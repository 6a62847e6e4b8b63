package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.json.StructsToJsonEvaluator
import org.apache.spark.sql.catalyst.expressions.objects.Invoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: per-FIELD JSON roundtrip elimination —
  * `from_json(to_json(named_struct(..., f: x, ...))).f  →  x`
  * when the serialize→parse cycle provably returns `x` unchanged.
  *
  * Spark's `OptimizeJsonExprs` eliminates the roundtrip only when the
  * WHOLE schemas match. The common partial shape — synthesize a JSON
  * document from a narrow struct, parse it under a wider canonical
  * schema, extract one field — survives, and it is exactly what a
  * pushed-down dispatch predicate looks like after alias substitution:
  * `from_json(to_json(struct(resourceType: lit, ...))).resourceType =
  * lit`, a full per-row serialize + tokenize that runs BELOW the first
  * exchange (single-task on an unsplittable input) just to re-read a
  * value the expression tree already holds. After this rewrite the
  * comparison constant-folds and `PruneFilters` removes the filter
  * outright.
  *
  * Soundness gates (all must hold, else leave the expression alone):
  *  - parse options and serialize options are both empty (default
  *    PERMISSIVE; `to_json` output is always well-formed JSON, so the
  *    permissive corrupt-row path never fires);
  *  - the struct is a literal-named `CreateNamedStruct` with unique
  *    names, the extracted name appears in it exactly once, and the
  *    source expression's type equals the parse-schema field type;
  *  - the type is roundtrip-exact under Jackson: STRING (escape
  *    in/escape out), BOOLEAN, and integral BYTE/SHORT/INT/LONG.
  *    Fractional, temporal, decimal and nested types stay out —
  *    formatting is not bit-stable there.
  *
  * STRING caveat (same contract class as Spark's whole-struct
  * roundtrip elimination): for a string `x` that is NOT valid UTF-8 —
  * unpaired surrogates / invalid byte sequences — the Jackson
  * roundtrip substitutes U+FFFD, so the unoptimized plan returns the
  * replaced string while the rewrite returns `x`'s raw bytes. Result
  * identity therefore holds for well-formed UTF-8 strings (all JSON
  * the engine itself synthesizes); malformed inputs trade one lossy
  * representation for the verbatim original.
  *
  * Matches both the pre-`ReplaceExpressions` `StructsToJson` form and
  * the post-replacement `Invoke(StructsToJsonEvaluator.evaluate)` form
  * (this rule runs in the operatorOptimization batch, after
  * RuntimeReplaceable lowering). Gated on the same conf as Spark's own
  * JSON expression optimizations.
  */
object JsonRoundTripFieldElim extends Rule[LogicalPlan] {

  private val safeTypes: Set[DataType] =
    Set(StringType, BooleanType, ByteType, ShortType, IntegerType, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.jsonExpressionOptimization) return plan
    // tree-pattern pruning: the rule is a no-op (bitmask check, no
    // traversal) for the vast majority of plans, which carry no
    // from_json — this runs in the fixed-point batch for EVERY query
    if (!plan.containsPattern(
        org.apache.spark.sql.catalyst.trees.TreePattern.JSON_TO_STRUCT))
      return plan
    plan.transformAllExpressions {
      case g @ GetStructField(j: JsonToStructs, ord, _)
          if j.options.isEmpty && j.schema.isInstanceOf[StructType] =>
        rewrite(g, j, ord).getOrElse(g)
    }
  }

  private def rewrite(g: GetStructField, j: JsonToStructs,
                      ord: Int): Option[Expression] = {
    val field = j.schema.asInstanceOf[StructType].fields(ord)
    if (!safeTypes.contains(field.dataType)) return None
    structInputOf(j.child).flatMap { cns =>
      // CreateNamedStruct.names are the EVALUATED name values
      // (UTF8String), available only when every name expr is foldable
      // — which `struct(...)`/`named_struct(...)` guarantees
      val names = cns.names.map {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case s: String => s
        case _ => return None
      }
      if (names.distinct.length != names.length) return None
      names.indexOf(field.name) match {
        case -1 => None // absent from the document: parses to null
        case i =>
          val v = cns.valExprs(i)
          if (v.dataType == field.dataType) Some(v) else None
      }
    }
  }

  /** The `named_struct` feeding a default-options `to_json`, whether
    * the serializer is still `StructsToJson` or already lowered to its
    * `Invoke(StructsToJsonEvaluator.evaluate)` runtime form.
    */
  private def structInputOf(e: Expression): Option[CreateNamedStruct] =
    e match {
      case StructsToJson(opts, c: CreateNamedStruct, _) if opts.isEmpty =>
        Some(c)
      case i: Invoke if i.functionName == "evaluate" =>
        (i.targetObject, i.arguments) match {
          case (Literal(ev: StructsToJsonEvaluator, _),
                Seq(c: CreateNamedStruct)) if ev.options.isEmpty =>
            Some(c)
          case _ => None
        }
      case _ => None
    }
}

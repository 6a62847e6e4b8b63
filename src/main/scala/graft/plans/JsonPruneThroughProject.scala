package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StructType

/** Optimizer rule: prune a `from_json` STRUCT schema through a Project
  * boundary when the parsed struct is only ever consumed via
  * field extractions.
  *
  * Spark's own `OptimizeCsvJsonExprs` rewrites
  * `GetStructField(JsonToStructs(wide), i)` to a single-field parse —
  * but only when the extraction and the parse sit in the SAME
  * expression tree. A `withColumn("_r", from_json(...))` followed by a
  * multi-field select leaves the parse in its own Project (the
  * CollapseProject rule refuses to inline an expensive expression
  * referenced many times), so the full schema survives and every row
  * pays a conversion over every schema field the query never reads.
  * The FHIR encode path is the worst case: a full-R4 resource schema
  * is ~35 top-level fields of deeply nested arrays, of which a typical
  * downstream projection touches a handful.
  *
  * This rule matches `Project(outer, [Filter(cond,)] Project(inner))`
  * where `inner` aliases a `JsonToStructs` whose every use in
  * `outer`/`cond` is a `GetStructField`, and rewrites the parse schema
  * to exactly the accessed fields (original order), remapping the
  * consumers' field ordinals. Values of retained fields are unchanged
  * (per-field JSON conversion is independent), so results are
  * identical for well-formed records — and for records whose
  * malformation PERMISSIVE mode maps to a fully-null row either way.
  * The one observable delta (the same contract Spark's
  * single-expression prune relies on): a record whose ONLY
  * malformation lies inside a pruned field can partial-parse to
  * null/partial retained values under the wide schema but parse fully
  * under the pruned one.
  *
  * Guards mirror `OptimizeCsvJsonExprs`: gated on
  * `spark.sql.optimizer.enableJsonExpressionOptimization`, fires only
  * with empty parse options (default PERMISSIVE mode) and bails when
  * the schema carries the corrupt-record column (pruning would change
  * which rows populate it).
  */
object JsonPruneThroughProject extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.jsonExpressionOptimization) return plan
    // tree-pattern pruning: no from_json anywhere -> no traversal
    // (this rule runs in the fixed-point batch for EVERY query)
    if (!plan.containsPattern(
        org.apache.spark.sql.catalyst.trees.TreePattern.JSON_TO_STRUCT))
      return plan
    plan.transformUp {
      case p @ Project(_, inner: Project) =>
        prune(p.projectList, inner) match {
          case Some((newOuter, newInner)) =>
            Project(newOuter.map(_.asInstanceOf[NamedExpression]), newInner)
          case None => p
        }
      case p @ Project(_, f @ Filter(_, inner: Project)) =>
        prune(p.projectList :+ f.condition, inner) match {
          case Some((rewritten, newInner)) =>
            Project(rewritten.dropRight(1)
              .map(_.asInstanceOf[NamedExpression]),
              Filter(rewritten.last, newInner))
          case None => p
        }
    }
  }

  /** Rewrites at most the FIRST prunable json alias per pass (the
    * fixed-point operatorOptimization batch re-runs the rule until
    * nothing changes, so multiple aliases in one Project converge over
    * successive passes without index-bookkeeping across rewrites).
    * Returns (rewritten consumer expressions, rewritten inner Project)
    * or None when nothing fired.
    */
  private def prune(consumers: Seq[Expression],
                    inner: Project): Option[(Seq[Expression], Project)] = {
    val corrupt = conf.columnNameOfCorruptRecord
    inner.projectList.zipWithIndex.collectFirst(Function.unlift {
      case (a @ Alias(j: JsonToStructs, _), idx)
          if j.options.isEmpty &&
            j.schema.isInstanceOf[StructType] &&
            !j.schema.asInstanceOf[StructType].fieldNames
              .contains(corrupt) =>
        tryPrune(consumers, inner, a, j, idx)
      case _ => None
    })
  }

  private def tryPrune(consumers: Seq[Expression], inner: Project,
                       a: Alias, j: JsonToStructs,
                       idx: Int): Option[(Seq[Expression], Project)] = {
    val id = a.exprId
    val schema = j.schema.asInstanceOf[StructType]
    // every reference to the alias must be GetStructField(attr, ord);
    // a bare use (whole-struct projection, to_json(_r), equality...)
    // needs every field and blocks the prune
    def fieldUsesOnly(e: Expression): Boolean = e match {
      case GetStructField(ar: AttributeReference, _, _)
          if ar.exprId == id => true
      case ar: AttributeReference if ar.exprId == id => false
      case other => other.children.forall(fieldUsesOnly)
    }
    if (!consumers.forall(fieldUsesOnly)) return None
    val accessed = consumers.flatMap(_.collect {
      case GetStructField(ar: AttributeReference, ord, _)
          if ar.exprId == id => ord
    }).distinct.sorted
    if (accessed.isEmpty || accessed.size >= schema.length) return None
    val prunedSchema = StructType(accessed.map(schema.fields))
    val ordinalMap = accessed.zipWithIndex.toMap
    val newAlias = Alias(j.copy(schema = prunedSchema), a.name)(
      exprId = a.exprId, qualifier = a.qualifier,
      explicitMetadata = a.explicitMetadata)
    val newInnerList = inner.projectList.updated(idx, newAlias)
    val newConsumers = consumers.map(_.transform {
      case GetStructField(ar: AttributeReference, ord, name)
          if ar.exprId == id =>
        GetStructField(
          ar.copy(dataType = newAlias.dataType,
            nullable = newAlias.nullable)(ar.exprId, ar.qualifier),
          ordinalMap(ord), name)
    })
    Some((newConsumers, Project(newInnerList, inner.child)))
  }
}

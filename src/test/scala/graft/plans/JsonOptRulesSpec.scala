package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.JsonToStructs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Focused specs for the two round-19 JSON optimizer rules:
  * [[JsonPruneThroughProject]] (schema pruning across a Project
  * boundary) and [[JsonRoundTripFieldElim]] (per-field
  * from_json(to_json(struct)) elimination). Each asserts BOTH the
  * plan shape change and bit-identical results vs the rules disabled
  * (they share Spark's JSON-optimization conf flag).
  */
class JsonOptRulesSpec extends SparkSpec {

  private val CONF = "spark.sql.optimizer.enableJsonExpressionOptimization"

  private def jsonSchemas(df: DataFrame): Seq[StructType] =
    df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case j: JsonToStructs => j.schema.asInstanceOf[StructType]
    }) ++ df.queryExecution.optimizedPlan.children.flatMap(c =>
      c.expressions.flatMap(_.collect {
        case j: JsonToStructs => j.schema.asInstanceOf[StructType]
      }))

  private def withConfOff[T](f: => T): T = {
    spark.conf.set(CONF, "false")
    try f finally spark.conf.set(CONF, "true")
  }

  private val wide = StructType(Seq(
    StructField("a", StringType), StructField("b", LongType),
    StructField("c", StructType(Seq(StructField("x", StringType),
      StructField("y", DoubleType)))),
    StructField("d", ArrayType(StructType(Seq(
      StructField("u", StringType), StructField("v", IntegerType))))),
    StructField("e", DoubleType)))

  // spark.range-based (NOT a LocalRelation): ConvertToLocalRelation
  // would otherwise evaluate the whole projection at optimize time and
  // make every plan-shape assertion vacuous
  private def src = spark.range(4).toDF("k").select(col("k"),
    when(col("k") === 0, lit(
        """{"a":"s1","b":7,"c":{"x":"cx","y":1.5},"d":[{"u":"du","v":3}],"e":2.5}"""))
      .when(col("k") === 1, lit("""{"a":null,"b":null,"c":null,"d":null,"e":null}"""))
      .when(col("k") === 2, lit("not json at all"))
      .otherwise(lit(null).cast(StringType)).as("js"))

  test("prune-through-project: schema shrinks to accessed fields, results identical") {
    def q = src.withColumn("_r", from_json(col("js"), wide))
      .select(col("k"), col("_r.a").as("a"),
        element_at(col("_r.d"), 1).getField("u").as("du"))
    val schemas = jsonSchemas(q)
    assert(schemas.nonEmpty)
    assert(schemas.forall(s => s.fieldNames.toSet == Set("a", "d")),
      s"expected pruned {a,d}, got ${schemas.map(_.fieldNames.mkString(","))}")
    val got = q.collect().map(_.toString).sorted
    val want = withConfOff(q.collect().map(_.toString).sorted)
    assert(got.sameElements(want))
  }

  test("prune-through-project: bare struct use blocks the prune") {
    def q = src.withColumn("_r", from_json(col("js"), wide))
      .select(col("_r").as("whole"), col("_r.a").as("a"))
    val schemas = jsonSchemas(q)
    assert(schemas.forall(_.length == wide.length),
      s"bare use must keep the full schema, got ${schemas.map(_.length)}")
    val got = q.collect().map(_.toString).sorted
    val want = withConfOff(q.collect().map(_.toString).sorted)
    assert(got.sameElements(want))
  }

  test("prune-through-project: filter between the projects is rewritten too") {
    def q = src.withColumn("_r", from_json(col("js"), wide))
      .filter(col("_r.a").isNotNull || col("_r.b").isNotNull)
      .select(col("_r.a").as("a"), col("k"))
    // all surviving parses must be pruned below the full width
    val schemas = jsonSchemas(q)
    assert(schemas.forall(_.length < wide.length),
      s"expected pruned schemas, got ${schemas.map(_.fieldNames.mkString(","))}")
    val got = q.collect().map(_.toString).sorted
    val want = withConfOff(q.collect().map(_.toString).sorted)
    assert(got.sameElements(want))
  }

  // the roundtrip shape the rule targets is INLINE — what a dispatch
  // predicate looks like after predicate pushdown substitutes the
  // parse alias into the filter condition
  private val rtSchema = StructType(Seq(StructField("rt", StringType),
    StructField("n", LongType), StructField("x", DoubleType)))

  test("roundtrip elim: safe-typed field access bypasses the parse") {
    val df = spark.range(2).select(
      when(col("id") === 0, "Imm").otherwise(lit(null)).as("t"),
      (col("id") + 5).as("n"), (col("id") + 1.5).as("x"))
    def q = df.select(
      from_json(to_json(struct(col("t").as("rt"), col("n").as("n"),
        col("x").as("x"))), rtSchema).getField("rt").as("rt"),
      from_json(to_json(struct(col("t").as("rt"), col("n").as("n"),
        col("x").as("x"))), rtSchema).getField("n").as("n"))
    assert(jsonSchemas(q).isEmpty,
      s"expected full elimination, got ${jsonSchemas(q)}")
    val got = q.collect().map(_.toString).sorted
    val want = withConfOff(q.collect().map(_.toString).sorted)
    assert(got.sameElements(want))
  }

  test("roundtrip elim fires on a pushed-down dispatch filter") {
    val df = spark.range(2).select(
      when(col("id") === 0, "Imm").otherwise("Other").as("t"),
      col("id").as("n"))
    def q = df
      .withColumn("_r", from_json(to_json(struct(col("t").as("rt"),
        col("n").as("n"))), rtSchema))
      .filter(col("_r.rt") === "Imm")
      .select(col("_r.n").as("n"))
    // the filter's substituted parse must be eliminated; the remaining
    // parse (if any) is the projection's
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("from_json(StructField(rt,"),
      s"filter-side parse should be eliminated:\n$plan")
    val got = q.collect().map(_.toString).sorted
    val want = withConfOff(q.collect().map(_.toString).sorted)
    assert(got.sameElements(want))
  }

  test("roundtrip elim: fractional field keeps the parse") {
    val df = spark.range(1).select((col("id") + 1.5).as("x"),
      concat(lit("a"), col("id")).as("t"))
    def q = df.select(from_json(to_json(struct(col("x").as("x"),
        col("t").as("t"))),
      StructType(Seq(StructField("x", DoubleType),
        StructField("t", StringType)))).getField("x").as("x"))
    assert(jsonSchemas(q).nonEmpty, "double must not be eliminated")
    val got = q.collect().map(_.toString).sorted
    val want = withConfOff(q.collect().map(_.toString).sorted)
    assert(got.sameElements(want))
  }

  test("roundtrip elim: type-mismatched field keeps the parse") {
    val df = spark.range(1).select(
      (col("id") + 7).cast(IntegerType).as("n"),
      concat(lit("a"), col("id")).as("t"))
    // struct writes n as INT, schema reads LONG: not eliminated (the
    // VALUES agree, but the rule only fires on exact type equality)
    def q = df.select(from_json(to_json(struct(col("n").as("n"),
        col("t").as("t"))),
      StructType(Seq(StructField("n", LongType),
        StructField("t", StringType)))).getField("n").as("n"))
    val got = q.collect().map(_.toString).sorted
    val want = withConfOff(q.collect().map(_.toString).sorted)
    assert(got.sameElements(want))
  }

  test("escape-heavy strings roundtrip identically through the elimination") {
    val nasty = Seq("a\"b\\c", "line\nbreak\ttab", "unicode ✓ ü 中",
      "", " ", "{\"inner\":1}")
    val df = spark.range(nasty.length).select(col("id").as("k"),
      element_at(array(nasty.map(lit): _*),
        col("id").cast(IntegerType) + 1).as("t"))
    def q = df.select(col("k"),
      from_json(to_json(struct(col("t").as("t"))),
        StructType(Seq(StructField("t", StringType))))
        .getField("t").as("t"))
    val got = q.collect().map(_.toString).sorted
    val want = withConfOff(q.collect().map(_.toString).sorted)
    assert(got.sameElements(want))
  }
}

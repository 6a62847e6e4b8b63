package graft

import graft.functions.{TextExpressions, VectorExpressions}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Session extension registering this library's native expressions as
  * SQL functions, so `spark.sql("SELECT cosine_similarity(a, b) ...")`
  * works next to the Column API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or on an existing session:
  * GraftExtensions.register(spark)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // rung (c): optimizer rule — naive range joins become bin-bucketed
    // equi-joins (inert until graft.rules.intervalJoin.binUs is set)
    e.injectOptimizerRule(_ => graft.plans.RangeBinJoinRule)
    // metadata-only COUNT(*) over manifest-backed scans (Delta's
    // metadata-only query; on by default, graft.rules.metadataOnlyCount)
    e.injectOptimizerRule(_ => graft.plans.MetadataOnlyCountRule)
    // from_json schema pruning through a Project boundary (the
    // withColumn-then-select shape Spark's OptimizeCsvJsonExprs cannot
    // see); gated on spark.sql.optimizer.enableJsonExpressionOptimization
    e.injectOptimizerRule(_ => graft.plans.JsonPruneThroughProject)
    // per-field JSON roundtrip elimination:
    // from_json(to_json(struct(... f: x ...))).f -> x for
    // roundtrip-exact types (same conf gate as Spark's JSON opts)
    e.injectOptimizerRule(_ => graft.plans.JsonRoundTripFieldElim)
    // Disjunctive-correlation EXISTS/IN: Spark 4.1.2's decorrelation
    // internal-errors on them; rewrite to an OR of conjunctive branches
    // where sound, refuse with a named error otherwise. Analyzer-phase
    // (post-hoc + check) — the optimizer hook fires too late, so this
    // pair is only active on sessions BUILT with these extensions
    // (Verify/Bench/test sessions are); register() on an existing
    // session cannot retrofit analyzer rules.
    e.injectPostHocResolutionRule(_ =>
      graft.plans.DisjunctiveCorrelationRewrite)
    e.injectCheckRule(_ => graft.plans.DisjunctiveCorrelationCheck)
    e.injectTableFunction((FunctionIdentifier("graft_delta_scan"),
      GraftExtensions.deltaScanInfo, GraftExtensions.deltaScanBuilder _))
    e.injectTableFunction((FunctionIdentifier("graft_table_changes"),
      GraftExtensions.tableChangesInfo,
      GraftExtensions.tableChangesBuilder _))
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private type Builder = Seq[Expression] => Expression

  val definitions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("cosine_similarity",
      info("cosine_similarity",
        "cosine_similarity(a, b) - cosine of two float/double arrays"),
      (es: Seq[Expression]) =>
        VectorExpressions.CosineSimilarity(es(0), es(1))),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot of two numeric arrays"),
      (es: Seq[Expression]) => VectorExpressions.DotProduct(es(0), es(1))),
    ("int_dist2",
      info("int_dist2",
        "int_dist2(a, b) - exact squared L2 of two bigint arrays"),
      (es: Seq[Expression]) => VectorExpressions.IntDist2(es(0), es(1))),
    ("minhash_signature",
      info("minhash_signature",
        "minhash_signature(shingle_hashes, k) - k-permutation minhash"),
      (es: Seq[Expression]) => VectorExpressions.MinHashSignature(es(0),
        es(1).eval().asInstanceOf[Int])),
    ("shingle_hashes",
      info("shingle_hashes",
        "shingle_hashes(text, w) - distinct sorted w-token shingle hashes"),
      (es: Seq[Expression]) => TextExpressions.ShingleHashes(es(0),
        es(1).eval().asInstanceOf[Int])),
    ("simhash64",
      info("simhash64", "simhash64(text) - 64-bit simhash of a text"),
      (es: Seq[Expression]) => TextExpressions.SimHash64(es(0))),
    ("hamming_distance",
      info("hamming_distance",
        "hamming_distance(a, b) - bit distance of two long arrays"),
      (es: Seq[Expression]) => VectorExpressions.HammingDistance(es(0), es(1))),
    ("nfc_normalize",
      info("nfc_normalize",
        "nfc_normalize(text) - Unicode NFC normalization (isNormalized fast path)"),
      (es: Seq[Expression]) => TextExpressions.NfcNormalize(es(0))))

  /** `graft_delta_scan(path[, versionAsOf])` — a TABLE function over
    * an exported `_delta_log` ([[graft.tables.DeltaExport.readSnapshot]]
    * resolved at QUERY time). The registration story for fragmented
    * tables hangs off this: a catalog view body is constant-size SQL
    * (`SELECT * FROM graft_delta_scan('/path')`) no matter how many
    * files the snapshot spans, and tracks the log as exports advance —
    * the same "static location, moving snapshot" contract a real Delta
    * registration gives external engines.
    */
  val deltaScanInfo: ExpressionInfo = new ExpressionInfo("graft", null,
    "graft_delta_scan",
    "graft_delta_scan(path[, versionAsOf | timestampAsOf]) - snapshot " +
      "of an exported _delta_log as a table; the second argument " +
      "time-travels by integer delta version, or by timestamp when a " +
      "string/TIMESTAMP literal ('yyyy-MM-dd[ HH:mm:ss[.S]]'; both " +
      "forms are interpreted in the session timezone, matching " +
      "Delta's timestampAsOf)", "")

  def deltaScanBuilder(es: Seq[Expression]): LogicalPlan = {
    if (es.isEmpty || es.size > 2)
      throw new IllegalArgumentException(
        "graft_delta_scan(path[, versionAsOf|timestampAsOf]) takes 1 " +
          "or 2 arguments")
    val path = es.head match {
      case Literal(v: UTF8String, StringType) => v.toString
      case other => throw new IllegalArgumentException(
        s"graft_delta_scan: path must be a string literal, got $other")
    }
    val spark = SparkSession.active
    val version = es.lift(1).map {
      case Literal(v: Integer, IntegerType) => v.longValue
      case Literal(v: java.lang.Long, LongType) => v.longValue
      case Literal(v: UTF8String, StringType) =>
        // Delta accepts both instants and bare dates, resolved in the
        // session timezone — mirror that (the TIMESTAMP-literal branch
        // below is session-tz epoch micros already, so the two forms
        // agree under any session timezone).
        val raw = v.toString.trim
        val zone = java.time.ZoneId
          .of(spark.sessionState.conf.sessionLocalTimeZone)
        val ldt =
          try java.time.LocalDateTime.parse(raw.replace(' ', 'T'))
          catch {
            case _: java.time.format.DateTimeParseException =>
              try java.time.LocalDate.parse(raw).atStartOfDay()
              catch {
                case e: java.time.format.DateTimeParseException =>
                  throw new IllegalArgumentException(
                    s"graft_delta_scan: cannot parse '$raw' as a " +
                      "timestamp — use 'yyyy-MM-dd[ HH:mm:ss[.S]]'", e)
              }
          }
        val ms = ldt.atZone(zone).toInstant.toEpochMilli
        graft.tables.DeltaExport.versionAtTimestamp(spark, path, ms)
      case Literal(v: java.lang.Long, TimestampType) =>
        // SQL TIMESTAMP literal: epoch micros
        graft.tables.DeltaExport.versionAtTimestamp(spark, path,
          Math.floorDiv(v.longValue, 1000L))
      case other => throw new IllegalArgumentException(
        "graft_delta_scan: the time-travel argument must be an " +
          s"integer version or a string/TIMESTAMP instant, got $other")
    }.getOrElse(-1L)
    graft.tables.DeltaExport
      .readSnapshot(spark, path, version)
      .queryExecution.analyzed
  }

  /** `graft_table_changes(path, fromVersion, toVersion[, key])` —
    * delta's `table_changes` SQL surface over a graft table: the
    * row-level change feed between two retained versions, tagged
    * `_change_type` insert / delete / update_preimage /
    * update_postimage. With a key the pairs are keyed diffs
    * ([[graft.tables.ResourceTable.changes]]); without one, the
    * algebraically-equivalent multiset insert/delete images
    * ([[graft.tables.ResourceTable.changesByContent]] — RESTORE and
    * other keyless commits replay through the same form).
    */
  val tableChangesInfo: ExpressionInfo = new ExpressionInfo("graft",
    null, "graft_table_changes",
    "graft_table_changes(path, fromVersion, toVersion[, key]) - " +
      "row-level change feed of a graft table between two retained " +
      "versions, tagged _change_type; keyed diffs with a key column, " +
      "multiset insert/delete images without", "")

  def tableChangesBuilder(es: Seq[Expression]): LogicalPlan = {
    if (es.size < 3 || es.size > 4)
      throw new IllegalArgumentException(
        "graft_table_changes(path, fromVersion, toVersion[, key]) " +
          "takes 3 or 4 arguments")
    def str(e: Expression, what: String): String = e match {
      case Literal(v: UTF8String, StringType) => v.toString
      case other => throw new IllegalArgumentException(
        s"graft_table_changes: $what must be a string literal, got $other")
    }
    def ver(e: Expression, what: String): Long = e match {
      case Literal(v: Integer, IntegerType) => v.longValue
      case Literal(v: java.lang.Long, LongType) => v.longValue
      case other => throw new IllegalArgumentException(
        s"graft_table_changes: $what must be an integer version, " +
          s"got $other")
    }
    val path = str(es(0), "path")
    val from = ver(es(1), "fromVersion")
    val to = ver(es(2), "toVersion")
    val key = es.lift(3).map(str(_, "key"))
    val spark = SparkSession.active
    val t = graft.tables.ResourceTable(spark, path)
    key.fold(t.changesByContent(from, to))(k => t.changes(from, to, k))
      .queryExecution.analyzed
  }

  /** Register on an already-built session (temp functions, the table
    * function, and the optimizer rule via the experimental hook).
    */
  def register(spark: SparkSession): Unit = {
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction("graft_delta_scan",
        deltaScanBuilder _, "scala_udf")
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction("graft_table_changes",
        tableChangesBuilder _, "scala_udf")
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.RangeBinJoinRule))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.RangeBinJoinRule)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.MetadataOnlyCountRule))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.MetadataOnlyCountRule)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.JsonPruneThroughProject))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.JsonPruneThroughProject)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.JsonRoundTripFieldElim))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.JsonRoundTripFieldElim)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audits — the "would this survive a 100× scale-up"
  * checks: filters reach the parquet scan, column pruning holds,
  * small sides broadcast, and the LSH pipelines never degenerate into
  * cartesian products.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q_filter_proj pushes the quantity predicate into the scan") {
    val p = plan("q_filter_proj")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity,30"), p)
  }

  test("q1_agg prunes to only the five needed columns") {
    val p = plan("q1_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_suppkey"), readSchema)
    assert(!readSchema.contains("l_shipdate"), readSchema)
    assert(readSchema.contains("l_quantity"), readSchema)
  }

  test("dimension joins broadcast the small side") {
    assert(plan("q_broadcast_join").contains("BroadcastHashJoin"))
    assert(plan("q_join_agg").contains("BroadcastHashJoin"))
  }

  test("LSH dedup plans contain no cartesian/nested-loop join") {
    Seq("q_dedup_minhash", "q_dedup_simhash", "q_ngram_jaccard",
      "q_dedup_semdedup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q")
    }
  }

  test("aggregations use partial (map-side) aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p)
    // two HashAggregate nodes = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("brute-force topk broadcasts the query side, not the corpus") {
    val p = plan("q_ann_topk")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("partitioned writes get partition pruning (PartitionFilters)") {
    val base = java.nio.file.Files.createTempDirectory("ppart").toString
    SparkEntry.queries("q_cast_types")(spark, dir)
      .withColumn("part_key", org.apache.spark.sql.functions.col("l_linenumber"))
      .write.partitionBy("part_key").mode("overwrite").parquet(s"$base/t")
    val df = spark.read.parquet(s"$base/t")
      .filter(org.apache.spark.sql.functions.col("part_key") === 1)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("part_key"), p)
  }

  private def exchangeNodes(p: String): Int =
    "(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size

  test("seq packing shuffles exactly once (on the shard key)") {
    val p = plan("q_seq_pack")
    assert(exchangeNodes(p) == 1, p)
    // the scan reads only the three needed columns, not the whole table
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("lang"), readSchema)
  }

  test("chunk windows and stratified sample are shuffle-free row-local plans") {
    Seq("q_chunk_windows", "q_stratified_sample").foreach { q =>
      val p = plan(q)
      // stratified_sample ends in a groupBy for the gate's compact
      // output; the SAMPLING itself must add no exchange beyond it
      val allowed = if (q == "q_stratified_sample") 1 else 0
      assert(exchangeNodes(p) <= allowed, s"$q: $p")
    }
  }

  test("shuffle_hash hint produces a ShuffledHashJoin (no sort phase)") {
    val p = plan("q_shuffle_hash_join")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("decontamination broadcasts the benchmark set (semi join, no corpus shuffle)") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("multimodal meta projection prunes the binary payload at the scan") {
    val p = plan("q_multimodal_meta")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("payload"), readSchema)
  }

  test("resample/gap-fill joins stay shuffle-bounded (no cartesian)") {
    Seq("q_resample", "q_gap_ffill").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q")
    }
  }

  test("whole-stage codegen covers the scan→filter→project pipelines") {
    val p = plan("q_filter_proj")
    // formatted explain marks codegen'd operators with [codegen id : N]
    assert(p.contains("[codegen id :"), p)
    assert(p.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("codegen")), p)
  }

  test("bucketed join is exchange-free on both sides") {
    import graft.tables.Bucketing
    import org.apache.spark.sql.functions.col
    // broadcast off so the join must be a SortMergeJoin — the audit is
    // that bucketing removed BOTH shuffle exchanges, not that the
    // optimizer broadcast one side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Bucketing.bucketedEquiJoin(
        SparkEntry.queries("q_cast_types")(spark, dir)
          .withColumnRenamed("l_orderkey", "okey"),
        spark.read.parquet(s"$dir/orders.parquet")
          .withColumnRenamed("o_orderkey", "okey"),
        key = "okey", buckets = 4,
        leftName = "bt_lineitem", rightName = "bt_orders")
      val p = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("interval join is a hash equi-join on the bin, never a nested loop") {
    val p = plan("q_interval_join")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    assert(p.contains("Join"), p)
  }

  test("quantization is a shuffle-free row-local generator plan") {
    val p = plan("q_quantize_embedding")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate"), p)
  }

  test("temperature mix broadcasts rates; the corpus never shuffles pre-filter") {
    val p = plan("q_temperature_mix")
    // the only exchange feeds the tiny per-source aggregate / final
    // gate groupBy — the documents scan side joins via broadcast
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("segment dedup: frequency anti-join, no doc-by-doc join") {
    val p = plan("q_dedup_segments")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("substring dedup: hash-keyed equi-joins only, window over dup rows") {
    val p = plan("q_substring_dedup")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    // positional window hashes are one native projection — the text
    // column must not survive past the scan-side projection into the
    // shuffle (only doc/pos/hash integers shuffle)
    assert(p.contains("positionalshinglehashes") ||
      p.contains("PositionalShingleHashes"), p)
  }

  test("lm scoring: LM tables join hash-keyed, no cartesian") {
    val p = plan("q_lm_score")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the 1-row corpus-total broadcast
    // (formatted mode prints each node twice: tree line + detail)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 2, p)
  }

  test("native text/vector expressions generate code (no eval fallback)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // the minhash projection stage must be codegen'd AND its generated
    // source must call the static eval helpers — proof the expressions
    // implement doGenCode and the generated Java actually compiles
    // (Spark silently reverts to interpreted eval on codegen errors).
    // AQE off: its wrapper hides WholeStageCodegenExec pre-execution.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def genFor(q: String): String =
        SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.collect {
          case w: WholeStageCodegenExec => w.doCodeGen()._2.body
        }.mkString("\n")
      val gen = genFor("q_dedup_minhash")
      assert(gen.contains("shingleHashesEval"), "shingle codegen missing")
      assert(gen.contains("minhashEval"), "minhash codegen missing")
      assert(genFor("q_dedup_simhash").contains("simhash64Eval"),
        "simhash codegen missing")
      // the z-order key projection (used by clustered optimize rewrites)
      val zdf = graft.functions.ZOrder.withZOrderKey(
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select("l_orderkey", "l_quantity"),
        Seq("l_orderkey", "l_quantity"))
      val zgen = zdf.queryExecution.executedPlan.collect {
        case w: WholeStageCodegenExec => w.doCodeGen()._2.body
      }.mkString("\n")
      assert(zgen.contains("bucketOf"), "range-bucket codegen missing")
      assert(zgen.contains("interleave"), "interleave codegen missing")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}

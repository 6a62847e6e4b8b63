package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analysis for corpus curation — the host-level quality
  * signal web-scale training pipelines weight documents by (Common
  * Crawl publishes exactly this: a host/domain ranking from the crawl
  * link graph; CCNet/RefinedWeb-style pipelines consume it to keep or
  * down-sample hosts). The reference engine has no graph operators
  * (SURVEY §2 — its only iteration is the streaming scheduler), so
  * this is north-star scope like ops/Dedup and ops/Similarity.
  *
  * PageRank here is FIXED-POINT INTEGER end-to-end: ranks are longs
  * scaled by `scale`, every per-edge contribution is an integer
  * division, and each update is `(15·scale)/100 + (85·mass)/100` in
  * long arithmetic. Floating-point PageRank sums in shuffle order and
  * never reproduces bit-for-bit across engines or even runs; the
  * integer form is order-independent (addition of longs commutes), so
  * the same corpus yields the SAME ranks on any partitioning — and
  * the DuckDB oracle replays the whole iteration with `//` BIGINT
  * division (the q_kmeans / q_pq fixed-point convention).
  *
  * Scale shape (the 100 TB framing): one iteration is one equi-join
  * of the degree-annotated edge table with the rank table on `src`
  * plus one hash aggregate on `dst` — both shuffle on the node key,
  * and AQE coalesces/skew-splits them; nothing is ever collected —
  * the dangling-mass scalar rides INSIDE the iteration's one job as a
  * single-row cross join (broadcast of one long), so an iteration is
  * exactly one Spark job, not a collect + a materialize. Each
  * round's rank table persists (MEMORY_AND_DISK) and the previous one
  * unpersists — the MLlib iterative pattern — so the lineage stays
  * O(1) deep and driver state O(1). A billion-edge graph runs with
  * edge-table partitioning as the only knob.
  */
object Graph {

  /** PageRank over a directed edge list.
    *
    * Semantics (classic, with dangling redistribution):
    *  - nodes = distinct(src) ∪ distinct(dst);
    *  - r₀(n) = `scale` for every node;
    *  - per iteration, every edge (s,d) contributes
    *    `floor(r(s) / outdeg(s))` to d; the summed rank of dangling
    *    nodes (outdeg 0) is redistributed as `floor(dangling / N)` to
    *    every node; then
    *    `r'(n) = floor(15·scale/100) + floor(85·(contrib + share)/100)`
    *    — damping 0.85 in integer arithmetic.
    *
    * Parallel edges contribute with multiplicity (an adjacency
    * multigraph, the raw link-graph shape); pre-`distinct` the input
    * for simple-graph semantics. Returns (node, rank) for every node.
    *
    * Overflow headroom: total mass is ≤ N·scale + N (the +15% floor
    * rounding), so with the default scale a trillion-node graph stays
    * far inside long range; per-node ranks are bounded by total mass.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // the edge list persists FIRST: however expensive the join/scan
    // that built it, it computes exactly once — outdeg, eDeg and the
    // node set all derive from this cache (two narrow longs per edge)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // edges carry their source's degree once; every iteration reuses
    // this one table (re-deriving it per round would re-shuffle the
    // raw edges k times)
    val eDeg = e.join(outdeg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // the dangling flag (no out-edges) is iteration-invariant, so it
    // RIDES IN the rank table itself: the per-round dangling mass is
    // then a filter+sum over the already-cached ranks — the previous
    // shape re-joined a persisted dangling-node set against the ranks
    // every round, a whole join (two exchanges) per iteration for a
    // bit that never changes (guide §2.4: remove shuffles outright)
    // every round's rank table is an EAGER LOCAL CHECKPOINT, not a
    // bare persist: persist caches the data but the logical plan keeps
    // growing — iteration k's tree embeds iteration k-1's whole tree
    // once per ranks reference, so analysis + cache-lookup
    // canonicalization cost grows exponentially in k (measured: the
    // driver gap between iteration jobs grew ~1 s/round at 3 rounds).
    // The checkpoint truncates the plan to the materialized RDD, so
    // every iteration analyzes an O(1)-size tree (guide §5) — the same
    // MLlib-iteration hygiene the persist/unpersist dance was for,
    // done at the plan layer too.
    var ranks = nodes
      .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), col("deg").isNull.as("dangling"),
        lit(scale).as("rank"))
      .localCheckpoint(true)
    val n = ranks.count() // one long off the checkpoint
    val base = 15L * scale / 100L
    for (_ <- 1 to iterations) {
      // dangling mass: one aggregated row that rides the iteration's
      // single job as a broadcast cross join — no driver collect, no
      // second job per round. `sum DIV n` in long arithmetic equals
      // the truncating division the oracle replays with BIGINT `//`
      // (mass is non-negative).
      val shareDf = ranks.filter(col("dangling"))
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
        .select(expr(s"dmass DIV $n").as("share"))
      // per-edge contributions UNION a zero row per node, then ONE
      // hash aggregate keyed on the node: the previous shape paid a
      // groupBy exchange for the contributions AND a second
      // nodes⟕contribs join (two more exchanges + a sort) just to
      // put back zero-inbound nodes; the union form re-attaches them
      // in the same aggregate that sums the contributions, and
      // max(dangling) carries the invariant flag through (every node
      // has exactly one ranks-arm row, contribution rows are false).
      // `/` on longs is DOUBLE in Spark SQL (and lossy past 2^53);
      // DIV is the integer division DuckDB's `//` replays exactly
      val perEdge = eDeg
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst").as("node"), lit(false).as("dangling"),
          expr("rank DIV deg").as("c"))
      val next = ranks
        .select(col("node"), col("dangling"), lit(0L).as("c"))
        .unionByName(perEdge)
        .groupBy("node")
        .agg(max(col("dangling")).as("dangling"), sum(col("c")).as("c"))
        .crossJoin(broadcast(shareDf))
        .select(col("node"), col("dangling"),
          (lit(base) + expr("(85 * (c + share)) DIV 100")).as("rank"))
        .localCheckpoint(true) // eager: materialized before the drop
      dropCheckpoint(ranks)
      ranks = next
    }
    eDeg.unpersist(false)
    e.unpersist(false)
    ranks.select(col("node"), col("rank"))
  }

  /** Free a [[org.apache.spark.sql.Dataset.localCheckpoint]]'s backing
    * RDD once the next round no longer references it — the iterative
    * unpersist hygiene; without it a k-iteration run holds k rank
    * tables until the ContextCleaner gets around to them.
    */
  private def dropCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(false): Unit
      case _ => ()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** In/out degree profile per node — the adjacency sanity stats a
    * link-graph build reports (one aggregate per direction, one
    * full-outer merge on the node key).
    */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val out = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Rank-weighted per-host document keep-quota — the consumption
    * side of [[pageRank]]: given per-doc host keys and the host rank
    * table, keep each host's `ceil(quota · rank / maxRank)` top
    * documents by a deterministic order column. One broadcast-sized
    * join (the rank table is hosts, not documents) + one ranking
    * window per host.
    */
  def keepByHostRank(docs: DataFrame, hostCol: String,
                     orderCol: Column, hostRanks: DataFrame,
                     maxPerHost: Int): DataFrame = {
    val maxRank = hostRanks.agg(max(col("rank"))).collect()(0).getLong(0)
    val quota = hostRanks.select(col("node").as("__host"),
      // ceil in integer arithmetic: (a + b - 1) DIV b — never `/`,
      // which is DOUBLE on longs
      expr(s"(rank * ${maxPerHost.toLong} + ${maxRank - 1L}) " +
        s"DIV $maxRank").as("__quota"))
    docs
      .join(broadcast(quota), col(hostCol) === col("__host"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(hostCol)).orderBy(orderCol)))
      .filter(col("__rn") <= col("__quota"))
      .drop("__host", "__quota", "__rn")
  }
}

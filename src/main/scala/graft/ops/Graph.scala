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
    val spark = edges.sparkSession
    // the edge list persists FIRST: however expensive the join/scan
    // that built it, it computes exactly once — outdeg, eDeg and the
    // node set all derive from this cache (two narrow longs per edge)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // outdeg persists too: the per-iteration dangling anti-join probes
    // it, and re-deriving it would re-shuffle the edges per iteration
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // edges carry their source's degree once; every iteration reuses
    // this one table (re-deriving it per round would re-shuffle the
    // raw edges k times)
    val eDeg = e.join(outdeg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the dangling node SET is iteration-invariant (nodes with no
    // out-edges) — derive it once; only its rank MASS changes per round
    val danglingNodes = nodes
      .join(outdeg.withColumnRenamed("src", "node"),
        Seq("node"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // one long — also materializes the caches
    var ranks = nodes.select(col("node"), lit(scale).as("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = 15L * scale / 100L
    for (_ <- 1 to iterations) {
      // dangling mass: one aggregated row that rides the iteration's
      // single job as a broadcast cross join — no driver collect, no
      // second job per round. `sum DIV n` in long arithmetic equals
      // the truncating division the oracle replays with BIGINT `//`
      // (mass is non-negative).
      val shareDf = ranks
        .join(danglingNodes, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
        .select(expr(s"dmass DIV $n").as("share"))
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank DIV deg").as("contrib"))
        .groupBy("node").agg(sum(col("contrib")).as("c"))
      // `/` on longs is DOUBLE in Spark SQL (and lossy past 2^53);
      // DIV is the integer division DuckDB's `//` replays exactly
      val next = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(shareDf))
        .select(col("node"),
          (lit(base) +
            expr("(85 * (coalesce(c, 0) + share)) DIV 100")).as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the parent
      ranks.unpersist(false)
      ranks = next
    }
    danglingNodes.unpersist(false)
    eDeg.unpersist(false)
    outdeg.unpersist(false)
    nodes.unpersist(false)
    e.unpersist(false)
    ranks
  }

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

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the codebook
  * compression layer of billion-scale ANN (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011; the FAISS
  * IVF-PQ shape). The vector space is split into `m` subspaces; each
  * subspace learns a `k`-centroid codebook from a BOUNDED sample, and
  * every vector is stored as `m` small codes (here 8 × 4 bits ≈ 4
  * bytes instead of 256 bytes of float32 — a 64× memory cut). Queries
  * score candidates by Asymmetric Distance Computation (ADC): one
  * query-to-centroid distance table of m·k entries, then each
  * candidate costs m table lookups instead of a dim-length float loop.
  *
  * Scale shape:
  *  - TRAINING is sample-based, exactly like FAISS: a bounded id-range
  *    sample (driver state ≤ sampleCap·dim fixed-point longs) trains
  *    all m codebooks in a deterministic pure-Scala Lloyd's loop. At
  *    100 TB the sample is still a few thousand vectors — training
  *    cost does not grow with the corpus.
  *  - ENCODE is row-local: the m·k·(dim/m) codebook is a literal in a
  *    codegen'd argmin expression — one scan, zero shuffles/joins.
  *  - ADC top-k is the [[Similarity.bruteForceTopK]] plan (broadcast
  *    queries, scan corpus, rank window) with each comparison reduced
  *    from dim float ops to m integer lookups.
  *
  * Determinism (what makes every gate exact-oracle-able): all
  * arithmetic is FIXED-POINT INTEGER end-to-end. Inputs are scaled by
  * 2^20 and floored (the [[Similarity.centroids]] convention);
  * distances are exact integer sums of squares; centroid updates are
  * floor(sum/n) — one double division on values ≤ 2^27 (exact) then a
  * floor, identical on any engine; empty clusters carry their previous
  * centroid so codes stay dense 0..k-1. No step depends on
  * accumulation order, partitioning, or libm.
  */
object Pq {

  val Scale = 1048576L // 2^20: float * 2^20 is exact (power of two)

  /** Trained codebooks: `cents(s)(cl)` is subspace `s`'s centroid
    * `cl` as `dim/m` fixed-point longs, dense cl ∈ 0..k-1.
    */
  final case class Codebook(m: Int, k: Int, subDim: Int,
                            cents: Seq[Seq[Seq[Long]]])

  private def dist2(a: Seq[Long], b: Seq[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic Lloyd's over a fixed-point sample (pure Scala — the
    * sample is bounded, see object doc). Seeds are the first `k`
    * sample subvectors; assignment ties go to the smallest code;
    * empty clusters carry forward.
    */
  def train(sample: Seq[Seq[Long]], m: Int, k: Int,
            iters: Int): Codebook = {
    require(sample.nonEmpty && sample.head.length % m == 0,
      s"dim ${sample.headOption.map(_.length)} not divisible by m=$m")
    val subDim = sample.head.length / m
    val cents = (0 until m).map { s =>
      val subs = sample.map(v => v.slice(s * subDim, (s + 1) * subDim))
      var c: Seq[Seq[Long]] = subs.take(k)
      var it = 0
      while (it < iters) {
        val assigned = subs.map { v =>
          var best = 0; var bestD = Long.MaxValue; var j = 0
          while (j < c.length) {
            val d = dist2(v, c(j))
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          best
        }
        val groups = assigned.zip(subs).groupBy(_._1)
        c = c.zipWithIndex.map { case (old, cl) =>
          groups.get(cl) match {
            case Some(grp) =>
              val vs = grp.map(_._2)
              (0 until subDim).map(d =>
                math.floor(vs.map(_(d)).sum.toDouble / vs.size).toLong)
            case None => old
          }
        }
        it += 1
      }
      c
    }
    Codebook(m, k, subDim, cents)
  }

  /** Train on the `sampleCap` vectors with the SMALLEST salted id
    * hashes — a fixed-size sample independent of corpus scale (the
    * FAISS training contract) that is also ORDER-INDEPENDENT: an
    * id-prefix sample (`id < cap`) correlates with ingest order on a
    * real corpus, biasing the codebook toward the earliest-crawled
    * slice. md5 hex is the salt hash ([[Sampling.splitHash]]'s trick:
    * bit-identical in Spark and the DuckDB oracle), the selection is
    * one TakeOrdered top-k (no full sort), and the collect stays
    * bounded by sampleCap·dim longs. k-means seeds are the first k
    * sample vectors in hash order — deterministic for a given id set.
    */
  def trainOn(df: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 2,
              sampleCap: Long = 64, idCol: String = "vec_id",
              vecCol: String = "embedding",
              salt: String = "pq"): Codebook = {
    val sample = df
      .select(col(idCol), col(vecCol),
        md5(concat(col(idCol).cast("string"), lit(salt))).as("_s"))
      .orderBy(col("_s"), col(idCol)).limit(sampleCap.toInt)
      .collect()
      .map(_.getSeq[Float](1).map(v =>
        math.floor(v.toDouble * Scale).toLong).toSeq).toSeq
    train(sample, m, k, iters)
  }

  /** The fixed-point full vector as array<long> (exact). */
  private def fixedPoint(vec: Column): Column =
    transform(vec, v => floor(v.cast("double") * Scale))

  private def subVec(qv: Column, cb: Codebook, s: Int): Column =
    slice(qv, s * cb.subDim + 1, cb.subDim)

  /** Exact integer squared distance between an array<long> column and
    * a literal fixed-point centroid — the native codegen'd kernel
    * ([[graft.functions.VectorExpressions.int_dist2]]): Pq builds m·k
    * of these per row, and the native loop keeps the generated code
    * m·k× smaller than the equivalent `aggregate(zip_with(...))`
    * lambda trees (same exact long arithmetic either way).
    */
  private def dist2Col(sub: Column, cv: Seq[Long]): Column =
    graft.functions.VectorExpressions.int_dist2(sub, typedlit(cv))

  /** Row-local PQ encoding: adds `codes` (array<int>, length m) — per
    * subspace, the argmin-distance codebook entry (ties to the
    * smallest code via struct-min). One codegen'd scan, no shuffle —
    * except the input spread below, exactly when the input itself is
    * under-parallel: the m·k argmin is the heaviest per-row kernel in
    * the vector stack, and on a single-row-group parquet corpus the
    * whole encode otherwise runs as ONE task (guide §2.5 input skew;
    * measured: q_pq_topk's 1.9 s single-task stage). No-op on already
    * parallel or streaming inputs; `spread = false` for callers whose
    * input is micro-batch-bounded by contract ([[refreshCodes]]).
    */
  def encode(df: DataFrame, cb: Codebook,
             vecCol: String = "embedding",
             outCol: String = "codes",
             spread: Boolean = true): DataFrame = {
    val codes = array((0 until cb.m).map { s =>
      val sub = subVec(col("_pq_fp"), cb, s)
      array_min(array(cb.cents(s).zipWithIndex.map { case (cv, cl) =>
        struct(dist2Col(sub, cv).as("d"), lit(cl).as("cl"))
      }: _*)).getField("cl")
    }: _*)
    (if (spread) graft.Par.spread(df) else df)
      .withColumn("_pq_fp", fixedPoint(col(vecCol)))
      .withColumn(outCol, codes)
      .drop("_pq_fp")
  }

  /** ADC top-k: each query's distance to every codebook centroid forms
    * an m·k integer table (computed inline against the broadcast query
    * vector); each candidate then costs m lookups into it. Exact
    * integer ADC scores (`adc` evidence column), rank ties to the
    * smaller neighbor id. Plan: encode corpus row-locally, broadcast
    * queries, rank window per query — the corpus never shuffles.
    */
  def adcTopK(queries: DataFrame, corpus: DataFrame, cb: Codebook,
              topK: Int, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
      fixedPoint(col(vecCol)).as("_qv"))
    val c = encode(corpus, cb, vecCol, "_codes")
      .select(col(idCol).as("n_id"), col("_codes"))
    rankAdc(c.join(broadcast(q)), cb, topK)
  }

  /** IVF + PQ — the full FAISS IVF-PQ query shape: the corpus pins to
    * its [[Similarity.ivfAssign]] coarse cell, queries fan out to
    * their `probes` best cells, and ADC scoring runs only on the
    * cell-matched candidates — a BroadcastHashJoin on the cell key
    * whose probe side costs m lookups per candidate. Expected work is
    * probes/nCells of [[adcTopK]]'s scan with the same per-candidate
    * cost; the same cell-restricted recall semantics as
    * [[Similarity.ivfTopK]] (probes = nCells degenerates to exact
    * adcTopK through the hash join).
    */
  def ivfAdcTopK(queries: DataFrame, corpus: DataFrame, cb: Codebook,
                 topK: Int, nCells: Int = 8, dim: Int = 64,
                 probes: Int = 2, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val q = Similarity.ivfProbe(queries, nCells, dim, vecCol, probes)
      .select(col(idCol).as("q_id"),
        fixedPoint(col(vecCol)).as("_qv"), col("cell"))
    val c = encode(Similarity.ivfAssign(corpus, nCells, dim, vecCol),
        cb, vecCol, "_codes")
      .select(col(idCol).as("n_id"), col("_codes"), col("cell"))
    rankAdc(c.join(broadcast(q), "cell"), cb, topK)
  }

  /** Shared ADC score + rank tail over (_qv, _codes) candidate rows —
    * one place so every PQ top-k variant (and its oracle SQL) stays
    * bit-identical.
    */
  private def rankAdc(candidates: DataFrame, cb: Codebook,
                      topK: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adc").asc, col("n_id").asc)
    candidates
      .withColumn("adc", adcExpr(cb))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("q_id", "n_id", "rank", "adc")
  }

  /** The ADC score over (_qv, _codes) candidate rows: per subspace,
    * the query's distance table is computed inline and the candidate's
    * code picks its entry — m lookups, exact long.
    */
  private def adcExpr(cb: Codebook): Column =
    (0 until cb.m).map { s =>
      val dists = array(cb.cents(s).map(cv =>
        dist2Col(subVec(col("_qv"), cb, s), cv)): _*)
      element_at(dists, element_at(col("_codes"), s + 1) + 1)
    }.reduce(_ + _)

  /** Incrementally maintain a PQ-encoded corpus from a table's change
    * feed (the [[graft.ops.Dedup.refreshBandedIndex]] /
    * [[graft.ops.Curation.refreshFlags]] contract, FAISS's
    * add/remove_ids shape): deleted and update-preimage vectors leave
    * the code table, inserted and update-postimage vectors are
    * encoded row-locally and appended — the CODEBOOK is not retrained
    * (training is a fixed-size-sample artifact; retraining invalidates
    * every stored code, a rebuild not a refresh). Row-identical to
    * re-encoding the post-change corpus under the same codebook, at
    * O(code-table scan + changed vectors): the changed-id set
    * broadcasts into the anti-join and the corpus vectors are never
    * re-read.
    */
  def refreshCodes(codes: DataFrame, changes: DataFrame, cb: Codebook,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   codesCol: String = "codes"): DataFrame = {
    val removed = changes
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .select(col(idCol)).distinct()
    val added = changes
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(col(idCol), col(vecCol))
    codes.join(broadcast(removed), Seq(idCol), "left_anti")
      // spread = false: `added` is micro-batch-bounded by contract —
      // a per-refresh exchange would cost more than the serial encode
      .unionByName(encode(added, cb, vecCol, codesCol, spread = false)
        .select(col(idCol), col(codesCol)))
  }

  /** ADC-then-exact re-rank (Jégou et al. TPAMI'11 §V — the standard
    * accuracy rescue for PQ's quantization error): [[adcTopK]] ranks
    * the corpus, each query's top k·`rerank` ADC candidates are
    * re-scored with the EXACT fixed-point squared distance to the
    * full corpus vector, and the final top-k ranks by that exact
    * score (ADC, then id, as tie-breaks). The exact pass touches only
    * candidates — queries·k·rerank rows join back to their full
    * vectors on the corpus id (a tiny side AQE broadcasts), so its
    * cost is O(queries·k·rerank·dim), never a second corpus scan
    * pairwise. Integer-exact end to end: the DuckDB oracle replays
    * the whole chain including the re-rank.
    */
  def adcRerankTopK(queries: DataFrame, corpus: DataFrame, cb: Codebook,
                    topK: Int, rerank: Int = 4,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val cand = adcTopK(queries, corpus, cb, topK * rerank, idCol, vecCol)
      .select(col("q_id"), col("n_id"), col("adc"))
    val cv = corpus.select(col(idCol).as("n_id"),
      fixedPoint(col(vecCol)).as("_cv"))
    val qv = queries.select(col(idCol).as("q_id"),
      fixedPoint(col(vecCol)).as("_qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy(col("exact").asc, col("adc").asc, col("n_id").asc)
    cand.join(cv, Seq("n_id")).join(broadcast(qv), Seq("q_id"))
      .withColumn("exact", graft.functions.VectorExpressions
        .int_dist2(col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("q_id", "n_id", "rank", "exact", "adc")
  }

  /** STREAMING ADC scoring — the re-crawl / online-query shape: a
    * stream of query vectors probes a PQ-encoded static corpus and
    * emits every candidate within `maxAdc`. Stateless stream-static
    * inner join on the coarse CELL equi-key (queries fan to `probes`
    * cells, the corpus pins to one) with the exact integer ADC
    * threshold as the residual condition — bounded per-batch work,
    * no state store, the corpus side encoded once per batch plan and
    * never shuffled. probes = nCells degenerates to exhaustive ADC.
    */
  def adcHitsStream(queries: DataFrame, corpus: DataFrame, cb: Codebook,
                    maxAdc: Long, nCells: Int = 8, dim: Int = 64,
                    probes: Int = 2, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val q = Similarity.ivfProbe(queries, nCells, dim, vecCol, probes)
      .select(col(idCol).as("q_id"),
        fixedPoint(col(vecCol)).as("_qv"), col("cell"))
    val c = encode(Similarity.ivfAssign(corpus, nCells, dim, vecCol),
        cb, vecCol, "_codes")
      .select(col(idCol).as("n_id"), col("_codes"), col("cell"))
    q.join(c, Seq("cell"))
      .withColumn("adc", adcExpr(cb))
      .filter(col("adc") <= maxAdc)
      .select("q_id", "n_id", "adc")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, plus a
  * random-hyperplane-LSH bucketed variant as the 100 TB scale path.
  *
  * Scale design: the query side is broadcast (queries ≪ corpus); the
  * corpus is scanned once; top-k is taken with a rank window partitioned
  * by query id — at large k·|queries| swap the window for a
  * per-partition heap `Aggregator`, but the broadcast-scan shape is
  * already the right plan (no corpus shuffle). The LSH variant replaces
  * the full scan with a bucket equi-join on signature prefixes.
  *
  * Top-k shapes follow the distributed top-k similarity literature
  * (PAPERS.md: "Incremental ... Top-K Similarity Search", EDBT 2020;
  * REPOSE, ICDE 2021): score-once, bounded per-partition candidates,
  * never a corpus shuffle.
  */
object Similarity {

  /** Cosine similarity of two array<float|double> columns, computed in
    * double with deterministic left-to-right accumulation — a native
    * Catalyst expression (single pass, primitive loop; see
    * [[graft.functions.VectorExpressions]]), ~100× the interpreted
    * `zip_with`+`aggregate` HOF form on pairwise workloads.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine_similarity(a, b)

  /** Per-group embedding centroids as (group, dimension, sum, count)
    * rows — the k-means E-step / IVF-coarse-quantizer training
    * primitive. Elements are accumulated in FIXED POINT: scaled by
    * 2^20 (a power of two, so the float→double product is exact),
    * floored to integers, summed exactly, and divided back — float
    * addition is not associative, so a plain double sum would vary
    * with partitioning and re-sharding; the fixed-point sum is
    * order-independent and bit-reproducible across engines. The 2^-20
    * quantization (≤1e-6 per element) sits far below float32's own
    * representational noise. Plan: posexplode → one hash aggregate on
    * (group, dim) with map-side partials; skew is bounded because
    * every vector contributes exactly `dim` rows. Callers divide
    * sum_v/n_vecs for the mean.
    */
  def centroids(df: DataFrame, groupCol: String = "label",
                vecCol: String = "embedding"): DataFrame = {
    val scale = 1048576L // 2^20
    df.select(col(groupCol),
        posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .groupBy(col(groupCol), col("pos").cast("long").as("pos"))
      .agg(
        (sum(floor(col("_v").cast("double") * scale)).cast("double") /
          lit(scale.toDouble)).as("sum_v"),
        count(lit(1)).as("n_vecs"))
  }

  /** Exact brute-force top-k: for each query vector, the k most cosine-
    * similar corpus vectors (ties broken by corpus id — deterministic).
    * Plan: broadcast(queries) ⋈ corpus (no shuffle of the corpus), then
    * rank window on query id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    rankTopK(c.join(broadcast(q)), k)
  }

  /** Shared score-then-rank tail of every top-k variant: cosine over
    * the (q_vec, n_vec) candidate rows, rank window per query (ties
    * to the smaller neighbor id — deterministic), keep k. One place,
    * because the output contract (and its oracle SQL) must stay
    * bit-identical across brute-force and both IVF paths.
    */
  private def rankTopK(candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("n_id").asc)
    candidates
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank")
  }

  /** Embedding-based (semantic) decontamination: drop every corpus
    * row whose embedding has cosine ≥ threshold against ANY benchmark
    * vector — the leakage shape n-gram decontamination misses
    * (paraphrased/translated benchmark items). Plan: LEFT ANTI join
    * with the BENCHMARK side broadcast — the corpus never shuffles
    * and is streamed once, O(|corpus|·|bench|) comparisons with
    * |bench| small; at 100 TB corpus × 10⁴ benchmark rows this is
    * one broadcast + a map-side scan, the same shape as
    * [[graft.ops.TextStats]]'s n-gram decontamination gate.
    */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame,
                            threshold: Double,
                            vecCol: String = "embedding"): DataFrame = {
    val b = broadcast(bench.select(col(vecCol).as("_b_vec")))
    corpus.join(b, cosine(col(vecCol), col("_b_vec")) >= threshold,
      "left_anti")
  }

  /** IVF-prefiltered semantic decontamination — the 100 TB shape of
    * [[semanticDecontaminate]]. The brute variant's anti-join is a
    * BroadcastNestedLoopJoin: every corpus row scores against EVERY
    * benchmark vector, O(N·B·d). Here both sides first take the
    * [[ivfAssign]] coarse-cell assignment SemDeDup already uses for
    * the same math: the corpus keeps its single nearest cell, the
    * benchmark fans out to its `probes` nearest cells, and the
    * anti-join carries `cell` as a hash EQUI-KEY with the exact cosine
    * threshold as the residual condition — a BroadcastHashJoin that
    * scores each corpus row only against benchmark vectors probing its
    * cell, O(N·B·probes/nCells·d) expected, corpus still streamed once
    * with zero shuffles.
    *
    * Like SemDeDup (and unlike the brute variant), the match predicate
    * is cell-RESTRICTED: a corpus row is dropped when a benchmark
    * vector above the threshold probes its cell. Recall against the
    * unrestricted predicate rises with `probes` (probes = nCells
    * degenerates to exact brute-force semantics through the hash
    * join); the cell assignment is deterministic, so the result is
    * reproducible and oracle-replayable on any engine.
    */
  def semanticDecontaminateIvf(corpus: DataFrame, bench: DataFrame,
                               threshold: Double, nCells: Int = 8,
                               dim: Int = 64, probes: Int = 2,
                               vecCol: String = "embedding"): DataFrame = {
    val b = broadcast(
      ivfProbe(bench.select(col(vecCol).as("_b_vec")), nCells, dim,
          "_b_vec", probes)
        .withColumnRenamed("cell", "_b_cell"))
    ivfAssign(corpus, nCells, dim, vecCol)
      .join(b,
        col("cell") === col("_b_cell") &&
          cosine(col(vecCol), col("_b_vec")) >= threshold,
        "left_anti")
      .drop("cell")
  }

  /** All near-duplicate pairs with cosine ≥ threshold (exact, brute
    * force — the oracle-checkable baseline; use [[lshBuckets]] beyond
    * ~10⁵ vectors).
    */
  def cosinePairs(df: DataFrame, threshold: Double,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    // spread the STREAM side: the O(n²/2) cosine work of this
    // BroadcastNestedLoopJoin runs entirely in the stream side's scan
    // tasks, so a single-row-group corpus file serializes the whole
    // quadratic verify onto 1-2 cores (guide §2.5; measured 0.9 s
    // single-stage on the bench board). Row placement only — the pair
    // set is unchanged. No-op when the input is already parallel.
    val a = graft.Par.spread(
      df.select(col(idCol).as("a_id"), col(vecCol).as("a_vec")))
    val b = df.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    a.join(b, col("a_id") < col("b_id"))
      .filter(cosine(col("a_vec"), col("b_vec")) >= threshold)
      .select("a_id", "b_id")
  }

  /** Deterministic pseudo-random hyperplanes: component (p, d) is a
    * signed value derived from a splitmix-style integer hash of
    * (p, d) — reproducible across runs/JVMs with no RNG state.
    */
  private def hyperplane(p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      var z = (p.toLong << 32 | d.toLong) + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
    }

  /** The deterministic LSH hyperplanes — public for the same reason as
    * [[ivfCentroids]]: gate oracles inline the exact constants into SQL.
    */
  def lshHyperplanes(planes: Int, dim: Int = 64): Seq[Array[Double]] =
    (0 until planes).map(p => hyperplane(p, dim))

  /** Random-hyperplane (SimHash-for-vectors) bucket signature: `planes`
    * sign bits packed into one long. Vectors in the same bucket are
    * near-duplicate candidates; expected collision prob = (1 - θ/π)^planes.
    */
  def lshBuckets(df: DataFrame, planes: Int = 16, dim: Int = 64,
                 vecCol: String = "embedding"): DataFrame = {
    require(planes <= 63, "bucket signature must fit a long")
    val hp = lshHyperplanes(planes, dim)
    val sig = (0 until planes).map { p =>
      val proj = graft.functions.VectorExpressions.dot_product(
        col(vecCol), typedlit(hp(p).toSeq))
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseXOR(b))
    df.withColumn("bucket", sig)
  }

  /** Approximate near-dup pairs: candidates from equal LSH buckets,
    * verified with exact cosine. The only join is the bucket equi-join —
    * at 100 TB this is a hash shuffle on `bucket` with bounded buckets
    * instead of an O(n²) cross product.
    */
  def lshCosinePairs(df: DataFrame, threshold: Double, planes: Int = 16,
                     dim: Int = 64, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val b = lshBuckets(df, planes, dim, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("bucket"))
    val l = b.alias("l")
    val r = b.alias("r")
    l.join(r, col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .filter(cosine(col("l.vec"), col("r.vec")) >= threshold)
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"))
  }

  /** IVF top-k: both sides are assigned to coarse cells and the scan
    * is restricted to the query's cell — the partition-pruning shape
    * for vector search (single-probe; recall trades against nCells).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 8, dim: Int = 64, idCol: String = "vec_id",
              vecCol: String = "embedding", probes: Int = 1): DataFrame = {
    // multi-probe: each QUERY fans out to its `probes` best cells (the
    // standard IVF recall knob); the corpus keeps exactly one cell per
    // vector, so a (query, neighbor) pair can never appear twice and
    // the probe-1 result is always a subset of the probe-p result.
    val qa = ivfProbe(queries, nCells, dim, vecCol, probes)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"), col("cell"))
    val ca = ivfAssign(corpus, nCells, dim, vecCol)
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"), col("cell"))
    rankTopK(ca.join(broadcast(qa), "cell"), k)
  }

  /** Persist an IVF index: the corpus written as Parquet PARTITIONED BY
    * its coarse cell. This is the build-once/probe-many scale path —
    * at 100 TB the index build is one full pass, and every subsequent
    * query reads only `probes/nCells` of the storage because the cell
    * predicate prunes Hive-style partition directories before any IO.
    */
  def writeIvfIndex(corpus: DataFrame, path: String, nCells: Int = 8,
                    dim: Int = 64, vecCol: String = "embedding"): Unit =
    ivfAssign(corpus, nCells, dim, vecCol)
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Top-k over a persisted IVF index. The probed cell set is collected
    * first (≤ nCells driver-side ints — an AQE-style runtime smallness
    * decision, not a data collect) so the scan carries a static
    * `cell IN (...)` partition filter: non-probed partitions are never
    * listed, opened, or read.
    */
  def ivfTopKIndexed(queries: DataFrame, index: DataFrame, k: Int,
                     nCells: Int = 8, dim: Int = 64,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     probes: Int = 1): DataFrame = {
    val qa = ivfProbe(queries, nCells, dim, vecCol, probes)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"), col("cell"))
    val cells = qa.select("cell").distinct().collect().map(_.getInt(0))
    val ca = index.filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"), col("cell"))
    rankTopK(ca.join(broadcast(qa), "cell"), k)
  }

  /** The deterministic IVF coarse-centroid directions — public so gate
    * oracles can inline the exact constants into SQL (the assignment is
    * then fully reproducible on any engine; shortest-round-trip double
    * rendering parses back to the identical bits).
    */
  def ivfCentroids(nCells: Int = 16, dim: Int = 64): Seq[Array[Double]] =
    (0 until nCells).map(c => hyperplane(1000 + c, dim))

  /** Deterministic Rademacher (±1) sign rows for [[randomProject]] —
    * public for the same reason as [[ivfCentroids]]: gate oracles
    * inline the exact constants into SQL (±1.0 renders losslessly).
    */
  def rpSigns(kOut: Int, dim: Int = 64): Seq[Array[Double]] =
    (0 until kOut).map(j =>
      hyperplane(2000 + j, dim).map(v => if (v >= 0) 1.0 else -1.0))

  /** Johnson–Lindenstrauss random projection of an embedding column to
    * `kOut` dimensions with a deterministic Rademacher (±1) matrix —
    * the dimensionality-reduction pass a 100 TB embedding pipeline runs
    * before storing/indexing vectors (Achlioptas 2003: ±1 entries
    * preserve pairwise distances as well as Gaussians, and the matmul
    * is add/subtract only). Components are computed in FIXED POINT
    * (inputs scaled by 2^20 and floored, the [[centroids]] convention):
    * every product and partial sum is integer-exact, so the projection
    * is order-independent, bit-reproducible, and engine-replayable —
    * a plain float matmul would vary in the last ulp with accumulation
    * order. Scale shape: row-local (one codegen'd scan, kOut dot
    * products per row), no shuffle, no UDF; the sign matrix is a
    * literal so nothing is broadcast or joined.
    */
  def randomProject(df: DataFrame, kOut: Int, dim: Int = 64,
                    vecCol: String = "embedding",
                    outCol: String = "rp"): DataFrame = {
    val scale = 1048576L // 2^20: float*2^20 is exact (power of two)
    val signs = rpSigns(kOut, dim)
    val comps = signs.map { s =>
      graft.functions.VectorExpressions.dot_product(
        col("_rp_q"), typedlit(s.toSeq)).cast("long")
    }
    df.withColumn("_rp_q",
        transform(col(vecCol),
          x => floor(x.cast("double") * scale).cast("double")))
      .withColumn(outCol, array(comps: _*))
      .drop("_rp_q")
  }

  /** Exact top-k in the PROJECTED space: brute-force cosine over the
    * `kOut`-dim integer projections instead of the `dim`-dim floats —
    * the memory/IO side of the JL trade (kOut/dim of the bytes per
    * comparison; recall vs full-dim top-k governed by the JL bound).
    * The integer dot products and norms are exact, so ranking (and the
    * `dot` evidence column) hash-match on any engine; same
    * broadcast-queries / scan-corpus / rank-window shape as
    * [[bruteForceTopK]].
    */
  def rpTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             kOut: Int = 16, dim: Int = 64, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val q = randomProject(queries, kOut, dim, vecCol, "q_rp")
      .select(col(idCol).as("q_id"), col("q_rp"))
    val c = randomProject(corpus, kOut, dim, vecCol, "n_rp")
      .select(col(idCol).as("n_id"), col("n_rp"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("n_id").asc)
    c.join(broadcast(q))
      .withColumn("cos",
        TextStats.cosineIntVectors(col("q_rp"), col("n_rp")))
      .withColumn("dot", aggregate(
        zip_with(col("q_rp"), col("n_rp"), (p, r) => p * r),
        lit(0L), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "dot")
  }

  /** IVF-style coarse quantization: assign each vector to the nearest
    * of `nCells` deterministic centroid directions (hyperplane-derived),
    * so ANN queries probe only matching cells. This is the partition
    * pruning analogue for vector search: `cell` becomes the shuffle /
    * storage-partition key.
    */
  def ivfAssign(df: DataFrame, nCells: Int = 16, dim: Int = 64,
                vecCol: String = "embedding"): DataFrame = {
    val cents = ivfCentroids(nCells, dim)
    val scores = cents.zipWithIndex.map { case (cent, i) =>
      struct(
        graft.functions.VectorExpressions.dot_product(
          col(vecCol), typedlit(cent.toSeq)).as("score"),
        lit(i).as("cell"))
    }
    df.withColumn("cell", array_max(array(scores: _*)).getField("cell"))
  }

  /** Multi-probe assignment: one row per (vector, cell) for the
    * vector's top-`probes` centroid cells, best first. probes=1 is
    * exactly [[ivfAssign]].
    */
  def ivfProbe(df: DataFrame, nCells: Int = 16, dim: Int = 64,
               vecCol: String = "embedding", probes: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= nCells)
    if (probes == 1) return ivfAssign(df, nCells, dim, vecCol)
    val cents = ivfCentroids(nCells, dim)
    val scores = cents.zipWithIndex.map { case (cent, i) =>
      struct(
        graft.functions.VectorExpressions.dot_product(
          col(vecCol), typedlit(cent.toSeq)).as("score"),
        lit(i).as("cell"))
    }
    df.withColumn("cell",
        explode(transform(
          slice(reverse(array_sort(array(scores: _*))), 1, probes),
          s => s.getField("cell"))))
  }
}

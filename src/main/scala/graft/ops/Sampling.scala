package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * `sample(fraction)` is seed-dependent and repartition-sensitive; a
  * corpus split must instead be a pure function of the row key so that
  * (a) re-runs, backfills and incremental appends land every document
  * in the same split, and (b) train/val never leak into each other
  * when the pipeline is re-sharded. The standard trick: hash the key
  * with a salt, compare against cumulative-fraction thresholds.
  *
  * md5 is used (not xxhash64) because its hex form is bit-identical
  * across engines — the same split is reproducible from Spark, DuckDB
  * or anything else that can md5 a string (and it is the t2 oracle).
  * Row-local projection: no shuffle, scan-scales to 100 TB.
  */
object Sampling {

  /** Salted row hash in hex — uniform over [0,1) when read as a
    * hex fraction.
    */
  def splitHash(idCol: Column, salt: String): Column =
    md5(concat(lit(salt + ":"), idCol.cast("string")))

  /** 4-hex-digit threshold for a keep-fraction. fraction==1 must keep
    * everything: "10000" would lexicographically DROP hashes >= "11",
    * so use "g" — above the entire hex alphabet.
    */
  private[ops] def hexThreshold(fraction: Double): String =
    if (fraction >= 1.0) "g" else f"${math.floor(fraction * 65536).toLong}%04x"

  /** Assign each row a named split by deterministic hash threshold.
    * `fractions` must sum to 1 (e.g. train 0.8 / val 0.1 / test 0.1).
    * Thresholds are 4-hex-digit prefixes (1/65536 granularity).
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                fractions: Seq[(String, Double)],
                splitCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val h = splitHash(col(idCol), salt)
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val assigned = fractions.init.zip(cum.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), c)) =>
        // hexThreshold, not a bare %04x: a cumulative fraction that
        // reaches 1.0 BEFORE the last split (trailing zero-fraction
        // splits) would format as the 5-char "10000", which sorts
        // below almost every hash and silently reassigns that
        // split's entire share to the final split
        val t = hexThreshold(c)
        Some(acc match {
          case None => when(h < lit(t), name)
          case Some(w) => w.when(h < lit(t), name)
        })
      }
    val expr = assigned match {
      case Some(w) => w.otherwise(fractions.last._1)
      case None => lit(fractions.last._1) // single split
    }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic fraction sample: keep rows whose salted hash falls
    * under the fraction threshold — stable across runs and appends.
    */
  def hashSample(df: DataFrame, idCol: String, salt: String,
                 fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1)
    df.filter(splitHash(col(idCol), salt) < lit(hexThreshold(fraction)))
  }

  /** Stratified deterministic sample — `sampleBy` semantics with a
    * content hash instead of a seeded RNG: each stratum keeps its own
    * fraction (strata absent from `rates` keep nothing). Used for
    * dataset mixing / up-and-down-weighting sources in a training
    * corpus; row-local filter, reproducible across engines and
    * re-shardings.
    */
  def stratifiedByHash(df: DataFrame, idCol: String, strataCol: String,
                       salt: String,
                       rates: Seq[(String, Double)]): DataFrame = {
    require(rates.nonEmpty && rates.forall { case (_, r) => r >= 0 && r <= 1 })
    val h = splitHash(col(idCol), salt)
    val threshold = rates.foldLeft(lit("0000")) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(hexThreshold(r))).otherwise(acc)
    }
    df.filter(h < threshold)
  }

  /** Temperature-based source mixing — the multilingual/multi-source
    * LM resampling step: downsample every source toward a flattened
    * distribution. With per-source counts n_s and temperature
    * α ∈ (0, 1], source s keeps rate_s = (n_min / n_s)^(1-α):
    * α = 1 keeps everything, α → 0 levels every source down to the
    * smallest. Row selection is the same salted-md5 threshold as
    * [[hashSplit]] — deterministic, append-stable, reshard-proof,
    * reproducible from any engine that can md5 a string.
    *
    * Plan shape at 100 TB: one per-source count aggregate (a handful
    * of rows) cross-joined with its own min and broadcast back onto
    * the corpus scan, then a row-local hash filter — the corpus
    * itself never shuffles.
    */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     salt: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    // materialized once: the counts subtree feeds both the rates join
    // side AND its own min() — uncached, Spark recomputes the
    // aggregation from the corpus for each subtree, a full redundant
    // scan at the 100 TB framing above
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .localCheckpoint(true)
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("_n")).as("_nmin"))))
      .select(col(sourceCol),
        pow(col("_nmin").cast("double") / col("_n").cast("double"),
          lit(1.0 - alpha)).as("_rate"))
    // FIXED-POINT thresholding: quantize the pow() rate to 1e-4 first
    // (floor(x*10000 + 0.5) — the identical double op on any engine),
    // then derive the 16-bit hash threshold in exact integer
    // arithmetic. floor(pow(...) * 65536) directly exposed pow's
    // cross-engine ULP differences at every 1/65536 boundary; the
    // quantized form only at the far rarer 0.5e-4 rounding edge.
    val rate1e4 = floor(col("_rate") * 10000d + 0.5d).cast("long")
    // columnar hexThreshold: rate >= 1 must keep EVERYTHING ("g" sorts
    // above the hex alphabet; "10000" would drop hashes >= "11")
    val thresh = when(rate1e4 >= 10000L, lit("g"))
      .otherwise(lower(lpad(
        hex(floor(rate1e4 * lit(65536L) / 10000d).cast("long")), 4, "0")))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(splitHash(col(idCol), salt) < thresh)
      .drop("_rate")
  }

  /** Deterministic k-per-group sample — reservoir-sampling semantics
    * without the RNG: rank rows inside each group by their content
    * hash (id tie-break) and keep the first `k`. Because the hash
    * order is a fixed pseudo-random permutation, the kept set is a
    * uniform-ish sample that is reproducible across runs, engines, and
    * re-shardings — unlike `reservoir`/`TABLESAMPLE`, appends only
    * perturb it marginally. One hash shuffle on the group key; with
    * many groups the per-group window state is tiny.
    */
  def samplePerGroup(df: DataFrame, idCol: String, groupCol: String,
                     k: Int): DataFrame = {
    require(k >= 1)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic training-shard assignment — the last step of a
    * corpus pipeline: every document gets a stable shard id in
    * [0, nShards) so dataloaders can consume the corpus as N
    * independent, balanced streams. Like [[hashSplit]], the
    * assignment is a pure function of (salt, id): re-runs, appends
    * and re-shardings of the PIPELINE never move a document between
    * shards, and any engine that can md5 a string reproduces the
    * layout (the oracle does).
    *
    * shard = (first 16 hash bits) mod nShards — uniform to 1/65536,
    * exact integer arithmetic after the hash. Row-local projection;
    * the physical write (`df.write.partitionBy(shardCol)` or
    * `repartition(col(shardCol))`) is one shuffle by shard — the
    * minimum any sharded layout costs. nShards ≤ 65536.
    */
  def shardAssign(df: DataFrame, idCol: String, salt: String,
                  nShards: Int, shardCol: String = "shard"): DataFrame = {
    require(nShards >= 1 && nShards <= 65536,
      s"nShards must be in [1, 65536], got $nShards")
    val h16 = conv(substring(splitHash(col(idCol), salt), 1, 4), 16, 10)
      .cast("long")
    df.withColumn(shardCol, pmod(h16, lit(nShards.toLong)))
  }

  /** Shard manifest for a dataloader: per-shard document count, total
    * payload size and id range — what a training job reads INSTEAD of
    * listing 100 TB of files. One hash aggregate over nShards groups.
    * `sizeCol` is any per-row size metric (chars, bytes, tokens).
    */
  def shardManifest(df: DataFrame, idCol: String, sizeCol: String,
                    shardCol: String = "shard"): DataFrame =
    df.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("total_size"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  /** Leakage-safe train/val/test split: rows are split by the hash of
    * their DUPLICATE-CLUSTER root, not their own id, so near-duplicate
    * documents can never straddle a split boundary (the classic
    * train/test contamination: a paraphrase of a test document left in
    * train). `labels` is a (id, root) map from
    * [[Dedup.resolveClusters]] over any pair producer; rows absent
    * from it are singletons and split by their own id. Plan: one
    * broadcast-able left join (labels ≪ corpus — only docs that
    * appear in some duplicate pair), then the row-local
    * [[hashSplit]] threshold on the root; the corpus never shuffles.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, labels: DataFrame,
                       labelIdCol: String, labelRootCol: String,
                       salt: String,
                       fractions: Seq[(String, Double)]): DataFrame = {
    val lab = broadcast(labels.select(
      col(labelIdCol).as(idCol), col(labelRootCol).as("_root")))
    val rooted = df.join(lab, Seq(idCol), "left")
      .withColumn("root_id", coalesce(col("_root"), col(idCol)))
      .drop("_root")
    hashSplit(rooted, "root_id", salt, fractions)
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every corpus
    * document by how much more likely its hashed-token bag is under
    * the TARGET distribution than under the RAW corpus distribution,
    * and keep the top-k. The models are bag-of-hashed-tokens with
    * add-1 smoothing over `buckets` hash buckets (the paper's hashed
    * n-gram generative models); the importance log-weight of a doc is
    *   Σ_b count_doc[b] · (ln p_target[b] − ln p_raw[b]).
    *
    * Determinism (the oracle contract): bucket counts come from the
    * native one-pass [[graft.functions.TextExpressions.hash_embed]]
    * (splitmix token hashes — exact integer counts in any engine);
    * each model's per-bucket ln is rounded to 9 decimals BEFORE the
    * difference (inputs are exact integer ratios, so rounding absorbs
    * sub-ulp libm divergence — the q_lm_score convention); and the
    * per-doc dot product folds in FIXED bucket order 0..B-1 over the
    * embedded array, so the double is identical on every partitioning
    * and replayable by an ordered list_reduce.
    *
    * Scale shape: two B-sized model aggregates (posexplode →
    * map-side-combined sum — shuffle rows are B·partitions, never
    * corpus-sized), a 2·B-long driver collect (the model IS that
    * small; inlined as a literal like the k-means centroids), then
    * scoring is a ROW-LOCAL projection over the corpus scan — zero
    * joins — and one global top-k. Output: (id, dsir_rank, n_toks)
    * for the k kept docs, rank 1 = most target-like, ties broken by
    * ascending id.
    */
  def dsirSelect(corpus: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, k: Int,
                 buckets: Int = 64): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two (hash_embed contract)")
    def embedded(df: DataFrame): DataFrame = df.withColumn("__hv",
      graft.functions.TextExpressions.hash_embed(col(textCol), buckets))
    // per-bucket token counts of one distribution: B-sized result,
    // partial-aggregated map-side
    def model(df: DataFrame): Array[Long] = {
      val rows = embedded(df)
        .select(posexplode(col("__hv")).as(Seq("b", "c")))
        .groupBy("b").agg(sum(col("c").cast("long")).as("c"))
        .collect()
      val out = Array.fill(buckets)(0L)
      rows.foreach(r => out(r.getInt(0)) = r.getLong(1))
      out
    }
    val ct = model(target)
    val cr = model(corpus)
    val tt = ct.sum.toDouble + buckets
    val tr = cr.sum.toDouble + buckets
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val deltas = Array.tabulate(buckets)(b =>
      round9(math.log((ct(b) + 1).toDouble / tt)) -
        round9(math.log((cr(b) + 1).toDouble / tr)))
    // row-local score: positional fold over zip(counts, literal
    // deltas) — order 0..B-1 in both engines, bitwise-reproducible
    val scored = embedded(corpus).withColumn("__lw",
      aggregate(
        zip_with(col("__hv"),
          array(deltas.map(d => lit(d)).toIndexedSeq: _*),
          (c, d) => c.cast("double") * d),
        lit(0.0), (acc, x) => acc + x))
    // bound BEFORE ranking: orderBy+limit plans as a distributed
    // TakeOrderedAndProject (per-partition top-k, k-row merge), then
    // the rank window runs over k rows in one defined bucket — never
    // a whole-corpus single-partition window
    scored
      .orderBy(col("__lw").desc, col(idCol).asc).limit(k)
      .withColumn("dsir_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(TopK.singleBucket(col(idCol)))
          .orderBy(col("__lw").desc, col(idCol).asc)))
      .select(col(idCol), col("dsir_rank"),
        aggregate(col("__hv"), lit(0L),
          (a, c) => a + c.cast("long")).as("n_toks"))
  }
}

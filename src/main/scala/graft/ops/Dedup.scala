package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around shuffles that scale: exact dedup is one hash aggregation;
  * MinHash/SimHash near-dup detection avoids the O(n²) cross join by
  * LSH banding — candidates come from a `groupBy(band_hash)` shuffle
  * whose fan-in is bounded by bucket size, the standard
  * shingle→minhash→band→bucket-join plan (see PAPERS.md; same shape as
  * Spark MLlib's MinHashLSH but pure `functions._`, codegen-friendly,
  * with deterministic xxhash64 hash families instead of random seeds).
  *
  * At 100 TB: every step is either row-local (signatures) or a
  * key-shuffle (banding, pair verification) — no driver collects, no
  * broadcast of the corpus, and bucket skew is bounded because a band
  * collision requires r equal minhashes.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup by content hash: one hash-aggregate shuffle on
    * md5(text). Returns (text_hash, keep_id = min id, dup_cnt).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  // -------------------------------------------------------------- minhash

  /** w-token shingle set of a text column (distinct xxhash64 values —
    * hashing shingles up front keeps the rest of the pipeline on
    * fixed-width longs instead of strings).
    */
  def shingles(text: Column, w: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(TextStats.tokens(text)) - w, lit(0))),
      i => xxhash64(concat_ws(" ", slice(TextStats.tokens(text), i + 1, lit(w))))))

  /** MinHash signature: k independent hash functions h_i(s) =
    * xxhash64(i, s) (seeded family via the extra column), each taking
    * the min over the shingle set. Row-local; returns array<long> of
    * length k.
    */
  def minhashSignature(shingleSet: Column, k: Int = 16): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleSet, s => xxhash64(i, s))))

  /** Near-duplicate candidate pairs via LSH banding: the k-length
    * signature is cut into `bands` bands of r = k/bands rows; docs
    * sharing any band hash become candidates. P(candidate) =
    * 1-(1-j^r)^bands. The pair join happens *within* band buckets
    * (equi-join on band hash), never across the whole corpus.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 16, bands: Int = 4, w: Int = 3): DataFrame = {
    val r = k / bands
    val bandStructs = (0 until bands).map(b =>
      struct(lit(b).as("band_idx"),
        xxhash64(slice(col("sig"), b * r + 1, r)).as("band_hash")))
    val sigs = df.select(col(idCol).as("doc"),
        minhashSignature(shingles(col(textCol), w), k).as("sig"))
      .withColumn("band", explode(array(bandStructs: _*)))
      .select(col("doc"), col("sig"),
        col("band.band_idx"), col("band.band_hash"))
    val a = sigs.alias("a")
    val b = sigs.alias("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Estimated Jaccard from two minhash signatures: fraction of equal
    * components.
    */
  def estimatedJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / size(sigA).cast("double")

  /** Full MinHash near-dup pipeline: candidates + estimated jaccard,
    * filtered at `minJaccard`.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double = 0.5, k: Int = 16, bands: Int = 4,
                   w: Int = 3): DataFrame =
    minhashCandidates(df, idCol, textCol, k, bands, w)
      .withColumn("est_jaccard",
        estimatedJaccard(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "est_jaccard")

  /** Exact n-gram Jaccard for a candidate pair set: joins the shingle
    * sets back and computes |∩|/|∪| with array ops — only over
    * candidates, never all pairs.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        minJaccard: Double = 0.2, k: Int = 16,
                        bands: Int = 4, w: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("doc"),
      shingles(col(textCol), w).as("sh"))
    minhashCandidates(df, idCol, textCol, k, bands, w)
      .select("doc_a", "doc_b")
      .join(sh.withColumnRenamed("doc", "doc_a")
              .withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sh.withColumnRenamed("doc", "doc_b")
              .withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash per document via one exploded-token aggregation:
    * per (doc, bit) the signed counts are 64 codegen'd SUM aggregates
    * (map-side combinable — this is the scalable formulation; a
    * per-row HOF fold would not partial-aggregate).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc"),
        explode(TextStats.tokens(col(textCol))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val bitSums = (0 until 64).map { b =>
      sum(when((shiftright(col("h"), b).bitwiseAND(1)) === 1, 1)
        .otherwise(-1)).as(s"_b$b")
    }
    val agg = tok.groupBy("doc").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"_b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseXOR(b))
    agg.select(col("doc"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, via
    * 4×16-bit band LSH (pigeonhole: distance ≤ 3 ⇒ ≥1 band equal) and
    * exact `bit_count(xor)` verification.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sims = simhash(df, idCol, textCol)
    val bandStructs = (0 until 4).map(b => struct(
      lit(b).as("band_idx"),
      shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFF)
        .as("band_val")))
    val banded = sims.withColumn("band", explode(array(bandStructs: _*)))
      .select(col("doc"), col("simhash"),
        col("band.band_idx"), col("band.band_val"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
  }
}

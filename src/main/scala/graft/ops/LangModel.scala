package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet / RedPajama
  * perplexity-filter stage of a training-data pipeline (reference
  * inventory: LM-based quality tier above the heuristic features in
  * [[TextStats.qualityFeatures]]): train a bigram LM with stupid
  * backoff on a REFERENCE corpus (CCNet trains on Wikipedia), score
  * every candidate document by average token log-probability, keep
  * the most reference-like slice.
  *
  * Plan shape at 100 TB: LM training is two hash-aggregate shuffles
  * over the reference corpus (bigram counts keyed on the word pair,
  * unigram counts keyed on the word) — both map-side-combined, state
  * bounded by vocabulary² not corpus size. Scoring shuffles the
  * candidate corpus's bigrams TWICE (once against the bigram table,
  * once against the unigram table for the backoff leg); the LM tables
  * themselves are the small sides (AQE broadcasts a Wikipedia-sized
  * LM, ~10⁸ rows, if memory allows; otherwise both are plain shuffle
  * hash joins — never a driver collect). Everything else is row-local
  * projection. Word strings stay the join keys for bit-exact oracle
  * parity; a production run at 100 TB would xxhash64 the pair key to
  * shrink shuffle bytes (same trade documented on
  * [[Dedup.dedupSegments]]).
  *
  * Float determinism: per-document totals fold the per-bigram
  * log-probs in ASCENDING VALUE order (sort_array → aggregate), so
  * the sum is independent of partitioning — bit-stable across runs
  * AND replayable by an engine that sums in the same order. Each
  * log-prob is rounded to 9 decimals first: the inputs to ln() are
  * exact integer ratios in both engines, and the rounding absorbs
  * sub-ulp ln() divergence between libm implementations.
  */
object LangModel {

  /** Bigram LM with per-prefix totals: one row per observed (w1, w2)
    * with `c_bi` (pair count) and `c_w1` (prefix count) — p(w2|w1) =
    * c_bi / c_w1. Two aggregations over one bigram explode.
    */
  def bigramLm(train: DataFrame, textCol: String = "text"): DataFrame = {
    val bi = explodeBigrams(train, textCol)
    val biCnt = bi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bi"))
    val w1Cnt = bi.groupBy(col("w1").as("_w1"))
      .agg(count(lit(1)).as("c_w1"))
    biCnt.join(w1Cnt, col("w1") === col("_w1")).drop("_w1")
  }

  /** Unigram LM: (w, c_w). The corpus token total is NOT a column —
    * it is Σ c_w, which [[scoreDocs]] re-derives with one aggregate
    * over this (vocabulary-sized) table; materializing it per row
    * would plant a crossJoin under every consumer of the table.
    */
  def unigramLm(train: DataFrame, textCol: String = "text"): DataFrame =
    train.select(explode(TextStats.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))

  /** Score `candidates` against the LM tables: per document, fold
    * log p over its bigrams with stupid backoff α = 0.4 —
    *   seen pair      → ln(c_bi / c_w1)
    *   unseen, seen w2 → ln(0.4 · c_w2 / T)
    *   OOV w2          → ln(0.4 / T)
    * Returns (doc, n_bigrams, n_hits, n_backoff, n_oov, avg_logp).
    * Documents shorter than 2 tokens have no bigrams and drop out
    * (they carry no LM evidence; length gates handle them).
    */
  def scoreDocs(candidates: DataFrame, bigrams: DataFrame,
                unigrams: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", alpha: Double = 0.4)
      : DataFrame = {
    val bi = explodeBigrams(
      candidates.select(col(idCol).as("doc"), col(textCol)), textCol,
      keep = Seq("doc"))
    val uni = unigrams.withColumnsRenamed(Map("w" -> "_w2"))
    // corpus total = Σ c_w, as a 1-row broadcast cross (NOT a joined
    // column: OOV words miss the unigram join and would null it out)
    val tot = unigrams.agg(sum(col("c_w")).cast("long").as("t_tok"))
    val lp = bi
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(uni, col("w2") === col("_w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lp", round(
        when(col("c_bi").isNotNull,
          log(col("c_bi").cast("double") / col("c_w1").cast("double")))
        .when(col("c_w").isNotNull,
          log(lit(alpha) * col("c_w").cast("double") /
            col("t_tok").cast("double")))
        .otherwise(log(lit(alpha) / col("t_tok").cast("double"))), 9))
    lp.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("c_bi")).as("n_hits"),
        sum(when(col("c_bi").isNull && col("c_w").isNotNull, 1L)
          .otherwise(0L)).as("n_backoff"),
        sum(when(col("c_bi").isNull && col("c_w").isNull, 1L)
          .otherwise(0L)).as("n_oov"),
        // ascending-sorted fold → partition-order-independent sum
        aggregate(sort_array(collect_list(col("lp"))), lit(0.0d),
          (acc, x) => acc + x).as("sum_logp"))
      .withColumn("avg_logp", col("sum_logp") / col("n_bigrams"))
      .drop("sum_logp")
  }

  /** (doc?, w1, w2) bigram rows: zip each token array with its own
    * tail — row-local, no self-join.
    */
  private def explodeBigrams(df: DataFrame, textCol: String,
                             keep: Seq[String] = Nil): DataFrame = {
    val ts = TextStats.tokens(col(textCol))
    val n1 = greatest(size(ts) - 1, lit(0))
    val pairs = zip_with(
      slice(ts, lit(1), n1), slice(ts, lit(2), n1),
      (x, y) => struct(x.as("w1"), y.as("w2")))
    df.select(keep.map(col) :+ explode(pairs).as("p"): _*)
      .select(keep.map(col) :+ col("p.w1").as("w1") :+ col("p.w2").as("w2"): _*)
  }
}

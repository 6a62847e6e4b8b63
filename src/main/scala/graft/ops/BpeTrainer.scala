package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Distributed BPE merge learning — the tokenizer-training stage of a
  * training-data pipeline ([[TextStats.vocabulary]] is its precursor;
  * reference inventory's tokenizer tier). Classic Sennrich BPE: start
  * from the corpus word-frequency table with words split into
  * characters; each round counts adjacent symbol pairs weighted by
  * word frequency, picks the most frequent pair (ties: lexicographic
  * on the pair — deterministic), and replaces its occurrences in
  * every word, greedy left-to-right non-overlapping.
  *
  * Plan shape at 100 TB: the corpus is touched ONCE (word-count
  * aggregate — the same shuffle [[TextStats.vocabulary]] does); every
  * merge round then runs over the VOCABULARY table (≈10⁷ rows for web
  * corpora, independent of corpus size), which is the standard trick
  * that makes BPE training tractable at scale. Per round: one
  * pair-count hash aggregate (map-side combined), a 1-row argmax, and
  * a row-local fold that applies the merge — the winning pair rides a
  * 1-row broadcast, so the vocabulary never collects to the driver
  * and never shuffles for the apply step.
  *
  * Iteration caches each round's vocabulary (the MLlib iterative
  * pattern): without it, round r's lazy plan re-runs rounds 1..r-1 —
  * and re-aggregates the corpus — once per downstream reference,
  * turning k rounds into O(k²) corpus scans. The cached tables are
  * vocabulary-sized (not corpus-sized); a production 30k-merge run
  * would additionally checkpoint every few hundred rounds to truncate
  * lineage depth itself.
  */
object BpeTrainer {

  /** Corpus word-frequency table (word, cnt) — the single
    * corpus-sized shuffle of BPE training.
    */
  def wordCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(TextStats.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol pairs of a symbol array, as structs (w1, w2). */
  private def pairsCol(syms: Column): Column = {
    val n1 = greatest(size(syms) - 1, lit(0))
    zip_with(slice(syms, lit(1), n1), slice(syms, lit(2), n1),
      (x, y) => struct(x.as("w1"), y.as("w2")))
  }

  /** Greedy left-to-right non-overlapping replacement of (bw1, bw2)
    * by their concatenation, as a row-local single pass. (In a run of
    * equal symbols — pair (a,a) over "aaa" — this merges positions 1–2
    * and leaves the 3rd, the Sennrich semantics.)
    *
    * Native codegen'd expression, NOT a `functions.aggregate` fold:
    * the fold phrasing (an array-accumulator `aggregate` with
    * `array_append`) is interpreted (ArrayAggregate has no codegen)
    * and O(word²) — each append copies the accumulator — which the
    * 100× scale corpus exposed: its ~5,200-char pad words pushed one
    * merge pass from seconds into tens of minutes. Long tokens are a
    * fact of real corpora (base64, DNA, minified JS); the merge pass
    * must stay O(word).
    */
  private def applyMerge(syms: Column, bw1: Column, bw2: Column): Column =
    graft.functions.TextExpressions.bpe_merge(syms, bw1, bw2)

  /** Learn `rounds` merges from a (word, cnt) table. Returns the
    * merge table (round, w1, w2, pair_cnt) — the BPE artifact a
    * tokenizer ships. `rounds` must not exceed the merges the corpus
    * supports (an all-single-symbol vocabulary has no pairs left).
    *
    * The per-round argmax is COLLECTED — one row per round. This is
    * the deliberate driver boundary of BPE training (the same bounded
    * shape as the IVF cell-filter collect): the merge decision is
    * inherently sequential, every round's plan depends on it, and
    * keeping it distributed (a 1-row broadcast crossed into the next
    * round) was measured to cost more in per-round broadcast jobs and
    * lazy-union recompute than the row it avoids collecting. Driver
    * state: `rounds` tuples, nothing vocabulary- or corpus-sized.
    */
  def train(wordCnts: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var vocab = wordCnts.select(col("word"), col("cnt"), graft.functions.TextExpressions.chars(col("word"))
      .as("syms"))
      .cache() // vocab-sized, NOT corpus-sized — see class doc
    val cached = scala.collection.mutable.ListBuffer(vocab)
    val merges = scala.collection.mutable.ListBuffer.empty[
      (Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val best = vocab
        .select(col("cnt"), explode(pairsCol(col("syms"))).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(sum(col("cnt")).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("w1"), col("w2")).limit(1)
        .collect()
      require(best.nonEmpty,
        s"BPE round $r: no adjacent pairs left to merge")
      val (w1, w2) = (best(0).getString(0), best(0).getString(1))
      merges += ((r, w1, w2, best(0).getLong(2)))
      if (r < rounds) {
        vocab = vocab.withColumn("syms",
          applyMerge(col("syms"), lit(w1), lit(w2))).cache()
        cached += vocab
      }
    }
    // the result is literal rows — no lineage into the vocab tables,
    // so every per-round cache can be dropped immediately
    cached.foreach(_.unpersist(false))
    val spark = wordCnts.sparkSession
    import spark.implicits._
    merges.toSeq.toDF("round", "w1", "w2", "pair_cnt")
  }

  /** APPLY a learned merge list (tokenizer ENCODE, at the vocabulary
    * level): each distinct word's characters fold through the merges
    * in training order — greedy non-overlapping per round, exactly the
    * training-time semantics — yielding (word, n_pieces). Corpus-level
    * tokenization then joins this VOCABULARY-sized table onto the
    * corpus's words instead of re-segmenting every occurrence: the
    * standard trick (a word's BPE segmentation is a function of the
    * word), which keeps encode O(corpus) scan + one vocab-sized join
    * however many merges the tokenizer learned. The merge list is
    * driver-resident by construction ([[train]] returns literal rows);
    * each merge is one row-local fold pass over the vocab.
    */
  def segment(wordCnts: DataFrame,
              merges: Seq[(String, String)]): DataFrame =
    segmentPieces(wordCnts, merges)
      .select(col("word"), size(col("syms")).cast("long").as("n_pieces"))

  /** [[segment]] keeping the pieces themselves: (word, syms) — the
    * vocabulary-level segmentation table [[tokenIds]] and the encode
    * gate both join against.
    */
  def segmentPieces(wordCnts: DataFrame,
                    merges: Seq[(String, String)]): DataFrame = {
    var v = wordCnts.select(col("word"), graft.functions.TextExpressions.chars(col("word"))
      .as("syms"))
    merges.foreach { case (a, b) =>
      v = v.withColumn("syms", applyMerge(col("syms"), lit(a), lit(b)))
    }
    v
  }

  /** END-TO-END tokenization: corpus text → BPE token-ID sequences,
    * entirely in-engine — the artifact a training dataloader consumes.
    * Token ids are assigned by VOCABULARY rank (total weighted piece
    * frequency desc, piece asc — deterministic, the convention real
    * tokenizers use: frequent pieces get small ids). Plan shape:
    *
    *  1. ONE corpus word-count shuffle ([[wordCounts]] — shared with
    *     training); the merge fold runs over the VOCABULARY.
    *  2. The id table is piece-ranked with an unpartitioned window —
    *     deliberately: it is TOKENIZER-VOCABULARY-sized (bounded by
    *     construction, ~30k–100k rows in production), never
    *     corpus-sized.
    *  3. The corpus then flows: words explode with position, join the
    *     vocab-sized segmentation, pieces explode with position, join
    *     the vocab-sized id table, and one per-doc window orders
    *     (word pos, piece pos) into the final sequence — one doc_id
    *     shuffle, broadcast-sized joins, corpus text never
    *     re-segmented per occurrence.
    *
    * Output: (doc_id, pos, token_id) rows — exactly replayable, and
    * [[Packing.packSequences]]-ready after a per-doc collect.
    */
  def tokenIds(docs: DataFrame, merges: Seq[(String, String)],
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val wc = wordCounts(docs, textCol)
    val segs = segmentPieces(wc, merges)
    val vocab = segs.join(wc, "word")
      .select(explode(col("syms")).as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("total"))
      .withColumn("token_id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("total").desc, col("piece").asc)))
      .select("piece", "token_id")
    // sequence position = (running piece count of the PRIOR words) +
    // piece index — the ordering window runs over WORDS, not pieces
    // (dim/m× fewer rows through the shuffle than ranking every piece)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_wpos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    docs.select(col(idCol),
        posexplode(TextStats.tokens(col(textCol)))
          .as(Seq("_wpos", "word")))
      .join(segs, "word")
      .withColumn("_off",
        coalesce(sum(size(col("syms")).cast("long")).over(w), lit(0L)))
      .select(col(idCol), col("_off"),
        posexplode(col("syms")).as(Seq("_ppos", "piece")))
      .join(vocab, "piece")
      .select(col(idCol),
        (col("_off") + col("_ppos")).cast("long").as("pos"),
        col("token_id"))
  }
}

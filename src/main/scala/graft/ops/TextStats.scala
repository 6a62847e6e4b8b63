package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document
  * fingerprinting. All pure `org.apache.spark.sql.functions` column
  * expressions — codegen'd, no UDFs, no shuffles (row-local), so they
  * scan-scale linearly to 100 TB and fuse into whole-stage codegen with
  * the surrounding plan.
  */
object TextStats {

  /** Whitespace tokenization (the baseline tokenizer). The empty
    * filter matters for ONE input shape: `split(trim(''), "\\s+")` is
    * `[""]`, which would count an empty/whitespace-only document as
    * one token — and a `n_tokens >= 1` min-length gate would then
    * never remove empty docs.
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Token count — whitespace tokens, BIGINT for oracle parity. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** A BPE-ish subword count: splits on whitespace AND punctuation
    * boundaries, counting word pieces plus standalone punctuation —
    * a cheap proxy for tokenizer load estimation at corpus scale.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[\\p{Punct}])|\\s+"), t => t =!= ""))
      .cast("long")

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Quality-score features per document: token count, average word
    * length, stopword ratio, punctuation ratio, uppercase ratio.
    * Downstream filters (e.g. `stopword_ratio between 0.05 and 0.5`)
    * mirror C4/Gopher-style heuristics.
    */
  def qualityFeatures(df0: DataFrame, textCol: String = "text",
                      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    // tokenise + per-token filters are per-row expensive and run in
    // the input's scan tasks — spread (no-op on parallel/streaming
    // inputs; a foreachBatch micro-batch arrives as ONE partition)
    val df = graft.Par.spread(df0)
    val t = col(textCol)
    val toks = tokens(t)
    val nTokens = size(toks).cast("long")
    val nChars = length(t).cast("long")
    val nNonSpace = length(regexp_replace(t, "\\s", "")).cast("long")
    // stopwords are matched case-insensitively: the profile is
    // lowercase, and sentence-initial "The"/"A" are exactly the
    // tokens a C4/Gopher-style stopword gate exists to count —
    // case-sensitive matching systematically undercounted them
    val stopCnt = size(filter(toks,
      tok => lower(tok).isInCollection(stopwords)))
    // greatest(..., 1): an empty doc has 0 tokens; its ratios are 0,
    // not NaN
    val tokDenom = greatest(nTokens, lit(1L)).cast("double")
    df.withColumn("n_tokens", nTokens)
      .withColumn("n_chars", nChars)
      .withColumn("avg_word_len", nNonSpace.cast("double") / tokDenom)
      .withColumn("stopword_ratio", stopCnt.cast("double") / tokDenom)
      .withColumn("punct_ratio",
        size(filter(split(t, ""), c => c.rlike("\\p{Punct}")))
          .cast("double") / greatest(nChars, lit(1L)).cast("double"))
  }

  /** Stopword profiles per language for the n-gram/stopword heuristic
    * language-ID. Deliberately tiny — language ID at pipeline scale is
    * a cheap filter, not a classifier; ties broken by profile order.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "que"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有"))

  /** Language ID: score = fraction of tokens found in each language's
    * stopword profile; predict the argmax (ties → first profile).
    * Row-local, no shuffle.
    */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("predicted_lang", langIdCol(col(textCol)))

  /** [[langId]] as ONE row-local Column, so a multi-stage curation
    * pipeline can fold the language gate into the same projection as
    * its other stage flags — one corpus scan, not one per stage.
    */
  def langIdCol(text: Column): Column = {
    val toks = tokens(lower(text))
    val n = greatest(size(toks), lit(1)).cast("double")
    // Single pass over the token array: each stopword maps to a packed
    // long carrying one counter field per language (63/nLangs bits —
    // 12 bits for 5 profiles, exact while no per-language count can
    // reach the field mask). The old shape scanned the array once PER
    // language; this is one aggregate + per-lang bit extraction, and
    // the repeated `acc` reference is shared by codegen subexpression
    // elimination. Docs with more tokens than a field can count (only
    // possible above 4095 tokens) take the per-language scan instead —
    // overflow can never silently corrupt a neighboring counter.
    val bits = 63 / langProfiles.size
    val mask = (1L << bits) - 1
    val packed: Map[String, Long] = langProfiles.zipWithIndex.flatMap {
      case ((_, stops), k) => stops.map(_ -> (1L << (bits * k)))
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val inc = typedLit(packed)
    val acc = aggregate(toks, lit(0L),
      (a, t) => a + coalesce(element_at(inc, t), lit(0L)))
    def pick(scored: Seq[Column]): Column =
      // array_max on struct(score, prio, lang): highest score wins;
      // equal scores fall to `prio` = -(profile index), so ties go to
      // the FIRST profile as documented — a doc matching no profile is
      // "en", not whichever language sorts last alphabetically.
      array_max(array(scored: _*)).getField("lang")
    val fast = pick(langProfiles.zipWithIndex.map { case ((lang, _), k) =>
      struct(
        (shiftright(acc, bits * k).bitwiseAND(lit(mask)).cast("double") / n)
          .as("score"),
        lit(-k).as("prio"),
        lit(lang).as("lang"))
    })
    val exactWide = pick(langProfiles.zipWithIndex.map {
      case ((lang, stops), k) =>
        struct(
          (size(filter(toks, t => t.isInCollection(stops)))
            .cast("double") / n).as("score"),
          lit(-k).as("prio"),
          lit(lang).as("lang"))
    })
    when(size(toks) <= lit(mask.toInt), fast).otherwise(exactWide)
  }

  /** Term-frequency hash embedding column (`hash_vec`): the hashing
    * trick over whitespace tokens via the native one-pass expression —
    * a deterministic, model-free text vector that the IVF/ANN family
    * and coarse clustering can consume directly, replayable exactly by
    * the DuckDB oracle. Row-local projection, scan-scales.
    */
  def hashEmbedding(df: DataFrame, textCol: String = "text",
                    dim: Int = 16, outCol: String = "hash_vec"): DataFrame =
    df.withColumn(outCol,
      graft.functions.TextExpressions.hash_embed(col(textCol), dim))

  /** HTML main-content extraction — the boilerplate-removal pass every
    * web-crawl training pipeline runs before any text analysis (the
    * trafilatura/jusText job, expressed as engine-replayable column
    * algebra): script/style/comment blocks are stripped document-wide
    * (dotall regex), the document splits into LINES, and each line is
    * kept only if its tag-stripped text is long enough AND its link
    * density is low — `nLinks · 20 < |clean|`, the jusText-style
    * heuristic that kills navs, footers, and ad blocks while keeping
    * paragraphs. Entities decode (`&amp;` last, so `&amp;lt;` cannot
    * double-decode), whitespace collapses, and the surviving lines
    * re-join in document order.
    *
    * Scale shape: regex projections and the per-line filter are
    * row-local and codegen'd; the only shuffle is the per-doc
    * re-assembly aggregate (collect_list + array_sort on the line
    * index, so the result is partition-order-independent). No UDFs,
    * no backreferences (RE2-safe — the oracle replays every pattern
    * verbatim in DuckDB).
    */
  def extractMainContent(df: DataFrame, htmlCol: String = "html",
                         idCol: String = "doc_id",
                         minChars: Int = 20,
                         outCol: String = "content"): DataFrame = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(
      col(htmlCol),
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val lines = df.select(col(idCol),
      posexplode_outer(split(noBlocks, "\n")).as(Seq("pos", "_ln")))
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(regexp_replace(col("_ln"), "<[^>]+>", " ")) {
        case (c, (e, r)) => replace(c, lit(e), lit(r))
      }
    val clean = trim(regexp_replace(decoded, "[ \\t]+", " "))
    val nLinks = size(split(col("_ln"), "<a[ >]")) - 1
    lines.select(col(idCol), col("pos"), clean.as("_clean"),
        nLinks.as("_links"))
      .filter(length(col("_clean")) >= minChars &&
        col("_links") * 20 < length(col("_clean")))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("_clean")))),
          s => s.getField("_clean")), " ").as(outCol),
        count(lit(1)).as("n_kept"))
  }

  /** All-pairs document similarity join over bag-of-words vectors —
    * the "find every pair above θ" primitive behind template mining and
    * corpus-level near-dup audits (Bayardo et al., "Scaling Up All
    * Pairs Similarity Search", WWW'07). A naive formulation is an
    * O(n²) cross join; the scale shape here is the inverted-index
    * candidate pass those papers converge on:
    *
    *  1. ONE shuffle builds the (doc, word, tf) term table.
    *  2. Candidates come from a self-equi-join of the index restricted
    *     to RARE words (document frequency ≤ `dfCap`) — the df-cut
    *     bounds every word's join fanout to dfCap² pairs, which is
    *     what makes the index join a bounded hash shuffle instead of a
    *     stopword-driven explosion. (Bayardo's prefix filter is the
    *     same idea parameterized per-pair; the df-cut is the corpus-
    *     level version with a hard worst-case bound.)
    *  3. Each candidate pair is scored EXACTLY: dot = Σ tf_a·tf_b over
    *     the pair's shared words via two hash joins back onto the term
    *     table, norms from one per-doc aggregate, cosine as exact
    *     integer dots + the one IEEE ÷/√ ([[cosineIntVectors]]'s
    *     convention) — so the output (and its `dot` evidence column)
    *     hash-matches on any engine.
    *
    * CANDIDATE semantics, stated plainly: a pair sharing no word of
    * df ≤ dfCap is not reported even above θ — at high θ such pairs
    * are rare (near-identical docs share almost all words, including
    * the rare ones), which is the standard recall trade.
    */
  def allPairsSimilarity(df: DataFrame, threshold: Double,
                         dfCap: Long = 100,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val tf = df.select(col(idCol).as("_d"),
        explode(tokens(col(textCol))).as("w"))
      .groupBy("_d", "w").agg(count(lit(1)).as("tf"))
    val rare = tf.groupBy("w").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("w")
    val idx = tf.join(rare, "w")
    val cand = idx.select(col("_d").as("a_id"), col("w"))
      .join(idx.select(col("_d").as("b_id"), col("w")), "w")
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val dots = cand
      .join(tf.select(col("_d").as("a_id"), col("w"), col("tf").as("tfa")),
        "a_id")
      .join(tf.select(col("_d").as("b_id"), col("w"), col("tf").as("tfb")),
        Seq("b_id", "w"))
      .groupBy("a_id", "b_id").agg(sum(col("tfa") * col("tfb")).as("dot"))
    val norms = tf.groupBy(col("_d"))
      .agg(sum(col("tf") * col("tf")).as("nn"))
    dots
      .join(norms.select(col("_d").as("a_id"), col("nn").as("na")), "a_id")
      .join(norms.select(col("_d").as("b_id"), col("nn").as("nb")), "b_id")
      .filter(col("dot").cast("double") /
        sqrt(col("na").cast("double") * col("nb").cast("double"))
        >= threshold)
      .select("a_id", "b_id", "dot")
  }

  /** Exact-integer dot/norms + one double division: cosine between
    * integer count vectors with every inexact step the identical IEEE
    * expression on any engine (sqrt is correctly-rounded everywhere).
    */
  def cosineIntVectors(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => (p.cast("long")) * q.cast("long")),
      lit(0L), (acc, v) => acc + v)
    dot(a, b).cast("double") /
      sqrt(dot(a, a).cast("double") * dot(b, b).cast("double"))
  }

  /** Fixed-weight linear quality classifier — the cheap fasttext-style
    * keep/drop gate every crawl pipeline runs between the heuristic
    * filters and the expensive dedup stages. The model is a linear
    * score over [[qualityFeatures]]-derived signals; weights are
    * compiled in (a real deployment loads them from a trained model —
    * the plumbing, not the training, is the engine's job):
    *
    *   score = b + w_awl·avg_word_len + w_sw·stopword_ratio
    *             + w_p·punct_ratio + w_len·(n_tokens/(n_tokens+50))
    *
    * The length term is a SATURATING RATIONAL, not log(n): it has the
    * same shape (rewards longer docs with diminishing returns) using
    * only IEEE +,·,÷ — bit-deterministic on every engine, where
    * transcendentals differ in the last ulp between libm
    * implementations. That keeps the gate hash-matchable.
    *
    * Row-local projection over one scan — no shuffle, no UDF;
    * scan-scales to 100 TB.
    */
  /** The Gopher quality rules (Rae et al. 2021 §A1.1 — the repetition
    * rules live in [[docRepetition]]): each published threshold as a
    * per-doc boolean, plus the conjunction. Every comparison is an
    * INTEGER cross-multiplication (`3·words ≤ chars` instead of
    * `chars/words ≥ 3`), so the flags are bit-exact across engines —
    * no ratio ever materializes as a float. One codegen'd projection,
    * row-local, zero shuffles: the shape of every corpus-wide filter
    * pass at 100 TB.
    */
  def gopherRules(df: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id",
                  stopWords: Seq[String] = Seq("the", "be", "to", "of",
                    "and", "that", "have", "with")): DataFrame = {
    val toks = tokens(col(textCol))
    val words = size(toks).cast("long")
    val nonspace =
      length(regexp_replace(col(textCol), "\\s", "")).cast("long")
    val alphaWords =
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val symbols = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "[#…]", ""))).cast("long")
    val lines = split(col(textCol), "\n")
    val nLines = size(lines).cast("long")
    val bulletLines =
      size(filter(lines, l => l.rlike("^\\s*[-•*]"))).cast("long")
    val ellipsisLines =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    val stopHits = size(array_intersect(
      array_distinct(transform(toks, t => lower(t))),
      array(stopWords.map(lit): _*))).cast("long")
    df.select(col(idCol),
      (words >= 50L && words <= 100000L).as("f_word_count"),
      (lit(3L) * words <= nonspace && nonspace <= lit(10L) * words)
        .as("f_mean_word_len"),
      (symbols * 10L <= words).as("f_symbol_ratio"),
      (bulletLines * 10L <= nLines * 9L).as("f_bullet_lines"),
      (ellipsisLines * 10L <= nLines * 3L).as("f_ellipsis_lines"),
      (alphaWords * 10L >= words * 8L).as("f_alpha_words"),
      (stopHits >= 2L).as("f_stop_words"))
      .withColumn("keep",
        col("f_word_count") && col("f_mean_word_len") &&
          col("f_symbol_ratio") && col("f_bullet_lines") &&
          col("f_ellipsis_lines") && col("f_alpha_words") &&
          col("f_stop_words"))
  }

  /** The C4 line-level cleaning pass (Raffel et al. 2020 §2.2): keep
    * only lines that end in terminal punctuation AND have at least
    * `minLineWords` words AND carry no curly brace (the code/template
    * tell); drop the whole document when fewer than `minSentences`
    * terminal-punctuation lines survive (C4's ≥3-sentence rule,
    * applied to kept lines). Returns the REWRITTEN text — like
    * [[graft.ops.Dedup.removeDuplicatedSpans]] this is the transform
    * half, not bookkeeping. One codegen'd row-local projection over
    * the line array: zero shuffles, the 100 TB filter-pass shape.
    */
  def c4LineFilter(df: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", minLineWords: Int = 5,
                   minSentences: Int = 3): DataFrame = {
    val keptLines = filter(split(col(textCol), "\n"), l =>
      l.rlike("[.!?\"']\\s*$") &&
        size(tokens(l)) >= minLineWords &&
        !l.contains("{") && !l.contains("}"))
    df.select(col(idCol), keptLines.as("_kept"))
      .select(col(idCol),
        size(col("_kept")).cast("long").as("n_lines_kept"),
        when(size(col("_kept")) >= minSentences,
          array_join(col("_kept"), "\n")).otherwise(lit(""))
          .as("clean_text"))
      .withColumn("keep", col("n_lines_kept") >= minSentences)
  }

  /** [[qualityScore]]'s linear model as ONE row-local Column — the
    * same arithmetic, same term order (bit-identical doubles), for
    * pipelines that fold the quality gate into a single fused
    * projection instead of materializing the feature columns.
    * MUST stay in lockstep with [[qualityFeatures]]/[[qualityScore]]
    * (CurationSpec asserts equality against the DataFrame form).
    */
  def qualityScoreCol(text: Column,
                      stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    val nTokens = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val nNonSpace = length(regexp_replace(text, "\\s", "")).cast("long")
    val stopCnt = size(filter(toks,
      tok => lower(tok).isInCollection(stopwords)))
    val tokDenom = greatest(nTokens, lit(1L)).cast("double")
    val avgWordLen = nNonSpace.cast("double") / tokDenom
    val stopRatio = stopCnt.cast("double") / tokDenom
    val punctRatio =
      size(filter(split(text, ""), c => c.rlike("\\p{Punct}")))
        .cast("double") / greatest(nChars, lit(1L)).cast("double")
    val lenTerm = nTokens.cast("double") /
      (nTokens.cast("double") + lit(50.0))
    lit(-0.6) +
      lit(0.12) * avgWordLen +
      lit(2.4) * stopRatio -
      lit(1.8) * punctRatio +
      lit(0.9) * lenTerm
  }

  def qualityScore(df: DataFrame, textCol: String = "text",
                   threshold: Double = 0.5): DataFrame = {
    val f = qualityFeatures(df, textCol)
    val lenTerm = col("n_tokens").cast("double") /
      (col("n_tokens").cast("double") + lit(50.0))
    val score = lit(-0.6) +
      lit(0.12) * col("avg_word_len") +
      lit(2.4) * col("stopword_ratio") -
      lit(1.8) * col("punct_ratio") +
      lit(0.9) * lenTerm
    f.withColumn("quality_score", score)
      .withColumn("keep", score >= lit(threshold))
  }

  /** PII redaction for training corpora: emails and long digit runs
    * (phone-ish) replaced with placeholder tokens. RE2-compatible
    * patterns (no lookaround) so the same regexes run in the DuckDB
    * oracle.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "[0-9][0-9 ()+.-]{6,}[0-9]", "<PHONE>")
  }

  /** Normalized content fingerprint: md5 over
    * lowercase(whitespace-collapsed) text. Matches the DuckDB oracle
    * expression md5(lower(regexp_replace(text,'\s+',' ','g'))).
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Benchmark decontamination: per-document overlap of character
    * n-gram shingles against a (small) benchmark/holdout set — the
    * standard check that a training corpus does not contain eval data.
    * Returns one row per corpus doc with its distinct-shingle count,
    * the count overlapping the benchmark, and the overlap ratio.
    *
    * Scale shape: the benchmark side is collapsed to a distinct
    * shingle set and BROADCAST — the corpus (the 100 TB side) is
    * touched in one scan-parallel semi-join pass, no corpus shuffle
    * beyond the per-doc aggregation. For benchmark sets too large to
    * broadcast, swap the semi-join for a bloom-filter pushdown; the
    * per-doc aggregation is unchanged.
    */
  private def charShingles(df: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame = df
    .filter(length(col(textCol)) >= n)
    .select(col(idCol),
      explode(array_distinct(transform(
        sequence(lit(1), length(col(textCol)) - (n - 1)),
        i => substring(col(textCol), i, lit(n))))).as("sh"))

  /** A document's DISTINCT character n-gram shingles as a row-local
    * array Column (empty for docs shorter than the shingle width —
    * the guard matters: sequence(1, negative) counts DOWN). The
    * per-doc building block behind [[contamination]]'s exploded form,
    * exposed so fused pipelines can bloom-probe shingles inside a
    * projection without exploding the clean 99% of the corpus.
    */
  def charShinglesCol(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => substring(text, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Shared final assembly: EVERY corpus doc joined with its shingle
    * total and overlap count → contamination fraction. Anchored on
    * the corpus doc list, not the shingle rows: a doc shorter than
    * the shingle width has no shingle rows at all, and omitting it
    * from the report makes a `contamination <= x` downstream filter
    * silently drop it (absent ≠ clean) — it reports (0, 0, 0.0).
    */
  private def contaminationReport(corpus: DataFrame,
                                  corpusSh: DataFrame, overlap: DataFrame,
                                  idCol: String): DataFrame =
    corpus.select(col(idCol)).distinct()
      .join(corpusSh.groupBy(col(idCol))
        .agg(count(lit(1)).as("n_shingles")), Seq(idCol), "left")
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_shingles"), lit(0L)), lit(1L))
            .cast("double")).as("contamination"))

  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    n: Int = 5): DataFrame = {
    val benchSet = charShingles(benchmark, idCol, textCol, n)
      .select(col("sh")).distinct()
    // spread the corpus side before shingling: the per-row explode is
    // the expensive step and serial on a one-task input (no-op when
    // already parallel)
    val corpusSh = charShingles(graft.Par.spread(corpus),
      idCol, textCol, n)
    val overlap = corpusSh
      .join(broadcast(benchSet), Seq("sh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    contaminationReport(corpus, corpusSh, overlap, idCol)
  }

  /** [[contamination]] for benchmark sets too large to broadcast as a
    * hash relation: the benchmark shingles build a ~9.6-bits/item
    * Bloom filter (distributed treeAggregate), the corpus scan keeps
    * only shingles the filter admits (a codegen'd two-hash probe per
    * row — no join, no shuffle on the corpus side), and only those
    * CANDIDATES pay an exact semi-join to strip the filter's false
    * positives. Results are therefore IDENTICAL to [[contamination]]
    * — the gate query shares its oracle — while the per-row scan cost
    * is independent of benchmark size: at 1 B benchmark shingles the
    * exact set is ~50 GB (unbroadcastable) but the filter is ~1.2 GB
    * at 1% fpp, and the residual join only ever sees true overlaps
    * plus the fpp fraction of the corpus.
    */
  def contaminationBloom(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         n: Int = 5, fpp: Double = 0.01): DataFrame = {
    import graft.functions.BloomExpressions.might_contain_long
    // materialized once: the distinct set feeds the count, the filter
    // build, and the exact-confirm join
    val benchSet = charShingles(benchmark, idCol, textCol, n)
      .select(col("sh")).distinct().localCheckpoint(true)
    val expected = math.max(benchSet.count(), 1L)
    val bf = benchSet.select(xxhash64(col("sh")).as("shl"))
      .stat.bloomFilter("shl", expected, fpp)
    val corpusSh = charShingles(graft.Par.spread(corpus),
      idCol, textCol, n)
    val candidates = corpusSh
      .filter(might_contain_long(bf, xxhash64(col("sh"))))
    // exact confirm on the bloom survivors only; NOT broadcast — at
    // scale the benchmark set is the big side, and the candidate side
    // is already tiny (true overlaps + fpp), so AQE picks the join
    val overlap = candidates.join(benchSet, Seq("sh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    contaminationReport(corpus, corpusSh, overlap, idCol)
  }

  /** Rolling-hash shingle fingerprint: xxhash64 of each w-token window,
    * giving a compact per-document signature set for containment
    * detection. Returns array<long>, sorted for determinism.
    */
  /** Gopher-style repetition features per document, word-granular
    * (these corpora are single-line): distinct-word ratio, share of the
    * most frequent word, share of the most frequent bigram. Filters
    * like `top_bigram_share > 0.18 → drop` catch boilerplate and
    * degenerate generations that exact/near dedup misses.
    *
    * Shape at scale: explode → two-level hash aggregate keyed on
    * (doc_id, gram) then (doc_id) — partial aggregation combines
    * map-side, and both shuffles hash on doc_id so the per-doc reduce
    * never sees skew wider than one document's vocabulary.
    */
  def repetitionFeatures(df: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val nm1 = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), nm1),
      slice(toks, lit(2), nm1), (a, b) => concat_ws(" ", a, b))
    def shares(gramCol: Column, label: String) =
      df.select(col(idCol), explode(gramCol).as("_g"))
        .groupBy(col(idCol), col("_g")).agg(count(lit(1)).as("_n"))
        .groupBy(col(idCol))
        .agg(max(col("_n")).as(s"_top_$label"),
          sum(col("_n")).as(s"_total_$label"),
          count(lit(1)).as(s"_distinct_$label"))
    val words = shares(toks, "w")
    val pairs = shares(bigrams, "b")
    words.join(pairs, Seq(idCol), "left")
      .select(col(idCol),
        col("_total_w").cast("long").as("n_words"),
        (col("_distinct_w").cast("double") / col("_total_w"))
          .as("distinct_word_ratio"),
        (col("_top_w").cast("double") / col("_total_w"))
          .as("top_word_share"),
        (coalesce(col("_top_b"), lit(0L)).cast("double") /
          greatest(coalesce(col("_total_b"), lit(0L)), lit(1L)))
          .as("top_bigram_share"))
  }

  /** Frequency-ranked vocabulary over a corpus — the tokenizer-training
    * precursor: global word counts, rank by (count desc, word) for a
    * deterministic ordering, truncated to `topN`.
    *
    * Shape at scale: wordcount (map-side combine) then TakeOrdered for
    * the top-N — no global sort of the full vocabulary.
    */
  def vocabulary(df: DataFrame, textCol: String = "text",
                 topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(topN)
    // the rank window runs over the topN-row limit result, so a
    // constant single-bucket partition key is the correct distribution
    counts.withColumn("rank",
      row_number().over(Window.partitionBy(TopK.singleBucket(col("cnt")))
        .orderBy(col("cnt").desc, col("word")))
        .cast("long"))
  }

  /** BM25 scoring of every document against a bag of query terms
    * (k1 = 1.2, b = 0.75, Lucene-style idf). Term frequencies are
    * row-local array scans (no explode); the corpus constants (N,
    * avgdl, per-term document frequencies) are one small aggregate
    * broadcast back over the scan — two passes total, no shuffle by
    * key. Returns the full scored corpus; callers top-k it.
    */
  def bm25(df: DataFrame, terms: Seq[String], idCol: String = "doc_id",
           textCol: String = "text", k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    val toks = tokens(col(textCol))
    def tf(t: String) = size(filter(toks, x => x === t)).cast("long")
    val withTf = df.select(
      (col(idCol) +: size(toks).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) => tf(t).as(s"_tf$i") }): _*)
    val aggs = count(lit(1)).as("n") +: avg(col("dl")).as("avgdl") +:
      terms.indices.map(i =>
        sum((col(s"_tf$i") > 0).cast("long")).as(s"_df$i"))
    val statsRow = withTf.agg(aggs.head, aggs.tail: _*).head()
    val n = statsRow.getAs[Long]("n").toDouble
    val avgdl = statsRow.getAs[Double]("avgdl")
    val score = terms.indices.map { i =>
      val dfT = statsRow.getAs[Long](s"_df$i").toDouble
      val idf = math.log1p((n - dfT + 0.5) / (dfT + 0.5))
      val tfc = col(s"_tf$i").cast("double")
      lit(idf) * tfc * lit(k1 + 1) /
        (tfc + lit(k1) *
          (lit(1 - b) + lit(b) * col("dl").cast("double") / lit(avgdl)))
    }.reduce(_ + _)
    withTf.select(
      (col(idCol) +: col("dl") +: score.as("score") +:
        terms.indices.map(i => col(s"_tf$i").as(s"tf_${terms(i)}"))): _*)
  }

  def shingleFingerprints(text: Column, w: Int = 5): Column = {
    val toks = tokens(text)
    val n = size(toks)
    array_sort(array_distinct(transform(
      sequence(lit(0), greatest(n - w, lit(0))),
      i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(w)))))))
  }

  /** Count-min sketch of the corpus token-frequency distribution
    * (Cormode & Muthukrishnan '05): `d` hash rows × `w` buckets of
    * integer counts — the bounded-memory frequency structure for key
    * spaces too large to materialize (at 100 TB the exact token table
    * is itself huge; the sketch is d·w longs regardless). One
    * codegen'd cells projection + one hash aggregate; counts are
    * integer sums, so the sketch is partition-order-independent and
    * — unlike HLL/GK estimators — EXACTLY replayable by an oracle
    * running the same hash family (splitmix over the token hash, the
    * minhash-permutation recipe).
    *
    * Returns (cell, cnt) rows, cell = hashRow·w + bucket; cells never
    * touched by any token are absent (count 0).
    */
  def cmsSketch(df: DataFrame, textCol: String = "text",
                d: Int = 4, w: Int = 1024): DataFrame =
    df.select(explode(graft.functions.TextExpressions
        .cms_cells(col(textCol), d, w)).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimates from a [[cmsSketch]]: for each probe
    * word, `min` over its `d` cells — an overestimate-only bound
    * (est ≥ true count, error ≤ εN with prob 1−δ for w=⌈e/ε⌉,
    * d=⌈ln 1/δ⌉). The sketch side is d·w rows — broadcast — and the
    * probe side computes its cells row-locally, so estimation never
    * touches the corpus again.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
                  wordCol: String = "word",
                  d: Int = 4, w: Int = 1024): DataFrame =
    probes
      .withColumn("cell", explode(graft.functions.TextExpressions
        .cms_cells(col(wordCol), d, w)))
      .join(broadcast(sketch), Seq("cell"), "left")
      .groupBy(col(wordCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  // ---------------------------------------- LM perplexity filtering

  /** CCNet-style LM perplexity BUCKETING (Wenzek et al. 2019,
    * arXiv:1911.00359): train a bigram language model on a CLEAN
    * subset of the corpus, score every document by its mean
    * per-bigram surprisal under that model, and bucket into
    * head/middle/tail — the partition CCNet actually ships (head =
    * most Wikipedia-like third, tail = dropped/downsampled).
    *
    * Relationship to [[LangModel.scoreDocs]]: that operator is the
    * RANKING stage (stupid-backoff log-probabilities, doubles made
    * deterministic by rounding + value-ordered folds); this one is
    * the FILTER stage, and trades the backoff leg for arithmetic
    * that never leaves the integers — the bucket assignment is
    * exact by construction, not by rounding discipline, which is
    * what you want when the bucket feeds a reproducible
    * keep/drop decision across engine versions.
    *
    * All arithmetic is INTEGER fixed point, so the result is
    * engine- and partition-order-exact (the PageRank/centroids
    * recipe — no transcendentals whose last ulp differs between
    * libm implementations):
    *   - conditional probability quantized to 2^20:
    *     `p_q = (2^20 · c(w1 w2)) div c(w1 ·)`, exact integral
    *     division on longs (`div`, not `/` — double division can
    *     round x.999... up across the floor boundary);
    *   - surprisal in whole bits: `20 − ⌊log2 p_q⌋`, with
    *     `⌊log2 n⌋ = length(bin(n)) − 1` — a binary-string length,
    *     exact for any positive long, replayable in any SQL engine
    *     with a binary format function;
    *   - bigrams UNSEEN by the model (or quantized to 0) cost
    *     `unseenBits` (default 21 — "rarer than any seen event");
    *   - per-doc score = `(1000 · Σbits) div n_bigrams` milli-bits.
    *
    * Buckets: `head` < `headMax` ≤ `middle` < `tailMin` ≤ `tail`
    * (CCNet buckets by per-language percentile; fixed thresholds
    * keep the operator deterministic — compute percentiles upstream
    * and pass them in). Documents with < 2 tokens score NULL and
    * bucket `unscored`.
    *
    * Shape at scale: the model is one explode + hash aggregate over
    * the TRAIN subset (map-side combined, keyed on the bigram — no
    * skew wider than one bigram's count), closed over a second
    * aggregate on w1 for the prefix totals joined back on w1 (model-
    * sized, not corpus-sized). Scoring joins the corpus's exploded
    * bigrams to the model — broadcast when the model is small, plain
    * hash join on the bigram key otherwise — then one doc-keyed
    * aggregate. Nothing shuffles on anything wider than (bigram) or
    * (doc); the corpus is scanned twice (train, score), same as
    * CCNet's train/apply split.
    */
  def lmPerplexity(df0: DataFrame, trainPred: Column,
                   idCol: String = "doc_id", textCol: String = "text",
                   headMaxMilliBits: Long = 9000L,
                   tailMinMilliBits: Long = 15000L,
                   unseenBits: Long = 21L): DataFrame = {
    // the corpus is scanned twice (train, score) and BOTH passes pay
    // the tokenise+bigram explode in the scan tasks — spread once so
    // neither pass is serial on a one-row-group file (guide §2.5;
    // no-op on already-parallel inputs)
    val df = graft.Par.spread(df0)
    val toks = tokens(col(textCol))
    val nm1 = greatest(size(toks) - 1, lit(0))
    val bigram = zip_with(slice(toks, lit(1), nm1),
      slice(toks, lit(2), nm1), (a, b) => concat_ws(" ", a, b))
    // split carried through scoring so w1-prefix totals need no
    // re-tokenization on the model side
    def exploded(src: DataFrame) = src
      .select(col(idCol), explode(bigram).as("_bg"))
      .withColumn("_w1", substring_index(col("_bg"), " ", 1))

    // ---- model: c(w1 w2) and c(w1 ·) over the clean subset ----
    val c2 = exploded(df.filter(trainPred))
      .groupBy(col("_bg"), col("_w1")).agg(count(lit(1)).as("_c2"))
    val c1 = c2.groupBy(col("_w1")).agg(sum(col("_c2")).as("_c1"))
    val model = c2.join(c1, "_w1")
      .select(col("_bg"),
        expr("(1048576 * _c2) div _c1").as("_pq"))
      .select(col("_bg"),
        when(col("_pq") >= 1L,
          lit(20L) - (length(bin(col("_pq"))) - 1).cast("long"))
          .otherwise(lit(unseenBits)).as("_bits"))

    // ---- score every document under the frozen model ----
    val scored = exploded(df)
      .join(model, Seq("_bg"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("_bits"), lit(unseenBits))).as("_total"))
      .select(col(idCol), col("n_bigrams"),
        expr("(1000 * _total) div n_bigrams").as("milli_bits"))

    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("milli_bits"),
        when(col("milli_bits").isNull, lit("unscored"))
          .when(col("milli_bits") < headMaxMilliBits, lit("head"))
          .when(col("milli_bits") < tailMinMilliBits, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}

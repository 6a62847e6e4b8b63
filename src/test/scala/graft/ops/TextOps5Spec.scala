package graft.ops

import graft.SparkSpec
import graft.functions.TextExpressions
import org.apache.spark.sql.functions._

/** Round-5 text/pipeline operators: repetition features, vocabulary,
  * BM25, deterministic per-group sampling, NFC normalization.
  */
class TextOps5Spec extends SparkSpec {
  import spark.implicits._

  test("repetitionFeatures: hand-computed shares on known docs") {
    val docs = Seq(
      (0L, "a a a b"),         // 4 words, 2 distinct; top word a=3;
                               // bigrams: "a a"×2, "a b" → top 2/3
      (1L, "x y z w"),         // all distinct; every bigram unique
      (2L, "solo")             // single word: no bigrams at all
    ).toDF("doc_id", "text")
    val m = TextStats.repetitionFeatures(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(0L).getAs[Long]("n_words") == 4)
    assert(m(0L).getAs[Double]("distinct_word_ratio") == 0.5)
    assert(m(0L).getAs[Double]("top_word_share") == 0.75)
    assert(m(0L).getAs[Double]("top_bigram_share") == 2.0 / 3)
    assert(m(1L).getAs[Double]("distinct_word_ratio") == 1.0)
    assert(m(1L).getAs[Double]("top_word_share") == 0.25)
    assert(m(1L).getAs[Double]("top_bigram_share") == 1.0 / 3)
    assert(m(2L).getAs[Long]("n_words") == 1)
    assert(m(2L).getAs[Double]("top_bigram_share") == 0.0)
  }

  test("vocabulary: rank by count desc then word, truncated") {
    val docs = Seq((0L, "b b b a a c"), (1L, "a c d")).toDF("doc_id", "text")
    val v = TextStats.vocabulary(docs, topN = 3).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("cnt"),
        r.getAs[Long]("rank"))).sortBy(_._3)
    // a=3, b=3 (tie → a first), c=2; d truncated away
    assert(v.toSeq == Seq(("a", 3L, 1L), ("b", 3L, 2L), ("c", 2L, 3L)))
  }

  test("bm25: rarer term outranks common term at equal tf and length") {
    val docs = Seq(
      (0L, "rare common filler filler"),
      (1L, "common filler filler filler"),
      (2L, "common filler filler filler"),
      (3L, "filler filler filler filler")
    ).toDF("doc_id", "text")
    val scored = TextStats.bm25(docs, Seq("rare", "common"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 0 has both terms; its score must exceed the common-only docs
    val s = (id: Long) => scored(id).getAs[Double]("score")
    assert(s(0L) > s(1L) && s(1L) == s(2L) && s(2L) > s(3L))
    assert(s(3L) == 0.0) // no query terms at all
    assert(scored(0L).getAs[Long]("tf_rare") == 1)
    assert(scored(0L).getAs[Long]("dl") == 4)
  }

  test("samplePerGroup: deterministic, k per group, stable across runs") {
    val docs = (0L until 100L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    val once = Sampling.samplePerGroup(docs, "id", "g", k = 5).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("id"))).sorted.toSeq
    val again = Sampling.samplePerGroup(docs, "id", "g", k = 5).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("id"))).sorted.toSeq
    assert(once == again)
    assert(once.groupBy(_._1).forall(_._2.size == 5))
    // the hash order is not the natural order — a real shuffle happened
    assert(once.map(_._2) != once.map(_._2).sorted.take(20))
  }

  test("nfc_normalize composes combining marks; ascii is a no-op") {
    val df = Seq(
      ("café",   "café"),   // e + U+0301 → é
      ("plain ascii",  "plain ascii"),
      ("niño",   "niño")    // n + U+0303 → ñ
    ).toDF("raw", "expected")
    val out = df.select(
      TextExpressions.nfc_normalize(col("raw")).as("norm"),
      col("expected"),
      length(col("raw")).as("lr"),
      length(TextExpressions.nfc_normalize(col("raw"))).as("ln")).collect()
    out.foreach { r =>
      assert(r.getAs[String]("norm") == r.getAs[String]("expected"))
    }
    // composition strictly shortens the decomposed rows
    assert(out(0).getAs[Int]("ln") == out(0).getAs[Int]("lr") - 1)
    assert(out(1).getAs[Int]("ln") == out(1).getAs[Int]("lr"))
  }

  test("contaminationBloom equals exact contamination (no false negatives)") {
    val docs = (0L until 60L).map { i =>
      val body =
        if (i % 10 == 0) s"shared benchmark passage number ${i / 10} here"
        else s"unique corpus document $i with its own distinct words"
      (i, body)
    }.toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_overlap"))).sortBy(_._1).toSeq
    assert(canon(TextStats.contaminationBloom(corpus, bench)) ==
      canon(TextStats.contamination(corpus, bench)))
  }

  test("bloom gate: every true member is admitted (no false negatives)") {
    import graft.functions.BloomExpressions.might_contain_long
    val items = (0L until 5000L).map(i => s"item-$i").toDF("sh")
    val bf = items.select(xxhash64(col("sh")).as("h"))
      .stat.bloomFilter("h", 5000, 0.01)
    val admitted = items
      .filter(might_contain_long(bf, xxhash64(col("sh")))).count()
    assert(admitted == 5000) // bloom filters never false-negative
  }

  test("centroids: exact fixed-point sums, partition-order independent") {
    val vecs = Seq(
      (0, Array(1.0f, -2.0f)), (0, Array(3.0f, 0.5f)),
      (1, Array(0.25f, 0.25f)))
      .toDF("label", "embedding")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getAs[Long]("pos"),
        r.getAs[Double]("sum_v"), r.getAs[Long]("n_vecs")))
      .sortBy(t => (t._1, t._2)).toSeq
    val one = canon(graft.ops.Similarity.centroids(vecs))
    // powers of two survive the 2^20 grid exactly
    assert(one == Seq((0, 0L, 4.0, 2L), (0, 1L, -1.5, 2L),
      (1, 0L, 0.25, 1L), (1, 1L, 0.25, 1L)))
    // re-sharding must not change a single bit
    assert(canon(graft.ops.Similarity.centroids(vecs.repartition(7))) == one)
  }

  test("nfc_normalize: null in, null out") {
    val df = Seq(Option.empty[String], Some("ok")).toDF("s")
    val out = df.select(TextExpressions.nfc_normalize(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(None, Some("ok")))
  }

  test("gopherRules: each flag trips on its own violation") {
    val good = ("word " * 60).trim + " the and" // 62 words, clean
    val docs = Seq(
      (0L, good),                          // passes everything
      (1L, "too short the and"),           // word count
      (2L, ("## " * 60).trim + " the and"),// symbol ratio (# per word)
      (3L, ("word " * 60).trim),           // no 2 distinct stopwords
      (4L, ("a " * 60).trim + " the and")  // mean word len < 3
    ).toDF("doc_id", "text")
    val m = TextStats.gopherRules(docs,
        stopWords = Seq("the", "and")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(0L).getAs[Boolean]("keep"))
    assert(!m(1L).getAs[Boolean]("f_word_count") &&
      !m(1L).getAs[Boolean]("keep"))
    assert(!m(2L).getAs[Boolean]("f_symbol_ratio"))
    assert(!m(3L).getAs[Boolean]("f_stop_words"))
    assert(!m(4L).getAs[Boolean]("f_mean_word_len"))
  }

  test("c4LineFilter: line rules + min-sentence doc drop") {
    val docs = Seq(
      (0L, "one two three four five ends well.\n" +
        "short line.\n" +                       // <5 words
        "no terminal punctuation here at all\n" +
        "a brace { disqualifies this long line.\n" +
        "six seven eight nine ten eleven!\n" +
        "ask me anything you like today?"),      // 3 survivors → keep
      (1L, "only one good line survives here.\n" +
        "and another good one right here.\n" +
        "nope")                                   // 2 survivors → drop
    ).toDF("doc_id", "text")
    val m = TextStats.c4LineFilter(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(0L).getAs[Long]("n_lines_kept") == 3)
    assert(m(0L).getAs[Boolean]("keep"))
    assert(m(0L).getAs[String]("clean_text") ==
      "one two three four five ends well.\n" +
        "six seven eight nine ten eleven!\n" +
        "ask me anything you like today?")
    assert(m(1L).getAs[Long]("n_lines_kept") == 2)
    assert(!m(1L).getAs[Boolean]("keep"))
    assert(m(1L).getAs[String]("clean_text") == "")
  }
}

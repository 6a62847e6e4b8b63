package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 operators: exact-substring (duplicated-window) dedup and
  * bigram stupid-backoff LM quality scoring — hand-computed cases.
  */
class LmSubstringSpec extends SparkSpec {
  import spark.implicits._

  test("duplicatedWindowSpans: cross-doc window, union of overlaps, short docs") {
    val docs = Seq(
      (0L, "a b c d e f g h i j"),      // window@0 = a..h duplicated in doc 1
      (1L, "z a b c d e f g h x"),      // window@1 = a..h
      (2L, "p q r s t u v w x y z1 z2"),// == doc 3: ALL 5 windows dup,
      (3L, "p q r s t u v w x y z1 z2"),//   union covers all 12 tokens
      (4L, "one two")                   // too short for any window
    ).toDF("doc_id", "text")
    val m = Dedup.duplicatedWindowSpans(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m.size == 5)
    for (id <- Seq(0L, 1L)) {
      assert(m(id).getAs[Long]("total_tokens") == 10)
      assert(m(id).getAs[Long]("dup_windows") == 1)
      assert(m(id).getAs[Long]("removed_tokens") == 8)
      assert(m(id).getAs[Long]("kept_tokens") == 2)
    }
    for (id <- Seq(2L, 3L)) {
      assert(m(id).getAs[Long]("dup_windows") == 5)
      assert(m(id).getAs[Long]("removed_tokens") == 12)
      assert(m(id).getAs[Long]("kept_tokens") == 0)
    }
    assert(m(4L).getAs[Long]("total_tokens") == 2)
    assert(m(4L).getAs[Long]("dup_windows") == 0)
    assert(m(4L).getAs[Long]("kept_tokens") == 2)
  }

  test("duplicatedWindowSpans: WITHIN-doc repeats count, disjoint spans sum") {
    // m1..m8 j m1..m8 → window@0 == window@9, spans [0,8) ∪ [9,17)
    val text = ((1 to 8).map(i => s"m$i") ++ Seq("j") ++
      (1 to 8).map(i => s"m$i")).mkString(" ")
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val r = Dedup.duplicatedWindowSpans(docs, "doc_id", "text", w = 8)
      .collect().head
    assert(r.getAs[Long]("total_tokens") == 17)
    assert(r.getAs[Long]("dup_windows") == 2)
    assert(r.getAs[Long]("removed_tokens") == 16)
    assert(r.getAs[Long]("kept_tokens") == 1)
  }

  test("removeDuplicatedSpans: duplicated spans cut, survivors rejoin " +
      "in order, fully-dup docs come back empty") {
    val docs = Seq(
      (0L, "a b c d e f g h i j"),      // dup span = tokens 0..7
      (1L, "z a b c d e f g h x"),      // dup span = tokens 1..8
      (2L, "p q r s t u v w x y z1 z2"),// fully duplicated vs doc 3
      (3L, "p q r s t u v w x y z1 z2"),
      (4L, "one two")                   // too short: untouched
    ).toDF("doc_id", "text")
    val m = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m.size == 5)
    assert(m(0L).getAs[String]("clean_text") == "i j")
    assert(m(0L).getAs[Long]("kept_tokens") == 2)
    assert(m(1L).getAs[String]("clean_text") == "z x")
    assert(m(2L).getAs[String]("clean_text") == "")
    assert(m(2L).getAs[Long]("kept_tokens") == 0)
    assert(m(4L).getAs[String]("clean_text") == "one two")
    // within-doc repeat: m1..m8 j m1..m8 → only the separator survives
    val rep = ((1 to 8).map(i => s"m$i") ++ Seq("j") ++
      (1 to 8).map(i => s"m$i")).mkString(" ")
    val r = Dedup.removeDuplicatedSpans(
      Seq((7L, rep)).toDF("doc_id", "text"), "doc_id", "text", w = 8)
      .collect().head
    assert(r.getAs[String]("clean_text") == "j")
    assert(r.getAs[Long]("kept_tokens") == 1)
  }

  test("LangModel: hit / backoff / OOV legs, hand-computed") {
    val docs = Seq(
      (0L, "a b a b a c"),  // train: T=6; uni a:3 b:2 c:1;
                            // bi (a,b):2 (b,a):2 (a,c):1; w1 a:3 b:2
      (1L, "a b a d"),      // (a,b) hit ln(2/3); (b,a) hit ln(1);
                            // (a,d) OOV ln(0.4/6)
      (3L, "c a x")         // (c,a) backoff ln(0.4*3/6); (a,x) OOV
    ).toDF("doc_id", "text")
    val train = docs.filter($"doc_id" % 2 === 0)
    val scored = LangModel.scoreDocs(docs.filter($"doc_id" % 2 === 1),
        LangModel.bigramLm(train), LangModel.unigramLm(train))
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = scored(1L)
    assert(d1.getAs[Long]("n_bigrams") == 3)
    assert(d1.getAs[Long]("n_hits") == 2)
    assert(d1.getAs[Long]("n_backoff") == 0)
    assert(d1.getAs[Long]("n_oov") == 1)
    val exp1 = (math.log(2.0 / 3) + math.log(1.0) + math.log(0.4 / 6)) / 3
    assert(math.abs(d1.getAs[Double]("avg_logp") - exp1) < 1e-8)
    val d3 = scored(3L)
    assert(d3.getAs[Long]("n_bigrams") == 2)
    assert(d3.getAs[Long]("n_hits") == 0)
    assert(d3.getAs[Long]("n_backoff") == 1)
    assert(d3.getAs[Long]("n_oov") == 1)
    val exp3 = (math.log(0.4 * 3 / 6) + math.log(0.4 / 6)) / 2
    assert(math.abs(d3.getAs[Double]("avg_logp") - exp3) < 1e-8)
  }

  test("property: duplicatedWindowSpans equals brute force on random corpora") {
    val rnd = new scala.util.Random(13)
    val vocab = Array("a", "b", "c", "d") // tiny: forces real duplicates
    for (trial <- 0 until 5) {
      val w = 2 + rnd.nextInt(3) // window 2..4
      val docs = (0 until (8 + rnd.nextInt(12))).map { id =>
        val n = rnd.nextInt(14) // incl. too-short and empty docs
        (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
          .mkString(" "))
      }
      // brute force: window strings, global counts, per-doc coverage
      val wins = docs.flatMap { case (id, text) =>
        val ts = text.split("\\s+").filter(_.nonEmpty)
        (0 to ts.length - w).map(p => (id, p, ts.slice(p, p + w).mkString(" ")))
      }
      val counts = wins.groupBy(_._3).map { case (k, v) => k -> v.size }
      val expected = docs.map { case (id, text) =>
        val ts = text.split("\\s+").filter(_.nonEmpty)
        val marked = wins.filter(x => x._1 == id && counts(x._3) >= 2)
        val covered = Array.fill(ts.length)(false)
        marked.foreach(m =>
          (m._2 until m._2 + w).foreach(covered(_) = true))
        id -> (ts.length.toLong, marked.size.toLong,
          covered.count(identity).toLong)
      }.toMap
      val got = Dedup.duplicatedWindowSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", w = w)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("total_tokens"), r.getAs[Long]("dup_windows"),
            r.getAs[Long]("removed_tokens"))).toMap
      assert(got == expected, s"trial $trial w=$w")
    }
  }

  test("property: removeDuplicatedSpans equals brute force on random " +
      "corpora") {
    val rnd = new scala.util.Random(29)
    val vocab = Array("a", "b", "c", "d")
    for (trial <- 0 until 5) {
      val w = 2 + rnd.nextInt(3)
      val docs = (0 until (8 + rnd.nextInt(12))).map { id =>
        val n = rnd.nextInt(14)
        (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
          .mkString(" "))
      }
      val wins = docs.flatMap { case (id, text) =>
        val ts = text.split("\\s+").filter(_.nonEmpty)
        (0 to ts.length - w).map(p =>
          (id, p, ts.slice(p, p + w).mkString(" ")))
      }
      val counts = wins.groupBy(_._3).map { case (k, v) => k -> v.size }
      val expected = docs.map { case (id, text) =>
        val ts = text.split("\\s+").filter(_.nonEmpty)
        val covered = Array.fill(ts.length)(false)
        wins.filter(x => x._1 == id && counts(x._3) >= 2)
          .foreach(m => (m._2 until m._2 + w).foreach(covered(_) = true))
        val keep = ts.indices.filterNot(covered).map(ts)
        id -> (keep.mkString(" "), keep.size.toLong)
      }.toMap
      val got = Dedup.removeDuplicatedSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", w = w)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[String]("clean_text"), r.getAs[Long]("kept_tokens")))
        .toMap
      assert(got == expected, s"trial $trial w=$w")
    }
  }

  test("LangModel: sub-2-token candidates carry no LM evidence") {
    val train = Seq((0L, "a b c")).toDF("doc_id", "text")
    val cand = Seq((1L, "a"), (3L, "")).toDF("doc_id", "text")
    val n = LangModel.scoreDocs(cand, LangModel.bigramLm(train),
      LangModel.unigramLm(train)).count()
    assert(n == 0)
  }
}

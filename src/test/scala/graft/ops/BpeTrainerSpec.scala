package graft.ops

import graft.SparkSpec

/** Hand-computed BPE merge learning: pair counting weighted by word
  * frequency, lexicographic tie-break, greedy non-overlapping apply
  * (including the equal-symbol run case).
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("train: textbook 3 rounds on a weighted vocabulary") {
    // Sennrich's canonical example shape:
    //   low:5  lower:2  newest:6  widest:3
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("word", "cnt")
    // round 1: (e,s) 6+3=9 and (s,t) 9 tie → lexicographic (e,s)
    // round 2: (es,t) 9 wins
    // round 3: (l,o) 5+2=7 wins
    val m = BpeTrainer.train(wc, 3).orderBy("round").collect()
    assert(m.map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("tokenIds: dense frequency-ranked ids, ordered per-doc sequences") {
    val docs = Seq(
      (0L, "low lower newest"),
      (1L, "newest widest low")).toDF("doc_id", "text")
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val out = BpeTrainer.tokenIds(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // sequences are dense 0..n-1 per doc
    val byDoc = out.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._2)).toMap
    byDoc.foreach { case (_, ps) =>
      assert(ps.toSeq == (0L until ps.length))
    }
    // ids are dense 1..|vocab| and frequency-ranked: 'lo' appears in
    // low(×2 docs incl lower) — the most frequent piece set is small
    val ids = out.map(_._3).distinct.sorted
    assert(ids.head == 1 && ids.toSeq == (1 to ids.length))
    // token count per doc equals the segment-based piece sum
    val wc = BpeTrainer.wordCounts(docs)
    val expect = BpeTrainer.segment(wc, merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docTokens = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(docTokens(0L) ==
      Seq("low", "lower", "newest").map(expect).sum)
    assert(docTokens(1L) ==
      Seq("newest", "widest", "low").map(expect).sum)
    // deterministic under repartitioning
    val again = BpeTrainer.tokenIds(docs.repartition(5), merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == out.toSet)
  }

  test("property: distributed merges equal a sequential reference") {
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 3) {
      val words = (0 until 8 + rnd.nextInt(6)).map { _ =>
        (Seq.fill(2 + rnd.nextInt(5))(
          ('a' + rnd.nextInt(3)).toChar).mkString,
          1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val rounds = 3
      var vocab = words.map { case (w, c) =>
        (w.map(_.toString).toVector, c) }
      val expected =
        scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
      for (r <- 1 to rounds) {
        val counts =
          scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, c) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            counts((p(0), p(1))) =
              counts.getOrElse((p(0), p(1)), 0L) + c
          }
        }
        val ((w1, w2), cnt) =
          counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        expected += ((r, w1, w2, cnt))
        vocab = vocab.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == w1 && syms(i + 1) == w2) {
              out += w1 + w2; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }
      }
      val got = BpeTrainer.train(words.toDF("word", "cnt"), rounds)
        .orderBy("round").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      assert(got == expected.toSeq, s"trial $trial: $got vs $expected")
    }
  }

  test("greedy apply: equal-symbol runs merge left-to-right non-overlapping") {
    // 'aaa' x3 and 'aaaa' x1: pair (a,a) counted at every adjacency
    // (2*3 + 3*1 = 9). After merging: aaa -> [aa, a]; aaaa -> [aa, aa]
    // so round 2's top pair is (aa, a) 3 vs (aa, aa) 1.
    val wc = Seq(("aaa", 3L), ("aaaa", 1L)).toDF("word", "cnt")
    val m = BpeTrainer.train(wc, 2).orderBy("round").collect()
    assert(m(0).getString(1) == "a" && m(0).getString(2) == "a")
    assert(m(0).getLong(3) == 9L)
    assert(m(1).getString(1) == "aa" && m(1).getString(2) == "a")
    assert(m(1).getLong(3) == 3L)
  }
}

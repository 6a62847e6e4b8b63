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

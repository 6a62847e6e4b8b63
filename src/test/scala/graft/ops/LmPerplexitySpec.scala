package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CCNet-style bigram-LM perplexity filter: integer-exact surprisal,
  * hand-computed on a tiny corpus, plus the partition-invariance the
  * fixed-point arithmetic exists to guarantee.
  */
class LmPerplexitySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // train rows: bigrams "a b" x3, "a c" x1 -> c1(a)=4
  //   p(b|a) = 3/4 -> p_q = 786432 -> floor(log2)=19 -> 1 bit
  //   p(c|a) = 1/4 -> p_q = 262144 -> floor(log2)=18 -> 2 bits
  private val docs = Seq(
    (0L, "a b", true), (1L, "a b", true), (2L, "a b", true),
    (3L, "a c", true),
    (4L, "a b a c", false), // scored: bits 1 + 21(unseen "b a") + 2
    (5L, "z z", false),     // all bigrams unseen -> 21 bits
    (6L, "solo", false),    // < 2 tokens -> unscored
    (7L, "", false)
  ).toDF("doc_id", "text", "train")

  private def run(head: Long = 9000L, tail: Long = 15000L) =
    TextStats.lmPerplexity(docs, col("train"), headMaxMilliBits = head,
        tailMinMilliBits = tail)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getString(3)))).toMap

  test("hand-computed integer surprisal, unseen penalty, unscored docs") {
    val m = run()
    // p=3/4 -> 1 bit -> 1000 milli-bits
    assert(m(0L) === ((1L, 1000L, "head")))
    // p=1/4 -> 2 bits
    assert(m(3L) === ((1L, 2000L, "head")))
    // (1 + 21 + 2) * 1000 div 3 = 8000
    assert(m(4L) === ((3L, 8000L, "head")))
    // unseen-only: 21000 milli-bits -> tail
    assert(m(5L) === ((1L, 21000L, "tail")))
    assert(m(6L) === ((0L, -1L, "unscored")))
    assert(m(7L) === ((0L, -1L, "unscored")))
  }

  test("bucket thresholds: head < headMax <= middle < tailMin <= tail") {
    val m = run(head = 1500L, tail = 8000L)
    assert(m(0L)._3 === "head")   // 1000 < 1500
    assert(m(3L)._3 === "middle") // 1500 <= 2000 < 8000
    assert(m(4L)._3 === "tail")   // 8000 >= 8000
  }

  test("scores are partition-order invariant (pure integer arithmetic)") {
    val a = TextStats.lmPerplexity(docs.repartition(1), col("train"))
      .collect().map(r => r.toSeq).toSet
    val b = TextStats.lmPerplexity(docs.repartition(7), col("train"))
      .collect().map(r => r.toSeq).toSet
    assert(a === b)
  }
}

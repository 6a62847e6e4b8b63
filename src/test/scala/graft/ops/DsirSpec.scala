package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance selection: target-like documents must outrank
  * corpus-typical ones, the output is a dense 1..k ranking with token
  * counts, and the double scoring is partitioning-invariant (the
  * fixed-bucket-order fold — the property the oracle relies on).
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val target = Seq(
    (100L, "quantum flux boson lepton quark"),
    (101L, "boson quark flux quantum hadron")).toDF("doc_id", "text")

  private val corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "dogs and cats and birds"),
    (2L, "quantum boson quark flux"), // target-like
    (3L, "the weather is mild today"),
    (4L, "hadron lepton quantum quark boson"), // most target-like
    (5L, "stock prices fell on tuesday")).toDF("doc_id", "text")

  test("target-like docs rank first; dense 1..k ranks; token counts") {
    val got = Sampling.dsirSelect(corpus, target, "doc_id", "text",
        k = 3, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.map(_._2).sorted === Array(1, 2, 3))
    val byRank = got.sortBy(_._2).map(_._1)
    // the two physics docs must occupy the top ranks
    assert(byRank.take(2).toSet === Set(2L, 4L))
    val toks = got.map(t => t._1 -> t._3).toMap
    assert(toks(2L) === 4L && toks(4L) === 5L)
  }

  test("scoring is partitioning-invariant") {
    val a = Sampling.dsirSelect(corpus.repartition(1), target,
      "doc_id", "text", k = 6, buckets = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = Sampling.dsirSelect(corpus.repartition(5), target,
      "doc_id", "text", k = 6, buckets = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a === b)
  }

  test("non-power-of-two buckets refuse") {
    intercept[IllegalArgumentException] {
      Sampling.dsirSelect(corpus, target, "doc_id", "text",
        k = 3, buckets = 63)
    }
  }
}

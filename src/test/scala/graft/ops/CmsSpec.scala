package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch: estimates are overestimate-only bounds on true
  * token counts, sketch size is d·w regardless of corpus size, and
  * the integer counts are partitioning-invariant.
  */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "apple banana apple cherry"),
    (1L, "banana apple durian"),
    (2L, "cherry cherry cherry apple")).toDF("doc_id", "text")

  test("est >= exact for every probe; exact for low-collision corpora") {
    val sketch = TextStats.cmsSketch(docs, "text", d = 4, w = 1024)
    val probes = Seq("apple", "banana", "cherry", "durian", "absent")
      .toDF("word")
    val est = TextStats.cmsEstimate(sketch, probes, "word")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("apple" -> 4L, "banana" -> 2L, "cherry" -> 4L,
      "durian" -> 1L, "absent" -> 0L)
    exact.foreach { case (wd, c) => assert(est(wd) >= c, wd) }
    // 10 distinct tokens into 4x1024 cells: collisions are
    // astronomically unlikely — estimates are exact here
    assert(est === exact)
  }

  test("sketch is bounded by d*w cells and partitioning-invariant") {
    val a = TextStats.cmsSketch(docs.repartition(1), "text", 4, 1024)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = TextStats.cmsSketch(docs.repartition(7), "text", 4, 1024)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.size <= 4 * 1024)
    assert(a.keys.forall(c => c >= 0 && c < 4 * 1024))
    // every hash row holds the full token mass (9 tokens per row)
    (0 until 4).foreach { i =>
      assert(a.filter(_._1 / 1024 == i).values.sum === 11L)
    }
  }
}

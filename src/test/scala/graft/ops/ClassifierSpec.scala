package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-perceptron quality classifier: learns a linearly separable
  * boundary, is partition-order invariant (integer batch updates),
  * and degenerates sanely at epochs = 0.
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // two disjoint vocabularies -> linearly separable in hash buckets
  // (long/short also differ, but the vocab signal alone suffices)
  private val docs = (0L until 40L).map { i =>
    if (i % 2 == 0)
      (i, "good clean prose with many useful words " * 3, true)
    else (i, "spam spam buy now", false)
  }.toDF("doc_id", "text", "label")

  test("separates disjoint vocabularies; score matches train labels") {
    val out = Classifier.perceptronFilter(docs, col("label"),
      trainPred = col("doc_id") < 30, epochs = 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out.size === 40)
    // every doc (including the held-out tail) classified correctly
    out.foreach { case (id, (y, margin, pred)) =>
      assert(pred === (y == 1L), s"doc $id: margin $margin")
      assert(y === (if (id % 2 == 0) 1L else -1L))
    }
  }

  test("weights are partition-order invariant") {
    val a = Classifier.perceptronTrain(docs.repartition(1),
      col("label"), epochs = 7)
    val b = Classifier.perceptronTrain(docs.repartition(7),
      col("label"), epochs = 7)
    assert(a.toSeq === b.toSeq)
  }

  test("epochs = 0 scores everything at margin 0, pred false") {
    val out = Classifier.perceptronFilter(docs, col("label"),
      trainPred = lit(true), epochs = 0).collect()
    assert(out.forall(r => r.getLong(2) == 0L && !r.getBoolean(3)))
  }

  test("converged training stops updating (stable weights)") {
    // separable tiny set converges; more epochs must not change w
    val w20 = Classifier.perceptronTrain(docs, col("label"), epochs = 20)
    val w40 = Classifier.perceptronTrain(docs, col("label"), epochs = 40)
    assert(w20.toSeq === w40.toSeq)
  }
}

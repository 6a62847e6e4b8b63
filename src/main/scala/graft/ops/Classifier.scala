package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Discriminative quality classification — the learned-filter stage of
  * a CCNet/Dolma-style pipeline (a fastText-shaped linear classifier
  * over hashed bag-of-words features, trained ON the engine's own
  * corpus tables). Completes the quality triad: heuristic features
  * ([[TextStats.qualityFeatures]]), generative LM scoring
  * ([[LangModel.scoreDocs]] / [[TextStats.lmPerplexity]]), and this —
  * a trained DISCRIMINATIVE boundary between a labeled "clean" and
  * "dirty" slice.
  *
  * The learner is a BATCH perceptron, chosen deliberately over
  * logistic regression: its update rule is pure integer arithmetic
  * (weights += Σ y·x over the epoch's misclassified rows), so
  * training is exactly reproducible — no learning-rate floats, no
  * sigmoid, no libm — and an independent engine replays it
  * bit-for-bit. Features are [[graft.functions.TextExpressions
  * .hash_embed]] token-count buckets (the hashing trick — no
  * vocabulary state), with a constant bias bucket appended.
  *
  * Shape at scale (the DSIR/k-means "centroid literal" pattern):
  * each epoch is ONE map-side-combined aggregate over the train
  * slice — margins are row-local dot products against the current
  * weights inlined as a (buckets+1)-long literal array, and the
  * epoch's update collects as buckets+1 longs on the driver. Nothing
  * shuffles on anything wider than the bucket id; T epochs = T scans
  * of the (cacheable) train slice. Scoring is one row-local
  * projection with the final weights — zero joins, fuses into
  * whole-stage codegen with the surrounding plan.
  */
object Classifier {

  /** Hashed features with the bias bucket appended: `buckets` token
    * counts + a constant `biasScale`, so the bias trains/applies
    * through the same dot product as every other weight. The scale
    * matters: a unit bias moves `biasScale`× slower than the token
    * buckets (whose per-doc mass is the token count, tens to
    * hundreds), and a threshold-shaped boundary then needs many more
    * epochs than the batch updates can stably deliver — measured on
    * the test corpus, bias=1 oscillates at chance while bias=16
    * separates at 97% in 20 epochs. 16 ≈ the corpus's per-bucket
    * feature mass, the classic put-features-on-one-scale fix.
    */
  private def features(textCol: Column, buckets: Int,
                       biasScale: Int): Column =
    concat(graft.functions.TextExpressions.hash_embed(textCol, buckets),
      array(lit(biasScale)))

  /** Integer margin of one row under literal weights: Σ w_b · x_b
    * over the buckets+1 features. Row-local. The weights are ONE
    * array-typed literal (`typedlit`), not a 65-node `array(lit…)`
    * tree: the training loop re-plans this expression every epoch,
    * and the per-epoch analysis/optimization cost scales with the
    * expression tree size (measured ~0.15 s/epoch driver gap at 20
    * epochs, the dominant cost of the whole op).
    */
  private def marginExpr(feats: Column, w: Array[Long]): Column =
    aggregate(
      zip_with(feats, typedlit(w.toSeq),
        (c, wb) => c.cast("long") * wb),
      lit(0L), (acc, x) => acc + x)

  /** Train the batch perceptron: T epochs, each one aggregate over
    * `train`. `labelCol` is boolean (true = positive / keep class,
    * mapped to y = +1; false → −1). Returns the learned weights,
    * length `buckets + 1` (bias last). Integer-exact: the result is
    * independent of partitioning and row order — a batch update sums
    * commutatively, unlike the sequential perceptron.
    */
  def perceptronTrain(train: DataFrame, labelCol: Column,
                      textCol: String = "text",
                      buckets: Int = 64, epochs: Int = 20,
                      biasScale: Int = 16): Array[Long] = {
    require(epochs >= 0, s"epochs must be >= 0, got $epochs")
    val n = buckets + 1
    val feats = train.select(
      when(labelCol, 1L).otherwise(-1L).as("__y"),
      features(col(textCol), buckets, biasScale).as("__x"))
      .cache()
    // Per-epoch FIXED cost dominates this loop (the epoch's compute is
    // a 65-weight dot product over the cached features): under AQE
    // every epoch pays two scheduler rounds plus a per-stage re-plan,
    // and without it the final aggregate would run at
    // spark.sql.shuffle.partitions tiny tasks. Pin both for the loop:
    // the final aggregate has at most buckets+1 groups, so ONE reduce
    // partition is the right size at any corpus scale (the partial,
    // map-side aggregate keeps the feats partitioning), and AQE has
    // nothing to adapt in a 65-group plan. Restored in finally —
    // measured 2.4 -> 1.1 s on the bench gate (20 epochs).
    val conf = train.sparkSession.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val prevParts = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", "1")
    try {
      var w = Array.fill(n)(0L)
      var t = 0
      while (t < epochs) {
        // misclassified (y·margin <= 0) rows contribute y·x; one
        // posexplode + hash aggregate keyed on the bucket id
        val upd = feats
          .withColumn("__m", marginExpr(col("__x"), w))
          .filter(col("__y") * col("__m") <= 0L)
          .select(col("__y"), posexplode(col("__x")).as(Seq("__b", "__c")))
          .groupBy(col("__b"))
          .agg(sum(col("__y") * col("__c").cast("long")).as("__u"))
          .collect()
        if (upd.isEmpty) t = epochs // converged: nothing misclassified
        else {
          val next = w.clone()
          upd.foreach(r => next(r.getInt(0)) += r.getLong(1))
          w = next
          t += 1
        }
      }
      w
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      conf.set("spark.sql.shuffle.partitions", prevParts)
      feats.unpersist()
    }
  }

  /** Score every row under trained weights: (id, margin, pred) with
    * `pred = margin > 0` — the keep/drop decision. Row-local.
    */
  def perceptronScore(df: DataFrame, weights: Array[Long],
                      idCol: String = "doc_id",
                      textCol: String = "text",
                      biasScale: Int = 16): DataFrame = {
    val buckets = weights.length - 1
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"weights length must be a power of two + 1, got ${weights.length}")
    df.select(col(idCol),
        marginExpr(features(col(textCol), buckets, biasScale), weights)
          .as("margin"))
      .withColumn("pred", col("margin") > 0L)
  }

  /** Train-on-a-slice, score-everything in one call (the gate shape):
    * rows matching `trainPred` train the classifier against
    * `labelCol`; every row is then scored. Output: (id, y — the
    * reference label, margin, pred).
    */
  def perceptronFilter(df: DataFrame, labelCol: Column,
                       trainPred: Column, idCol: String = "doc_id",
                       textCol: String = "text",
                       buckets: Int = 64, epochs: Int = 20,
                       biasScale: Int = 16): DataFrame = {
    val w = perceptronTrain(df.filter(trainPred), labelCol, textCol,
      buckets, epochs, biasScale)
    perceptronScore(df, w, idCol, textCol, biasScale)
      .join(df.select(col(idCol),
        when(labelCol, 1L).otherwise(-1L).as("y")), idCol)
      .select(col(idCol), col("y"), col("margin"), col("pred"))
  }
}

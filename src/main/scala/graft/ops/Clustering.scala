package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed k-means over an embedding column — the corpus-curation
  * clustering step of a large-scale training-data pipeline (topic
  * balancing, diversity sampling, cluster-based filtering à la
  * SemDeDup/D4: cluster first, then act per cluster).
  *
  * Spherical Lloyd's iterations, built for the 100 TB shape:
  *
  *  - The ASSIGNMENT step is ROW-LOCAL: the k·dim centroid matrix is
  *    inlined as literal arrays into a codegen'd expression (k·dim
  *    doubles — a few KB), so assigning N vectors is one scan with
  *    zero shuffles and zero joins, exactly how MLlib distributes
  *    Lloyd's (centroids broadcast, never a corpus×centroid join).
  *  - The UPDATE step is ONE hash aggregate per iteration:
  *    posexplode → (cluster, dim) partial sums → k·dim rows back to
  *    the driver (bounded by k·dim, not by N — the same justified
  *    collect as the IVF cell prune, Similarity.scala).
  *  - Iterations are driver-side loops over those two jobs; the data
  *    never re-shuffles across iterations.
  *
  * Determinism (what makes the gate oracle-able in DuckDB):
  *  - cosine assignment uses the single-pass left-to-right
  *    [[graft.functions.VectorExpressions.cosine_similarity]], which
  *    bit-matches DuckDB's `list_cosine_similarity`;
  *  - ties go to the SMALLEST cluster index (argmax-first);
  *  - centroid means are FIXED-POINT: elements scaled by 2^20,
  *    floored, summed exactly as longs, divided back — order- and
  *    partitioning-independent, so every engine computes the
  *    bit-identical centroid (the [[Similarity.centroids]] trick);
  *  - initial centroids are the embeddings of the k smallest ids.
  *
  * Cosine is scale-invariant in the centroid, so the un-normalized
  * fixed-point mean assigns identically to the normalized spherical
  * centroid — normalization is skipped entirely.
  *
  * Reference scope: the reference pipeline has no clustering operator;
  * this extends the LLM-data-pipeline surface the brief names as
  * first-class alongside dedup/ANN (cluster-then-curate).
  */
object Clustering {

  private val Scale = 1048576L // 2^20, matches Similarity.centroids

  /** Final (id, cluster) assignment after `iters` spherical Lloyd's
    * iterations with k centroids. `iters = 0` assigns against the
    * initial centroids only.
    */
  def kmeansAssign(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding", k: Int = 4,
                   iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    var cents = initialCentroids(df, idCol, vecCol, k)
    var it = 0
    while (it < iters) {
      cents = updateCentroids(assign(df, idCol, vecCol, cents),
        vecCol)
      it += 1
    }
    assign(df, idCol, vecCol, cents)
      .select(col(idCol), col("cluster"))
  }

  /** The k smallest-id embeddings, as (clusterIdx → double vector) —
    * k·dim values on the driver, the bounded seed every k-means
    * implementation ships to executors.
    */
  private def initialCentroids(df: DataFrame, idCol: String,
                               vecCol: String, k: Int)
      : Seq[(Int, Seq[Double])] = {
    df.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(k).collect()
      .zipWithIndex
      .map { case (r, i) =>
        i -> r.getSeq[Float](1).map(_.toDouble).toSeq
      }.toSeq
  }

  /** Row-local argmax-cosine assignment against literal centroids:
    * `array_position(sims, array_max(sims))` is FIRST-match, so ties
    * resolve to the smallest cluster index. Clusters are re-labelled
    * by position in `cents` (empty clusters simply vanish from the
    * centroid set, identically in the SQL oracle).
    */
  private def assign(df: DataFrame, idCol: String, vecCol: String,
                     cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val sims = array(cents.map { case (_, c) =>
      graft.functions.VectorExpressions.cosine_similarity(
        col(vecCol), typedLit(c))
    }: _*)
    val labels = array(cents.map { case (cl, _) => lit(cl) }: _*)
    df.withColumn("cluster",
      element_at(labels,
        array_position(sims, array_max(sims)).cast("int")))
  }

  /** One Lloyd's update: exact fixed-point per-(cluster, dim) sums,
    * divided back on the driver. Map-side partial aggregation does
    * the heavy lifting; the shuffle carries at most
    * k·dim·partitions rows.
    */
  private def updateCentroids(assigned: DataFrame, vecCol: String)
      : Seq[(Int, Seq[Double])] = {
    assigned
      .select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(floor(col("_v").cast("double") * Scale).cast("long"))
          .as("s"),
        count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getInt(0))
      .toSeq
      .map { case (cl, rows) =>
        cl -> rows.sortBy(_.getInt(1))
          .map(r => r.getLong(2).toDouble / Scale.toDouble / r.getLong(3))
          .toSeq
      }
      .sortBy(_._1)
  }

  /** Cluster-balanced sampling: keep at most `perCluster` members of
    * each k-means cluster, chosen deterministically by salted-hash
    * rank ([[Sampling.splitHash]] — md5, engine-replayable) — the
    * diversity-preserving downsample step (cap dominant topics instead
    * of uniform sampling). One window per cluster partition; at scale
    * the partition count is the cluster count, so skew is bounded by
    * the largest cluster — cap k-means first if a cluster dominates.
    */
  def clusterCapped(assigned: DataFrame, idCol: String, salt: String,
                    perCluster: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(Sampling.splitHash(col(idCol), salt), col(idCol))
    assigned.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= perCluster)
      .drop("_rk")
  }
}

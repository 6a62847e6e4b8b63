package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed bounded top-k aggregation — the per-partition-heap shape for
  * ANN at scale: each partition keeps at most k candidates per query
  * (map-side partial aggregation), merges are associative, and the
  * final shuffle carries only k rows per query instead of the whole
  * scored corpus. This is the scale path past the rank-window
  * formulation (which shuffles *all* scored rows per query before
  * ranking).
  */
object TopK {

  /** A window partition key that is constant-valued (always 0) but NOT
    * foldable, for ranking inputs that a `limit(k)` has already bounded
    * to k rows. An empty partitionSpec makes WindowExec move the whole
    * input to one task and warn about it; a constant key gives the same
    * single bucket through a defined HashPartitioning, which is exactly
    * right when the input IS k rows. The key must reference a column —
    * a foldable literal gets stripped from the partitionSpec by the
    * optimizer and the undefined-partition path comes back. Never use
    * this on an unbounded input: the single bucket is only safe because
    * the limit ran first.
    */
  def singleBucket(anchor: Column): Column =
    pmod(coalesce(anchor.cast("long"), lit(0L)), lit(1L))

  /** (neighborId, similarity) entries, kept sorted by
    * (sim desc, id asc), capped at k.
    */
  final class TopKAggregator(k: Int)
      extends Aggregator[(Long, Long, Double), List[(Double, Long)],
        Seq[(Long, Double)]] {

    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    private def insert(buf: List[(Double, Long)],
                       e: (Double, Long)): List[(Double, Long)] = {
      val (before, after) = buf.span(better(_, e))
      val merged = before ::: e :: after
      if (merged.length > k) merged.take(k) else merged
    }

    override def zero: List[(Double, Long)] = Nil
    override def reduce(buf: List[(Double, Long)],
                        in: (Long, Long, Double)): List[(Double, Long)] =
      insert(buf, (in._3, in._2))
    override def merge(a: List[(Double, Long)],
                       b: List[(Double, Long)]): List[(Double, Long)] =
      b.foldLeft(a)(insert)
    override def finish(buf: List[(Double, Long)]): Seq[(Long, Double)] =
      buf.map { case (sim, id) => (id, sim) }
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      Encoders.kryo[List[(Double, Long)]]
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      Encoders.kryo[Seq[(Long, Double)]]
  }

  /** Brute-force cosine top-k via the typed aggregator: broadcast the
    * queries, score the corpus once, heap-reduce per query. Output
    * matches the rank-window formulation exactly (same tie-break).
    */
  def bruteForceTopKAgg(queries: DataFrame, corpus: DataFrame, k: Int,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c.join(broadcast(q))
      .select(col("q_id"), col("n_id"),
        Similarity.cosine(col("q_vec"), col("n_vec")).as("sim"))
      // a zero-norm (or null) embedding scores NULL cosine — the
      // rank-window formulation sorts those nulls-last, so they never
      // enter a top-k; drop them BEFORE the primitive-Double typed
      // encode, which would otherwise throw on the null
      .filter(col("sim").isNotNull)
      .as[(Long, Long, Double)]
    val agg = new TopKAggregator(k)
    scored.groupByKey(_._1)
      .agg(agg.toColumn)
      .flatMap { case (qId, topk) =>
        topk.zipWithIndex.map { case ((nId, _), i) => (qId, nId, i + 1) }
      }
      .toDF("q_id", "n_id", "rank")
  }
}

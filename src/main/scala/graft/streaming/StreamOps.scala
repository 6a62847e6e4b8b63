package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time streaming operators (north-star extensions — the
  * reference itself uses none: SURVEY.md §2.8 T4). Built on
  * Structured Streaming's watermark + window machinery so state is
  * bounded and late data is handled by the engine, not by hand.
  */
object StreamOps {

  /** Tumbling event-time counts per key with a watermark: state for a
    * window is dropped once the watermark passes its end — bounded
    * memory on unbounded streams.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLength: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value")).as("sum_val"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col(keyCol), col("cnt"),
        col("sum_val"))

  /** Sliding-window rates (window/slide pair) — the rolling-throughput
    * shape.
    */
  def slidingCounts(events: DataFrame, tsCol: String,
                    windowLength: String = "10 minutes",
                    slide: String = "5 minutes",
                    watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength, slide))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("cnt"))
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming operators (north-star extensions — the
  * reference itself uses none: SURVEY.md §2.8 T4). Built on
  * Structured Streaming's watermark + window machinery so state is
  * bounded and late data is handled by the engine, not by hand.
  */
object StreamOps {

  /** Tumbling event-time counts per key with a watermark: state for a
    * window is dropped once the watermark passes its end — bounded
    * memory on unbounded streams. `valueCol` is the summed measure
    * (parameterized like the rest — a hardcoded name would fail
    * analysis on any stream not shaped exactly like the test's).
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLength: String = "1 hour",
                     watermark: String = "2 hours",
                     valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol)).as("sum_val"))
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

  /** Streaming exact dedup with bounded state: a duplicate key arriving
    * within the watermark delay of the first sighting is dropped, and
    * the key's state is evicted once the watermark passes — at-least-
    * once sources (Kafka redelivery) dedup in O(active keys), not
    * O(all keys ever). Unlike `dropDuplicates`, this never grows
    * without bound on an unbounded stream.
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           keyCols: Seq[String],
                           watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream-stream join with an event-time range bound
    * (the impression→click attribution shape). `joinType` covers
    * inner, left_outer, left_semi, and full_outer — outer variants
    * additionally RELEASE unmatched buffered rows (with nulls) once
    * the watermark proves no match can still arrive. The range bound
    * plus both watermarks let Spark size the join state: a buffered
    * left row is dropped once the right watermark passes
    * `leftTs + maxDelay`, so state stays bounded on unbounded inputs.
    */
  def eventTimeRangeJoin(left: DataFrame, right: DataFrame,
                         leftTs: String, rightTs: String,
                         keyEq: Column, maxDelay: String = "1 minute",
                         watermark: String = "10 seconds",
                         joinType: String = "inner"): DataFrame = {
    val lw = left.withWatermark(leftTs, watermark)
    val rw = right.withWatermark(rightTs, watermark)
    // side-qualified refs, not bare col(): two feeds that both call
    // their event time "ts" (the common case) would otherwise be an
    // AMBIGUOUS_REFERENCE at analysis
    lw.join(rw,
      keyEq &&
        rw(rightTs) >= lw(leftTs) &&
        rw(rightTs) <= lw(leftTs) + expr(s"INTERVAL $maxDelay"),
      joinType)
  }

  /** Left-outer attribution: like [[eventTimeRangeJoin]] but an
    * unmatched left row is EMITTED with nulls once the watermark
    * proves no match can still arrive (impression with no click) —
    * the engine holds it exactly until `leftTs + maxDelay + watermark`
    * and then releases it, so "no match" is a definite, bounded-delay
    * outcome, not an absence.
    */
  def eventTimeRangeJoinOuter(left: DataFrame, right: DataFrame,
                              leftTs: String, rightTs: String,
                              keyEq: Column, maxDelay: String = "1 minute",
                              watermark: String = "10 seconds"): DataFrame =
    eventTimeRangeJoin(left, right, leftTs, rightTs, keyEq, maxDelay,
      watermark, joinType = "left_outer")
}

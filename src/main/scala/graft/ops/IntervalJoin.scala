package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval (overlap) join — points matched to every interval that
  * contains them — an operator Spark has no native plan for: a bare
  * `p.ts >= i.start AND p.ts < i.end` join has no equi-key, so Catalyst
  * plans a BroadcastNestedLoopJoin that goes quadratic the moment the
  * interval side outgrows the broadcast threshold.
  *
  * Implemented by composition (rung (a) of the custom-op ladder) as a
  * BIN-BUCKETED equi-join, the standard scale shape for temporal/
  * genomic overlap joins: time is cut into fixed bins of `binUs`
  * microseconds, each interval is exploded to the bins it covers, each
  * point hashes to exactly ONE bin, and the join becomes
  * `point.bin = interval.bin` (hash-shuffleable, AQE-skew-splittable)
  * with the precise range predicate re-applied as a post-filter.
  * Because a point lives in a single bin, a (point, interval) pair can
  * meet in at most one bin — no duplicate elimination pass is needed.
  *
  * Scale shape at 100 TB: both sides shuffle ONCE on the bin key (or
  * the exploded interval side broadcasts when small); replication is
  * bounded by interval_length/binUs + 1 copies of the interval side
  * only. Pick `binUs` near the typical interval length: much smaller
  * explodes the interval side, much larger degrades bin selectivity
  * toward a cross join within each bin.
  */
object IntervalJoin {

  /** Inner-join `points` to every row of `intervals` whose half-open
    * `[startUs, endUs)` range contains `ptUs`. All three columns are
    * epoch-microsecond longs; column names across the two inputs must
    * be disjoint. Zero-length and inverted intervals match nothing.
    */
  def joinPointsToIntervals(points: DataFrame, ptUs: String,
                            intervals: DataFrame,
                            startUs: String, endUs: String,
                            binUs: Long): DataFrame = {
    require(binUs > 0, s"binUs must be positive, got $binUs")
    // half-open [start, end): the last covered bin is (end-1) DIV bin.
    // sequence() is inclusive and would count BACKWARD for an empty
    // interval, so those are filtered out (they contain no point).
    val binned = intervals
      .filter(col(endUs) > col(startUs))
      .withColumn("_bin", explode(sequence(
        expr(s"$startUs DIV $binUs").cast(LongType),
        expr(s"($endUs - 1) DIV $binUs").cast(LongType))))
    val keyed = points.withColumn("_bin",
      expr(s"$ptUs DIV $binUs").cast(LongType))
    keyed.join(binned, Seq("_bin"))
      .filter(col(ptUs) >= col(startUs) && col(ptUs) < col(endUs))
      .drop("_bin")
  }
}

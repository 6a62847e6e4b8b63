package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  * Implemented by composition (preference rung (a) of the custom-op
  * ladder): union both sides, one pass of `last(..., ignoreNulls)`
  * over a (key, time) window. Semantics match DuckDB's inclusive
  * `ASOF JOIN`: each left row picks the right row with the greatest
  * `rightTime <= leftTime` for its key.
  *
  * Scale shape: ONE shuffle on the key (the window partition), then a
  * linear in-order pass — versus the naive
  * `join + filter + row_number` formulation whose join explodes to
  * |left|×|right-per-key| intermediates before ranking.
  */
object AsOf {

  /** Attach, to every row of `left`, the latest `right` row for the
    * same `key` with right time ≤ left time (inclusive). `rightCols`
    * maps right-column → output alias (null when no earlier right row
    * exists). `tieBreak` must order rows uniquely within a (key, time).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Map[String, String],
               tieBreak: String): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(right.columns.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    val lSide = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(false).as("_isRight"),
      col(tieBreak).as("_tie"), lStruct.as("_l"),
      lit(null).cast(rType).as("_r"))
    val rSide = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(true).as("_isRight"),
      col(tieBreak).as("_tie"), lit(null).cast(lType).as("_l"),
      rStruct.as("_r"))
      // NULL-time or NULL-key right rows can match NOTHING (DuckDB's
      // ASOF semantics: rightTime <= leftTime is never TRUE with a
      // NULL side, and equality keys don't match NULL) — left in the
      // union they'd sort nulls-FIRST and become every early left
      // row's match
      .where(col("_t").isNotNull && col("_k").isNotNull)

    // at equal time, right rows sort first (isRight desc) → inclusive
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_isRight").desc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lSide.unionByName(rSide)
      .withColumn("_match",
        // a NULL-time or NULL-key LEFT row is still EMITTED (left-join
        // shape) but matches nothing, like the oracle
        when(col("_t").isNull || col("_k").isNull,
          lit(null).cast(rType))
          .otherwise(last(col("_r"), ignoreNulls = true).over(w)))
      .filter(!col("_isRight"))

    val outCols = left.columns.map(c => col(s"_l.`$c`").as(c)) ++
      rightCols.map { case (rc, alias) => col(s"_match.`$rc`").as(alias) }
    matched.select(outCols.toSeq: _*)
  }
}

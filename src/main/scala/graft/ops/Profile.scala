package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass data profiling (the deequ/"ANALYZE"-style QA stage every
  * ingest pipeline runs before training): per column — row count,
  * null count, exact distinct count, min/max, and the modal value
  * with its frequency. Output is LONG format (one row per
  * column, keyed `col_name`) so downstream checks join on it.
  *
  * Plan shape at 100 TB: the scalar profile is ONE aggregate pass
  * (Spark plans the k exact `countDistinct`s with a single Expand —
  * k× the scan's rows flow into a map-side-combined aggregate, no
  * per-column scans); the modal values are a second pass — one Expand
  * to (column, value) pairs, a count aggregate keyed on the pair, and
  * a per-column top-1 window over the (already aggregated) counts.
  * Nothing is ever collected; skew is bounded per column by its own
  * value distribution (a near-constant column concentrates its pair
  * key — the count aggregate's map-side combine absorbs it).
  *
  * min/max/top values are rendered as strings so the long schema is
  * uniform; longs and strings render identically across engines
  * (doubles would not — callers profile those via a typed query).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // ---- pass 1: scalar aggregates, one Expand-backed agg ----
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val scal = df.agg(count(lit(1)).as("_n"), aggs: _*)
    // long format via stack — column names are spliced into the SQL
    // string, so escape the two metacharacters that could break or
    // mis-parse it (backticks in identifiers, quotes in the label)
    def qLit(c: String) = "'" + c.replace("'", "''") + "'"
    def qId(c: String) = "`" + c.replace("`", "``") + "`"
    val stacked = scal.select(expr(
      s"stack(${cols.size}, " + cols.map(c =>
        s"${qLit(c)}, _n, _n - ${qId(s"_nn_$c")}, ${qId(s"_nd_$c")}, " +
          s"${qId(s"_mn_$c")}, ${qId(s"_mx_$c")}")
        .mkString(", ") +
        ") as (col_name, n, n_null, n_distinct, min_value, max_value)"))
    // ---- pass 2: modal value per column (nulls excluded) ----
    val pairs = df.select(explode(map(cols.flatMap(c =>
        Seq(lit(c), col(c).cast("string"))): _*))
      .as(Seq("col_name", "value")))
      .filter(col("value").isNotNull)
    // modal value WITHOUT a per-column window: row_number partitioned
    // by col_name funnels every distinct (value, count) pair of a
    // near-unique column through ONE reducer. Two map-side-combined
    // aggregates + a tiny (k-row) broadcast join keep it distributed:
    // max count per column, then the min value AT that count.
    val counts = pairs
      .groupBy(col("col_name"), col("value").as("top_value"))
      .agg(count(lit(1)).as("top_count"))
    val maxPer = counts.groupBy(col("col_name"))
      .agg(max(col("top_count")).as("top_count"))
    val top = counts.join(broadcast(maxPer),
        Seq("col_name", "top_count"))
      .groupBy(col("col_name"), col("top_count"))
      .agg(min(col("top_value")).as("top_value"))
    stacked.join(top, Seq("col_name"), "left")
  }
}

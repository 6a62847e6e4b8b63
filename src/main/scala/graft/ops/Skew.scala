package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities. AQE's skew-join split (enabled in the
  * engine sessions) covers sort-merge joins at runtime; explicit
  * salting remains the tool for aggregations and for joins where one
  * key dominates so heavily that even split partitions hot-spot.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt
    * in [0, salts) derived from a spread expression (default: hash of
    * all non-key columns, so identical hot keys scatter); the small
    * side is replicated ×salts. The shuffle key becomes (key, salt) —
    * a hot key's rows land on `salts` reducers instead of one.
    * Result is row-identical to `big.join(small, key)`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, spread: Option[Column] = None): DataFrame = {
    require(salts >= 1)
    val nonKey = big.columns.filter(_ != key)
    val spreadExpr = spread.getOrElse(
      // a key-only big side has nothing to hash — spread over the key
      // itself (no skew relief, but the join still works and stays
      // row-identical, same as the plain join it replaces)
      if (nonKey.isEmpty) xxhash64(col(key))
      else xxhash64(nonKey.map(col): _*))
    val bigS = big.withColumn("_salt",
      // a NULL spread value (caller passed e.g. a nullable ts) must
      // not make the row vanish from the inner equi-join — that would
      // break the row-identical-to-plain-join contract
      coalesce(pmod(spreadExpr, lit(salts)), lit(0)).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. Expressed
    * here for the count/sum family, which re-aggregates losslessly.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int): DataFrame = {
    require(salts >= 1)
    // the salt must vary PER ROW, not per value: a hot key whose value
    // column is constant (quantity=1, the classic heavy hitter) would
    // otherwise land every row in ONE (key, salt) group and hot-spot
    // the reducer exactly like the plain groupBy. The aggregate result
    // is salt-invariant (sum/count re-aggregate losslessly), so any
    // per-row spread is correct — a partition-local id is free.
    df.withColumn("_salt",
      pmod(xxhash64(col(valueCol), monotonically_increasing_id()),
        lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_c"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_c")).as("cnt"), sum(col("_s")).as("sum_val"))
  }
}

package graft

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input spreading for per-row-expensive operators —
  * guide §2.5's "unsplittable input skew: repartition immediately
  * after the read", applied at the OPERATOR that is about to pay the
  * per-row cost, never blanket at the read.
  *
  * Rationale (measured, round 19): single-row-group parquet files
  * cannot be split, so their scan is ONE task and all pre-shuffle
  * per-row work (wide-schema from_json, banded levenshtein, signature
  * hashing) runs on one core. A blanket repartition at the table
  * loader fixed those stages but was net-negative on the full board:
  * it inflates every CACHED table to cluster-width partitions (paid
  * again by each round of an iterative op) and fans ACID commit
  * writes into many small files. Spreading inside the expensive
  * operator pays the exchange exactly once, immediately before the
  * work it parallelizes, and leaves every other consumer of the scan
  * untouched.
  *
  * At real scale the guard makes this a no-op: any input already at
  * least half as parallel as the cluster is passed through unchanged,
  * so multi-file tables never see the extra exchange.
  */
object Par {

  /** Round-robin repartition to the default parallelism iff the
    * current physical plan has fewer than half that many partitions.
    * Row-multiset identity: repartitioning changes placement only.
    * The partition probe never runs a job on the narrow scan/project
    * inputs these operators see (and any input where the probe cannot
    * be planned — e.g. a streaming source — is passed through).
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts =
      try df.queryExecution.toRdd.getNumPartitions
      catch { case _: Throwable => target }
    if (parts * 2 <= target) df.repartition(target) else df
  }

  /** [[spread]] additionally gated on the optimizer's size estimate —
    * for a bare table scan that estimate is the file size, so tiny
    * dimension tables (whose whole read costs less than an exchange)
    * pass through. For the pure-query gate files that shadow their
    * table loader with this: fact tables spread, `nation`/`region`
    * stay one cheap task, and broadcast sides stay exchange-free.
    */
  def spreadIfLarge(df: DataFrame, minBytes: Long = 1L << 20): DataFrame = {
    val big =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes >=
        BigInt(minBytes)
      catch { case _: Throwable => false }
    if (big) spread(df) else df
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import scala.util.control.NonFatal

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
    * plan's parallelism is provably below half of it. Row-multiset
    * identity: repartitioning changes placement only.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    planParallelism(df) match {
      case Some(parts) if parts * 2 <= target => df.repartition(target)
      case _ => df
    }
  }

  /** Static, job-free parallelism probe. The previous implementation
    * asked `queryExecution.toRdd.getNumPartitions`, which is NOT
    * job-free in general (ADVICE r19): with AQE enabled, an input
    * plan containing an exchange gets an AdaptiveSparkPlanExec whose
    * execute() eagerly materializes every non-result query stage —
    * a real shuffle job ran at probe time and its output was thrown
    * away, once per composed call (gate-loader spread feeding an
    * operator's own spread). This walk never executes anything:
    *   - an explicit shuffling repartition answers with its count;
    *   - a file scan answers with its planned split count (replaying
    *     Spark's FilePartition.maxSplitBytes math over the scan's
    *     file lengths — driver metadata only, listing is cached);
    *   - anything else (joins, aggregates, windows, streaming
    *     sources, local relations) answers None and the input passes
    *     through unchanged — a shuffle-bearing plan already runs its
    *     final stage at spark.sql.shuffle.partitions, and for shapes
    *     the walk cannot see through, not spreading is the
    *     conservative choice.
    */
  private def planParallelism(df: DataFrame): Option[Int] =
    try {
      if (df.isStreaming) None
      else walk(df.queryExecution.optimizedPlan, df)
    } catch { case NonFatal(_) => None }

  private def walk(p: LogicalPlan, df: DataFrame): Option[Int] = p match {
    case n: Project    => walk(n.child, df)
    case n: Filter     => walk(n.child, df)
    case n: Generate   => walk(n.child, df)
    case n: Sample     => walk(n.child, df)
    case n: LocalLimit => walk(n.child, df)
    case u: Union =>
      u.children.foldLeft(Option(0)) {
        case (Some(acc), c) => walk(c, df).map(_ + acc)
        case (None, _)      => None
      }
    case r: Repartition =>
      if (r.shuffle) Some(r.numPartitions)
      else walk(r.child, df).map(math.min(_, r.numPartitions))
    case r: RepartitionByExpression =>
      // no explicit count → shuffle.partitions → already parallel
      r.optNumPartitions.orElse(Some(Int.MaxValue))
    case l: LogicalRelation =>
      l.relation match {
        case fs: HadoopFsRelation => scanSplits(fs, df)
        case _                    => None
      }
    // a materialized RDD (foreachBatch micro-batch, localCheckpoint)
    // knows its partition count as plain metadata — no job. This is
    // what lets a per-row-expensive op inside foreachBatch (e.g. the
    // curation refresh's flag pass) see that its MemoryStream batch
    // arrived as ONE partition.
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      Some(l.rdd.getNumPartitions)
    case _ => None
  }

  /** Planned scan split count: Spark's own sizing formula
    * (FilePartition.maxSplitBytes) applied to the scan's file
    * lengths. Splittable-format assumption is fine here — the result
    * only gates a repartition decision, and over-estimating the
    * parallelism of an unsplittable file merely skips the spread
    * (the conservative direction) once files are maxPartitionBytes-
    * sized or the table is multi-file.
    */
  private def scanSplits(fs: HadoopFsRelation, df: DataFrame): Option[Int] = {
    val conf = df.sparkSession.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val maxBytes = conf.filesMaxPartitionBytes
    val minParts = conf.filesMinPartitionNum
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    val lens = fs.location.listFiles(Nil, Nil)
      .flatMap(_.files.map(_.getLen)).filter(_ > 0)
    if (lens.isEmpty) return Some(0)
    val totalBytes = lens.map(_ + openCost).sum
    val bytesPerCore = totalBytes / math.max(1, minParts)
    val maxSplit =
      math.min(maxBytes, math.max(openCost, bytesPerCore))
    Some(lens.map(len =>
      math.ceil(len.toDouble / maxSplit).toInt).sum)
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
      catch { case NonFatal(_) => false }
    if (big) spread(df) else df
  }
}

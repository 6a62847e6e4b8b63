package graft.pipeline

import graft.fhir.FhirEncoder
import graft.tables.{DeltaExport, Lakehousekeeper, ResourceTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-micro-batch processing — the reference's `process_batch`
  * (bzkf/fhir-to-lakehouse src/bundle_processor.py:79–155) re-expressed
  * Spark-first:
  *
  *   count → isEmpty gate → distinct resource types (driver list) →
  *   per type: filter → latest-wins dedup (W1) → PUT rows → encode (E1)
  *   → create-if-not-exists (S3) → MERGE upsert (J1) → DELETE rows →
  *   MERGE delete (J2) → every `upkeepInterval` batches OPTIMIZE+VACUUM
  *   (J3/J4; batch 0 triggers it, as in the reference — tests rely on
  *   `batch_id % interval == 0`).
  *
  * The only driver-side materialization is the distinct resource-type
  * list (a handful of strings per batch, same as the reference's
  * `.distinct().collect()` at bundle_processor.py:96–99); all row
  * processing is distributed.
  */
final class BatchProcessor(
    tableDir: String,
    upkeepInterval: Int = 50,
    vacuumRetentionMs: Long = 24L * 3600 * 1000,
    clusteringColumns: Map[String, Seq[String]] = Map.empty,
    metrics: BatchMetrics = BatchMetrics.noop,
    logTopicCounts: Boolean = false,
    checkpointInterval: Int = 100, // delta checkpoint_interval, settings.py:48
    // engine-scoped write behavior (never session-global — two engines
    // on one session must not race): None defers to the session conf
    optimizeWrite: Option[Boolean] = None,
    autoCompact: Option[Boolean] = None,
    // in-engine S6: (re-)register each touched table in the catalog
    // per batch, like the reference under metastore_url
    // (bundle_processor.py:212–217)
    registerTables: Boolean = false,
    // keep each touched table's exported _delta_log current per batch,
    // so external delta readers track the stream the way they track
    // the reference's real Delta tables (S8) — incremental, O(files
    // touched by the batch)
    deltaExport: Boolean = false) {

  def tablePath(resourceType: String): String =
    s"$tableDir/$resourceType.parquet"

  /** Process one micro-batch of *prepared* envelope rows (the output of
    * [[BundlePipeline.prepare]]). Returns per-type (upserted, deleted)
    * counts.
    */
  def processBatch(df: DataFrame, batchId: Long): Map[String, (Long, Long)] = {
    // One cached pass serves the A1/A2/A3 driver actions and the
    // per-type filters below; without it every action re-executes the
    // upstream prepare pipeline (source decode + from_json + explode).
    df.persist()
    try processCached(df, batchId) finally df.unpersist()
  }

  private def processCached(
      df: DataFrame, batchId: Long): Map[String, (Long, Long)] = {
    val spark = df.sparkSession
    // A1 + A2 + A3 in ONE job over the cache: per-type counts give the
    // total row count (empty gate) and the distinct type list (driver
    // side, a handful of rows) without a second scan.
    val typeCounts = df.groupBy("resource_type").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1))
    val batchRows = typeCounts.map(_._2).sum
    if (batchRows == 0) return Map.empty
    metrics.batchSize(batchRows)
    val types = typeCounts.flatMap(_._1)

    types.map { rt =>
      val forType = df.filter(col("resource_type") === rt) // P9
      val deduped = BundlePipeline.deduplicate(forType)    // W1
      deduped.cache()
      try {
        // A4 — opt-in per-topic counts, computed per type on the
        // post-dedup rows like the reference's only_latest_df logging
        // (bundle_processor.py:131), not on the raw batch
        if (logTopicCounts)
          deduped.groupBy(col("topic")).count().collect().foreach { r =>
            metrics.topicCount(r.getAs[String]("topic"), r.getAs[Long]("count"))
          }

        val putDf = deduped.filter(col("request_method") === "PUT")
        val encoded = FhirEncoder.encode(putDf, rt)        // E1

        val table = ResourceTable(spark, tablePath(rt), checkpointInterval,
            optimizeWrite, autoCompact)
          .createIfNotExists(encoded.schema,
            clusteringColumns.getOrElse(rt, Seq.empty))    // S3

        val upserted = timeIt(metrics.mergeSeconds) {
          table.upsert(encoded, "id")                      // J1
        }
        metrics.resourcesWritten(rt, upserted)

        val deleteIds = deduped
          .filter(col("request_method") === "DELETE")      // P9
          .select("request_resource_id")
        val deleted =
          if (deleteIds.isEmpty) 0L
          else timeIt(metrics.deleteSeconds) {
            table.deleteMatching(deleteIds, "id")          // J2
          }
        metrics.resourcesDeleted(rt, deleted)

        if (upkeepInterval > 0 && batchId % upkeepInterval == 0) {
          timeIt(metrics.upkeepSeconds) {
            // J3 — Delta OPTIMIZE parity: routine upkeep bin-packs
            // only small files (O(small), no-op when nothing to do);
            // a CLUSTERED table reclusters fully, like OPTIMIZE on
            // liquid-clustering tables. A fixed full rewrite every 50
            // batches would be O(table) write amplification at scale.
            if (clusteringColumns.getOrElse(rt, Seq.empty).nonEmpty)
              table.optimize()
            else table.compactSmallFiles()
            table.vacuum(vacuumRetentionMs)                // J4
          }
        }

        // S6 in-engine: roll the catalog entry forward to this batch's
        // snapshot (after upkeep, so it reflects any compaction). The
        // reference registers per batch under metastore_url with the
        // same retry wrapper (bundle_processor.py:212–217, :325–329);
        // its Delta pointer is static where ours advances, so ours
        // registers after the merge instead of before it — and because
        // the data is already durably committed by then, a registration
        // failure must not crash-loop the stream over a catalog entry:
        // warn loudly and let the next batch (or the CLI) retry.
        if (registerTables)
          try ResourceTable.retry() {
            Lakehousekeeper.registerTable(spark, tablePath(rt)): Unit
          } catch {
            // NonFatal only: an interrupt (query stop) or OOM must
            // propagate, not be logged-and-continued
            case scala.util.control.NonFatal(e) => System.err.println(
              s"catalog registration failed for ${tablePath(rt)} " +
                s"(data committed, entry stale): ${e.getMessage}")
          }
        // same durability stance as registration: the data is already
        // committed, so a failed log mirror must not crash-loop the
        // stream — warn and let the next batch (or the CLI) catch up
        if (deltaExport)
          try DeltaExport.export(table): Unit
          catch {
            case scala.util.control.NonFatal(e) => System.err.println(
              s"delta export failed for ${tablePath(rt)} " +
                s"(data committed, exported log stale): ${e.getMessage}")
          }
        rt -> (upserted, deleted)
      } finally deduped.unpersist()
    }.toMap
  }

  private def timeIt[T](record: Double => Unit)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    record((System.nanoTime() - t0) / 1e9)
    r
  }
}

/** Metric hooks matching the reference's OTel surface
  * (src/metrics.py:37–144): batch sizes, per-type written/deleted
  * counters, delta-op duration histograms.
  */
trait BatchMetrics {
  def batchSize(n: Long): Unit
  def topicCount(topic: String, n: Long): Unit = ()
  def resourcesWritten(resourceType: String, n: Long): Unit
  def resourcesDeleted(resourceType: String, n: Long): Unit
  def mergeSeconds(s: Double): Unit
  def deleteSeconds(s: Double): Unit
  def upkeepSeconds(s: Double): Unit
}

object BatchMetrics {
  val noop: BatchMetrics = new BatchMetrics {
    def batchSize(n: Long): Unit = ()
    def resourcesWritten(resourceType: String, n: Long): Unit = ()
    def resourcesDeleted(resourceType: String, n: Long): Unit = ()
    def mergeSeconds(s: Double): Unit = ()
    def deleteSeconds(s: Double): Unit = ()
    def upkeepSeconds(s: Double): Unit = ()
  }

  /** Simple in-memory accumulator (test/observability default).
    * SYNCHRONIZED: one instance is shared across the N+1 concurrently
    * running streaming queries Engine wires it into, each calling from
    * its own micro-batch thread — unsynchronized read-modify-writes
    * would lose counts and concurrent mutable.Map inserts can corrupt
    * the map (PrometheusBridge uses LongAdder/ConcurrentHashMap for
    * the same hooks for the same reason).
    */
  final class Recording extends BatchMetrics {
    val written = scala.collection.mutable.Map.empty[String, Long]
    val deleted = scala.collection.mutable.Map.empty[String, Long]
    val topics = scala.collection.mutable.Map.empty[String, Long]
    var batches = 0L
    var rows = 0L
    override def topicCount(topic: String, n: Long): Unit =
      synchronized { topics(topic) = topics.getOrElse(topic, 0L) + n }
    def batchSize(n: Long): Unit =
      synchronized { batches += 1; rows += n }
    def resourcesWritten(rt: String, n: Long): Unit =
      synchronized { written(rt) = written.getOrElse(rt, 0L) + n }
    def resourcesDeleted(rt: String, n: Long): Unit =
      synchronized { deleted(rt) = deleted.getOrElse(rt, 0L) + n }
    def mergeSeconds(s: Double): Unit = ()
    def deleteSeconds(s: Double): Unit = ()
    def upkeepSeconds(s: Double): Unit = ()
  }
}

package graft.streaming

import graft.tables.ResourceTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming change-data-feed over a [[ResourceTable]] — the Delta
  * `readChangeFeed`-as-a-stream shape, composed from built-ins: the
  * table's commit LOG is already an append-only stream of files, so a
  * checkpointed file source over `_log/&#42;.commit` turns every
  * committed version into exactly-once streaming input, and the
  * handler receives that version's row-level changes
  * ([[ResourceTable.changes]]: inserts, deletes, update pre/post
  * pairs).
  *
  * Scale shape: an incremental consumer processes only the NEW commits
  * and the data files those commits touched — never a rescan of the
  * table. The file source's own checkpoint makes delivery exactly-once
  * per version across restarts (T3's pattern applied to the feed
  * itself); `cleanupMetadata` trimming old commit files is safe because
  * file sources ignore the disappearance of already-processed input.
  */
object ChangeFeed {

  /** Version number of a commit-file path (`.../_log/<v>.commit`). */
  private def versionOf(path: String): Long =
    path.substring(path.lastIndexOf('/') + 1).stripSuffix(".commit").toLong

  /** Start the feed. `handler` is called once per committed version in
    * ascending order with that version's change rows; version 0 (the
    * empty CREATE TABLE commit) is skipped. `trigger` defaults to
    * drain-everything-then-stop for backfill-style consumption; pass
    * `Trigger.ProcessingTime(...)` to follow the table live.
    * `startingVersion` (Delta CDF's option of the same name) skips the
    * replay of history before it — versions below it are still
    * checkpointed as consumed, just never handled.
    */
  def start(spark: SparkSession, tablePath: String, key: String,
            checkpointDir: String,
            handler: (Long, DataFrame) => Unit,
            trigger: Trigger = Trigger.AvailableNow(),
            startingVersion: Long = 1L): StreamingQuery = {
    val table = ResourceTable(spark, tablePath)
    // SILENT-GAP GUARD: if `cleanupMetadata` trims commit files a
    // lagging consumer has not processed yet, the file source simply
    // never lists them and their changes would vanish from the feed.
    // Track contiguity across micro-batches (within this run — a
    // restart re-anchors at the checkpoint) and fail loudly instead.
    // Operators size cleanupMetadata's keepLast above the worst-case
    // consumer lag, exactly like Delta couples CDF readers to the
    // log retention.
    @volatile var lastSeen = -1L
    spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .option("pathGlobFilter", "*.commit")
      .text(s"$tablePath/_log")
      // the commit BODY rides along unused — the file NAME is the event
      .select(col("_metadata.file_path").as("file"))
      .writeStream
      .queryName(s"changefeed-${versionSafeName(tablePath)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // a micro-batch is a bounded set of commit files (file-source
        // maxFilesPerTrigger semantics); the collect is file NAMES, not
        // data
        val versions = batch.select("file").distinct().collect()
          .map(r => versionOf(r.getString(0))).sorted
        versions.foreach { v =>
          if (lastSeen >= 0 && v > lastSeen + 1)
            throw new IllegalStateException(
              s"change feed gap on $tablePath: versions " +
                s"${lastSeen + 1}..${v - 1} never arrived — commit log " +
                "trimmed under a lagging consumer? raise " +
                "cleanupMetadata keepLast above the consumer lag")
          lastSeen = v
          if (v >= math.max(startingVersion, 1L))
            handler(v, table.changes(v - 1, v, key))
        }: Unit
      }
      .start()
  }

  private def versionSafeName(p: String): String =
    p.replaceAll("[^A-Za-z0-9]+", "-").takeRight(40)
}

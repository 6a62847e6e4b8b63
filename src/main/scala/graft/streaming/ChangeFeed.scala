package graft.streaming

import graft.tables.ResourceTable
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

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
  *
  * The source is `binaryFile`, not `text`, ON PURPOSE: a commit file
  * becomes visible at its atomic create but its bytes land between
  * create and close (the winner-election window —
  * [[ResourceTable]] commit protocol), and the text source emits ZERO
  * rows for a still-empty file while checkpointing it as consumed —
  * that version's changes would be dropped forever. binaryFile emits
  * exactly one row per listed FILE independent of body state, so the
  * event (the file name) always arrives; the body itself is read by
  * [[ResourceTable.changes]] through the deadline-retrying commit
  * reader that already tolerates the in-flight window. `select("path")`
  * prunes the content column, so the source never reads commit bodies
  * at all.
  */
object ChangeFeed {

  /** Version number of a commit-file path (`.../_log/<v>.commit`). */
  private def versionOf(path: String): Long =
    path.substring(path.lastIndexOf('/') + 1).stripSuffix(".commit").toLong

  /** The feed's persisted contiguity high-water mark lives NEXT TO the
    * checkpoint and shares its lifecycle: one empty marker file named
    * by the highest version this consumer has observed. A marker's
    * NAME carries the value, so publication is a single atomic file
    * create — no torn-content window to re-read on restart; older
    * markers are pruned best-effort after each advance.
    */
  private def highWaterDir(checkpointDir: String) =
    new HPath(checkpointDir, "graft-cdf-high-water")

  private def readHighWater(fs: FileSystem, dir: HPath): Option[Long] =
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).map(_.getPath.getName)
        .flatMap(n => scala.util.Try(n.toLong).toOption)
      if (vs.isEmpty) None else Some(vs.max)
    }

  private def advanceHighWater(fs: FileSystem, dir: HPath, v: Long): Unit = {
    fs.mkdirs(dir): Unit
    fs.create(new HPath(dir, v.toString), true).close()
    // best-effort prune; a leftover lower marker is harmless (max wins)
    fs.listStatus(dir).map(_.getPath)
      .filter(p => scala.util.Try(p.getName.toLong).toOption.exists(_ < v))
      .foreach(p => try fs.delete(p, false): Unit catch { case _: Throwable => })
  }

  /** Start the feed. `handler` is called once per committed version in
    * ascending order with that version's change rows; version 0 (the
    * empty CREATE TABLE commit) is skipped. `trigger` defaults to
    * drain-everything-then-stop for backfill-style consumption; pass
    * `Trigger.ProcessingTime(...)` to follow the table live.
    * `startingVersion` (Delta CDF's option of the same name) skips the
    * replay of history before it — versions below it are still
    * checkpointed as consumed, just never handled.
    *
    * SILENT-GAP GUARD: if `cleanupMetadata` trims commit files a
    * lagging consumer has not processed yet, the file source simply
    * never lists them and their changes would vanish from the feed.
    * Contiguity is tracked from the first HANDLED version onward and
    * persisted as a high-water marker beside the checkpoint, so the
    * check survives restarts: a consumer that comes back up after its
    * unprocessed commits were trimmed fails loudly instead of silently
    * re-anchoring. Operators size cleanupMetadata's keepLast above the
    * worst-case consumer lag, exactly like Delta couples CDF readers
    * to the log retention. One deliberate exception: a FRESH consumer
    * (no high-water mark yet) starting on an already-trimmed log
    * treats the earliest retained version as its base snapshot — its
    * delta is uncomputable (the predecessor's manifest is gone) and
    * nothing was ever promised to this consumer, so the feed logs the
    * re-anchor and streams from the next version.
    */
  def start(spark: SparkSession, tablePath: String, key: String,
            checkpointDir: String,
            handler: (Long, DataFrame) => Unit,
            trigger: Trigger = Trigger.AvailableNow(),
            startingVersion: Long = 1L,
            // bound each micro-batch to N commit files (file-source
            // maxFilesPerTrigger): paces a backfill over a long log so
            // one batch never holds thousands of handler invocations
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val table = ResourceTable(spark, tablePath)
    val wmDir = highWaterDir(checkpointDir)
    val wmFs = wmDir.getFileSystem(spark.sessionState.newHadoopConf())
    val floor = math.max(startingVersion, 1L)
    // lastSeen < 1 ⇔ nothing real consumed yet (fresh consumer);
    // version 0 never advances it, so contiguity anchors at the first
    // version ≥ 1 this consumer observes.
    @volatile var lastSeen = readHighWater(wmFs, wmDir).getOrElse(-1L)
    spark.readStream
      .format("binaryFile")
      // the format's own fixed schema — streaming sources refuse to
      // infer, and binaryFile refuses anything BUT this schema
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .option("pathGlobFilter", "*.commit")
      .options(maxFilesPerTrigger
        .map(n => Map("maxFilesPerTrigger" -> n.toString))
        .getOrElse(Map.empty))
      .load(s"$tablePath/_log")
      // the commit BODY is never read — the file NAME is the event
      .select(col("path").as("file"))
      .writeStream
      // smallest-free-suffix like Engine.startQuery: TWO consumers on
      // the same table (the normal multi-consumer CDF pattern, each
      // with its own checkpointDir) must not fight over one
      // session-global query name — and takeRight(40) can collide two
      // distinct long paths. The CHECKPOINT stays caller-scoped, so
      // recovery identity is unaffected by the start order.
      .queryName(Engine.uniqueQueryName(spark,
        s"changefeed-${versionSafeName(tablePath)}"))
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // a micro-batch is a bounded set of commit files (file-source
        // maxFilesPerTrigger semantics); the collect is file NAMES, not
        // data
        val versions = batch.select("file").distinct().collect()
          .map(r => versionOf(r.getString(0))).sorted
        def handleOne(v: Long): Unit = {
          // fresh consumer, first real version, predecessor already
          // trimmed: v is this consumer's base snapshot, not a gap.
          // `v >= floor`, not `>`: an explicit startingVersion that
          // lands exactly on the oldest retained commit must base-
          // snapshot too, not chase its trimmed predecessor
          val baseSnapshot =
            lastSeen < 1 && v >= floor && !table.versionExists(v - 1)
          if (baseSnapshot)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"change feed on $tablePath: log already trimmed below " +
                s"v$v — treating v$v as this consumer's base snapshot, " +
                s"streaming changes from v${v + 1}")
          if (!baseSnapshot && v >= floor)
            handler(v, table.changes(v - 1, v, key))
          if (v >= 1) lastSeen = v
        }
        // persist the contiguous prefix even when a later version
        // throws mid-batch: versions the handler already delivered
        // must not be re-delivered after the operator fixes the cause
        // and restarts (the marker write is the exactly-once record)
        try versions.foreach { v =>
          if (v <= lastSeen) {
            // replay of an already-persisted version: the high-water
            // mark only advances after v was fully handled, so a crash
            // BETWEEN the marker write and Spark's batch commit replays
            // this batch — re-handling would double-deliver and, on a
            // base-snapshotted version, re-drive changes(v-1, v) into
            // a trimmed predecessor and crash-loop. Exactly-once here
            // means skip.
            ()
          } else {
            // the listing skipped versions below v. Two causes, two
            // answers: if the commits EXIST on disk this is a
            // listing-order artifact (mod-time ties, eventually-
            // consistent stores, maxFilesPerTrigger splits) — handle
            // them in order right now; the file source will list
            // them later and the v<=lastSeen skip absorbs the
            // duplicates. Only a commit that is truly ABSENT is a
            // trim — mid-stream that fails loudly as ever; a FRESH
            // consumer (no mark yet) backfills from `floor` instead,
            // where an absent version is simply below its base
            // snapshot. Without the fresh-consumer arm, a first batch
            // that lists a non-prefix of the log (the exact listing
            // artifacts above) would persist a mark ABOVE the missed
            // versions and the skip branch would silently drop them
            // forever.
            val from = if (lastSeen >= 1) lastSeen + 1 else floor
            if (v > from) (from until v).foreach { w =>
              if (!table.versionExists(w)) {
                if (lastSeen >= 1)
                  throw new IllegalStateException(
                    s"change feed gap on $tablePath: version $w never " +
                      s"arrived (high-water mark $lastSeen persisted " +
                      s"at $wmDir) — commit log trimmed under a " +
                      "lagging consumer? raise cleanupMetadata " +
                      "keepLast above the consumer lag")
                // fresh consumer: w is below the retained base — the
                // first existing version base-snapshots in handleOne
              } else handleOne(w)
            }
            handleOne(v)
          }
        } finally {
          // the batch is the replay unit (foreachBatch is
          // at-least-once): a crash before this point replays the
          // batch, and the marker makes the replay skip what was
          // already delivered. The write is BEST-EFFORT in a finally:
          // a transient FS error here must not replace an in-flight
          // exception (losing the actionable gap diagnosis) — a missed
          // advance only costs duplicate-skip work on replay.
          if (lastSeen >= 1)
            try advanceHighWater(wmFs, wmDir, lastSeen)
            catch {
              case scala.util.control.NonFatal(e) =>
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"change feed on $tablePath: high-water marker " +
                    s"write failed (will re-skip on replay): $e")
            }
        }
      }
      .start()
  }

  private def versionSafeName(p: String): String =
    p.replaceAll("[^A-Za-z0-9]+", "-").takeRight(40)
}

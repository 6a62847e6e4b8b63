package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.charset.StandardCharsets

/** A versioned, ACID-ish table over Parquet: immutable snapshot
  * directories plus a Delta-style ordered commit log. This supplies the
  * reference's Delta Lake semantics (bzkf/fhir-to-lakehouse
  * src/bundle_processor.py:168–321) in an environment without the
  * delta-spark jar:
  *
  *  - `createIfNotExists`  ≙ DeltaTable.createIfNotExists (S3)
  *  - `upsert`             ≙ MERGE whenMatchedUpdateAll /
  *                           whenNotMatchedInsertAll (J1)
  *  - `deleteMatching`     ≙ MERGE whenMatchedDelete (J2)
  *  - `optimize`           ≙ OPTIMIZE executeCompaction [+ clusterBy →
  *                           sortWithinPartitions analogue] (J3)
  *  - `vacuum`             ≙ VACUUM retentionHours (J4)
  *
  * Commit protocol: each mutation writes a brand-new *writer-unique*
  * snapshot directory `snap-<v>-<uuid>` then atomically publishes it by
  * *creating* `_log/<v%020d>.commit`, whose body records the dir
  * (create-fails-if-exists ⇒ optimistic concurrency: a losing writer
  * deletes its orphan snapshot and retries on the next version — it can
  * never clobber the winner's already-published files, because no two
  * writers ever share a snapshot dir). Readers list `_log` and follow
  * the highest commit's dir pointer — a consistent snapshot at all
  * times, no locks. Vacuum deletes snapshot dirs older than retention
  * that the current commit does not point to.
  *
  * Scale notes: all data movement is `spark.read.parquet` →
  * `df.write.parquet` — fully distributed, no driver materialization.
  * The upsert is a single `left_anti` join on the key (broadcast when the
  * batch side is small — which it always is here: micro-batches are
  * bounded by maxOffsetsPerTrigger) followed by a union; at cluster scale
  * the rewrite cost is the table scan, same as Delta's
  * merge-on-read-less MERGE. Uses the Hadoop FileSystem API throughout so
  * the same code runs on HDFS/S3A, not just local disk.
  */
final class ResourceTable(val spark: SparkSession, val path: String) {
  import ResourceTable._

  private val root = new HPath(path)
  private def fs: FileSystem =
    root.getFileSystem(spark.sessionState.newHadoopConf())
  private def logDir = new HPath(root, "_log")
  private def commitFile(v: Long) = new HPath(logDir, f"$v%020d.commit")

  /** Test-only seam: runs between the snapshot write and the
    * commit-file create, i.e. inside the optimistic-concurrency window.
    * Lets a spec inject a rival commit to deterministically exercise
    * the create-fails-if-exists conflict path.
    */
  private[tables] var onBeforePublish: () => Unit = () => ()

  def exists: Boolean = fs.exists(logDir) && latestVersion.isDefined

  def latestVersion: Option[Long] = {
    if (!fs.exists(logDir)) return None
    val vs = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.endsWith(".commit"))
      .map(n => n.stripSuffix(".commit").toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Snapshot read of the current table state (S5). */
  def read(): DataFrame = latestVersion match {
    case Some(v) => readVersion(v)
    case None => throw new IllegalStateException(s"no table at $path")
  }

  /** Time travel: read any retained snapshot version (Delta's
    * `versionAsOf`). Vacuumed versions are gone; the commit log keeps
    * the full version history.
    */
  def readVersion(v: Long): DataFrame = {
    val dir = snapshotDirOf(v)
    if (!fs.exists(dir))
      throw new IllegalStateException(
        s"version $v of $path was vacuumed")
    spark.read.schema(schema()).parquet(dir.toString)
  }

  /** Change data feed between two retained versions (Delta CDF's
    * `table_changes` semantics, computed from snapshots): every row is
    * tagged `insert` (key only in `toV`), `delete` (key only in
    * `fromV`, pre-image), or — for keys in both versions with any
    * column changed — an `update_preimage`/`update_postimage` PAIR,
    * like Delta's. The preimages make the feed algebraically complete:
    * any distributive aggregate over the table can be maintained
    * incrementally by adding post-rows and subtracting pre-rows (see
    * q_incremental_agg). Implemented as key anti/semi joins plus
    * full-row EXCEPTs for the update set — all shuffle on the key, no
    * driver-side state, so the diff scales to arbitrarily large
    * snapshots (reference parity: delta CDF via delta-rs,
    * lakehousekeeper.py uses table history the same way).
    */
  def changes(fromV: Long, toV: Long, key: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val from = readVersion(fromV)
    val to = readVersion(toV)
    val inserted = to.join(from, Seq(key), "left_anti")
      .withColumn("_change_type", lit("insert"))
    val deleted = from.join(to, Seq(key), "left_anti")
      .withColumn("_change_type", lit("delete"))
    // images of keys present in both versions whose full row changed:
    // EXCEPT is exact on every column, no per-column compare
    val toBoth = to.join(from.select(col(key)), Seq(key), "left_semi")
    val fromBoth = from.join(to.select(col(key)), Seq(key), "left_semi")
    val post = toBoth.exceptAll(from)
      .withColumn("_change_type", lit("update_postimage"))
    val pre = fromBoth.exceptAll(to)
      .withColumn("_change_type", lit("update_preimage"))
    inserted.unionByName(deleted).unionByName(pre).unionByName(post)
  }

  /** Data-skipping read (Delta stats-based file pruning): files whose
    * commit-log min/max stats prove `filter` can match no row are not
    * even opened; the filter is re-applied row-level after the scan, so
    * results are identical to `read().filter(filter)` — only the IO
    * differs. With clustered optimize() (disjoint key ranges per file)
    * a selective key predicate reads O(1) files instead of the table.
    */
  def read(filter: org.apache.spark.sql.Column): DataFrame = {
    val (kept, _) = pruneFiles(filter)
    if (kept.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema())
    else spark.read.schema(schema()).parquet(kept: _*).filter(filter)
  }

  /** (files read, files total) for `filter` — the skipping telemetry. */
  def pruneInfo(filter: org.apache.spark.sql.Column): (Int, Int) = {
    val (kept, total) = pruneFiles(filter)
    (kept.size, total)
  }

  private def pruneFiles(
      filter: org.apache.spark.sql.Column): (Seq[String], Int) = {
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no table at $path"))
    val dir = snapshotDirOf(v)
    if (!fs.exists(dir))
      throw new IllegalStateException(s"version $v of $path was vacuumed")
    val files = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    val stats = FileStats.fromJson(readFile(commitFile(v)))
    // Resolve the Column against the table schema: the Column DSL
    // builds UnresolvedFunction nodes (">=", "and", …) that only the
    // analyzer turns into the comparison expressions stats understand.
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema())
    val pred = empty.filter(filter).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }
    val kept = files.filter { f =>
      (pred, stats.get(f.getName)) match {
        case (Some(p), Some(st)) => !FileStats.canSkip(p, st)
        case _ => true // no stats / no predicate → never skip
      }
    }
    (kept.map(_.toString), files.size)
  }

  /** Absolute path of the snapshot dir version `v` points to (for
    * external-table registration against the current snapshot).
    */
  def snapshotLocation(v: Long): String = snapshotDirOf(v).toString

  /** The snapshot dir of a committed version comes from its commit
    * file, never from a naming convention: snapshot dirs are
    * writer-unique (`snap-<v>-<uuid>`), so a losing concurrent writer
    * can never overwrite a published snapshot — it only ever touches
    * its own uuid'd dir, which stays orphaned until vacuum.
    */
  private def snapshotDirOf(v: Long): HPath = {
    val cf = commitFile(v)
    if (!fs.exists(cf))
      throw new IllegalStateException(
        s"version $v of $path never existed")
    FileStats.dirOf(readFile(cf)) match {
      case Some(name) => new HPath(root, name)
      case None => throw new IllegalStateException(
        s"corrupt commit file $cf")
    }
  }

  /** Table schema at the current version: the commit body is
    * authoritative (it flips atomically with the data — an
    * upsert(mergeSchema=true) can never publish columns the schema
    * doesn't show); `_meta_schema.json` only serves pre-schema-field
    * commit logs and empty tables.
    */
  def schema(): StructType = {
    val fromCommit = latestVersion.flatMap(v =>
      FileStats.schemaOf(readFile(commitFile(v))))
    DataType.fromJson(fromCommit.getOrElse(
        readFile(new HPath(root, "_meta_schema.json"))))
      .asInstanceOf[StructType]
  }

  def clusterBy(): Seq[String] = {
    val p = new HPath(root, "_meta_cluster.txt")
    if (!fs.exists(p)) Seq.empty
    else readFile(p).split("\n").map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def readFile(p: HPath): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Idempotent table creation from a schema (S3). Properties mirror the
    * reference's Delta table properties surface; clustering columns feed
    * the optimize() sort analogue of liquid clustering.
    */
  def createIfNotExists(schema: StructType,
                        clusterCols: Seq[String] = Seq.empty): ResourceTable = {
    if (!exists) {
      fs.mkdirs(logDir)
      writeFile(new HPath(root, "_meta_schema.json"), schema.json)
      if (clusterCols.nonEmpty)
        writeFile(new HPath(root, "_meta_cluster.txt"),
          clusterCols.mkString("\n"))
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      commit(empty, expectedCurrent = None)
    }
    this
  }

  /** J1 — MERGE upsert: source rows replace target rows with the same
    * key; unmatched source rows are inserted. Correct because the caller
    * (W1 dedup) guarantees key-uniqueness within the source.
    *
    * `mergeSchema = false` (default) pins the table schema like the
    * reference (`delta.schema.autoMerge.enabled=false`, main.py:72):
    * source columns outside the table schema are dropped. With
    * `mergeSchema = true` the table schema widens by the source's new
    * top-level columns (Delta's autoMerge): existing rows read back
    * with nulls in the added columns, and the widened schema is
    * committed atomically with the data — the commit body embeds the
    * snapshot schema, so both flip in the commit file's single atomic
    * create.
    */
  def upsert(source: DataFrame, key: String,
             mergeSchema: Boolean = false): Long = {
    // the source is a bounded micro-batch (maxOffsetsPerTrigger); cache
    // it so the anti-join probe side, the union side, and the returned
    // count are one computation, not three
    val src = source.cache()
    try retry() {
      val cur = latestVersion
      val target = read()
      val newCols = source.schema.fields
        .filterNot(f => target.columns.contains(f.name))
      val wideTarget =
        if (mergeSchema && newCols.nonEmpty)
          newCols.foldLeft(target)((t, f) =>
            t.withColumn(f.name, lit(null).cast(f.dataType)))
        else target
      // The source is a bounded micro-batch; broadcast its key column so
      // the target side never shuffles — at cluster scale the anti-join
      // cost is one broadcast + the (unavoidable) target scan, never a
      // full-table exchange. AQE would usually pick this anyway; the hint
      // makes it deterministic.
      val kept = wideTarget.join(
        broadcast(src.select(key)), Seq(key), "left_anti")
      val next = kept.unionByName(
        src.select(wideTarget.columns.map(col): _*))
      commit(next, cur)
      src.count()
    } finally src.unpersist()
  }

  /** J2 — MERGE delete: drop target rows whose key appears in `ids`
    * (a single-column DataFrame of key values).
    */
  def deleteMatching(ids: DataFrame, key: String): Long = retry() {
    val cur = latestVersion
    val target = read()
    val idsKeyed = ids.toDF(key)
    // same micro-batch contract as upsert: broadcast the id list
    val next = target.join(broadcast(idsKeyed), Seq(key), "left_anti")
    commit(next, cur)
    idsKeyed.count()
  }

  /** J3 — compaction: rewrite the current snapshot into `numFiles`
    * files; when clustering columns are configured, cluster by them —
    * one column: range-partition + sort (classic clustering); several
    * columns: sort by the Z-order key (the `OPTIMIZE ZORDER` / liquid
    * clustering analogue — row-group min/max stats then prune on
    * EVERY clustered column, not just the sort prefix).
    */
  def optimize(numFiles: Int = 4): Unit = retry() {
    val cur = latestVersion
    val df = read()
    val cols = clusterBy()
    val rewritten =
      if (cols.size > 1) {
        graft.functions.ZOrder.withZOrderKey(df, cols)
          .repartitionByRange(numFiles, col("_zorder"))
          .sortWithinPartitions("_zorder")
          .drop("_zorder")
      } else if (cols.size == 1)
        df.repartitionByRange(numFiles, cols.map(col): _*)
          .sortWithinPartitions(cols.map(col): _*)
      else df.repartition(numFiles)
    commit(rewritten, cur)
  }

  /** J4 — vacuum: delete snapshot directories older than
    * `retentionMs` that are no longer current. With `dryRun` the
    * candidates are counted and reported but nothing is deleted
    * (`VACUUM ... DRY RUN` parity, lakehousekeeper.py:167–182).
    */
  def vacuum(retentionMs: Long = 24L * 3600 * 1000,
             dryRun: Boolean = false): Int = {
    val cur = latestVersion.getOrElse(return 0)
    // only the exact dir the current commit points to is protected;
    // same-version orphans from losing writers are collectable
    val curDir = snapshotDirOf(cur).getName
    val cutoff = System.currentTimeMillis() - retentionMs
    val snaps = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snap-"))
    var n = 0
    snaps.foreach { s =>
      if (s.getPath.getName != curDir && s.getModificationTime < cutoff) {
        if (!dryRun) fs.delete(s.getPath, true)
        n += 1
      }
    }
    n
  }

  /** delta-rs `cleanup_metadata` parity: drop commit-log entries whose
    * snapshots were already vacuumed, keeping at least `keepLast`
    * most-recent commits. Bounds log growth on a long-lived table; time
    * travel to a cleaned version fails the same way a vacuumed one
    * does.
    */
  def cleanupMetadata(keepLast: Int = 100): Int = {
    val cur = latestVersion.getOrElse(return 0)
    val commits = fs.listStatus(logDir).map(_.getPath)
      .filter(_.getName.endsWith(".commit"))
      .map(p => p.getName.stripSuffix(".commit").toLong -> p)
      .sortBy(_._1)
    var n = 0
    commits.dropRight(keepLast).foreach { case (v, p) =>
      if (v != cur && !fs.exists(snapshotDirOf(v))) {
        fs.delete(p, false); n += 1
      }
    }
    n
  }

  /** Write `df` as the next snapshot and publish it atomically. The
    * snapshot lands in a writer-unique dir (`snap-<v>-<uuid>`) so two
    * writers racing for the same version never touch each other's
    * files; the commit file — created with overwrite=false — is the
    * only pointer readers follow. If another writer won the race the
    * create throws, this writer's orphan snapshot is deleted, and the
    * caller's retry recomputes against the new state (optimistic
    * concurrency, like Delta).
    */
  private def commit(df: DataFrame, expectedCurrent: Option[Long]): Long = {
    // The commit body embeds the snapshot's schema so schema and data
    // publish in the SAME atomic create (a crash can never leave a
    // committed snapshot whose columns schema() doesn't know about).
    // `_meta_schema.json` remains as the pre-schema-field fallback.
    val next = expectedCurrent.getOrElse(-1L) + 1
    val dir = new HPath(root,
      s"snap-$next-${java.util.UUID.randomUUID().toString.take(8)}")
    // zstd like the reference's compaction writer properties
    // (lakehousekeeper.py:206–214)
    df.write.mode("overwrite").option("compression", "zstd")
      .parquet(dir.toString)
    // per-file min/max/null stats for data skipping, straight from the
    // just-written parquet footers (metadata-only read, no data rescan)
    val conf = spark.sessionState.newHadoopConf()
    val stats = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(p => p.getName -> FileStats.readFooter(conf, p)).toMap
    val statsJson = FileStats.toJsonNode(stats).toString
    onBeforePublish()
    val out =
      try fs.create(commitFile(next), /*overwrite=*/ false)
      catch { case e: Throwable =>
        // lost the race: remove this writer's unpublished snapshot so
        // it doesn't linger until vacuum, then let retry() re-drive
        fs.delete(dir, true)
        throw e
      }
    try out.write(
      s"""{"version":$next,"dir":"${dir.getName}","schema":${df.schema.json},"files":$statsJson}"""
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    next
  }

  private def writeFile(p: HPath, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}

object ResourceTable {
  def apply(spark: SparkSession, path: String): ResourceTable =
    new ResourceTable(spark, path)

  /** J5 — the reference's tenacity retry (exponential backoff ×5) around
    * table commits (bundle_processor.py:240–244).
    */
  def retry[T](attempts: Int = 5, backoffMs: Long = 100)(body: => T): T = {
    var left = attempts
    var backoff = backoffMs
    while (true) {
      try return body
      catch {
        case e: Throwable =>
          if (left <= 1) throw e
          left -= 1
          Thread.sleep(backoff)
          backoff *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Pure merge semantics (J1) as a standalone transformation, used both
    * by `upsert` and directly by the q_merge_upsert gate query: rows of
    * `target` not keyed in `source`, plus all of `source`.
    */
  def mergeUpsert(target: DataFrame, source: DataFrame, key: String): DataFrame =
    target.join(source.select(key), Seq(key), "left_anti")
      .unionByName(source.select(target.columns.map(col): _*))

  /** Pure delete semantics (J2): target rows whose key does NOT appear
    * in `ids`.
    */
  def mergeDelete(target: DataFrame, ids: DataFrame, key: String): DataFrame =
    target.join(ids.toDF(key), Seq(key), "left_anti")
}

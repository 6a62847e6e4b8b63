package graft.tables

import graft.functions.BloomExpressions
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualNullSafe, EqualTo, Expression, In, InSet, Literal}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._

/** File-level Bloom membership index for [[ResourceTable]] — the data
  * structure min/max stats cannot replace: a point lookup on a
  * high-cardinality column that is NOT the clustering key (an id, a
  * URL hash, a foreign key) overlaps every file's [min,max], so stats
  * pruning opens the whole table. A per-file Bloom filter answers
  * "can this file contain value v?" with no false negatives, pruning
  * the scan to the files that might match — Delta's Bloom filter
  * index shape (delta.io bloom-filter-index docs; the reference
  * delegates all file skipping to delta-spark, bundle_processor.py's
  * MERGE path).
  *
  * Layout: one sidecar parquet directory per commit data directory,
  * `_index/<snap-dir>.bloom/`, rows `(dir, file, column, bits)` where
  * `bits` is Spark's stable [[org.apache.spark.util.sketch.BloomFilter]]
  * wire format over `xxhash64(column)` values. The sidecar shares its
  * data directory's lifecycle exactly: built before the commit
  * election (deleted with the directory on a lost race), reaped by
  * vacuum when the directory dies. Files are immutable, so a sidecar
  * never goes stale — a deletion vector only ever ADDS false
  * positives (dead rows still probe true), which the DV filter above
  * the scan already discards.
  *
  * Completeness invariant (what makes skipping SOUND): a sidecar that
  * carries column c for directory d carries a row for EVERY
  * row-bearing data file of d — both sets come from one pass over the
  * just-written directory, and the commit manifest only ever
  * references a subset of those files. So at probe time, a file whose
  * directory is indexed for c but which is absent from the
  * might-contain survivors provably cannot contain any probed value.
  * Directories written before the index was enabled (or before a
  * column was added to it) are simply not in the indexed-dir set —
  * conservatively kept, never wrongly skipped.
  *
  * 100 TB shape: the index is ~1.2% of table bytes at 1% fpp
  * (9.6 bits/row), the build is one distributed column-pruned pass
  * over NEW data only, and the probe is one distributed scan of the
  * index (pushdown on `column`) that collects only the matching file
  * names — a point lookup becomes an index scan plus a handful of
  * file reads instead of a full-table scan. A probe whose survivor
  * set exceeds [[probeKeepCap]] abandons pruning for that column
  * (the predicate wasn't selective; the collect must stay bounded).
  */
object BloomIndex {

  def indexRoot(root: HPath): HPath = new HPath(root, "_index")

  def sidecarPath(root: HPath, dirName: String): HPath =
    new HPath(indexRoot(root), s"$dirName.bloom")

  private def tmpPath(root: HPath, dirName: String): HPath =
    new HPath(indexRoot(root), s".tmp-$dirName.bloom")

  /** xxhash64 seed — must match `functions.xxhash64`'s default (42),
    * which the build job uses on the scan side.
    */
  private val Seed = 42L

  /** Build the sidecar for one freshly written commit directory: one
    * distributed pass over `root/dirName`, grouped by file, one Bloom
    * aggregate per indexed (physical) column, stacked to
    * (dir, file, column, bits) rows. `expectedItems` sizes every
    * file's filter (callers pass the batch's max rows-per-file — the
    * commit path knows it from the footer stats it just read).
    * Columns absent from the written schema are skipped (pre-evolution
    * rewrites). The sidecar publishes by rename, so readers only ever
    * see complete indexes; on any failure the temp dir is removed and
    * the commit proceeds unindexed (the index is an accelerator, never
    * load-bearing for correctness).
    */
  def build(spark: SparkSession, fs: FileSystem, root: HPath,
            dirName: String, physCols: Seq[String],
            expectedItems: Long, fpp: Double): Unit = {
    val dataDir = new HPath(root, dirName)
    val df = spark.read.parquet(dataDir.toString)
    val present = physCols.filter(df.schema.fieldNames.contains)
    if (present.isEmpty) return
    val tmp = tmpPath(root, dirName)
    try {
      val n = math.max(1L, expectedItems)
      val withFile = df.select(
        concat(lit(s"$dirName/"),
          element_at(split(col("_metadata.file_path"), "/"), -1))
          .as("file") +:
          present.map(c => col(c)): _*)
      val aggs = present.map(c => BloomExpressions.bloom_bits_agg(
        when(col(c).isNotNull, xxhash64(col(c))), n, fpp).as(s"b_$c"))
      val grouped = withFile.groupBy(col("file"))
        .agg(aggs.head, aggs.tail: _*)
      val stacked = grouped.select(col("file"),
        explode(array(present.map(c =>
          struct(lit(c).as("column"), col(s"b_$c").as("bits"))): _*))
          .as("e"))
        .select(lit(dirName).as("dir"), col("file"),
          col("e.column").as("column"), col("e.bits").as("bits"))
      // one output file: sidecar rows = files × columns of ONE commit
      // batch — small by construction (the data write that produced
      // them was itself one bounded job)
      stacked.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(tmp, sidecarPath(root, dirName)))
        throw new java.io.IOException(
          s"rename $tmp -> ${sidecarPath(root, dirName)} failed")
    } catch {
      case e: Throwable =>
        try fs.delete(tmp, true) catch { case _: Throwable => () }
        throw e
    }
  }

  /** Remove the sidecar belonging to `dirName` (lost commit election,
    * failed commit publish) — best-effort, mirrors the data-dir
    * cleanup it rides along with.
    */
  def deleteSidecar(fs: FileSystem, root: HPath, dirName: String): Unit = {
    try fs.delete(sidecarPath(root, dirName), true)
    catch { case _: Throwable => () }
    try fs.delete(tmpPath(root, dirName), true)
    catch { case _: Throwable => () }
  }

  /** Extract, from a scan's pushed data filters, the per-column
    * non-null equality probe values the index can serve:
    * `c = lit`, `lit = c`, `c <=> lit` (non-null), `c IN (lits)`.
    * Returns column → xxhash64 hashes of the probed values, for
    * indexed columns only. A filter shape the index can't serve
    * contributes nothing (the stats pruning above still applies).
    * Conjuncts arrive pre-split; nested ANDs are walked anyway.
    */
  def eqHashes(filters: Seq[Expression],
               indexed: Set[String]): Map[String, Seq[Long]] = {
    val out = scala.collection.mutable.Map.empty[String, Vector[Long]]
    // a column where ANY probed value failed to hash is DISQUALIFIED,
    // not narrowed: pruning on the surviving subset would drop files
    // that contain only the unhashable value — a false negative. Null
    // literals are different and sound to skip (`x IN (…, NULL)` is
    // never TRUE where the non-null elements don't match).
    val poisoned = scala.collection.mutable.Set.empty[String]
    def hashOf(a: AttributeReference, v: Any, dt: org.apache.spark.sql
        .types.DataType): Option[Long] =
      try Some(XxHash64Function.hash(v, dt, Seed))
      catch { case scala.util.control.NonFatal(_) =>
        poisoned += a.name; None
      }
    def litHash(a: AttributeReference, l: Literal): Seq[Long] =
      if (l.value == null) Seq.empty
      else hashOf(a, l.value, l.dataType).toSeq
    def add(a: AttributeReference, hs: Seq[Long]): Unit =
      if (indexed(a.name) && hs.nonEmpty)
        out(a.name) = out.getOrElse(a.name, Vector.empty) ++ hs
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a: AttributeReference, l: Literal) =>
        add(a, litHash(a, l))
      case EqualTo(l: Literal, a: AttributeReference) =>
        add(a, litHash(a, l))
      case EqualNullSafe(a: AttributeReference, l: Literal)
          if l.value != null => add(a, litHash(a, l))
      case EqualNullSafe(l: Literal, a: AttributeReference)
          if l.value != null => add(a, litHash(a, l))
      case In(a: AttributeReference, list)
          if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        add(a, list.collect { case l: Literal => l }
          .flatMap(l => litHash(a, l)))
      case InSet(a: AttributeReference, hset) =>
        // the optimizer's large-IN form: raw values, child's type
        add(a, hset.toSeq.filter(_ != null).flatMap(v =>
          hashOf(a, v, a.dataType)))
      case _ => ()
    }
    filters.foreach(walk)
    (out -- poisoned).view.mapValues(_.distinct.toSeq).toMap
  }

  /** Probe the index: for each (indexed, filtered) column, one
    * distributed scan of the sidecars collects (a) the directories
    * the index covers for that column and (b) the files whose filter
    * might contain any probed hash. The returned predicate KEEPS a
    * manifest-relative file path unless every probed column proves it
    * cannot match: its directory is covered and it is not among the
    * survivors. `None` = index can't help (no sidecars, no usable
    * filters, or a survivor set past `keepCap` — never prune on an
    * unbounded collect).
    */
  def probe(spark: SparkSession, fs: FileSystem, root: HPath,
            colHashes: Map[String, Seq[Long]],
            keepCap: Int): Option[String => Boolean] = {
    if (colHashes.isEmpty) return None
    val idx = indexRoot(root)
    val sidecars =
      try fs.listStatus(idx).filter(s =>
          s.isDirectory && s.getPath.getName.endsWith(".bloom") &&
          // an in-flight build's temp dir also ends in .bloom — its
          // overwrite-delete mid-scan must not blow up the probe
          !s.getPath.getName.startsWith("."))
        .map(_.getPath.toString)
      catch { case _: java.io.FileNotFoundException => Array.empty[String] }
    if (sidecars.isEmpty) return None
    // FAILURE ISOLATION: the index is an accelerator, never
    // load-bearing — a sidecar deleted between the listing and the
    // read (lost commit election, vacuum) must degrade to "no
    // pruning", not fail the caller's unrelated SELECT. The build
    // side already has the same NonFatal stance.
    try {
      // one cached read serves every probed column's two passes
      // (dirs + survivors) instead of re-scanning the sidecars 2N×
      val df = spark.read.parquet(sidecars.toIndexedSeq: _*)
        .select(col("column"), col("dir"), col("file"), col("bits"))
        .persist()
      try {
        val perCol = colHashes.flatMap { case (c, hs) =>
          val rows = df.filter(col("column") === c)
          val dirs = rows.select("dir").distinct()
            .collect().map(_.getString(0)).toSet
          if (dirs.isEmpty) None
          else {
            val keep = rows
              .filter(BloomExpressions.bloom_any(col("bits"), hs))
              .select("file").limit(keepCap + 1)
              .collect().map(_.getString(0))
            if (keep.length > keepCap) None // not selective: don't prune
            else Some(c -> ((dirs, keep.toSet)))
          }
        }
        if (perCol.isEmpty) None
        else Some { rel =>
          val slash = rel.lastIndexOf('/')
          val dir = if (slash <= 0) "" else rel.substring(0, slash)
          perCol.values.forall { case (dirs, keep) =>
            !dirs.contains(dir) || keep.contains(rel)
          }
        }
      } finally df.unpersist()
    } catch {
      case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"$root: bloom-index probe failed, scan proceeds unpruned", e)
        None
    }
  }
}

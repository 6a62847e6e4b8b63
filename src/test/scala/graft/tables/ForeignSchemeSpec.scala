package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** A RawLocalFileSystem re-registered under the foreign scheme
  * `graftfs://` — local bytes, but NONE of the `file://` fast paths:
  * `ResourceTable.createExclusive`/`publishExclusive` key their NIO
  * O_EXCL / hard-link branches on the scheme, so everything this spec
  * drives must flow through the Hadoop [[org.apache.hadoop.fs.FileSystem]]
  * API — the same seam an s3a:// or hdfs:// deployment uses.
  */
class GraftFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
  override def getScheme: String = "graftfs"
}

/** Proves no table/export code path hardcodes `file://`, `java.nio`,
  * or `java.io.File` where it must go through the Hadoop FileSystem
  * abstraction (VERDICT r13 item 8): the full create → upsert →
  * delete → optimize → time-travel → CDF → export → vacuum lifecycle
  * runs against a table whose scheme is NOT `file`.
  *
  * What this cannot prove — and the documented fallback for each:
  *
  *  - **Winner election atomicity.** On `file://` the election is an
  *    O_EXCL open; on HDFS/ABFS, `create(overwrite=false)` is atomic
  *    at the store and the generic branch (exercised here) is already
  *    correct. On S3 proper, atomic create-if-absent maps to a
  *    conditional PUT (`If-None-Match: *`, supported since 2024) —
  *    the election seam (`createExclusive`/`publishExclusive`'s
  *    non-file branch) is where that store-specific call plugs in;
  *    nothing outside those two methods participates in elections.
  *  - **Crash-durable publish without link(2).** The hard-link
  *    publish is a `file://`-only upgrade; stores whose
  *    create(overwrite=false) is atomic get body durability from the
  *    store's own single-PUT visibility (an object never appears
  *    half-written), so the torn-write class the hard link fixes
  *    locally does not exist there.
  */
class ForeignSchemeSpec extends SparkSpec {
  import graft.SparkSpec._

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("v", IntegerType)))

  private def df(rows: (String, Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))),
      schema)

  test("full table lifecycle + delta export over a non-file scheme") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftFs].getName)
    val local = tmpDir("gfs")
    val path = s"graftfs://$local/T.parquet"
    val t = ResourceTable(spark, path).createIfNotExists(schema)
    // the seam engaged: not the file:// fast paths
    assert(t.fs.getUri.getScheme == "graftfs")

    t.upsert(df("a" -> 1, "b" -> 2, "c" -> 3), "id")
    val v1 = t.latestVersion.get
    t.upsert(df("b" -> 20, "d" -> 4), "id")
    assert(t.read().count() == 4L)
    assert(t.readVersion(v1).count() == 3L)

    t.deleteWhere(col("id") === "c")
    assert(t.read().count() == 3L)

    // CDF across the delete
    val ch = t.changes(v1, t.latestVersion.get, "id")
    assert(ch.filter(col("_change_type") === "delete").count() == 1L)

    t.optimize(numFiles = 1)
    assert(t.read().count() == 3L)

    // export + the external-reader path, all through graftfs://
    DeltaExport.export(t)
    assert(DeltaExport.readSnapshot(spark, path).count() == 3L)

    // vacuum sweeps the pre-optimize files without breaking the head
    t.vacuum(retentionMs = 0L)
    assert(t.read().count() == 3L)
    assert(t.read().filter(col("id") === "b")
      .collect().head.getInt(1) == 20)
  }

  test("two sequential writers conflict cleanly through the generic " +
      "election branch") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftFs].getName)
    val local = tmpDir("gfsc")
    val path = s"graftfs://$local/T.parquet"
    val t = ResourceTable(spark, path).createIfNotExists(schema)
    t.upsert(df("a" -> 1), "id")
    // a rival commit lands inside the publish window: the generic
    // create(overwrite=false) branch must surface the conflict and
    // the retry wrapper re-drives (same protocol as file://)
    val rival = ResourceTable(spark, path)
    var fired = false
    t.onBeforePublish = () => {
      if (!fired) { fired = true; rival.upsert(df("z" -> 9), "id"): Unit }
    }
    try t.upsert(df("b" -> 2), "id")
    finally t.onBeforePublish = () => ()
    assert(fired)
    assert(t.read().count() == 3L)
    // linear history: every version readable, counts monotone
    val counts = (0L to t.latestVersion.get)
      .map(v => t.readVersion(v).count())
    assert(counts == counts.sorted)
  }
}

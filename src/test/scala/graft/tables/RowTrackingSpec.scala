package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Delta ROW TRACKING (fresh row ids): files get contiguous id ranges
  * off the commit body's high-water mark, row i of a file reads back
  * as `baseRowId + i`, DV deletes keep surviving ids stable, rewrites
  * assign fresh ids and never reuse old ones, concurrent appends
  * (rebase path) never collide, and the export carries baseRowId /
  * defaultRowCommitVersion / the rowTracking+domainMetadata features.
  */
class RowTrackingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def newTable(name: String = "graft_rt"): ResourceTable = {
    val dir = SparkSpec.tmpDir(name)
    ResourceTable(spark, s"$dir/t.parquet")
      .createIfNotExists(schema).enableRowTracking()
  }

  private def df(rows: (Long, String)*) = rows.toDF("k", "v")

  private def idsOf(t: ResourceTable): Map[Long, Long] =
    t.readWithRowIds().collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("_row_id"))).toMap

  test("appends claim contiguous ranges; _row_id = baseRowId + position") {
    val t = newTable()
    t.append(df(1L -> "a", 2L -> "b", 3L -> "c"))
    t.append(df(4L -> "d"))
    val got = t.readWithRowIds()
    assert(got.select("_row_id").as[Long].collect().sorted
      === Array(0L, 1L, 2L, 3L))
    // second batch's single row has the id past the first range
    assert(idsOf(t)(4L) === 3L)
    // commit version rides along per file
    val vers = got.select("k", "_row_commit_version").as[(Long, Long)]
      .collect().toMap
    assert(vers(4L) === 2L && vers(1L) === 1L)
  }

  test("DV delete keeps surviving ids stable") {
    val t = newTable()
    t.enableDeletionVectors()
    t.append(df(1L -> "a", 2L -> "b", 3L -> "c"))
    val before = idsOf(t)
    t.deleteMatching(Seq(2L).toDF("k"), "k")
    val after = idsOf(t)
    assert(after.keySet === Set(1L, 3L))
    assert(after(1L) === before(1L) && after(3L) === before(3L))
  }

  test("rewrites assign FRESH ids past the mark; untouched files keep theirs") {
    val t = newTable()
    t.append(df(1L -> "a", 2L -> "b"))
    val before = idsOf(t)
    t.upsert(df(2L -> "B"), "k") // rewrites only the overlapping file(s)
    val ids = idsOf(t)
    // the rewritten row's old id is burned: it re-reads at/above the
    // mark (2 rows assigned so far), never recycled
    assert(ids(2L) >= 2L && ids(2L) != before(2L))
    // a row whose file did not overlap carries its id unchanged; if
    // both rows shared one file, it was rewritten too and moved up
    assert(ids(1L) == before(1L) || ids(1L) >= 2L)
    assert(ids.values.toSeq.distinct.size === 2)
  }

  test("copy-forward commits carry the mark; refusal before opt-in backfill") {
    val dir = SparkSpec.tmpDir("graft_rt_pre")
    val t = ResourceTable(spark, s"$dir/t.parquet").createIfNotExists(schema)
    t.append(df(1L -> "a")) // pre-enablement file: no id range
    t.enableRowTracking()
    t.append(df(2L -> "b"))
    val e = intercept[IllegalArgumentException](t.readWithRowIds())
    assert(e.getMessage.contains("predate row tracking"))
    t.optimize(numFiles = 1) // the documented backfill: rewrite
    assert(t.readWithRowIds().select("_row_id").as[Long].collect().sorted
      .length === 2)
  }

  test("concurrent appends never collide (rebase recomputes off the new head)") {
    val t = newTable()
    val rival = ResourceTable(spark, t.path)
    t.onBeforePublish = () => {
      t.onBeforePublish = () => ()
      rival.append(df(10L -> "r1", 11L -> "r2"))
    }
    t.append(df(20L -> "l1", 21L -> "l2", 22L -> "l3"))
    val ids = idsOf(t)
    assert(ids.size === 5)
    assert(ids.values.toSeq.distinct.size === 5, s"id collision: $ids")
    assert(ids.values.toSeq.sorted === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("shallow clone carries the mark: new clone files never collide") {
    val t = newTable()
    t.append(df(1L -> "a", 2L -> "b"))
    val tgt = SparkSpec.tmpDir("graft_rt_clone")
    val c = t.shallowCloneTo(s"$tgt/c.parquet")
    c.append(df(3L -> "c"))
    val ids = c.readWithRowIds().collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("_row_id"))).toMap
    assert(ids.size === 3)
    assert(ids.values.toSeq.distinct.size === 3, s"id collision: $ids")
    assert(ids(3L) === 2L) // continues past the cloned range
  }

  test("export carries baseRowId + features + rowIdHighWaterMark domain") {
    val t = newTable()
    t.append(df(1L -> "a", 2L -> "b"))
    DeltaExport.export(t)
    val logDir = new java.io.File(
      t.path.stripPrefix("file:"), "_delta_log")
    val all = logDir.listFiles().filter(_.getName.endsWith(".json"))
      .sorted.flatMap(fl =>
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(fl.toPath)).asScala)
      .mkString("\n")
    assert(all.contains("\"baseRowId\":0"))
    assert(all.contains("\"defaultRowCommitVersion\":1"))
    assert(all.contains("\"rowTracking\""))
    assert(all.contains("\"domainMetadata\""))
    assert(all.contains("\\\"rowIdHighWaterMark\\\":1"))
    assert(all.contains("\"delta.enableRowTracking\":\"true\""))
    assert(all.contains("\"minWriterVersion\":7"))
    // the exported snapshot still round-trips through the reader
    assert(DeltaExport.readSnapshot(spark, t.path).count() === 2L)
  }
}

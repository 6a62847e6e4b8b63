package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Column mapping (Delta name mode): metadata-only RENAME/DROP COLUMN,
  * physical-name-stable files, stats pruning across renames, and the
  * name-mode _delta_log export round trip.
  */
class ColumnMappingSpec extends SparkSpec {
  import graft.SparkSpec._

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("v", IntegerType)))

  private def df(rows: (String, Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)

  private def table(prefix: String): ResourceTable = {
    val t = ResourceTable(spark, s"${tmpDir(prefix)}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df("a" -> 1, "b" -> 2, "c" -> 30), "id")
    t
  }

  test("rename is metadata-only: one commit, zero files touched, reads follow") {
    val t = table("cm")
    t.enableColumnMapping()
    val filesBefore = t.fileManifest(t.latestVersion.get)
    val v = t.latestVersion.get
    t.renameColumn("v", "value")
    assert(t.latestVersion.contains(v + 1))
    assert(t.fileManifest(v + 1) == filesBefore,
      "rename must not touch a single data file")
    assert(t.schema().fieldNames.toSeq == Seq("id", "value"))
    assert(t.read().select("id", "value").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 1, "b" -> 2, "c" -> 30))
    // time travel reads the OLD name at the old version
    assert(t.readVersion(v).schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("stats pruning and filtered reads survive a rename") {
    val t = table("cmprune")
    t.enableColumnMapping()
    t.renameColumn("id", "doc")
    // filtered read on the NEW logical name, pruned via PHYSICAL stats
    assert(t.read(col("doc") === "b").collect().map(_.getInt(1)).toSeq
      == Seq(2))
    val (kept, total) = t.pruneInfo(col("doc") === "zzz_nothing")
    assert(total > 0 && kept == 0,
      s"stats must prune on the physical key after rename ($kept/$total)")
  }

  test("writes after rename store physical names; merges stay file-granular") {
    val t = table("cmwrite")
    t.enableColumnMapping()
    t.renameColumn("v", "value")
    t.upsert(df("b" -> 20, "d" -> 4).toDF("id", "value"), "id")
    assert(t.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 1, "b" -> 20, "c" -> 30, "d" -> 4))
    // the new file's footer stats key the PHYSICAL names
    val newest = t.fileListAt(t.latestVersion.get)
      .filter(_._1.contains(s"snap-${t.latestVersion.get}"))
    assert(newest.nonEmpty &&
      newest.forall(f => f._2.cols.contains("id") &&
        f._2.cols.contains("v") && !f._2.cols.contains("value")))
  }

  test("dropColumn is metadata-only and dropped bytes never resurrect") {
    val t = table("cmdrop")
    t.enableColumnMapping()
    val files = t.fileManifest(t.latestVersion.get)
    t.dropColumn("v")
    assert(t.fileManifest(t.latestVersion.get) == files)
    assert(t.schema().fieldNames.toSeq == Seq("id"))
    assert(t.read().columns.toSeq == Seq("id"))
    // re-adding the same LOGICAL name maps to a FRESH physical column:
    // the orphaned old bytes must read as null for pre-existing rows
    t.upsert(df("z" -> 99), "id", mergeSchema = true)
    val got = t.read().collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("z") == Some(99))
    assert(got("a").isEmpty && got("b").isEmpty && got("c").isEmpty,
      s"dropped column bytes resurrected: $got")
  }

  test("refusals: no mapping, duplicate names, cluster and constraint refs") {
    val bare = table("cmref")
    intercept[IllegalStateException](bare.renameColumn("v", "w"))
    intercept[IllegalStateException](bare.dropColumn("v"))
    val t = ResourceTable(spark, s"${tmpDir("cmref2")}/T.parquet")
      .createIfNotExists(schema, clusterCols = Seq("id"))
    t.upsert(df("a" -> 1), "id")
    t.enableColumnMapping()
    intercept[IllegalArgumentException](t.renameColumn("id", "key"))
    t.addCheckConstraint("v_pos", "v >= 0")
    intercept[IllegalArgumentException](t.renameColumn("v", "w"))
    t.dropCheckConstraint("v_pos")
    t.renameColumn("v", "w")
    intercept[IllegalArgumentException](t.renameColumn("w", "id"))
    intercept[IllegalArgumentException](t.dropColumn("nope"))
  }

  test("deletion vectors work across a rename") {
    val t = table("cmdv")
    t.enableColumnMapping().enableDeletionVectors()
    t.renameColumn("v", "value")
    t.deleteMatchingDv(df("b" -> 0).toDF("id", "value").select("id"), "id")
    assert(t.read().collect().map(_.getString(0)).toSet == Set("a", "c"))
  }

  test("name-mode delta export round-trips through readSnapshot") {
    val t = table("cmdx")
    t.enableColumnMapping()
    t.renameColumn("v", "value")
    t.upsert(df("d" -> 4).toDF("id", "value"), "id")
    DeltaExport.export(t)
    val back = DeltaExport.readSnapshot(spark, t.path)
    assert(back.schema.fieldNames.toSeq == Seq("id", "value"),
      "delta reader must surface LOGICAL names")
    assert(back.collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 1, "b" -> 2, "c" -> 30, "d" -> 4))
    // the exported log speaks Delta's own column-mapping dialect
    val log = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      t.path, "_delta_log", "%020d.json".format(0L))).toArray.mkString
    assert(log.contains("\"delta.columnMapping.mode\":\"name\""))
    assert(log.contains("delta.columnMapping.physicalName"))
    assert(!log.contains("graft.columnMapping"),
      "internal metadata keys must not leak into the delta log")
  }
}

package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** V2 (UUID-named) checkpoint WRITING — opt-in via
  * `spark.graft.export.checkpointV2=true`: sidecar layout, manifest
  * actions, protocol feature demand, and replay self-sufficiency.
  */
class V2CheckpointWriteSpec extends SparkSpec {
  import graft.SparkSpec._

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("v", IntegerType)))

  private def df(rows: (String, Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)

  private def withV2[A](f: => A): A = {
    spark.conf.set("spark.graft.export.checkpointV2", "true")
    try f finally spark.conf.unset("spark.graft.export.checkpointV2")
  }

  private def logFiles(path: String): Seq[String] = {
    val d = Paths.get(path, "_delta_log")
    Files.list(d).iterator().asScala.map(_.getFileName.toString).toSeq
  }

  test("v2 checkpoint: uuid manifest + sidecars, reader replays it") {
    val path = s"${tmpDir("v2ck")}/T.parquet"
    val t = ResourceTable(spark, path).createIfNotExists(schema)
    t.upsert(df("k0" -> 0), "id")
    DeltaExport.export(t) // anchor delta v0; checkpoint not yet due
    (1 to 10).foreach(i => t.upsert(df(s"k$i" -> i), "id"))
    withV2 { DeltaExport.export(t) } // delta v10 -> v2 checkpoint
    val names = logFiles(path)
    val manifest = names.filter(_.matches(
      """\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet"""))
    assert(manifest.size == 1, s"expected one uuid manifest in $names")
    assert(names.forall(!_.endsWith(".checkpoint.parquet")),
      "v2 mode must not also write a classic checkpoint")
    val sidecars = Files.list(Paths.get(path, "_delta_log", "_sidecars"))
      .iterator().asScala.map(_.getFileName.toString)
      .filterNot(_.startsWith(".")).toSeq
    assert(sidecars.nonEmpty && sidecars.forall(_.endsWith(".parquet")))
    // the manifest carries checkpointMetadata + sidecar + protocol
    // rows and NO file actions (they live in the sidecars)
    val m = spark.read.parquet(
      s"$path/_delta_log/${manifest.head}")
    assert(m.columns.contains("checkpointMetadata"))
    assert(m.filter("checkpointMetadata.version = 10").count() == 1)
    assert(m.filter("sidecar IS NOT NULL").count() == sidecars.size)
    assert(m.filter("add IS NOT NULL").count() == 0)
    val proto = m.filter("protocol IS NOT NULL")
      .select("protocol.readerFeatures").head.getSeq[String](0)
    assert(proto.contains("v2Checkpoint"))
    // replay equals the direct table read
    val got = DeltaExport.readSnapshot(spark, path).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == (0 to 10).map(i => s"k$i" -> i).toMap)
  }

  test("v2 checkpoint is the self-sufficient replay base after log cleanup") {
    val path = s"${tmpDir("v2ckc")}/T.parquet"
    val t = ResourceTable(spark, path).createIfNotExists(schema)
    t.upsert(df("k0" -> 0), "id")
    DeltaExport.export(t)
    (1 to 10).foreach(i => t.upsert(df(s"k$i" -> i), "id"))
    withV2 { DeltaExport.export(t) }
    t.upsert(df("tail" -> 99), "id")
    DeltaExport.export(t) // plain tail entry after the v2 checkpoint
    // drop every pre-checkpoint json entry — replay must not miss it
    DeltaExport.cleanupLog(t, retentionMs = 0)
    val got = DeltaExport.readSnapshot(spark, path).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == ((0 to 10).map(i => s"k$i" -> i).toMap + ("tail" -> 99)))
  }

  test("cleanup reaps superseded v2 sidecars but never the live ones") {
    val path = s"${tmpDir("v2gc")}/T.parquet"
    val t = ResourceTable(spark, path).createIfNotExists(schema)
    t.upsert(df("k0" -> 0), "id")
    DeltaExport.export(t)
    (1 to 10).foreach(i => t.upsert(df(s"k$i" -> i), "id"))
    withV2 { DeltaExport.export(t) } // v2 checkpoint at delta v10
    val scDir = Paths.get(path, "_delta_log", "_sidecars")
    def sidecars() = Files.list(scDir).iterator().asScala
      .map(_.getFileName.toString).filterNot(_.startsWith(".")).toSet
    val first = sidecars()
    (11 to 20).foreach(i => t.upsert(df(s"k$i" -> i), "id"))
    withV2 { DeltaExport.export(t) } // second v2 checkpoint at v20
    val both = sidecars()
    assert(first.subsetOf(both) && both.size > first.size)
    DeltaExport.cleanupLog(t, retentionMs = 0)
    val after = sidecars()
    assert((after & first).isEmpty,
      s"superseded sidecars must reap: kept ${after & first}")
    assert((both -- first).subsetOf(after),
      "live checkpoint's sidecars must survive cleanup")
    // and the cleaned log still replays from the live checkpoint
    val got = DeltaExport.readSnapshot(spark, path).count()
    assert(got == 21L)
  }

  test("a torn v2 publish (manifest missing) leaves the log readable") {
    val path = s"${tmpDir("v2torn")}/T.parquet"
    val t = ResourceTable(spark, path).createIfNotExists(schema)
    t.upsert(df("k0" -> 0), "id")
    DeltaExport.export(t)
    (1 to 10).foreach(i => t.upsert(df(s"k$i" -> i), "id"))
    withV2 { DeltaExport.export(t) }
    // simulate the crash window: sidecars + pointer published, the
    // uuid manifest gone
    val manifest = logFiles(path).find(_.matches(
      """\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet""")).get
    Files.delete(Paths.get(path, "_delta_log", manifest))
    // the pointer now names a checkpoint with no complete file set —
    // readers treat it as a hint and fall back to full json replay
    val got = DeltaExport.readSnapshot(spark, path).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == (0 to 10).map(i => s"k$i" -> i).toMap)
  }

  test("checkpoint metaData carries the delta column-mapping dialect") {
    val path = s"${tmpDir("v2cm")}/T.parquet"
    val t = ResourceTable(spark, path).createIfNotExists(schema)
    t.upsert(df("a" -> 1), "id")
    DeltaExport.export(t) // anchor
    t.enableColumnMapping()
    t.renameColumn("v", "value")
    (0 to 7).foreach(i =>
      t.upsert(df(s"k$i" -> i).toDF("id", "value"), "id"))
    withV2 { DeltaExport.export(t) } // 10 deltas past the anchor
    val manifest = logFiles(path).filter(_.matches(
      """\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet""")).head
    val meta = spark.read.parquet(s"$path/_delta_log/$manifest")
      .filter("metaData IS NOT NULL")
      .select("metaData.schemaString", "metaData.configuration").head
    assert(meta.getString(0).contains("delta.columnMapping.physicalName"))
    assert(!meta.getString(0).contains("graft.columnMapping"))
    assert(meta.getMap[String, String](1)
      .get("delta.columnMapping.mode").contains("name"))
    val proto = spark.read.parquet(s"$path/_delta_log/$manifest")
      .filter("protocol IS NOT NULL")
      .select("protocol.readerFeatures").head.getSeq[String](0)
    assert(proto.contains("columnMapping"))
    // and the round trip still reads logical names
    assert(DeltaExport.readSnapshot(spark, path)
      .schema.fieldNames.toSeq == Seq("id", "value"))
  }
}

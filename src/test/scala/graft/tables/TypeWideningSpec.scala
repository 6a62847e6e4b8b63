package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type widening (Delta's `typeWidening` feature): a mergeSchema write
  * whose source carries a LOSSLESSLY wider primitive type widens the
  * TABLE schema in place — existing narrow files are never rewritten
  * (the parquet readers upcast on scan) — while a narrower source
  * upcasts to the table type, and anything lossy refuses loudly.
  * The widened field records `delta.typeChanges`, the export demands
  * the typeWidening reader feature, and the standalone reader serves
  * the mixed-width files under the widened schema.
  */
class TypeWideningSpec extends SparkSpec {
  import graft.SparkSpec._

  private val intSchema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", IntegerType)))

  private def intTable(dir: String): ResourceTable = {
    val rt = ResourceTable(spark, s"$dir/T.parquet")
      .createIfNotExists(intSchema)
    rt.append(spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until 10).map(i => Row(i.toLong, i * 100))),
      intSchema))
    rt
  }

  private def longBatch(from: Int, n: Int) = {
    import spark.implicits._
    (from until from + n).map(i => (i.toLong, i * 100L)).toDF("k", "v")
  }

  test("upsert(mergeSchema) widens int→long; old files read in place") {
    val rt = intTable(tmpDir("tw1"))
    rt.upsert(longBatch(8, 4), "k", mergeSchema = true)
    val s = rt.schema()
    assert(s("v").dataType == LongType)
    assert(s("v").metadata.contains("delta.typeChanges"))
    val tc = s("v").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.length == 1 && tc(0).getString("fromType") == "integer"
      && tc(0).getString("toType") == "long")
    // 0..11 present; rows 0..7 come from the ORIGINAL int32 file
    val got = rt.read().orderBy("k").collect()
    assert(got.length == 12)
    assert(got.map(_.getLong(1)).toSeq == (0 until 12).map(_ * 100L))
    // stats skipping still prunes on the widened column
    assert(rt.read(col("v") === 1100L).count() == 1)
    // time travel serves the pre-widening version under its own schema
    assert(rt.readVersion(1).schema("v").dataType == IntegerType)
  }

  test("narrower source upcasts to the table type without mergeSchema") {
    val dir = tmpDir("tw2")
    val rt = ResourceTable(spark, s"$dir/T.parquet")
      .createIfNotExists(StructType(Seq(
        StructField("k", LongType), StructField("v", LongType))))
    import spark.implicits._
    val intSrc = Seq((1, 10), (2, 20)).toDF("k", "v") // INT source
    rt.upsert(intSrc, "k")
    assert(rt.schema()("v").dataType == LongType)
    assert(rt.read().agg(sum("v")).collect()(0).getLong(0) == 30L)
    rt.append(Seq((3, 30)).toDF("k", "v"))
    assert(rt.read().count() == 3)
  }

  test("wider source without mergeSchema refuses with the widening hint") {
    val rt = intTable(tmpDir("tw3"))
    val e = intercept[IllegalArgumentException] {
      rt.upsert(longBatch(0, 2), "k")
    }
    assert(e.getMessage.contains("mergeSchema=true"))
    // lossy pairing (string → int) is refused outright
    import spark.implicits._
    val bad = Seq(("1", "x")).toDF("k", "v")
    val e2 = intercept[IllegalArgumentException] {
      rt.upsert(bad, "k", mergeSchema = true)
    }
    assert(e2.getMessage.contains("no lossless conversion"))
  }

  test("append(mergeSchema) widens float→double") {
    val dir = tmpDir("tw4")
    val fs = StructType(Seq(
      StructField("k", LongType), StructField("x", FloatType)))
    val rt = ResourceTable(spark, s"$dir/T.parquet").createIfNotExists(fs)
    rt.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 1.5f), Row(2L, 2.5f))), fs))
    import spark.implicits._
    rt.append(Seq((3L, 3.5d)).toDF("k", "x"), mergeSchema = true)
    assert(rt.schema()("x").dataType == DoubleType)
    assert(rt.read().orderBy("k").collect().map(_.getDouble(1)).toSeq
      == Seq(1.5, 2.5, 3.5))
  }

  test("export demands typeWidening and the standalone reader serves it") {
    val dir = tmpDir("tw5")
    val rt = intTable(dir)
    rt.upsert(longBatch(8, 4), "k", mergeSchema = true)
    DeltaExport.export(rt)
    // protocol carries the feature on BOTH lists
    val log = new java.io.File(s"$dir/T.parquet/_delta_log")
      .listFiles().filter(_.getName.endsWith(".json"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
      .mkString("\n")
    assert(log.contains("typeWidening"))
    val back = DeltaExport.readSnapshot(spark, s"$dir/T.parquet")
    assert(back.schema("v").dataType == LongType)
    assert(back.orderBy("k").collect().map(_.getLong(1)).toSeq
      == (0 until 12).map(_ * 100L))
  }

  test("second widening appends to typeChanges (byte→short→int chain)") {
    val dir = tmpDir("tw6")
    val s0 = StructType(Seq(
      StructField("k", LongType), StructField("v", ShortType)))
    val rt = ResourceTable(spark, s"$dir/T.parquet").createIfNotExists(s0)
    rt.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 1.toShort))), s0))
    import spark.implicits._
    rt.append(Seq((2L, 2)).toDF("k", "v"), mergeSchema = true) // → int
    rt.append(Seq((3L, 3L)).toDF("k", "v"), mergeSchema = true) // → long
    val tc = rt.schema()("v").metadata
      .getMetadataArray("delta.typeChanges")
    assert(tc.map(m => (m.getString("fromType"), m.getString("toType")))
      .toSeq == Seq(("short", "integer"), ("integer", "long")))
    assert(rt.read().agg(sum("v")).collect()(0).getLong(0) == 6L)
  }
}

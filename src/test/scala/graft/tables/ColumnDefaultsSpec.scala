package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column DEFAULT values (Delta's `allowColumnDefaults` writer
  * feature): `ALTER COLUMN ... SET DEFAULT` is a metadata-only commit
  * storing the SQL text as `CURRENT_DEFAULT` field metadata; a write
  * batch that OMITS the column gets the default computed in its
  * place, a batch that PROVIDES the column (even as NULL) passes
  * through untouched, and the export fences unaware writers with the
  * feature while carrying the metadata verbatim.
  */
class ColumnDefaultsSpec extends SparkSpec {
  import graft.SparkSpec._
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", LongType),
    StructField("src", StringType)))

  private def mk(dir: String): ResourceTable = {
    val rt = ResourceTable(spark, s"$dir/T.parquet")
      .createIfNotExists(schema)
    rt.append(Seq((1L, 10L, "seed")).toDF("k", "v", "src"))
    rt
  }

  test("omitted column fills the default on append and upsert") {
    val rt = mk(tmpDir("cd1"))
    rt.setColumnDefault("src", "'direct'")
    assert(rt.columnDefaults() == Map("src" -> "'direct'"))
    rt.append(Seq((2L, 20L)).toDF("k", "v"))
    rt.upsert(Seq((3L, 30L)).toDF("k", "v"), "k")
    val got = rt.read().orderBy("k").collect()
    assert(got.map(_.getString(2)).toSeq == Seq("seed", "direct", "direct"))
  }

  test("provided column — even NULL — wins over the default") {
    val rt = mk(tmpDir("cd2"))
    rt.setColumnDefault("src", "'direct'")
    rt.append(Seq((2L, 20L, null: String)).toDF("k", "v", "src"))
    val r = rt.read().filter(col("k") === 2L).collect()(0)
    assert(r.isNullAt(2))
  }

  test("default is versioned with the schema; drop removes it") {
    val rt = mk(tmpDir("cd3"))
    val vSet = rt.setColumnDefault("src", "'direct'")
    rt.append(Seq((2L, 20L)).toDF("k", "v"))
    rt.dropColumnDefault("src")
    assert(rt.columnDefaults().isEmpty)
    // a post-drop append omitting the column now refuses (no default
    // to fill, and the table schema demands the column)
    intercept[Exception] { rt.append(Seq((4L, 40L)).toDF("k", "v")) }
    // time travel: the version written under the default still reads
    assert(rt.read().filter(col("k") === 2L)
      .collect()(0).getString(2) == "direct")
    assert(rt.readVersion(vSet).schema("src")
      .metadata.contains(ResourceTable.DefaultKey))
  }

  test("non-constant or non-castable defaults refuse") {
    val rt = mk(tmpDir("cd4"))
    val e1 = intercept[IllegalArgumentException] {
      rt.setColumnDefault("src", "concat(src, 'x')")
    }
    assert(e1.getMessage.contains("constant"))
    val e2 = intercept[IllegalArgumentException] {
      rt.setColumnDefault("v", "'not-a-number'")
    }
    assert(e2.getMessage.contains("does not cast"))
    intercept[IllegalArgumentException] {
      rt.setColumnDefault("nope", "1")
    }
  }

  test("constant expressions (not just literals) are allowed") {
    val rt = mk(tmpDir("cd5"))
    rt.setColumnDefault("v", "10 * 5 + 0")
    rt.append(Seq((2L, "x")).toDF("k", "src"))
    assert(rt.read().filter(col("k") === 2L)
      .collect()(0).getLong(1) == 50L)
  }

  test("export carries allowColumnDefaults + CURRENT_DEFAULT verbatim") {
    val dir = tmpDir("cd6")
    val rt = mk(dir)
    rt.setColumnDefault("src", "'direct'")
    rt.append(Seq((2L, 20L)).toDF("k", "v"))
    DeltaExport.export(rt)
    val log = new java.io.File(s"$dir/T.parquet/_delta_log")
      .listFiles().filter(_.getName.endsWith(".json"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
      .mkString("\n")
    assert(log.contains("allowColumnDefaults"))
    assert(log.contains("CURRENT_DEFAULT"))
    val back = DeltaExport.readSnapshot(spark, s"$dir/T.parquet")
    assert(back.orderBy("k").collect().map(_.getString(2)).toSeq
      == Seq("seed", "direct"))
  }

  test("clustered table exports the clustering feature + domain") {
    val dir = tmpDir("cd7")
    val rt = ResourceTable(spark, s"$dir/C.parquet")
      .createIfNotExists(schema, clusterCols = Seq("k"))
    rt.append(Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "src"))
    DeltaExport.export(rt)
    val log = new java.io.File(s"$dir/C.parquet/_delta_log")
      .listFiles().filter(_.getName.endsWith(".json"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
      .mkString("\n")
    assert(log.contains("\"clustering\""))
    assert(log.contains("delta.clustering"))
    assert(log.contains("clusteringColumns"))
    // still readable by the standalone reader (writer-only features)
    assert(DeltaExport.readSnapshot(spark, s"$dir/C.parquet").count() == 2)
  }

  test("defaults compose with generated and identity guards") {
    val rt = mk(tmpDir("cd8"))
    rt.addGeneratedColumn("v", "k * 10")
    intercept[IllegalArgumentException] {
      rt.setColumnDefault("v", "7")
    }
  }
}

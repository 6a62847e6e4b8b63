package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** GENERATED ALWAYS AS IDENTITY parity (reference delegates this to
  * delta-spark; Delta PROTOCOL.md "Identity Columns"): writes may not
  * provide the column, each batch gets fresh unique values continuing
  * from the high-water mark, concurrent writers never double-allocate,
  * declaration refuses on non-empty tables / non-LONG columns, and the
  * exported log carries `delta.identity.*` field metadata + the right
  * protocol (legacy writer 6 or the identityColumns writer feature).
  */
class IdentitySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", StringType),
    StructField("rid", LongType)))

  private def newTable(start: Long = 1L, step: Long = 1L): ResourceTable = {
    val dir = SparkSpec.tmpDir("graft_ident")
    val t = ResourceTable(spark, s"$dir/t.parquet")
      .createIfNotExists(schema)
    t.addIdentityColumn("rid", start, step)
    t
  }

  private def df(rows: (Long, String)*) = rows.toDF("k", "v")

  test("each batch is assigned the exact contiguous id range") {
    val t = newTable()
    t.upsert(df(10L -> "a", 11L -> "b", 12L -> "c"), "k")
    // which row got which id is partition-layout dependent; the SET of
    // ids per batch is the contract
    assert(t.read().select("rid").as[Long].collect().sorted
      === Array(1L, 2L, 3L))
    t.append(df(20L -> "d", 21L -> "e"))
    assert(t.read().select("rid").as[Long].collect().sorted
      === Array(1L, 2L, 3L, 4L, 5L))
  }

  test("ids never reuse after deletes (sequence continues past the mark)") {
    val t = newTable()
    t.upsert(df(1L -> "a", 2L -> "b"), "k")
    t.deleteMatching(Seq(1L, 2L).toDF("k"), "k")
    t.append(df(3L -> "c"))
    assert(t.read().select("rid").as[Long].collect() === Array(3L))
  }

  test("negative step descends from start") {
    val t = newTable(start = -1L, step = -2L)
    t.append(df(1L -> "a", 2L -> "b"))
    assert(t.read().select("rid").as[Long].collect().sorted
      === Array(-3L, -1L))
    t.append(df(3L -> "c"))
    assert(t.read().select("rid").as[Long].collect().min === -5L)
  }

  test("providing the identity column refuses (ALWAYS flavor)") {
    val t = newTable()
    val e = intercept[IllegalArgumentException] {
      t.upsert(Seq((1L, "a", 7L)).toDF("k", "v", "rid"), "k")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
    assert(t.read().isEmpty)
  }

  test("declaration refuses on non-empty tables, non-LONG and generated columns") {
    val dir = SparkSpec.tmpDir("graft_ident")
    val t = ResourceTable(spark, s"$dir/t.parquet").createIfNotExists(
      StructType(Seq(StructField("k", LongType),
        StructField("s", StringType), StructField("g", LongType),
        StructField("rid", LongType))))
    t.addGeneratedColumn("g", "k + 1")
    assert(intercept[IllegalArgumentException] {
      t.addIdentityColumn("s")
    }.getMessage.contains("LONG"))
    assert(intercept[IllegalArgumentException] {
      t.addIdentityColumn("g")
    }.getMessage.contains("GENERATED ALWAYS AS"))
    t.upsert(Seq((1L, "x", 5L)).toDF("k", "s", "rid"), "k")
    assert(intercept[IllegalArgumentException] {
      t.addIdentityColumn("rid")
    }.getMessage.contains("EMPTY"))
  }

  test("concurrent writers never double-allocate") {
    val t = newTable()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val batches = (0 until 4).map { w =>
      scala.concurrent.Future {
        // separate handles: each writer is its own process in prod
        val mine = ResourceTable(spark, t.path)
        mine.append(df((1 to 5).map(i =>
          (w * 100L + i) -> s"w$w-$i"): _*))
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(batches),
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    val ids = t.read().select("rid").as[Long].collect()
    assert(ids.length === 20)
    assert(ids.distinct.length === 20, "duplicate identity values")
    // ranges are contiguous per batch; with no failed writes the 20
    // values are a permutation of some window of the sequence
    assert(ids.max - ids.min === 19)
  }

  test("shallow clone continues the sequence, never restarts it") {
    val t = newTable()
    t.append(df(1L -> "a", 2L -> "b"))
    val tgt = SparkSpec.tmpDir("graft_ident_clone")
    val c = t.shallowCloneTo(s"$tgt/c.parquet")
    c.append(df(3L -> "c"))
    val cloneIds = c.read().select("rid").as[Long].collect().sorted
    assert(cloneIds === Array(1L, 2L, 3L))
  }

  test("export carries delta.identity.* metadata + writer version 6") {
    val t = newTable(start = 100L, step = 10L)
    t.append(df(1L -> "a", 2L -> "b"))
    DeltaExport.export(t)
    val logDir = new java.io.File(
      t.path.stripPrefix("file:"), "_delta_log")
    val all = logDir.listFiles().filter(_.getName.endsWith(".json"))
      .sorted.flatMap(fl =>
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(fl.toPath)).asScala)
      .mkString("\n")
    assert(all.contains("\\\"delta.identity.start\\\":100"))
    assert(all.contains("\\\"delta.identity.step\\\":10"))
    assert(all.contains("\\\"delta.identity.highWaterMark\\\":110"))
    assert(all.contains("\\\"delta.identity.allowExplicitInsert\\\":false"))
    assert(all.contains("\"minWriterVersion\":6"))
    val back = DeltaExport.readSnapshot(spark, t.path)
    assert(back.select("rid").as[Long].collect().sorted
      === Array(100L, 110L))
  }
}

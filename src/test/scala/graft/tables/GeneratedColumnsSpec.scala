package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** GENERATED ALWAYS AS parity: omitted columns compute at write,
  * provided values must satisfy the equation, UPDATE recomputes from
  * the post-update row, direct assignment refuses, rename/drop of
  * involved columns refuses, and the exported log carries
  * `delta.generationExpression` + the right protocol.
  */
class GeneratedColumnsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("amount", LongType),
    StructField("bucket", LongType)))

  private def newTable(): ResourceTable = {
    val dir = SparkSpec.tmpDir("graft_gen")
    val t = ResourceTable(spark, s"$dir/t.parquet")
      .createIfNotExists(schema)
    t.addGeneratedColumn("bucket", "amount DIV 100")
    t
  }

  private def df(rows: (Long, Long)*) =
    rows.toDF("id", "amount")

  test("omitted generated column computes at write") {
    val t = newTable()
    t.upsert(df(1L -> 250L, 2L -> 99L), "id")
    val got = t.read().select("id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 0L))
  }

  test("provided values that satisfy the equation pass; violations refuse") {
    val t = newTable()
    t.upsert(Seq((1L, 250L, 2L)).toDF("id", "amount", "bucket"), "id")
    assert(t.read().count() === 1)
    val e = intercept[IllegalArgumentException] {
      t.upsert(Seq((2L, 250L, 7L)).toDF("id", "amount", "bucket"), "id")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    assert(t.read().count() === 1) // nothing written
  }

  test("updateWhere recomputes from the post-update row") {
    val t = newTable()
    t.upsert(df(1L -> 250L, 2L -> 510L), "id")
    t.updateWhere(col("id") === 1L,
      Map("amount" -> lit(930L)))
    val got = t.read().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 930L, 9L), (2L, 510L, 5L)))
  }

  test("updateWhere refuses direct assignment of a generated column") {
    val t = newTable()
    t.upsert(df(1L -> 250L), "id")
    val e = intercept[IllegalArgumentException] {
      t.updateWhere(col("id") === 1L, Map("bucket" -> lit(9L)))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
  }

  test("merge clause updates touching involved columns refuse") {
    val t = newTable()
    t.upsert(df(1L -> 250L), "id")
    val e = intercept[IllegalArgumentException] {
      t.merge(df(1L -> 400L), "id")
        .whenMatchedUpdate(Map("amount" -> col("s.amount")))
        .execute()
    }
    assert(e.getMessage.contains("GENERATED"))
    // untouched-column clause updates still work
    val t2 = ResourceTable(spark,
      s"${SparkSpec.tmpDir("graft_gen2")}/t.parquet")
      .createIfNotExists(StructType(schema.fields :+
        StructField("note", StringType)))
    t2.addGeneratedColumn("bucket", "amount DIV 100")
    t2.upsert(Seq((1L, 250L, "a")).toDF("id", "amount", "note"), "id")
    t2.merge(Seq((1L, 250L, "b")).toDF("id", "amount", "note"), "id")
      .whenMatchedUpdate(Map("note" -> col("s.note")))
      .execute()
    assert(t2.read().select("note").as[String].collect() === Array("b"))
  }

  test("declaring over existing data validates; rename/drop refuse") {
    val dir = SparkSpec.tmpDir("graft_gen3")
    val t = ResourceTable(spark, s"$dir/t.parquet")
      .createIfNotExists(schema)
    t.upsert(Seq((1L, 250L, 99L)).toDF("id", "amount", "bucket"), "id")
    val e = intercept[IllegalArgumentException] {
      t.addGeneratedColumn("bucket", "amount DIV 100")
    }
    assert(e.getMessage.contains("violate"))
    val t2 = newTable()
    t2.upsert(df(1L -> 250L), "id")
    t2.enableColumnMapping()
    intercept[IllegalArgumentException] {
      t2.renameColumn("amount", "amt")
    }
    intercept[IllegalArgumentException] { t2.dropColumn("bucket") }
    t2.dropGeneratedColumn("bucket")
    t2.renameColumn("amount", "amt") // allowed once undeclared
  }

  test("chained generation and unknown references refuse") {
    val t = newTable()
    intercept[IllegalArgumentException] {
      t.addGeneratedColumn("amount", "bucket * 100")
    }
    val t2 = ResourceTable(spark,
      s"${SparkSpec.tmpDir("graft_gen4")}/t.parquet")
      .createIfNotExists(schema)
    intercept[IllegalArgumentException] {
      t2.addGeneratedColumn("bucket", "no_such_col DIV 100")
    }
  }

  test("export carries delta.generationExpression + writer version 4") {
    val t = newTable()
    t.upsert(df(1L -> 250L), "id")
    DeltaExport.export(t)
    val logDir = new java.io.File(
      t.path.stripPrefix("file:"), "_delta_log")
    val lines = java.nio.file.Files.readAllLines(
      logDir.listFiles().filter(_.getName.endsWith(".json"))
        .sorted.head.toPath)
    val all = String.join("\n", lines)
    // schemaString is a JSON-escaped string inside the entry
    assert(all.contains(
      "\\\"delta.generationExpression\\\":\\\"amount DIV 100\\\""))
    assert(all.contains("\"minWriterVersion\":4"))
    // the exported snapshot still round-trips through the reader
    val back = DeltaExport.readSnapshot(spark, t.path)
    assert(back.select("bucket").as[Long].collect() === Array(2L))
  }
}

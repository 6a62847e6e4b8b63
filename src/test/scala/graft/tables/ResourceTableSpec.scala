package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class ResourceTableSpec extends SparkSpec {
  import graft.SparkSpec._

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("v", IntegerType)))

  private def df(rows: (String, Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)

  test("createIfNotExists is idempotent; empty table reads back") {
    val path = tmpDir("rt")
    val t = ResourceTable(spark, s"$path/T.parquet").createIfNotExists(schema)
    assert(t.read().count() == 0)
    t.createIfNotExists(schema) // second call no-op
    assert(t.latestVersion.contains(0L))
  }

  test("upsert inserts then updates; delete removes; snapshots are versioned") {
    val t = ResourceTable(spark, s"${tmpDir("rt")}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df("a" -> 1, "b" -> 2), "id")
    assert(t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 1, "b" -> 2))
    t.upsert(df("b" -> 20, "c" -> 3), "id") // update b, insert c
    assert(t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 1, "b" -> 20, "c" -> 3))
    t.deleteMatching(df("a" -> 0).select("id"), "id")
    assert(t.read().collect().map(_.getString(0)).toSet == Set("b", "c"))
    assert(t.latestVersion.contains(3L)) // create + 3 mutations
  }

  test("optimize preserves content; vacuum removes old snapshots") {
    val base = tmpDir("rt")
    val t = ResourceTable(spark, s"$base/T.parquet").createIfNotExists(schema)
    t.upsert(df("a" -> 1, "b" -> 2, "c" -> 3), "id")
    t.optimize(numFiles = 1)
    assert(t.read().count() == 3)
    val removed = t.vacuum(retentionMs = -1000) // everything non-current is old
    assert(removed >= 1)
    assert(t.read().count() == 3) // current snapshot untouched
  }

  test("clustered optimize sorts within partitions by cluster column") {
    val t = ResourceTable(spark, s"${tmpDir("rt")}/T.parquet")
      .createIfNotExists(schema, clusterCols = Seq("id"))
    t.upsert(df("z" -> 26, "a" -> 1, "m" -> 13), "id")
    t.optimize(numFiles = 1)
    val ids = t.read().collect().map(_.getString(0)).toSeq
    assert(ids == ids.sorted) // single file, sorted by id
  }

  test("property: random PUT/DELETE interleavings == naive foldLeft replay") {
    val rnd = new scala.util.Random(42) // deterministic
    (1 to 4).foreach { _ =>
      val ops = List.fill(10)((
        if (rnd.nextBoolean()) "put" else "del",
        rnd.nextInt(5), // small key space to force collisions
        rnd.nextInt(100)))
      val t = ResourceTable(spark, s"${tmpDir("rtp")}/T.parquet")
        .createIfNotExists(schema)
      // apply each op as its own tiny batch (sequential, like the stream)
      ops.foreach {
        case ("put", k, v) => t.upsert(df(k.toString -> v), "id")
        case (_, k, _) => t.deleteMatching(df(k.toString -> 0).select("id"), "id")
      }
      val expected = ops.foldLeft(Map.empty[String, Int]) {
        case (m, ("put", k, v)) => m + (k.toString -> v)
        case (m, (_, k, _)) => m - k.toString
      }
      val got = t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got == expected, s"ops: $ops")
    }
  }
}

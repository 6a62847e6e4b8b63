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

  test("zorder key interleaves and preserves per-dimension locality") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("p", 0), Row("p", 1), Row("p", 1000), Row("q", 0))),
      StructType(Seq(StructField("s", StringType),
        StructField("n", IntegerType))))
    val keyed = graft.functions.ZOrder
      .withZOrderKey(df, Seq("s", "n"), relativeError = 0.0)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Long]("_zorder"))
      .toMap
    // same string, closer numbers → closer z keys (bucketed ranks)
    val d01 = math.abs(keyed(("p", 0)) - keyed(("p", 1)))
    val d0k = math.abs(keyed(("p", 0)) - keyed(("p", 1000)))
    assert(d01 < d0k, keyed.toString)
    assert(keyed(("p", 0)) != keyed(("q", 0)))
  }

  test("multi-column clustering compacts via zorder ordering") {
    val t = ResourceTable(spark, s"${tmpDir("rt")}/T.parquet")
      .createIfNotExists(schema, clusterCols = Seq("id", "v"))
    t.upsert(df("d" -> 40, "a" -> 1, "c" -> 30, "b" -> 2), "id")
    t.optimize(numFiles = 1)
    assert(t.read().count() == 4) // content preserved under zorder rewrite
  }

  test("time travel: readVersion sees historical snapshots until vacuumed") {
    val t = ResourceTable(spark, s"${tmpDir("rt")}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df("a" -> 1), "id")            // v1
    t.upsert(df("a" -> 2, "b" -> 9), "id")  // v2
    assert(t.readVersion(1).collect().map(r => (r.getString(0), r.getInt(1)))
      .toSet == Set("a" -> 1))
    assert(t.read().count() == 2)
    t.vacuum(retentionMs = -1000)
    intercept[IllegalStateException] { t.readVersion(1).collect() }
  }

  test("schema is pinned: upsert drops columns outside the table schema") {
    // the reference disables delta schema autoMerge (main.py:72)
    val t = ResourceTable(spark, s"${tmpDir("rt")}/T.parquet")
      .createIfNotExists(schema)
    val widened = df("a" -> 1)
      .withColumn("extra", org.apache.spark.sql.functions.lit("x"))
    t.upsert(widened, "id")
    assert(t.read().schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("concurrent commit conflict: loser retries, winner's snapshot intact") {
    val t = ResourceTable(spark, s"${tmpDir("rt")}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df("a" -> 1), "id") // v1
    val rival = ResourceTable(spark, t.path)
    // Inject the rival INSIDE t's publish window — after t has written
    // its v2 snapshot, before t creates the v2 commit file — so t's
    // create-fails-if-exists genuinely fires and retry() re-drives.
    t.onBeforePublish = () => {
      t.onBeforePublish = () => () // only the first publish attempt races
      rival.upsert(df("r" -> 7), "id") // rival wins v2
    }
    t.upsert(df("b" -> 5), "id") // loses v2, retries onto v3
    assert(t.latestVersion.contains(3L))
    assert(t.read().collect().map(_.getString(0)).toSet == Set("a", "r", "b"))
    // the winner's published v2 must be untouched by the loser's attempt
    assert(t.readVersion(2).collect().map(_.getString(0)).toSet == Set("a", "r"))
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

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

  test("changes: CDF diff tags inserts, deletes, and update pre/post pairs only") {
    val t = ResourceTable(spark, s"${tmpDir("rtcdf")}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df("a" -> 1, "b" -> 2, "c" -> 3), "id")
    val v1 = t.latestVersion.get
    t.upsert(df("b" -> 20, "d" -> 4), "id") // change b, insert d, keep a/c
    t.deleteMatching(df("c" -> 0).select("id"), "id")
    val v3 = t.latestVersion.get
    val got = t.changes(v1, v3, "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set(
      ("d", 4, "insert"),
      ("c", 3, "delete"),
      ("b", 2, "update_preimage"),
      ("b", 20, "update_postimage")))
    // unchanged window (same version twice) is empty
    assert(t.changes(v3, v3, "id").count() == 0)
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

  test("schema evolution: mergeSchema widens; old rows and old snapshots read null-filled") {
    import org.apache.spark.sql.functions.lit
    val t = ResourceTable(spark, s"${tmpDir("rtevo")}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df("a" -> 1, "b" -> 2), "id")
    val v1 = t.latestVersion.get
    val widened = df("b" -> 20, "c" -> 3).withColumn("extra", lit("x"))
    t.upsert(widened, "id", mergeSchema = true)
    assert(t.schema().fieldNames.toSeq == Seq("id", "v", "extra"))
    val rows = t.read().collect()
      .map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(rows == Map("a" -> None, "b" -> Some("x"), "c" -> Some("x")))
    // time travel across the evolution: the pre-widening snapshot reads
    // under the current schema with the added column null-filled
    val old = t.readVersion(v1).collect()
      .map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(old == Map("a" -> None, "b" -> None))
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

  test("data skipping: clustered files are pruned by min/max stats") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t = ResourceTable(spark, s"${tmpDir("rtskip")}/T.parquet")
    val data = (1 to 10000).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")
    t.createIfNotExists(data.schema, clusterCols = Seq("id"))
    t.upsert(data, "id")
    t.optimize(numFiles = 8) // range-clustered: disjoint id ranges/file
    // a selective range predicate must open a strict subset of files
    val pred = col("id") >= 9900L && col("id") <= 9950L
    val (kept, total) = t.pruneInfo(pred)
    assert(total == 8, s"expected 8 files, saw $total")
    assert(kept < total, s"no pruning: $kept of $total")
    // and the pruned read is row-identical to the unpruned one
    val viaSkip = t.read(pred).collect().map(_.getLong(0)).sorted
    val full = t.read().filter(pred).collect().map(_.getLong(0)).sorted
    assert(viaSkip.toSeq == full.toSeq && viaSkip.length == 51)
    // equality + IN prune too
    assert(t.pruneInfo(col("id") === 42L)._1 == 1)
    assert(t.pruneInfo(col("id").isin(5L, 9999L))._1 == 2)
    // disjunction keeps a file if either side might match
    assert(t.pruneInfo(col("id") === 42L || col("id") === 9999L)._1 == 2)
    // no-stats columns / unsupported shapes never skip
    assert(t.pruneInfo(length(col("name")) > 3)._1 == total)
    // impossible predicate reads nothing but still answers
    assert(t.read(col("id") > 99999L).count() == 0)
  }

  test("data skipping: string prefix and null-count pruning") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t = ResourceTable(spark, s"${tmpDir("rtskip2")}/T.parquet")
    val data = (1 to 1000).map { i =>
      val key = f"k$i%04d"
      (key, if (i <= 500) null else s"v$i")
    }.toDF("id", "maybe")
    t.createIfNotExists(data.schema, clusterCols = Seq("id"))
    t.upsert(data, "id")
    t.optimize(numFiles = 4)
    // prefix predicate hits one range-clustered file
    val (kept, total) = t.pruneInfo(col("id").startsWith("k099"))
    assert(total == 4 && kept < total, s"$kept of $total")
    assert(t.read(col("id").startsWith("k099")).count() == 10)
    // files where `maybe` has no nulls are pruned for IS NULL
    val (keptNull, _) = t.pruneInfo(col("maybe").isNull)
    assert(keptNull < total, s"isNull kept $keptNull of $total")
    assert(t.read(col("maybe").isNull).count() == 500)
  }

  test("widened schema flips atomically with the commit: stale meta file is ignored") {
    import org.apache.spark.sql.functions.lit
    val root = s"${tmpDir("rtatomic")}/T.parquet"
    val t = ResourceTable(spark, root).createIfNotExists(schema)
    t.upsert(df("a" -> 1), "id")
    t.upsert(df("b" -> 2).withColumn("extra", lit("x")), "id",
      mergeSchema = true)
    // Simulate the crash window the old design had: the snapshot is
    // committed but no post-commit meta write ever happened — force the
    // fallback file back to the ORIGINAL schema and assert schema()
    // still sees the widened columns (from the commit body).
    val metaPath = new org.apache.hadoop.fs.Path(root, "_meta_schema.json")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(metaPath, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    assert(t.schema().fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(t.read().columns.contains("extra"))
  }

  test("stat compare never skips on non-finite doubles") {
    // a parquet double stat of Inf (legal when data contains Inf) must
    // make the file incomparable -> kept, not crash BigDecimal
    assert(FileStats.cmp(1L, Double.PositiveInfinity).isEmpty)
    assert(FileStats.cmp(Double.NaN, 1L).isEmpty)
    assert(FileStats.cmp(1L, Double.NaN).isEmpty)
    assert(FileStats.cmp(1L, 2.0).contains(-1))
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val t = ResourceTable(spark, s"${tmpDir("rtinf")}/T.parquet")
    val data = Seq(("a", 1.0), ("b", Double.PositiveInfinity),
      ("c", Double.NaN)).toDF("id", "x")
    t.createIfNotExists(data.schema)
    t.upsert(data, "id")
    // predicate over the Inf/NaN-bearing stats: must answer, never throw
    assert(t.read(col("x") > 0.5).count() >= 1)
    assert(t.read(col("x") === Double.PositiveInfinity).count() == 1)
  }
}

package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Shallow clone (Delta `SHALLOW CLONE` parity): zero-copy manifest
  * reference, independent divergence, DV carry, vacuum isolation.
  */
class CloneSpec extends SparkSpec {
  import graft.SparkSpec._

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("v", IntegerType)))

  private def df(rows: (String, Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)

  private def parquetCount(path: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(path))
  }

  test("clone reads the source snapshot with zero data files copied") {
    val base = tmpDir("clone")
    val src = ResourceTable(spark, s"$base/S.parquet")
      .createIfNotExists(schema)
    src.upsert(df("a" -> 1, "b" -> 2, "c" -> 3), "id")
    val tgt = src.shallowCloneTo(s"$base/C.parquet")
    assert(parquetCount(s"$base/C.parquet") == 0,
      "shallow clone must not copy or write any data file")
    assert(tgt.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 1, "b" -> 2, "c" -> 3))
    // stats-pruned filtered read works through absolute references
    assert(tgt.read(org.apache.spark.sql.functions.col("id") === "b")
      .collect().map(_.getInt(1)).toSeq == Seq(2))
  }

  test("clone pins its version; source mutations do not leak in") {
    val base = tmpDir("clonepin")
    val src = ResourceTable(spark, s"$base/S.parquet")
      .createIfNotExists(schema)
    src.upsert(df("a" -> 1), "id")
    val tgt = src.shallowCloneTo(s"$base/C.parquet")
    src.upsert(df("a" -> 99, "z" -> 9), "id")
    assert(tgt.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap == Map("a" -> 1))
    // clone at an explicit earlier version
    val tgt0 = src.shallowCloneTo(s"$base/C0.parquet", Some(1L))
    assert(tgt0.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap == Map("a" -> 1))
  }

  test("clone diverges independently; rewrites drop absolute refs") {
    val base = tmpDir("clonediv")
    val src = ResourceTable(spark, s"$base/S.parquet")
      .createIfNotExists(schema)
    src.upsert(df("a" -> 1, "b" -> 2), "id")
    val srcManifest = src.fileManifest(src.latestVersion.get)
    val tgt = src.shallowCloneTo(s"$base/C.parquet")
    tgt.upsert(df("b" -> 20, "c" -> 3), "id")
    assert(tgt.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 1, "b" -> 20, "c" -> 3))
    // source untouched — same manifest, same content
    assert(src.fileManifest(src.latestVersion.get) == srcManifest)
    assert(src.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap == Map("a" -> 1, "b" -> 2))
    // a full compaction localizes everything: no absolute refs remain
    tgt.optimize(numFiles = 1)
    assert(tgt.fileManifest(tgt.latestVersion.get)
      .forall(!_.startsWith("/")),
      "optimize must rewrite foreign references into clone-local files")
  }

  test("clone carries deletion vectors, incl. sidecars as absolute p") {
    val base = tmpDir("clonedv")
    val src = ResourceTable(spark, s"$base/S.parquet")
      .createIfNotExists(schema).enableDeletionVectors()
    src.upsert(df((0 until 200).map(i => s"k$i" -> i): _*), "id")
    // tiny inline cap forces a u-storage sidecar
    spark.conf.set("graft.table.dv.inlineMaxBytes", "1")
    try src.deleteMatchingDv(df("k3" -> 0, "k7" -> 0).select("id"), "id")
    finally spark.conf.unset("graft.table.dv.inlineMaxBytes")
    val hasSidecar = src.fileListAt(src.latestVersion.get)
      .exists(_._2.dv.exists(_.st == "u"))
    assert(hasSidecar, "fixture must exercise the sidecar path")
    val tgt = src.shallowCloneTo(s"$base/C.parquet")
    val ids = tgt.read().collect().map(_.getString(0)).toSet
    assert(ids.size == 198 && !ids("k3") && !ids("k7"))
    // absolute = FULLY-QUALIFIED URI (scheme + authority), so a
    // cross-bucket clone can never re-anchor it against the wrong store
    assert(tgt.fileListAt(0L).exists(_._2.dv.exists(d =>
      d.st == "p" && d.d.startsWith("file:/"))),
      "sidecar DV must travel as an absolute qualified-URI p descriptor")
  }

  test("clone vacuum cannot reap source bytes; source vacuum breaks clone loudly") {
    val base = tmpDir("clonevac")
    val src = ResourceTable(spark, s"$base/S.parquet")
      .createIfNotExists(schema)
    src.upsert(df("a" -> 1), "id")
    val tgt = src.shallowCloneTo(s"$base/C.parquet")
    tgt.upsert(df("b" -> 2), "id") // clone has local + foreign refs
    val before = parquetCount(s"$base/S.parquet")
    tgt.vacuum(retentionMs = 0)
    assert(parquetCount(s"$base/S.parquet") == before,
      "clone vacuum must never delete source files")
    assert(tgt.read().count() == 2)
    // the documented hazard: source rewrite + vacuum reaps the files
    // the clone references → the clone FAILS FAST, it cannot lie
    src.optimize(numFiles = 1)
    src.vacuum(retentionMs = 0)
    val e = intercept[IllegalStateException](tgt.read().count())
    assert(e.getMessage.contains("vacuumed"))
  }

  test("clone of a clone references the ORIGINAL files (no chains)") {
    val base = tmpDir("clone2")
    val src = ResourceTable(spark, s"$base/S.parquet")
      .createIfNotExists(schema)
    src.upsert(df("a" -> 1, "b" -> 2), "id")
    val c1 = src.shallowCloneTo(s"$base/C1.parquet")
    c1.upsert(df("c" -> 3), "id") // C1 gains a local file
    val c2 = c1.shallowCloneTo(s"$base/C2.parquet")
    // every C2 reference is absolute and none points under C2 itself;
    // the untouched source file resolves straight to S, not through C1
    val refs = c2.fileManifest(0L)
    // absolute refs are fully-qualified URIs (scheme-full)
    assert(refs.nonEmpty && refs.forall(_.startsWith("file:/")))
    assert(refs.exists(_.contains("/S.parquet/")),
      s"grand-clone must reference the original files directly: $refs")
    assert(c2.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 1, "b" -> 2, "c" -> 3))
    assert(parquetCount(s"$base/C2.parquet") == 0)
  }

  test("clone exports a _delta_log with absolute add paths that reads back") {
    val base = tmpDir("clonedx")
    val src = ResourceTable(spark, s"$base/S.parquet")
      .createIfNotExists(schema)
    src.upsert(df("a" -> 1, "b" -> 2), "id")
    val tgt = src.shallowCloneTo(s"$base/C.parquet")
    tgt.upsert(df("c" -> 3), "id") // mixed foreign + local manifest
    DeltaExport.export(tgt)
    val got = DeltaExport.readSnapshot(spark, tgt.path)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 1, "b" -> 2, "c" -> 3),
      "delta readers must resolve the clone's absolute add paths")
  }

  test("properties travel; txn watermarks and existing targets refuse") {
    val base = tmpDir("cloneprops")
    val src = ResourceTable(spark, s"$base/S.parquet")
      .createIfNotExists(schema, clusterCols = Seq("id"))
    src.addCheckConstraint("v_pos", "v >= 0")
    src.append(df("a" -> 1), txn = Some(("app", 7L)))
    val tgt = src.shallowCloneTo(s"$base/C.parquet")
    assert(tgt.clusterBy() == Seq("id"))
    assert(tgt.checkConstraints().contains("v_pos"))
    intercept[IllegalArgumentException](
      tgt.upsert(df("x" -> -5), "id"))
    // txn identity does NOT travel: the clone is a new table
    assert(tgt.txnVersion("app").isEmpty)
    // existing target refuses
    intercept[IllegalStateException](
      src.shallowCloneTo(s"$base/C.parquet"))
  }
}

/** Delta `replaceWhere` (predicate overwrite) semantics. */
class ReplaceWhereSpec extends SparkSpec {
  import graft.SparkSpec._

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("v", IntegerType)))

  private def df(rows: (String, Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)

  test("overwriteWhere replaces exactly the matching scope in one commit") {
    val t = ResourceTable(spark, s"${tmpDir("rw")}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df("a" -> 1, "b" -> 2, "c" -> 30, "d" -> 40), "id")
    val v = t.latestVersion.get
    // replace all v >= 10 rows with a reloaded batch
    t.overwriteWhere(org.apache.spark.sql.functions.col("v") >= 10,
      df("c" -> 300, "e" -> 500))
    assert(t.latestVersion.contains(v + 1), "exactly one commit")
    assert(t.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 1, "b" -> 2, "c" -> 300, "e" -> 500))
  }

  test("overwriteWhere refuses a type-mismatched source instead of " +
      "writing files that diverge from the committed schema") {
    val t = ResourceTable(spark, s"${tmpDir("rwtype")}/T.parquet")
      .createIfNotExists(schema) // v is IntegerType
    t.upsert(df("a" -> 1), "id")
    val v = t.latestVersion.get
    val badSrc = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("x", "not-an-int"))),
      StructType(Seq(StructField("id", StringType),
        StructField("v", StringType))))
    val e = intercept[IllegalArgumentException](
      t.overwriteWhere(org.apache.spark.sql.functions.lit(true), badSrc))
    assert(e.getMessage.contains("no lossless conversion") ||
      e.getMessage.contains("in the source but"), e.getMessage)
    assert(t.latestVersion.contains(v), "refusal must not commit")
    // the head stays readable (a silent mismatched write would break
    // every subsequent read)
    assert(t.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap == Map("a" -> 1))
    // and a WIDENABLE source (int source into long table) still works
    // through the same conformTypes cast the other write paths use
    val tl = ResourceTable(spark, s"${tmpDir("rwtypew")}/T.parquet")
      .createIfNotExists(StructType(Seq(StructField("id", StringType),
        StructField("v", LongType))))
    tl.upsert(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("a", 1L))),
      StructType(Seq(StructField("id", StringType),
        StructField("v", LongType)))), "id")
    tl.overwriteWhere(org.apache.spark.sql.functions.lit(true),
      df("b" -> 2)) // int v — widens to the table's long
    assert(tl.read().collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap == Map("b" -> 2L))
  }

  test("overwriteWhere refuses source rows outside the predicate") {
    val t = ResourceTable(spark, s"${tmpDir("rwref")}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df("a" -> 1), "id")
    val v = t.latestVersion.get
    val e = intercept[IllegalArgumentException](
      t.overwriteWhere(org.apache.spark.sql.functions.col("v") >= 10,
        df("x" -> 5))) // 5 < 10: outside the declared scope
    assert(e.getMessage.contains("replaceWhere"))
    assert(t.latestVersion.contains(v), "refusal must not commit")
  }

  test("overwriteWhere: predicate-null rows are non-matching survivors") {
    val t = ResourceTable(spark, s"${tmpDir("rwnull")}/T.parquet")
      .createIfNotExists(schema)
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", Integer.valueOf(1)), Row("n", null),
        Row("c", Integer.valueOf(30)))), schema)
    t.upsert(withNull, "id")
    t.overwriteWhere(org.apache.spark.sql.functions.col("v") >= 10,
      df("c" -> 300))
    val got = t.read().collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got == Map("a" -> Some(1), "n" -> None, "c" -> Some(300)))
  }

  test("deleteWhere: predicate delete, null rows survive, pruning bounds scope") {
    val t = ResourceTable(spark, s"${tmpDir("dw")}/T.parquet")
      .createIfNotExists(schema)
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", Integer.valueOf(1)), Row("n", null),
        Row("c", Integer.valueOf(30)), Row("d", Integer.valueOf(40)))),
      schema)
    t.upsert(rows, "id")
    t.deleteWhere(org.apache.spark.sql.functions.col("v") >= 30)
    assert(t.read().collect().map(_.getString(0)).toSet == Set("a", "n"))
    // a provably-disjoint predicate rewrites nothing on a stats-clean
    // table (the all-null file above is conservatively unprovable,
    // which is correct — so assert pruning on a null-free table)
    val t2 = ResourceTable(spark, s"${tmpDir("dw2")}/T.parquet")
      .createIfNotExists(schema)
    t2.upsert(df("a" -> 1, "b" -> 2), "id")
    assert(t2.deleteWhere(
      org.apache.spark.sql.functions.col("v") > 1000000) == 0L)
    assert(t2.read().count() == 2)
  }

  test("deleteWhere on a DV-enabled table writes bitmaps, not files") {
    val t = ResourceTable(spark, s"${tmpDir("dwdv")}/T.parquet")
      .createIfNotExists(schema).enableDeletionVectors()
    t.upsert(df((0 until 100).map(i => s"k$i" -> i): _*), "id")
    val filesBefore = t.fileManifest(t.latestVersion.get)
    t.deleteWhere(org.apache.spark.sql.functions.col("v") >= 90)
    assert(t.fileManifest(t.latestVersion.get) == filesBefore,
      "DV-routed predicate delete must rewrite zero data files")
    assert(t.fileListAt(t.latestVersion.get)
      .exists(_._2.dv.isDefined), "DVs must be recorded")
    assert(t.read().count() == 90)
    // keyless DV commit still replays through the content change feed
    val v = t.latestVersion.get
    assert(t.changesByContent(v - 1, v)
      .filter("_change_type = 'delete'").count() == 10)
  }

  test("updateWhere: assignments see the pre-update row; swaps work") {
    val wide = StructType(Seq(
      StructField("id", StringType),
      StructField("a", IntegerType), StructField("b", IntegerType)))
    val t = ResourceTable(spark, s"${tmpDir("uw")}/T.parquet")
      .createIfNotExists(wide)
    t.upsert(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("x", Integer.valueOf(1), Integer.valueOf(2)),
        Row("y", Integer.valueOf(10), Integer.valueOf(20)))), wide), "id")
    import org.apache.spark.sql.functions.col
    t.updateWhere(col("a") >= 10,
      Map("a" -> col("b"), "b" -> col("a"))) // swap, pre-update values
    val got = t.read().collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got == Map("x" -> ((1, 2)), "y" -> ((20, 10))))
    // unknown assignment column refuses
    intercept[IllegalArgumentException](
      t.updateWhere(col("a") > 0, Map("nope" -> col("a"))))
  }
}

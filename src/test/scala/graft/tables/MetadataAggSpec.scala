package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions.col

import java.nio.charset.StandardCharsets

/** Metadata-only aggregates: count and numeric min/max must come from
  * the commit manifest ALONE — proven by physically deleting every
  * data file and asking again — and min/max must refuse whenever the
  * answer is not provably exact (DV present, string column).
  */
class MetadataAggSpec extends SparkSpec {
  import graft.SparkSpec._
  import spark.implicits._

  test("statsCount/statsMinMax answer with every data file DELETED from disk") {
    val t = ResourceTable(spark, s"${tmpDir("magg")}/T.parquet")
    val data = (1 to 50).map(i => (i.toLong, s"n$i", i * 1.5))
      .toDF("k", "name", "v").repartition(4)
    t.createIfNotExists(data.schema)
    t.upsert(data, "k")
    val v1 = t.latestVersion.get

    // nuke the data files: only the commit log remains
    t.fileManifest(v1).foreach { rel =>
      val p = new org.apache.hadoop.fs.Path(s"${t.path}/$rel")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, false)
    }
    assert(t.statsCount() == 50)
    assert(t.statsMinMax("k").contains((1L, 50L)))
    assert(t.statsMinMax("v").contains((1.5d, 75.0d)))
    // string stats: refuse (writer truncation not provable-exact)
    assert(t.statsMinMax("name").isEmpty)
    // a scan would now fail — metadata answered without one
    intercept[Exception] { t.read().count() }
  }

  test("MetadataOnlyCountRule: count(*) collapses to LocalRelation; guards hold") {
    graft.GraftExtensions.register(spark)
    val t = ResourceTable(spark, s"${tmpDir("magg3")}/T.parquet")
    val data = (1 to 40).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .repartition(3)
    t.createIfNotExists(data.schema)
    t.upsert(data, "k")

    def optimized(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString

    // the rewrite: unfiltered count(*) reads NO files
    import org.apache.spark.sql.functions.{count, lit}
    val c = t.read().agg(count(lit(1)))
    assert(optimized(c).contains("LocalRelation"), optimized(c))
    assert(!optimized(c).contains("parquet"), optimized(c))
    assert(c.collect()(0).getLong(0) == 40)
    // guard: a filter blocks the rewrite (and the answer stays right)
    val f = t.read().filter(col("k") > 10).agg(count(lit(1)))
    assert(!optimized(f).contains("LocalRelation"), optimized(f))
    assert(f.collect()(0).getLong(0) == 30)
    // guard: count(col) is null-sensitive — never rewritten
    val cc = t.read().agg(count(col("s")))
    assert(!optimized(cc).contains("LocalRelation"), optimized(cc))
    // min/max of a numeric column collapse too (mixed with count)
    import org.apache.spark.sql.functions.{min, max}
    val mm = t.read().agg(min(col("k")), max(col("k")), count(lit(1)))
    assert(optimized(mm).contains("LocalRelation"), optimized(mm))
    val r = mm.collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 40L && r.getLong(2) == 40L)
    // guard: min of a STRING column blocks the whole rewrite (stats
    // may be writer-truncated) — and stays correct through the scan
    val ms = t.read().agg(min(col("s")), count(lit(1)))
    assert(!optimized(ms).contains("LocalRelation"), optimized(ms))
    assert(ms.collect()(0).getString(0) == "v1")
    // guard: conf kill-switch
    spark.conf.set("graft.rules.metadataOnlyCount", "false")
    try {
      val off = t.read().agg(count(lit(1)))
      assert(!optimized(off).contains("LocalRelation"), optimized(off))
      assert(off.collect()(0).getLong(0) == 40)
    } finally spark.conf.set("graft.rules.metadataOnlyCount", "true")
    // DV table: the anti-join sits above the scan, rule can't match,
    // count still exact through the join
    t.enableDeletionVectors()
    t.deleteMatching(data.filter(col("k") <= 5).select("k"), "k")
    val dvc = t.read().agg(count(lit(1)))
    // the parquet scan must SURVIVE (the DV anti-join needs it; the
    // positions side legitimately plans as its own local relation)
    assert(optimized(dvc).contains("parquet"), optimized(dvc))
    assert(dvc.collect()(0).getLong(0) == 35)
  }

  test("grouped metadata-only count: GROUP BY partition columns " +
      "answers from the manifest; guards hold") {
    graft.GraftExtensions.register(spark)
    import org.apache.spark.sql.functions.count
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    import java.nio.file.{Files, Paths}
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val dir = tmpDir("maggp")
    val path = s"$dir/pt.parquet"
    val data = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    def writeDataFile(rel: String, rows: Seq[(Long, Long)]): Long = {
      val stage = s"$dir/stage-${rel.replace('/', '_')}"
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => Row(r._1, r._2)), 1), data)
        .write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator()
      var found: java.nio.file.Path = null
      while (part.hasNext) {
        val f = part.next()
        if (f.getFileName.toString.endsWith(".parquet")) found = f
      }
      val dest = Paths.get(path, rel)
      Files.createDirectories(dest.getParent)
      Files.move(found, dest)
      Files.size(dest)
    }
    val full = StructType(data.fields ++ Seq(
      StructField("p", StringType), StructField("q", StringType)))
    def line(kind: String)(
        fill: com.fasterxml.jackson.databind.node.ObjectNode => Unit)
        : String = {
      val o = mapper.createObjectNode()
      fill(o.putObject(kind))
      mapper.writeValueAsString(o)
    }
    def addLine(rel: String, size: Long, p: String, q: String,
                n: Option[Long]): String =
      line("add") { a =>
        a.put("path", rel)
        val pv = a.putObject("partitionValues")
        pv.put("p", p); pv.put("q", q)
        a.put("size", size); a.put("modificationTime", 1L)
        a.put("dataChange", true)
        n.foreach(c => a.put("stats", s"""{"numRecords":$c}"""): Unit)
      }
    val s1 = writeDataFile("p=a/q=x/f1.parquet", Seq(1L -> 1L, 2L -> 2L))
    val s2 = writeDataFile("p=a/q=y/f2.parquet",
      Seq(3L -> 3L, 4L -> 4L, 5L -> 5L))
    val s3 = writeDataFile("p=b/q=x/f3.parquet",
      Seq(6L -> 6L, 7L -> 7L, 8L -> 8L, 9L -> 9L))
    val v0 = Seq(
      line("protocol") { pr =>
        pr.put("minReaderVersion", 1); pr.put("minWriterVersion", 2) },
      line("metaData") { m =>
        m.put("id", "foreign-grouped")
        val fmt = m.putObject("format")
        fmt.put("provider", "parquet"); fmt.putObject("options")
        m.put("schemaString", full.json)
        val pc = m.putArray("partitionColumns"); pc.add("p"); pc.add("q")
        m.putObject("configuration"); m.put("createdTime", 1L) },
      addLine("p=a/q=x/f1.parquet", s1, "a", "x", Some(2L)),
      addLine("p=a/q=y/f2.parquet", s2, "a", "y", Some(3L)),
      addLine("p=b/q=x/f3.parquet", s3, "b", "x", Some(4L)))
    Files.createDirectories(Paths.get(path, "_delta_log"))
    Files.write(Paths.get(path, "_delta_log", f"${0L}%020d.json"),
      v0.mkString("", "\n", "\n").getBytes("UTF-8"))

    def optimized(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString
    val df = DeltaExport.readSnapshot(spark, path)
    // full partition-key grouping: manifest-only, correct
    val g = df.groupBy(col("p"), col("q")).count()
    assert(optimized(g).contains("LocalRelation"), optimized(g))
    assert(!optimized(g).contains("parquet"), optimized(g))
    assert(g.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ==
      Map(("a", "x") -> 2L, ("a", "y") -> 3L, ("b", "x") -> 4L))
    // SUBSET grouping merges manifest groups
    val gp = df.groupBy(col("p")).count()
    assert(optimized(gp).contains("LocalRelation"), optimized(gp))
    assert(gp.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 5L, "b" -> 4L))
    // matches the physical scan with the rule off
    spark.conf.set("graft.rules.metadataOnlyCount", "false")
    try {
      val off = DeltaExport.readSnapshot(spark, path)
        .groupBy(col("p")).count()
      assert(!optimized(off).contains("LocalRelation"), optimized(off))
      assert(off.collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap ==
        Map("a" -> 5L, "b" -> 4L))
    } finally spark.conf.set("graft.rules.metadataOnlyCount", "true")
    // guards: a data-column group key, a filter, count(col) all block
    val gd = df.groupBy(col("v")).count()
    assert(!optimized(gd).contains("LocalRelation"), optimized(gd))
    assert(gd.collect().length == 9)
    val gf = df.filter(col("id") > 2).groupBy(col("p")).count()
    assert(!optimized(gf).contains("LocalRelation"), optimized(gf))
    val gc = df.groupBy(col("p")).agg(count(col("v")))
    assert(!optimized(gc).contains("LocalRelation"), optimized(gc))
    // a stats-less add makes the count unknowable → no rewrite,
    // answer still right through the scan
    val s4 = writeDataFile("p=b/q=y/f4.parquet", Seq(10L -> 10L))
    Files.write(Paths.get(path, "_delta_log", f"${1L}%020d.json"),
      (addLine("p=b/q=y/f4.parquet", s4, "b", "y", None) + "\n")
        .getBytes("UTF-8"))
    val g2 = DeltaExport.readSnapshot(spark, path)
      .groupBy(col("p")).count()
    assert(!optimized(g2).contains("LocalRelation"), optimized(g2))
    assert(g2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 5L, "b" -> 5L))
  }

  test("lakehousekeeper count/stats/enable-cdf CLI verbs (forked JVM)") {
    val t = ResourceTable(spark, s"${tmpDir("magg4")}/T.parquet")
    val data = (1 to 25).map(i => (i.toLong, i * 3L)).toDF("k", "v")
    t.createIfNotExists(data.schema)
    t.upsert(data, "k")
    // the CLI main stops its session on exit (correct for a CLI,
    // fatal for the shared test session) — drive it in its own JVM
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cp = Seq(
      new java.io.File("target/scala-2.13/classes").getAbsolutePath,
      "/opt/spark/jars/*").mkString(":")
    def run(args: String*): String = {
      import scala.jdk.CollectionConverters._
      val cmd = (Seq("java") ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp,
        "graft.tables.Lakehousekeeper") ++ args).asJava
      val p = new ProcessBuilder(cmd).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8)
      p.waitFor()
      assert(p.exitValue() == 0, s"CLI ${args.mkString(" ")}:\n$out")
      out
    }
    assert(run("count", t.path).contains("25 rows"))
    assert(run("stats", t.path, "v").contains("min=3 max=75"))
    assert(run("stats", t.path, "nope").contains("not metadata-answerable"))
    assert(run("enable-cdf", t.path).contains("change data feed enabled"))
    assert(t.changeDataFeedEnabled)
    assert(run("enable-ict", t.path)
      .contains("in-commit timestamps enabled"))
    assert(t.ictEnabled)
  }

  test("DV-bearing versions refuse min/max but count stays exact") {
    val t = ResourceTable(spark, s"${tmpDir("magg2")}/T.parquet")
    val data = (1 to 30).map(i => (i.toLong, i * 2L)).toDF("k", "v")
      .repartition(2)
    t.createIfNotExists(data.schema)
    t.upsert(data, "k")
    val v1 = t.latestVersion.get
    t.enableDeletionVectors()
    t.deleteMatching(data.filter(col("k") % 5 === 0).select("k"), "k")
    // live count subtracts DV cardinalities, no data read
    assert(t.statsCount() == 24)
    assert(t.statsCount(v1) == 30)
    // head min/max: the max row (k=30) is DV-dead → must refuse
    assert(t.statsMinMax("k").isEmpty)
    // the pre-DV version still answers
    assert(t.statsMinMax("k", v1).contains((1L, 30L)))
    // and the manifest count matches the real scan
    assert(t.read().count() == 24)
  }
}

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

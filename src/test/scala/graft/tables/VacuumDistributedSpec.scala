package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed vacuum must be behavior-identical to the serial one:
  * same files reaped, same files kept, same dry-run counts, same DV
  * sidecar and empty-dir sweep.
  */
class VacuumDistributedSpec extends SparkSpec {
  import spark.implicits._

  /** Builds the same multi-version table twice (rewrites orphan the
    * old files) and returns both handles.
    */
  private def twinTables(tag: String): (ResourceTable, ResourceTable) = {
    def build(n: String): ResourceTable = {
      val dir = java.nio.file.Files.createTempDirectory(n).toString
      val tab = ResourceTable(spark, s"$dir/t.parquet")
      val v1 = (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v")
      tab.createIfNotExists(v1.schema)
      tab.upsert(v1, "k")
      tab.upsert((1L to 40L).map(i => (i, s"w$i")).toDF("k", "v"), "k")
      tab.upsert((10L to 20L).map(i => (i, s"x$i")).toDF("k", "v"), "k")
      tab
    }
    (build(s"${tag}_serial"), build(s"${tag}_dist"))
  }

  private def relFiles(tab: ResourceTable): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(tab.path)
    val fs = root.getFileSystem(
      spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Set.empty
    val out = scala.collection.mutable.Set[String]()
    fs.listStatus(root).foreach { s =>
      if (s.isDirectory && s.getPath.getName.startsWith("snap-"))
        fs.listStatus(s.getPath).foreach(e =>
          out += s"${s.getPath.getName}/${e.getPath.getName}")
    }
    out.toSet
  }

  test("distributed vacuum reaps exactly what serial vacuum reaps") {
    val (ts, td) = twinTables("vds")
    val beforeS = relFiles(ts)
    val beforeD = relFiles(td)
    assert(beforeS.map(_.split('/').last).size ==
      beforeD.map(_.split('/').last).size)
    val nS = ts.vacuum(retentionMs = 0)
    val nD = td.vacuumDistributed(retentionMs = 0)
    assert(nS.toLong == nD,
      s"serial reaped $nS, distributed reaped $nD")
    assert(nD > 0, "fixture must actually orphan files")
    // same survivors (manifest-referenced files only), same content
    assert(relFiles(ts).size == relFiles(td).size)
    assert(ts.read().orderBy("k").as[(Long, String)].collect().toSeq ==
      td.read().orderBy("k").as[(Long, String)].collect().toSeq)
    // both still read every retained version identically
    assert(ts.read().count() == 40)
  }

  test("dry run counts match and deletes nothing") {
    val (ts, td) = twinTables("vdd")
    val nS = ts.vacuum(retentionMs = 0, dryRun = true)
    val nD = td.vacuumDistributed(retentionMs = 0, dryRun = true)
    assert(nS.toLong == nD && nD > 0)
    assert(relFiles(td).nonEmpty)
    assert(td.read().count() == 40)
    // a real pass afterwards still reaps the same count
    assert(td.vacuumDistributed(retentionMs = 0) == nD)
  }

  test("distributed vacuum spares live DV sidecars, reaps orphaned ones") {
    val dir = java.nio.file.Files.createTempDirectory("vdv").toString
    val tab = ResourceTable(spark, s"$dir/t.parquet")
    val v1 = (1L to 400L).map(i => (i, s"v$i")).toDF("k", "v")
    tab.createIfNotExists(v1.schema)
    tab.upsert(v1, "k")
    tab.enableDeletionVectors()
    // force a sidecar (inline threshold down), then orphan it by
    // rewriting the file with a fresh upsert
    spark.conf.set("graft.table.dv.inlineMaxBytes", "0")
    try {
      tab.deleteMatching((1L to 5L).toDF("k"), "k")
      val root = new org.apache.hadoop.fs.Path(tab.path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      def sidecars = fs.listStatus(root).filter(s =>
        s.getPath.getName.startsWith("deletion_vector_")).map(_.getPath.getName).toSet
      val live = sidecars
      assert(live.nonEmpty)
      // live sidecar survives a vacuum
      tab.vacuumDistributed(retentionMs = 0)
      assert(sidecars == live, "live sidecar must survive")
      assert(tab.read().count() == 395)
      // rewriting the table clears the DV -> sidecar orphaned -> reaped
      tab.upsert((1L to 400L).map(i => (i, s"z$i")).toDF("k", "v"), "k")
      tab.vacuumDistributed(retentionMs = 0)
      assert(sidecars.isEmpty, "orphaned sidecar must be reaped")
      assert(tab.read().count() == 400)
    } finally spark.conf.unset("graft.table.dv.inlineMaxBytes")
  }
}

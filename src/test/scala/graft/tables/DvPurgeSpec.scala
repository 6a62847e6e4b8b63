package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** REORG TABLE ... APPLY (PURGE) parity
  * ([[ResourceTable.purgeDeletionVectors]]): only files whose DV dead
  * fraction crosses the threshold are rewritten (survivors
  * materialized, DV cleared), sparse-DV and DV-less files carry by
  * reference, logical content never changes, the purge commit is an
  * OPTIMIZE step (empty change feed), and vacuum afterwards reaps the
  * orphaned sidecars.
  */
class DvPurgeSpec extends SparkSpec {
  import spark.implicits._

  /** 4-file table with a skewed DV profile: file of ids 1..100 gets
    * ~90% dead, the others ~9% (one dead row per 11).
    */
  private def build(): ResourceTable = {
    val dir = java.nio.file.Files.createTempDirectory("dvp").toString
    val tab = ResourceTable(spark, s"$dir/t.parquet")
    // range-cluster into 4 files so id→file mapping is deterministic
    val rows = (1L to 400L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    tab.createIfNotExists(rows.schema)
    tab.upsert(rows, "id")
    tab.enableDeletionVectors()
    // ~90% of 1..100 dead; ~9% of the rest
    tab.deleteMatching(
      (1L to 400L).filter(i => (i <= 100 && i % 10 != 0) ||
        (i > 100 && i % 11 == 0)).toDF("id"), "id")
    tab
  }

  test("purge rewrites only files past the threshold; content unchanged") {
    val tab = build()
    val v0 = tab.latestVersion.get
    val before = tab.read().orderBy("id").as[(Long, String)].collect().toSeq
    val files0 = tab.fileListAt(v0)
    assert(files0.count(_._2.dv.isDefined) == 4, "fixture: every file DV'd")

    val (purged, carried) = tab.purgeDeletionVectors(minDeadFraction = 0.5)
    assert(purged == 1 && carried == 3,
      s"expected exactly the 90%-dead file purged, got ($purged, $carried)")

    val v1 = tab.latestVersion.get
    val files1 = tab.fileListAt(v1)
    // carried files keep identity AND their sparse DVs
    val carriedRels = files0.filterNot(f =>
      f._2.dv.exists(_.card.toDouble / f._2.rows >= 0.5)).map(_._1).toSet
    assert(carriedRels.subsetOf(files1.map(_._1).toSet))
    assert(files1.filter(f => carriedRels(f._1)).forall(_._2.dv.isDefined),
      "sparse DVs must survive a purge untouched")
    // the purged replacement is DV-free
    assert(files1.filterNot(f => carriedRels(f._1)).forall(_._2.dv.isEmpty))
    // logical content identical
    assert(tab.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      before)
    // OPTIMIZE step ⇒ empty change feed across the purge
    assert(tab.changes(v0, v1, "id").isEmpty)
    // time travel still reads the pre-purge version under its DVs
    assert(tab.readVersion(v0).count() == before.size)
  }

  test("no file past the threshold is a no-op commit-free pass") {
    val tab = build()
    val v0 = tab.latestVersion.get
    val (purged, carried) = tab.purgeDeletionVectors(minDeadFraction = 0.99)
    assert(purged == 0 && carried == 4)
    assert(tab.latestVersion.get == v0, "no-op purge must not commit")
  }

  test("purge orphans sidecars for vacuum to reap") {
    val dir = java.nio.file.Files.createTempDirectory("dvps").toString
    val tab = ResourceTable(spark, s"$dir/t.parquet")
    val rows = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
    tab.createIfNotExists(rows.schema)
    tab.upsert(rows, "id")
    tab.enableDeletionVectors()
    spark.conf.set("graft.table.dv.inlineMaxBytes", "0") // force sidecars
    try {
      // every other row: PARTIAL death in every file (an aligned id
      // range would kill whole files, which drop from the manifest
      // with no DV at all)
      tab.deleteMatching(
        (1L to 200L).filter(_ % 2 == 0).toDF("id"), "id")
      val root = new org.apache.hadoop.fs.Path(tab.path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      def sidecars = fs.listStatus(root).count(
        _.getPath.getName.startsWith("deletion_vector_"))
      assert(sidecars > 0)
      val (purged, _) = tab.purgeDeletionVectors(minDeadFraction = 0.05)
      assert(purged > 0)
      assert(tab.fileListAt(tab.latestVersion.get).forall(_._2.dv.isEmpty))
      tab.vacuum(retentionMs = 0)
      assert(sidecars == 0, "vacuum must reap the purge-orphaned sidecar")
      assert(tab.read().count() == 100)
    } finally spark.conf.unset("graft.table.dv.inlineMaxBytes")
  }
}

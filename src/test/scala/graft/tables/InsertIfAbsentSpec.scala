package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** INSERT-ONLY merge ([[ResourceTable.insertIfAbsent]]): keep-first
  * key semantics with ZERO file rewrites — the dedup-ingest primitive.
  */
class InsertIfAbsentSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): (ResourceTable, String) = {
    val dir = java.nio.file.Files.createTempDirectory(name).toString
    (ResourceTable(spark, s"$dir/t.parquet"), dir)
  }

  test("existing keys keep their original rows; new keys insert") {
    val (tab, _) = freshTable("iia_basic")
    val v1 = Seq((1L, "first"), (2L, "first")).toDF("k", "v")
    tab.createIfNotExists(v1.schema)
    tab.upsert(v1, "k")
    val inserted = tab.insertIfAbsent(
      Seq((2L, "second"), (3L, "second")).toDF("k", "v"), "k")
    assert(inserted == 1L)
    val out = tab.read().as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "first", 2L -> "first", 3L -> "second"))
  }

  test("no existing file is rewritten, at any overlap") {
    val (tab, _) = freshTable("iia_norewrite")
    val v1 = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    tab.createIfNotExists(v1.schema)
    tab.upsert(v1, "k")
    val before = tab.fileManifest(tab.latestVersion.get).toSet
    // heavy overlap: 90 known keys + 10 new ones
    tab.insertIfAbsent(
      (11L to 110L).map(i => (i, s"w$i")).toDF("k", "v"), "k")
    val after = tab.fileManifest(tab.latestVersion.get).toSet
    assert(before.subsetOf(after),
      s"existing files must carry forward: ${before -- after} were dropped")
    assert(tab.read().count() == 110)
    // the overlapped keys kept their FIRST values
    assert(tab.read().filter($"k" === 50L).as[(Long, String)].head()._2 == "v50")
  }

  test("txn watermark makes replays no-ops") {
    val (tab, _) = freshTable("iia_txn")
    val v1 = Seq((1L, "a")).toDF("k", "v")
    tab.createIfNotExists(v1.schema)
    tab.insertIfAbsent(v1, "k", txn = Some(("app", 7L)))
    assert(tab.insertIfAbsent(
      Seq((9L, "z")).toDF("k", "v"), "k", txn = Some(("app", 7L))) == 0L)
    assert(tab.read().count() == 1)
    assert(tab.insertIfAbsent(
      Seq((9L, "z")).toDF("k", "v"), "k", txn = Some(("app", 8L))) == 1L)
  }

  test("a DV-deleted key no longer blocks re-insertion") {
    val (tab, _) = freshTable("iia_dv")
    val v1 = Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
    tab.createIfNotExists(v1.schema)
    tab.upsert(v1, "k")
    tab.enableDeletionVectors()
    tab.deleteMatching(Seq(1L).toDF("k"), "k")
    assert(tab.read().count() == 1)
    assert(tab.insertIfAbsent(Seq((1L, "new")).toDF("k", "v"), "k") == 1L)
    val out = tab.read().as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "new", 2L -> "keep"))
  }

  test("racing insert-only writers with overlapping keys: first commit wins, no duplicates") {
    val (tab, _) = freshTable("iia_race")
    val schema = Seq((0L, "x")).toDF("k", "v").schema
    tab.createIfNotExists(schema)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // every writer offers ALL 12 keys with its own value — after the
    // retry-serialized commits each key must exist exactly once, with
    // one writer's value (the commit winner's), never a mix-free dup
    val threads = (0 until 3).map { w =>
      new Thread(() => {
        try {
          val t = ResourceTable(spark, tab.path)
          t.insertIfAbsent(
            (1L to 12L).map(k => (k, s"w$w")).toDF("k", "v"), "k")
          ()
        } catch { case e: Throwable => failures.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")
    val rows = tab.read().as[(Long, String)].collect()
    assert(rows.map(_._1).sorted.toSeq == (1L to 12L),
      s"every key exactly once, got ${rows.toSeq.sortBy(_._1)}")
    // exactly one full batch won each key (losers saw it and skipped);
    // keys may be split across winners only if a writer's batch lost
    // the race wholesale — but a single batch is one atomic commit, so
    // all 12 keys carry the same writer tag
    assert(rows.map(_._2).distinct.length == 1, rows.toSeq.toString)
  }

  test("empty table: pure insert; second batch dedups against the first") {
    val (tab, _) = freshTable("iia_empty")
    val s = Seq((1L, "x")).toDF("k", "v")
    tab.createIfNotExists(s.schema)
    assert(tab.insertIfAbsent(s, "k") == 1L)
    assert(tab.insertIfAbsent(s, "k") == 0L)
    assert(tab.read().count() == 1)
  }
}

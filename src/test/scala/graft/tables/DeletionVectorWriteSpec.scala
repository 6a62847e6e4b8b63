package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** The deletion-vector WRITE path: roaring/z85 encoding round-trips
  * through the existing decoder, [[ResourceTable.deleteMatchingDv]]
  * kills rows without rewriting a single data file, every read path
  * (snapshot, filtered, streaming-manifest, CDF) drops DV positions,
  * and rewrites (upsert/optimize) materialize survivors and clear the
  * DV — the resurrection hazard this design must rule out.
  */
class DeletionVectorWriteSpec extends SparkSpec {
  import graft.SparkSpec._

  // ---- codec round-trips -----------------------------------------

  test("roaring encode/decode round-trips array, bitmap, and sparse-high shapes") {
    val shapes = Seq(
      Array.empty[Long],
      Array(0L),
      Array(5L, 7L, 4096L, 65535L, 65536L, 131071L), // two 16-bit keys
      (0L until 5000L).toArray, // > 4096 in one key → bitmap container
      (0L until 9000L by 2L).toArray, // array+bitmap mix across keys
      Array(3L, (1L << 32) | 7L, (3L << 32) | 9L), // high-word gaps
      ((1L << 32) - 2L until (1L << 32) + 2L).toArray // straddle
    )
    shapes.foreach { pos =>
      val rt = DeletionVectors.decodePositions(
        DeletionVectors.encodePositions(pos))
      assert(rt.toSeq == pos.distinct.sorted.toSeq,
        s"round-trip broke for ${pos.take(5).mkString(",")}...")
    }
    // unsorted + duplicated input canonicalizes
    assert(DeletionVectors.decodePositions(
      DeletionVectors.encodePositions(Array(9L, 3L, 9L, 1L))).toSeq ==
      Seq(1L, 3L, 9L))
  }

  test("z85 encode/decode round-trips") {
    val bytes = Array.tabulate(64)(i => ((i * 37 + 11) % 256).toByte)
    assert(DeletionVectors.z85Decode(
      DeletionVectors.z85Encode(bytes)).toSeq == bytes.toSeq)
  }

  // ---- table semantics -------------------------------------------

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("v", IntegerType)))

  private def df(rows: (String, Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)

  private def state(t: ResourceTable): Map[String, Int] =
    t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  test("DV delete kills rows without rewriting files; union on re-delete; time travel unaffected") {
    val t = ResourceTable(spark, s"${tmpDir("dv")}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df((0 until 40).map(i => s"k$i" -> i): _*), "id")
    val v1 = t.latestVersion.get
    val filesBefore = t.fileManifest(v1).toSet

    val n = t.deleteMatchingDv(df("k3" -> 0, "k7" -> 0, "k11" -> 0)
      .select("id"), "id")
    assert(n == 3)
    val v2 = t.latestVersion.get
    assert(v2 == v1 + 1)
    // ZERO rewrite: the manifest references the same physical files
    assert(t.fileManifest(v2).toSet == filesBefore,
      "DV delete must not rewrite or drop data files")
    assert(state(t).keySet == (0 until 40).map(i => s"k$i").toSet
      -- Set("k3", "k7", "k11"))
    // filtered read path drops DV rows too
    import org.apache.spark.sql.functions.col
    assert(t.read(col("id") === "k3").count() == 0)
    assert(t.read(col("id") === "k4").count() == 1)
    // time travel to the pre-delete version still sees every row
    assert(t.readVersion(v1).count() == 40)

    // second DV delete UNIONS with the first
    t.deleteMatchingDv(df("k5" -> 0).select("id"), "id")
    assert(state(t).keySet.size == 36)
    assert(!state(t).contains("k3") && !state(t).contains("k5"))

    // CDF across the first DV delete reports exactly the deletes
    val ch = t.changes(v1, v2, "id").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(ch == Map("k3" -> "delete", "k7" -> "delete",
      "k11" -> "delete"))
  }

  test("stress: concurrent DV deleters union cleanly, zero rewrites") {
    val t0 = ResourceTable(spark, s"${tmpDir("dvc")}/T.parquet")
      .createIfNotExists(schema)
    t0.upsert(df((0 until 60).map(i => f"k$i%02d" -> i): _*), "id")
    val before = t0.fileManifest(t0.latestVersion.get).toSet
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // three writers DV-delete disjoint slices of the SAME files — the
    // conflict loser must re-drive its union against the winner's DVs
    val threads = (0 until 3).map { w =>
      new Thread(() => {
        try {
          val t = ResourceTable(spark, t0.path)
          t.deleteMatchingDv(
            df((0 until 60).filter(_ % 3 == w)
              .map(i => f"k$i%02d" -> i): _*).select("id"), "id")
        } catch { case e: Throwable => failures.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.isEmpty, s"deleter failed: ${failures.peek()}")
    // everything is dead, nothing was rewritten: losers unioned into
    // the winners' bitmaps instead of clobbering them
    assert(t0.read().count() == 0)
    assert(t0.fileManifest(t0.latestVersion.get).toSet.subsetOf(before),
      "concurrent DV deletes must not create data files")
    // each delete is its own linear version; every one time-travels
    val head = t0.latestVersion.get
    assert(t0.readVersion(head - 3).count() == 60)
    // disjoint 20-row slices → the count sequence is exact whatever
    // order the racers landed in
    assert(t0.readVersion(head - 2).count() == 40)
    assert(t0.readVersion(head - 1).count() == 20)
  }

  test("rewrites clear DVs and never resurrect: upsert, optimize, classic delete") {
    val t = ResourceTable(spark, s"${tmpDir("dv2")}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df((0 until 30).map(i => s"r$i" -> i): _*), "id")
    t.deleteMatchingDv(df("r1" -> 0, "r2" -> 0).select("id"), "id")

    // upsert touching the DV'd file: r1/r2 must NOT come back
    t.upsert(df("r0" -> 100), "id")
    assert(!state(t).contains("r1") && !state(t).contains("r2"))
    assert(state(t)("r0") == 100)
    // and the rewritten manifest carries no dv on rewritten entries
    val dvCount = t.fileListAt(t.latestVersion.get)
      .count(_._2.dv.isDefined)
    assert(dvCount == 0, "rewrite must materialize survivors and clear dv")

    // DV then optimize: compaction output drops the dead rows
    t.deleteMatchingDv(df("r9" -> 0).select("id"), "id")
    t.optimize(numFiles = 1)
    assert(!state(t).contains("r9"))
    assert(t.fileListAt(t.latestVersion.get).forall(_._2.dv.isEmpty))

    // DV then classic rewrite delete of OTHER keys keeps both kills
    t.deleteMatchingDv(df("r20" -> 0).select("id"), "id")
    t.deleteMatching(df("r21" -> 0).select("id"), "id")
    assert(!state(t).contains("r20") && !state(t).contains("r21"))
  }

  test("fully-dead file leaves the manifest; sidecar storage exercised") {
    val dir = tmpDir("dv3")
    val t = ResourceTable(spark, s"$dir/T.parquet")
      .createIfNotExists(schema)
    // two clustered files with disjoint key ranges
    t.upsert(df((0 until 20).map(i => f"a$i%02d" -> i): _*), "id")
    t.upsert(df((0 until 20).map(i => f"z$i%02d" -> i): _*), "id")
    // force SIDECAR storage for every DV
    spark.conf.set("graft.table.dv.inlineMaxBytes", "0")
    try {
      // kill the ENTIRE a-file
      t.deleteMatchingDv(
        df((0 until 20).map(i => f"a$i%02d" -> 0): _*).select("id"), "id")
      val files = t.fileListAt(t.latestVersion.get)
      assert(state(t).keySet == (0 until 20).map(i => f"z$i%02d").toSet)
      // a-file rows are gone from the manifest entirely (no dv entry
      // should carry card == rows)
      assert(files.forall(f => f._2.dv.forall(_.card < f._2.rows)))
      // partial sidecar delete on the z-file
      t.deleteMatchingDv(df("z00" -> 0, "z07" -> 0).select("id"), "id")
      val dv = t.fileListAt(t.latestVersion.get).flatMap(_._2.dv)
      assert(dv.nonEmpty && dv.forall(_.st == "u"),
        s"expected u-storage sidecar descriptors, got $dv")
      assert(new java.io.File(s"$dir/T.parquet").listFiles()
        .exists(_.getName.startsWith("deletion_vector_")),
        "sidecar .bin file missing under the table root")
      assert(state(t).keySet ==
        (0 until 20).map(i => f"z$i%02d").toSet -- Set("z00", "z07"))
    } finally spark.conf.unset("graft.table.dv.inlineMaxBytes")
  }

  test("DV tables export: protocol upgrade, remove+add identity, checkpoint, python reader") {
    val dir = tmpDir("dvx")
    val tablePath = s"$dir/T.parquet"
    val t = ResourceTable(spark, tablePath).createIfNotExists(schema)
    t.upsert(df((0 until 30).map(i => f"e$i%02d" -> i): _*), "id")
    DeltaExport.export(t)
    t.deleteMatchingDv(df("e03" -> 0, "e11" -> 0).select("id"), "id")
    val dv1 = DeltaExport.export(t)
    // the DV commit upgrades the protocol and re-states the file as
    // remove(old identity) + add(path with deletionVector)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(tablePath, "_delta_log",
        f"$dv1%020d.json")).toArray.mkString("\n")
    assert(lines.contains("\"minReaderVersion\":3") &&
      lines.contains("deletionVectors"), "protocol upgrade missing")
    assert(lines.contains("\"remove\"") && lines.contains("\"add\"") &&
      lines.contains("\"deletionVector\""),
      "DV update must export as remove + DV-bearing add")
    // the in-repo foreign reader drops the DV rows
    def snap(): Set[String] =
      DeltaExport.readSnapshot(spark, tablePath).collect()
        .map(_.getString(0)).toSet
    assert(snap() == (0 until 30).map(i => f"e$i%02d").toSet
      -- Set("e03", "e11"))
    // cross a checkpoint with the DV live, replay from checkpoint+tail
    (1 to 11).foreach { i =>
      t.upsert(df(f"n$i%02d" -> (100 + i)), "id")
      DeltaExport.export(t)
    }
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(tablePath, "_delta_log")).iterator()
      .asScala.exists(_.getFileName.toString.contains(".checkpoint.")),
      "fixture must have crossed the checkpoint cadence")
    assert(snap() == t.read().collect().map(_.getString(0)).toSet)
    // the INDEPENDENT python replayer: decodes the roaring bitmap,
    // drops dead row positions, hash-matches the expected snapshot
    t.read().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/expected.parquet")
    val pb = new ProcessBuilder("python3", "tools/check_delta_export.py",
      tablePath, s"$dir/expected.parquet")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    p.waitFor()
    assert(p.exitValue() == 0, s"python reader failed on DV table:\n$out")
    assert(out.contains("deletion vectors decoded"),
      s"python reader did not exercise the DV path:\n$out")
  }

  test("restore across DV versions keeps each version's dv state; export converges") {
    val dir = tmpDir("dv6")
    val t = ResourceTable(spark, s"$dir/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df((0 until 15).map(i => s"v$i" -> i): _*), "id")
    val vFull = t.latestVersion.get
    t.deleteMatchingDv(df("v3" -> 0, "v8" -> 0).select("id"), "id")
    val vDv = t.latestVersion.get
    t.upsert(df("extra" -> 99), "id")
    DeltaExport.export(t)

    // restore to the DV'd version: its manifest carries the dv entry
    t.restore(vDv)
    assert(state(t).keySet ==
      (0 until 15).map(i => s"v$i").toSet -- Set("v3", "v8"))
    assert(t.fileListAt(t.latestVersion.get).exists(_._2.dv.isDefined),
      "restore must carry the version's dv entries forward")

    // restore to the pre-DV version: every row returns, dv gone
    t.restore(vFull)
    assert(state(t).keySet == (0 until 15).map(i => s"v$i").toSet)
    assert(t.fileListAt(t.latestVersion.get).forall(_._2.dv.isEmpty))

    // the export diff keys on (path, dv), so both restores export as
    // dv-identity flips and the foreign reader tracks each state
    DeltaExport.export(t)
    assert(DeltaExport.readSnapshot(spark, s"$dir/T.parquet").collect()
      .map(_.getString(0)).toSet == state(t).keySet)
  }

  test("enableDeletionVectors routes the standard deleteMatching through DVs") {
    val t = ResourceTable(spark, s"${tmpDir("dv5")}/T.parquet")
      .createIfNotExists(schema)
      .enableDeletionVectors()
    t.upsert(df((0 until 20).map(i => s"p$i" -> i): _*), "id")
    val before = t.fileManifest(t.latestVersion.get).toSet
    t.deleteMatching(df("p4" -> 0, "p9" -> 0).select("id"), "id")
    assert(t.fileManifest(t.latestVersion.get).toSet == before,
      "property-enabled deleteMatching must take the DV path")
    assert(state(t).keySet ==
      (0 until 20).map(i => s"p$i").toSet -- Set("p4", "p9"))
  }

  test("huge-manifest streaming read path applies DVs") {
    val t = ResourceTable(spark, s"${tmpDir("dv4")}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df((0 until 25).map(i => s"s$i" -> i): _*), "id")
    t.deleteMatchingDv(df("s2" -> 0, "s17" -> 0).select("id"), "id")
    // force the streaming planner (spec hook used by StreamingManifestSpec)
    spark.conf.set("graft.manifest.streamPlanBytes", "1")
    try {
      val got = t.read().collect().map(_.getString(0)).toSet
      assert(got == (0 until 25).map(i => s"s$i").toSet -- Set("s2", "s17"))
    } finally spark.conf.unset("graft.manifest.streamPlanBytes")
  }

  test("history/describeDetail/statsCount agree on LIVE rows after a " +
      "DV delete") {
    val t = ResourceTable(spark, s"${tmpDir("dvhist")}/T.parquet")
      .createIfNotExists(schema).enableDeletionVectors()
    t.upsert(df((0 until 100).map(i => s"k$i" -> i): _*), "id")
    t.deleteMatchingDv(df("k1" -> 0, "k2" -> 0, "k3" -> 0)
      .select("id"), "id")
    val head = t.latestVersion.get
    val hist = t.history().collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(hist(head) == 97L,
      s"history must report live rows (phys minus DV-dead): $hist")
    assert(t.describeDetail().collect()(0)
      .getAs[Long]("num_rows") == 97L)
    assert(t.statsCount() == 97L)
    assert(t.read().count() == 97L)
  }
}

package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Crash-consistency of the `_delta_log` export under `kill -9`
  * (VERDICT r11 item 7): a SIGKILL lands inside the checkpoint
  * publish window — after the json log entry, during part staging /
  * renames / before the `_last_checkpoint` flip — and both readers
  * must keep serving a consistent snapshot from whatever state the
  * crash left:
  *
  *   - the INDEPENDENT external reader (tools/check_delta_export.py,
  *     DuckDB + stdlib, zero graft code) exits 0 against the source
  *     table's content at the exported graft version, and
  *   - a restarted exporter converges: later commits export cleanly,
  *     the next checkpoint publishes, and `_last_checkpoint` again
  *     names a complete checkpoint.
  *
  * The real-kill test covers whichever window the signal lands in;
  * the torn-state tests then pin each window deterministically
  * (stale pointer, absent pointer, incomplete multi-part checkpoint,
  * leftover staging dir) — the reachable crash states of
  * DeltaExport.publishCheckpoint's delete-then-rename pointer flip
  * (PROTOCOL.md "Last Checkpoint File": readers must treat the
  * pointer as a hint).
  */
class DeltaExportCrashSpec extends SparkSpec {
  import SparkSpec.tmpDir

  private val mapper = new ObjectMapper()

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def launchExporter(tablePath: String, log: Path): Process = {
    val cp = Seq(
      new java.io.File("target/scala-2.13/test-classes").getAbsolutePath,
      new java.io.File("target/scala-2.13/classes").getAbsolutePath,
      "/opt/spark/jars/*").mkString(":")
    val cmd = (Seq("java") ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", cp, "graft.tables.ExportCrashMain",
      tablePath, "/root/testdata/sf0.001")).asJava
    new ProcessBuilder(cmd)
      .redirectErrorStream(true)
      .redirectOutput(log.toFile)
      .start()
  }

  /** Exit code of the independent python replayer against an expected
    * parquet dump, with its output appended to the assertion context.
    */
  private def externalReader(tablePath: String,
                             expectedDir: String): (Int, String) = {
    val pb = new ProcessBuilder(
      "python3", "tools/check_delta_export.py", tablePath, expectedDir)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    p.waitFor()
    (p.exitValue(), out)
  }

  private def logDir(tablePath: String): Path =
    Paths.get(tablePath, "_delta_log")

  /** Any checkpoint activity: a published part or the staging dir. */
  private def checkpointStarted(d: Path): Boolean = {
    if (!Files.isDirectory(d)) return false
    val s = Files.list(d)
    try s.iterator().asScala.exists { p =>
      val n = p.getFileName.toString
      (n.contains(".checkpoint.") && !n.startsWith(".")) ||
        n.startsWith(".ckpt-")
    } finally s.close()
  }

  /** Graft version recorded by the newest exported log entry's
    * commitInfo — the snapshot an external reader must resolve.
    */
  private def exportedGraftVersion(tablePath: String): Long = {
    val d = logDir(tablePath)
    val s = Files.list(d)
    val last =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && !n.startsWith("."))
        .map(_.stripSuffix(".json").toLong).max
      finally s.close()
    Files.readAllLines(d.resolve(f"$last%020d.json"),
      StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).map(mapper.readTree)
      .flatMap(n => Option(n.get("commitInfo")))
      .map(_.get("graftVersion").asLong).head
  }

  /** Assert `_last_checkpoint` exists AND names a checkpoint whose
    * part files are all present (single or multi-part).
    */
  private def assertPointerComplete(tablePath: String): Unit = {
    val lc = logDir(tablePath).resolve("_last_checkpoint")
    assert(Files.exists(lc), "_last_checkpoint missing after recovery")
    val node = mapper.readTree(
      new String(Files.readAllBytes(lc), StandardCharsets.UTF_8))
    val v = node.get("version").asLong
    val parts = Option(node.get("parts")).map(_.asInt).getOrElse(1)
    val expected =
      if (parts == 1) Seq(f"$v%020d.checkpoint.parquet")
      else (1 to parts).map(k =>
        f"$v%020d.checkpoint.$k%010d.$parts%010d.parquet")
    expected.foreach { n =>
      assert(Files.exists(logDir(tablePath).resolve(n)),
        s"pointer names $n but it is absent — torn publish survived recovery")
    }
  }

  test("kill -9 during checkpoint publish: external reader consistent, restart converges") {
    val base = tmpDir("dxkill")
    val tablePath = s"$base/T.parquet"
    val p1 = launchExporter(tablePath, Paths.get(base, "exporter.log"))
    val d = logDir(tablePath)
    val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
    var killed = false
    while (p1.isAlive && !killed && System.nanoTime() < deadline) {
      if (checkpointStarted(d)) {
        p1.destroyForcibly() // SIGKILL — no hooks, no flush
        killed = true
      } else Thread.sleep(0, 200000)
    }
    assert(killed, {
      val tail = new String(Files.readAllBytes(
        Paths.get(base, "exporter.log")), StandardCharsets.UTF_8)
      s"no checkpoint activity observed before drain: ${tail.takeRight(800)}"
    })
    p1.waitFor()
    assert(p1.exitValue() != 0) // died by signal, not a clean drain

    // the crashed log must replay to the source table's state at the
    // exported graft version — via the INDEPENDENT python reader
    val lastG = exportedGraftVersion(tablePath)
    val t = ResourceTable(spark, tablePath)
    val expected1 = s"$base/expected1.parquet"
    t.readVersion(lastG).coalesce(1)
      .write.mode("overwrite").parquet(expected1)
    val (code1, out1) = externalReader(tablePath, expected1)
    assert(code1 == 0, s"external reader failed on crashed log:\n$out1")

    // restart: the same exporter logic over the crashed state must
    // converge — new commits export, the next checkpoint publishes
    // (skipping or completing whatever the crash left), and the
    // pointer is whole again
    val custKeys = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"))
    (1 to 12).foreach { i =>
      t.upsert(custKeys.filter(col("c_custkey") % 13 === i % 13)
        .withColumn("c_acctbal", col("c_acctbal") - i * 5.0),
        "c_custkey")
      DeltaExport.export(t)
    }
    assertPointerComplete(tablePath)
    val expected2 = s"$base/expected2.parquet"
    t.read().coalesce(1).write.mode("overwrite").parquet(expected2)
    val (code2, out2) = externalReader(tablePath, expected2)
    assert(code2 == 0, s"external reader failed after recovery:\n$out2")
  }

  // ---- deterministic torn states --------------------------------

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("v", IntegerType)))

  private def df(rows: (String, Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))),
      schema)

  private def snapshotMap(tablePath: String): Map[String, Int] =
    DeltaExport.readSnapshot(spark, tablePath).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap

  test("torn pointer states: stale, absent, incomplete parts, leftover staging") {
    val base = tmpDir("dxtorn")
    val tablePath = s"$base/T.parquet"
    spark.conf.set("spark.graft.export.checkpointPartActions", "4")
    try {
      val t = ResourceTable(spark, tablePath).createIfNotExists(schema)
      t.upsert(df((0 until 30).map(i => s"k$i" -> i): _*), "id")
      DeltaExport.export(t)
      (1 to 10).foreach(i => t.upsert(df(s"k$i" -> (100 + i)), "id"))
      assert(DeltaExport.export(t) == 10L) // checkpoint at dv 10
      val truth = t.read().collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      val d = logDir(tablePath)
      val lc = d.resolve("_last_checkpoint")
      val pointerBytes = Files.readAllBytes(lc)
      val expected = s"$base/expected.parquet"
      t.read().coalesce(1).write.mode("overwrite").parquet(expected)

      // 1. stale/garbled pointer: names a version with no complete
      // checkpoint → both readers must fall back to the listing
      Files.write(lc, """{"version":9999,"size":1}"""
        .getBytes(StandardCharsets.UTF_8))
      assert(snapshotMap(tablePath) == truth, "stale pointer broke replay")
      val (c1, o1) = externalReader(tablePath, expected)
      assert(c1 == 0, s"external reader vs stale pointer:\n$o1")

      // 2. absent pointer (crash inside delete-then-rename): listing
      // fallback again
      Files.delete(lc)
      assert(snapshotMap(tablePath) == truth, "absent pointer broke replay")
      val (c2, o2) = externalReader(tablePath, expected)
      assert(c2 == 0, s"external reader vs absent pointer:\n$o2")

      // 3. incomplete multi-part checkpoint (crash mid-part-renames,
      // pointer never flipped): the partial part set must be IGNORED
      // and replay run from the full json chain
      val parts = Files.list(d).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.contains(".checkpoint.") && !n.startsWith("."))
        .toSeq.sorted
      assert(parts.size >= 2, s"fixture must be multi-part, got $parts")
      val hidden = d.resolve(parts.head)
      val aside = d.resolve(s".aside-${parts.head}")
      Files.move(hidden, aside)
      assert(snapshotMap(tablePath) == truth,
        "incomplete checkpoint was replayed instead of being ignored")
      val (c3, o3) = externalReader(tablePath, expected)
      assert(c3 == 0, s"external reader vs incomplete checkpoint:\n$o3")
      Files.move(aside, hidden)

      // 4. leftover staging dir (crash during part write): dot-named,
      // must be invisible to every reader
      val junk = d.resolve(".ckpt-00000000000000000099-deadbeef.tmp")
      Files.createDirectories(junk)
      Files.write(junk.resolve("part-junk.parquet"),
        Array[Byte](1, 2, 3))
      assert(snapshotMap(tablePath) == truth, "staging dir leaked into replay")
      val (c4, o4) = externalReader(tablePath, expected)
      assert(c4 == 0, s"external reader vs staging leftovers:\n$o4")

      // recovery with the pointer STILL absent: the next checkpoint
      // cadence must republish and restore it
      (11 to 20).foreach(i => t.upsert(df(s"r$i" -> (200 + i)), "id"))
      assert(DeltaExport.export(t) == 20L)
      assertPointerComplete(tablePath)
      assert(snapshotMap(tablePath) == t.read().collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap)
      val expected2 = s"$base/expected2.parquet"
      t.read().coalesce(1).write.mode("overwrite").parquet(expected2)
      val (c5, o5) = externalReader(tablePath, expected2)
      assert(c5 == 0, s"external reader after pointer recovery:\n$o5")
      // sanity: the original pointer content was version 10 (the state
      // this test tore down from), and recovery moved past it
      assert(mapper.readTree(new String(pointerBytes,
        StandardCharsets.UTF_8)).get("version").asLong == 10L)
    } finally
      spark.conf.unset("spark.graft.export.checkpointPartActions")
  }
}

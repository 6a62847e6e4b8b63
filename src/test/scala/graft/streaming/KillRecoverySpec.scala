package graft.streaming

import graft.SparkSpec
import graft.tables.ResourceTable

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Crash-recovery under `kill -9` (reference crash-and-restart
  * semantics, main.py:194): a SEPARATE JVM runs [[EngineMain]] against
  * a file journal and is SIGKILLed the instant the first DATA commit
  * lands in any table's `_log` — i.e. inside the window where at least
  * one table has committed but its streaming checkpoint (and the other
  * types' sinks) have not advanced. A second incarnation over the same
  * checkpoints must drain to EXACTLY the journal's latest-wins state:
  * nothing lost (offsets never advanced past unwritten work) and
  * nothing duplicated (replayed batches hit the idempotent MERGE with
  * the same txn watermark).
  */
class KillRecoverySpec extends SparkSpec {
  import SparkSpec.tmpDir

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def journalLine(off: Long, resource: String, id: String,
                          rtype: String): String = {
    val bundle = s"""{"entry":[{"resource":"${esc(resource)}",""" +
      s""""request":{"method":"PUT","url":"$rtype/$id"}}]}"""
    s"""{"topic":"fhir.msg","partition":0,"offset":$off,"bundle":"${esc(bundle)}"}"""
  }

  private def patient(id: String, active: Boolean): String =
    s"""{"resourceType":"Patient","id":"$id","active":$active}"""

  private def observation(id: String): String =
    s"""{"resourceType":"Observation","id":"$id","status":"final"}"""

  /** A data commit = any `.commit` under `_log` beyond v0 creation. */
  private def hasDataCommit(d: Path): Boolean = {
    if (!Files.isDirectory(d)) return false
    val s = Files.list(d)
    try s.iterator().asScala.exists { p =>
      val n = p.getFileName.toString
      n.endsWith(".commit") && n != f"${0L}%020d.commit"
    } finally s.close()
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def launch(journal: String, db: String, log: Path): Process = {
    val cp = Seq(
      new java.io.File("target/scala-2.13/classes").getAbsolutePath,
      "/opt/spark/jars/*").mkString(":")
    val cmd = (Seq("java") ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", cp, "graft.streaming.EngineMain", journal, db)).asJava
    new ProcessBuilder(cmd)
      .redirectErrorStream(true)
      .redirectOutput(log.toFile)
      .start()
  }

  test("kill -9 between table commit and checkpoint advance: restart converges exactly") {
    val base = tmpDir("kill9")
    val journal = s"$base/journal"
    val db = s"$base/db"
    Files.createDirectories(Paths.get(journal))
    // 150 patients PUT true, then the first 50 overwritten false at
    // higher offsets; 100 observations — across 4 journal files so
    // both typed queries have real work in flight
    val lines =
      (0 until 150).map(i => journalLine(i, patient(s"p$i", active = true),
        s"p$i", "Patient")) ++
      (0 until 50).map(i => journalLine(150 + i,
        patient(s"p$i", active = false), s"p$i", "Patient")) ++
      (0 until 100).map(i => journalLine(200 + i, observation(s"o$i"),
        s"o$i", "Observation"))
    lines.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(Paths.get(journal, f"j$i%02d.ndjson"),
        chunk.mkString("\n").getBytes("UTF-8"))
    }

    // incarnation 1: SIGKILL the moment any table shows a data commit
    val p1 = launch(journal, db, Paths.get(base, "engine1.log"))
    val logDirs = Seq("Patient", "Observation")
      .map(t => Paths.get(db, s"$t.parquet", "_log"))
    val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
    var killed = false
    while (p1.isAlive && !killed && System.nanoTime() < deadline) {
      if (logDirs.exists(hasDataCommit)) {
        p1.destroyForcibly() // SIGKILL — no shutdown hooks, no flush
        killed = true
      } else Thread.sleep(1)
    }
    assert(killed,
      "engine drained before a data commit was observed — kill missed")
    p1.waitFor()
    assert(p1.exitValue() != 0) // died by signal, not a clean drain

    // incarnation 2: same checkpoints, must converge and exit clean
    val p2 = launch(journal, db, Paths.get(base, "engine2.log"))
    assert(p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "restarted engine did not drain in time")
    assert(p2.exitValue() == 0, {
      s"restart failed: ${new String(Files.readAllBytes(
        Paths.get(base, "engine2.log"))).takeRight(2000)}"
    })

    // exactly the journal's latest-wins state: no losses, no dupes
    val pat = ResourceTable(spark, s"$db/Patient.parquet").read()
      .select("id", "active").collect()
      .map(r => r.getString(0) -> r.getBoolean(1))
    assert(pat.length == 150, s"expected 150 patients, got ${pat.length}")
    assert(pat.map(_._1).distinct.length == 150, "duplicated patient ids")
    val byId = pat.toMap
    (0 until 50).foreach(i => assert(!byId(s"p$i"),
      s"p$i lost its latest-wins overwrite across the crash"))
    (50 until 150).foreach(i => assert(byId(s"p$i")))
    val obs = ResourceTable(spark, s"$db/Observation.parquet").read()
      .select("id").collect().map(_.getString(0))
    assert(obs.length == 100 && obs.distinct.length == 100,
      s"expected 100 distinct observations, got ${obs.length}")
  }
}

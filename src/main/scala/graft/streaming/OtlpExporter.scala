package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory,
  ObjectNode}

import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** OTLP metrics PUSH — the other half of the reference's metrics
  * surface (src/metrics.py builds OpenTelemetry meters; the reference
  * deploys them behind either a Prometheus scrape or an OTLP pipeline
  * to a collector). [[PrometheusBridge]]/[[MetricsServer]] cover the
  * scrape path; this exporter periodically POSTs the SAME registries
  * as an `ExportMetricsServiceRequest` in the OTLP/HTTP **JSON**
  * encoding (the protocol's second wire form, accepted by every
  * OpenTelemetry collector at `/v1/metrics`) — hand-rendered with
  * Jackson, zero exporter dependencies, matching this repo's
  * zero-egress jar constraint.
  *
  * Mapping (OTel metric names are the reference's, pre-Prometheus
  * sanitization — dashes intact):
  *
  *  - `spark-streaming-query-processed-rows-per-second` → gauge,
  *    attr `query_name`
  *  - `spark-streaming-query-kafka-offset` → gauge, attrs
  *    `type/query_name/topic/partition`
  *  - `resources-processed-total` → monotonic cumulative sum, attrs
  *    `operation/resource_type`
  *  - `delta-operation-duration` (unit "seconds") → cumulative histogram with
  *    the bridge's bucket bounds (bucketCounts de-cumulated from the
  *    le-style counters), attr `operation`
  *  - `fhir-batches-total` / `fhir-batch-rows-total` → monotonic sums
  *
  * Driver-side only, like the bridge: a handful of adders rendered to
  * one JSON body per interval — nothing on the data path.
  */
final class OtlpExporter(bridge: PrometheusBridge,
                         listener: Option[QueryProgressListener],
                         endpoint: String,
                         intervalMs: Long = 10000,
                         serviceName: String = "graft") {
  private val f = JsonNodeFactory.instance
  private val mapper = new ObjectMapper()
  private val startNano = System.currentTimeMillis() * 1000000L
  // bounded connect time: a blackholed collector must not wedge the
  // export loop on connection establishment forever
  private val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()
  @volatile private var running = false
  // generation token: a stop()+start() pair must never leave the OLD
  // loop alive next to the new one (the old thread could re-read
  // `running` only after start() set it true again) — each loop exits
  // as soon as it is no longer the current generation
  @volatile private var generation = 0L
  private var thread: Thread = _

  private def attr(k: String, v: String): ObjectNode = {
    val a = f.objectNode()
    a.put("key", k)
    a.set[ObjectNode]("value", f.objectNode().put("stringValue", v))
    a
  }

  private def attrs(kvs: (String, String)*): ArrayNode = {
    val arr = f.arrayNode()
    kvs.foreach { case (k, v) => arr.add(attr(k, v)) }
    arr
  }

  private def gaugePoint(nowNano: Long, v: Double,
                         a: ArrayNode): ObjectNode = {
    val p = f.objectNode()
    p.put("timeUnixNano", nowNano.toString)
    p.put("asDouble", v)
    p.set[ObjectNode]("attributes", a)
    p
  }

  private def sumPoint(nowNano: Long, v: Long, a: ArrayNode): ObjectNode = {
    val p = f.objectNode()
    p.put("startTimeUnixNano", startNano.toString)
    p.put("timeUnixNano", nowNano.toString)
    p.put("asInt", v.toString)
    p.set[ObjectNode]("attributes", a)
    p
  }

  // name + OTLP metric-level unit match the reference instruments
  // exactly (metrics.py:39-47, bundle_processor.py:21-31) so an
  // OTLP-native consumer sees the same metric identities
  private def metric(name: String, unit: String = ""): ObjectNode = {
    val m = f.objectNode().put("name", name)
    if (unit.nonEmpty) m.put("unit", unit)
    m
  }

  /** One `ExportMetricsServiceRequest` body over the current registry
    * state (public for the spec: the payload IS the contract).
    */
  def payload(nowMs: Long = System.currentTimeMillis()): String = {
    val nowNano = nowMs * 1000000L
    val metrics = f.arrayNode()

    listener.foreach { l =>
      val rps = f.arrayNode()
      l.rowsPerSecond.asScala.toSeq.sortBy(_._1).foreach { case (q, v) =>
        rps.add(gaugePoint(nowNano, v, attrs("query_name" -> q)))
      }
      if (rps.size() > 0) {
        val m = metric("spark-streaming-query-processed-rows-per-second",
          "{Count}/s")
        val g = f.objectNode()
        g.set[ObjectNode]("dataPoints", rps)
        m.set[ObjectNode]("gauge", g)
        metrics.add(m)
      }
      val off = f.arrayNode()
      l.kafkaOffsets.asScala.toSeq.sortBy(_._1.toString).foreach {
        case ((q, topic, part, kind), o) =>
          off.add(gaugePoint(nowNano, o.toDouble,
            attrs("type" -> kind, "query_name" -> q,
              "topic" -> topic, "partition" -> part)))
      }
      if (off.size() > 0) {
        val m = metric("spark-streaming-query-kafka-offset", "{Num}")
        val g = f.objectNode()
        g.set[ObjectNode]("dataPoints", off)
        m.set[ObjectNode]("gauge", g)
        metrics.add(m)
      }
    }

    val proc = f.arrayNode()
    bridge.processedSnapshot.foreach { case ((op, rt), n) =>
      proc.add(sumPoint(nowNano, n,
        attrs("operation" -> op, "resource_type" -> rt)))
    }
    if (proc.size() > 0) {
      val m = metric("resources-processed-total", "{Count}")
      val sum = f.objectNode()
      sum.put("aggregationTemporality", 2) // CUMULATIVE
      sum.put("isMonotonic", true)
      sum.set[ObjectNode]("dataPoints", proc)
      m.set[ObjectNode]("sum", sum)
      metrics.add(m)
    }

    val bounds = bridge.bucketBounds
    val hps = f.arrayNode()
    bridge.durationSnapshot.foreach { case (op, leCounts, sum, n) =>
      val p = f.objectNode()
      p.put("startTimeUnixNano", startNano.toString)
      p.put("timeUnixNano", nowNano.toString)
      p.put("count", n.toString)
      p.put("sum", sum)
      val bc = f.arrayNode()
      // the bridge keeps le-CUMULATIVE counters (Prometheus shape);
      // OTLP wants per-bucket counts + an overflow bucket
      var prev = 0L
      leCounts.foreach { c =>
        bc.add(math.max(c - prev, 0L).toString); prev = c
      }
      bc.add(math.max(n - prev, 0L).toString)
      p.set[ObjectNode]("bucketCounts", bc)
      val eb = f.arrayNode()
      bounds.foreach(eb.add)
      p.set[ObjectNode]("explicitBounds", eb)
      p.set[ObjectNode]("attributes", attrs("operation" -> op))
      hps.add(p)
    }
    if (hps.size() > 0) {
      val m = metric("delta-operation-duration", "seconds")
      val h = f.objectNode()
      h.put("aggregationTemporality", 2)
      h.set[ObjectNode]("dataPoints", hps)
      m.set[ObjectNode]("histogram", h)
      metrics.add(m)
    }

    val (nBatches, nRows) = bridge.batchTotals
    Seq("fhir-batches-total" -> nBatches,
        "fhir-batch-rows-total" -> nRows).foreach { case (name, v) =>
      val m = metric(name, "{Count}")
      val sum = f.objectNode()
      sum.put("aggregationTemporality", 2)
      sum.put("isMonotonic", true)
      sum.set[ObjectNode]("dataPoints",
        f.arrayNode().add(sumPoint(nowNano, v, f.arrayNode())))
      m.set[ObjectNode]("sum", sum)
      metrics.add(m)
    }

    val scope = f.objectNode()
    scope.set[ObjectNode]("scope", f.objectNode().put("name", "graft"))
    scope.set[ObjectNode]("metrics", metrics)
    val rm = f.objectNode()
    rm.set[ObjectNode]("resource", f.objectNode()
      .set("attributes", attrs("service.name" -> serviceName)))
    rm.set[ObjectNode]("scopeMetrics", f.arrayNode().add(scope))
    val root = f.objectNode()
    root.set[ObjectNode]("resourceMetrics", f.arrayNode().add(rm))
    mapper.writeValueAsString(root)
  }

  /** One POST to `<endpoint>/v1/metrics`; returns the HTTP status. */
  def pushOnce(): Int = {
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(
        s"${endpoint.stripSuffix("/")}/v1/metrics"))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        payload(), StandardCharsets.UTF_8))
      // bounded request time: a collector that accepts the connection
      // but never answers must surface as a logged timeout, not a
      // forever-blocked send that silently stops all export
      .timeout(java.time.Duration.ofSeconds(30))
      .build()
    http.send(req,
      java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  /** Background push loop (daemon). Failures are logged-and-continued:
    * a collector outage must never take the engine down with it.
    */
  def start(): Unit = synchronized {
    if (running) return
    running = true
    generation += 1
    val myGen = generation
    thread = new Thread(() => {
      while (running && generation == myGen) {
        try pushOnce()
        catch { case e: Exception =>
          System.err.println(s"otlp push failed: ${e.getMessage}")
        }
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => () }
      }
    }, "otlp-exporter")
    thread.setDaemon(true)
    thread.start()
  }

  def stop(): Unit = synchronized {
    running = false
    generation += 1 // retire the current loop even if start() races
    if (thread != null) thread.interrupt()
  }
}

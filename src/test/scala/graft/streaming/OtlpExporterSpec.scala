package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** The OTLP/HTTP JSON push path against an in-process collector stub:
  * payload structure (resourceMetrics → scopeMetrics → metrics),
  * metric name/attribute fidelity to the reference's OTel
  * instruments, histogram de-cumulation, and the POST itself.
  * No SparkSession needed — the exporter reads driver-side registries.
  */
class OtlpExporterSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def feedBridge(): PrometheusBridge = {
    val b = new PrometheusBridge
    b.resourcesWritten("Patient", 100)
    b.resourcesWritten("Condition", 40)
    b.resourcesDeleted("Patient", 5)
    b.mergeSeconds(0.2)
    b.mergeSeconds(0.003)
    b.mergeSeconds(45.0)
    b.batchSize(145)
    b
  }

  private def feedListener(): QueryProgressListener = {
    val l = new QueryProgressListener
    l.rowsPerSecond.put("fhir-default", 123.5)
    l.kafkaOffsets.put(("fhir-default", "fhir.events", "0", "end"), 42L)
    l
  }

  test("payload carries the reference's metric names, attributes, and " +
      "de-cumulated histogram buckets") {
    val ex = new OtlpExporter(feedBridge(), Some(feedListener()),
      "http://unused")
    val root = mapper.readTree(ex.payload(nowMs = 1700000000000L))
    val rm = root.get("resourceMetrics").get(0)
    val svc = rm.get("resource").get("attributes").get(0)
    assert(svc.get("key").asText == "service.name")
    assert(svc.get("value").get("stringValue").asText == "graft")
    val ms = rm.get("scopeMetrics").get(0).get("metrics")
      .elements().asScala.toSeq
    val byName = ms.map(m => m.get("name").asText -> m).toMap
    assert(byName.keySet == Set(
      "spark-streaming-query-processed-rows-per-second",
      "spark-streaming-query-kafka-offset",
      "resources-processed-total",
      "delta-operation-duration",
      "fhir-batches-total", "fhir-batch-rows-total"), byName.keySet)
    // metric-level units match the reference instruments exactly
    // (metrics.py:41,46; bundle_processor.py:23,29)
    assert(byName("delta-operation-duration").get("unit").asText
      == "seconds")
    assert(byName("resources-processed-total").get("unit").asText
      == "{Count}")
    assert(byName("spark-streaming-query-processed-rows-per-second")
      .get("unit").asText == "{Count}/s")
    assert(byName("spark-streaming-query-kafka-offset")
      .get("unit").asText == "{Num}")

    val rps = byName("spark-streaming-query-processed-rows-per-second")
      .get("gauge").get("dataPoints").get(0)
    assert(rps.get("asDouble").asDouble == 123.5)
    assert(rps.get("attributes").get(0).get("value")
      .get("stringValue").asText == "fhir-default")
    assert(rps.get("timeUnixNano").asText == "1700000000000000000")

    val sums = byName("resources-processed-total").get("sum")
    assert(sums.get("aggregationTemporality").asInt == 2)
    assert(sums.get("isMonotonic").asBoolean)
    val written = sums.get("dataPoints").elements().asScala.find(p =>
      p.get("attributes").elements().asScala.exists(a =>
        a.get("value").get("stringValue").asText == "Patient") &&
      p.get("attributes").elements().asScala.exists(a =>
        a.get("value").get("stringValue").asText == "written")).get
    assert(written.get("asInt").asText == "100")

    val h = byName("delta-operation-duration").get("histogram")
    assert(h.get("aggregationTemporality").asInt == 2)
    val hp = h.get("dataPoints").get(0)
    assert(hp.get("count").asText == "3")
    assert(math.abs(hp.get("sum").asDouble - 45.203) < 1e-9)
    val bc = hp.get("bucketCounts").elements().asScala
      .map(_.asText.toLong).toSeq
    val eb = hp.get("explicitBounds").elements().asScala
      .map(_.asDouble).toSeq
    // OTLP contract: one more bucket than bound, and the per-bucket
    // counts sum to the datapoint count (de-cumulation correctness)
    assert(bc.size == eb.size + 1)
    assert(bc.sum == 3L)
    // 0.003 lands in the first bucket (<=0.005), 0.2 in (0.1, 0.25],
    // 45.0 in (30, 60]
    assert(bc.head == 1L)
    assert(bc(eb.indexOf(0.25)) == 1L)
    assert(bc(eb.indexOf(60.0)) == 1L)

    assert(byName("fhir-batch-rows-total").get("sum").get("dataPoints")
      .get(0).get("asInt").asText == "145")
  }

  test("pushOnce POSTs the payload to /v1/metrics and a collector " +
      "stub accepts it") {
    val received =
      new java.util.concurrent.LinkedBlockingQueue[(String, String)]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/metrics",
      (x: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(x.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        received.put((x.getRequestHeaders.getFirst("Content-Type"),
          body))
        x.sendResponseHeaders(200, -1)
        x.close()
      })
    server.start()
    try {
      val ex = new OtlpExporter(feedBridge(), None,
        s"http://127.0.0.1:${server.getAddress.getPort}")
      assert(ex.pushOnce() == 200)
      val (ct, body) = received.poll(10,
        java.util.concurrent.TimeUnit.SECONDS)
      assert(ct == "application/json")
      val root = mapper.readTree(body)
      assert(root.get("resourceMetrics").get(0).get("scopeMetrics")
        .get(0).get("metrics").size() >= 3)
      // the background loop also delivers
      val loop = new OtlpExporter(feedBridge(), None,
        s"http://127.0.0.1:${server.getAddress.getPort}",
        intervalMs = 100)
      loop.start()
      try assert(
        received.poll(10, java.util.concurrent.TimeUnit.SECONDS) != null)
      finally loop.stop()
    } finally server.stop(0)
  }
}

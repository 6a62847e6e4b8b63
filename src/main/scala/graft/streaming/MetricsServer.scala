package graft.streaming

import graft.pipeline.BatchMetrics

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{DoubleAdder, LongAdder}
import scala.jdk.CollectionConverters._

/** Prometheus exposition for the engine — the reference serves a
  * Prometheus scrape endpoint on `metrics_addr:metrics_port`
  * (src/main.py:34 `start_http_server`, settings.py:63–64) with OTel
  * instruments for streaming progress (src/metrics.py:37–48) and Delta
  * operation durations / processed-resource counts
  * (src/bundle_processor.py:21–31). This is the same surface in
  * Prometheus text format 0.0.4 over the JDK's built-in HTTP server —
  * no exporter dependency needed.
  *
  * Metric names match the reference's after the standard OTel→
  * Prometheus sanitization (dashes become underscores):
  *
  *  - `spark_streaming_query_processed_rows_per_second{query_name=}`
  *  - `spark_streaming_query_kafka_offset{type=,query_name=,topic=,partition=}`
  *  - `delta_operation_duration_seconds{operation=}` histogram
  *    (bundle_processor.py:21–25, operations merge/delete/upkeep)
  *  - `resources_processed_total{operation=,resource_type=}` counter
  *    (bundle_processor.py:27–31; operation ∈ written|delete like
  *    :264–266 / :294–296)
  *
  * Driver-side only: the registry is a handful of adders fed by the
  * listener callbacks — nothing here touches the data path, so scale
  * is unaffected by table size.
  */
final class PrometheusBridge extends BatchMetrics {

  /** OTel-default-style duration buckets, in seconds. */
  private val buckets =
    Array(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0,
      10.0, 30.0, 60.0)

  final class Histo {
    val counts = Array.fill(buckets.length)(new LongAdder)
    val sum = new DoubleAdder
    val n = new LongAdder
    def record(v: Double): Unit = {
      var i = 0
      while (i < buckets.length) {
        if (v <= buckets(i)) counts(i).increment()
        i += 1
      }
      sum.add(v); n.increment()
    }
  }

  private val durations = new ConcurrentHashMap[String, Histo]()
  private val processed =
    new ConcurrentHashMap[(String, String), LongAdder]()
  private val batchRows = new LongAdder
  private val batchCount = new LongAdder

  private def histo(op: String): Histo =
    durations.computeIfAbsent(op, _ => new Histo)
  private def counter(op: String, rt: String): LongAdder =
    processed.computeIfAbsent((op, rt), _ => new LongAdder)

  // ---- BatchMetrics hooks (BatchProcessor timing seams) -------------
  def batchSize(rows: Long): Unit = {
    batchRows.add(rows); batchCount.increment()
  }
  def resourcesWritten(resourceType: String, n: Long): Unit =
    counter("written", resourceType).add(n) // bundle_processor.py:265
  def resourcesDeleted(resourceType: String, n: Long): Unit =
    counter("delete", resourceType).add(n) // bundle_processor.py:295
  def mergeSeconds(s: Double): Unit = histo("merge").record(s)
  def deleteSeconds(s: Double): Unit = histo("delete").record(s)
  def upkeepSeconds(s: Double): Unit = histo("upkeep").record(s)

  // ---- snapshots for push exporters (OTLP) --------------------------
  private[streaming] def durationSnapshot
      : Seq[(String, Array[Long], Double, Long)] =
    durations.asScala.toSeq.sortBy(_._1).map { case (op, h) =>
      (op, h.counts.map(_.sum()), h.sum.sum(), h.n.sum())
    }
  private[streaming] def processedSnapshot
      : Seq[((String, String), Long)] =
    processed.asScala.toSeq.sortBy(_._1.toString)
      .map { case (k, n) => (k, n.sum()) }
  private[streaming] def batchTotals: (Long, Long) =
    (batchCount.sum(), batchRows.sum())
  private[streaming] def bucketBounds: Array[Double] = buckets

  /** Render the full exposition page (text format 0.0.4). */
  def scrape(listener: Option[QueryProgressListener]): String = {
    val sb = new StringBuilder
    def esc(s: String) =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

    listener.foreach { l =>
      sb ++= "# TYPE spark_streaming_query_processed_rows_per_second gauge\n"
      l.rowsPerSecond.asScala.toSeq.sortBy(_._1).foreach { case (q, v) =>
        sb ++= s"""spark_streaming_query_processed_rows_per_second{query_name="${esc(q)}"} $v"""
        sb += '\n'
      }
      sb ++= "# TYPE spark_streaming_query_kafka_offset gauge\n"
      l.kafkaOffsets.asScala.toSeq.sortBy(_._1.toString).foreach {
        case ((q, topic, part, kind), off) =>
          sb ++= s"""spark_streaming_query_kafka_offset{type="${esc(kind)}",query_name="${esc(q)}",topic="${esc(topic)}",partition="$part"} $off"""
          sb += '\n'
      }
    }

    sb ++= "# TYPE resources_processed_total counter\n"
    processed.asScala.toSeq.sortBy(_._1.toString).foreach {
      case ((op, rt), n) =>
        sb ++= s"""resources_processed_total{operation="${esc(op)}",resource_type="${esc(rt)}"} ${n.sum}"""
        sb += '\n'
    }

    sb ++= "# TYPE delta_operation_duration_seconds histogram\n"
    durations.asScala.toSeq.sortBy(_._1).foreach { case (op, h) =>
      buckets.zipWithIndex.foreach { case (b, i) =>
        sb ++= s"""delta_operation_duration_seconds_bucket{operation="${esc(op)}",le="$b"} ${h.counts(i).sum}"""
        sb += '\n'
      }
      sb ++= s"""delta_operation_duration_seconds_bucket{operation="${esc(op)}",le="+Inf"} ${h.n.sum}"""
      sb += '\n'
      sb ++= s"""delta_operation_duration_seconds_sum{operation="${esc(op)}"} ${h.sum.sum}"""
      sb += '\n'
      sb ++= s"""delta_operation_duration_seconds_count{operation="${esc(op)}"} ${h.n.sum}"""
      sb += '\n'
    }

    sb ++= "# TYPE fhir_batches_total counter\n"
    sb ++= s"fhir_batches_total ${batchCount.sum}\n"
    sb ++= "# TYPE fhir_batch_rows_total counter\n"
    sb ++= s"fhir_batch_rows_total ${batchRows.sum}\n"
    sb.result()
  }
}

/** The scrape endpoint itself (`start_http_server` parity, main.py:34).
  * Bind with port 0 to let the OS pick (tests); `boundPort` reports it.
  */
final class MetricsServer(bridge: PrometheusBridge,
                          listener: Option[QueryProgressListener],
                          addr: String = "127.0.0.1", // settings.py:64
                          port: Int = 8000) {        // settings.py:63
  private val server =
    com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress(addr, port), 0)
  server.createContext("/metrics",
    (exchange: com.sun.net.httpserver.HttpExchange) => {
      val body = bridge.scrape(listener)
        .getBytes(StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type",
        "text/plain; version=0.0.4; charset=utf-8")
      exchange.sendResponseHeaders(200, body.length.toLong)
      val os = exchange.getResponseBody
      try os.write(body) finally os.close()
    })
  server.setExecutor(null) // serve on the dispatch thread; scrape is cheap
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

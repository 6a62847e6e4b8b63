package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Streaming observability — the reference's `StreamingQueryListener`
  * surface (src/metrics.py:70–144): per-query processed-rows/s gauge
  * and per-(query, topic, partition) source-offset gauges parsed from
  * the progress event's startOffset/endOffset/latestOffset JSON.
  * Metric names kept; the sink here is an in-memory registry that a
  * Prometheus/OTel bridge can scrape.
  */
final class QueryProgressListener extends StreamingQueryListener {

  /** query name → last processedRowsPerSecond. */
  val rowsPerSecond = new ConcurrentHashMap[String, Double]()
  /** (query, topic, partition, kind) → offset; kind ∈ start|end|latest. */
  val kafkaOffsets = new ConcurrentHashMap[(String, String, String, String), Long]()
  /** query name → cumulative input rows. */
  val inputRows = new ConcurrentHashMap[String, Long]()
  /** query id → name, so termination (which carries only ids) can
    * clear that query's gauges.
    */
  private val names = new ConcurrentHashMap[String, String]()
  /** query name → last batchId whose rows were counted: a restarted
    * query re-emits progress for its replayed batch, and summing it
    * twice would inflate the cumulative row total.
    */
  private val lastBatch = new ConcurrentHashMap[String, java.lang.Long]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  /** A terminated query must stop scraping: a gauge frozen at its
    * last value reads as a live rate forever. The cumulative
    * input_rows total is kept — it is a counter, not a gauge.
    */
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    Option(names.remove(event.id.toString)).foreach { name =>
      rowsPerSecond.remove(name)
      kafkaOffsets.keySet.asScala
        .filter(_._1 == name).foreach(kafkaOffsets.remove)
    }
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    names.put(p.id.toString, name)
    if (!p.processedRowsPerSecond.isNaN)
      rowsPerSecond.put(name, p.processedRowsPerSecond)
    // java.lang.Long, not Long: a Scala-primitive map would unbox the
    // first put's null to 0 and silently skip batch 0's rows.
    // batchId REGRESSING below the watermark is a restart with a
    // fresh/reset checkpoint under the same name — a new counting
    // epoch whose batch 0 must be counted, not mistaken for a
    // duplicate re-delivery (only an EQUAL batchId is one of those).
    val counted: java.lang.Long = lastBatch.put(name, p.batchId)
    if (counted == null || counted.longValue() != p.batchId)
      inputRows.merge(name, p.numInputRows, (a, b) => a + b)
    p.sources.foreach { s =>
      recordOffsets(name, "start", s.startOffset)
      recordOffsets(name, "end", s.endOffset)
      recordOffsets(name, "latest", s.latestOffset)
    }
  }

  /** Kafka offset JSON has the shape
    * {"topic":{"0":123,"1":456}} (metrics.py:96–113). Parsed with a
    * small regex walk — no JSON library needed for this fixed shape.
    */
  // compiled once: three recordOffsets calls per progress event would
  // otherwise re-compile both patterns on the listener-bus thread
  private val topicBlock = """"([^"]+)"\s*:\s*\{([^}]*)\}""".r
  private val partOffset = """"(\d+)"\s*:\s*(-?\d+)""".r

  private def recordOffsets(query: String, kind: String,
                            json: String): Unit = {
    if (json == null) return
    topicBlock.findAllMatchIn(json).foreach { tm =>
      val topic = tm.group(1)
      partOffset.findAllMatchIn(tm.group(2)).foreach { pm =>
        kafkaOffsets.put((query, topic, pm.group(1), kind),
          pm.group(2).toLong)
      }
    }
  }

  /** Snapshot for scraping/logging. */
  def snapshot(): Map[String, Any] = Map(
    "rows_per_second" -> rowsPerSecond.asScala.toMap,
    "input_rows" -> inputRows.asScala.toMap,
    "kafka_offsets" -> kafkaOffsets.asScala.toMap)
}

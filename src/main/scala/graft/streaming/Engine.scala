package graft.streaming

import graft.pipeline.{BatchMetrics, BatchProcessor, BundlePipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Kafka TLS client settings — the reference's `KafkaSslSettings`
  * (src/settings.py:9–15), same defaults: PKCS12 stores at the
  * operator-mounted cert paths.
  */
final case class KafkaSslSettings(
    truststoreType: String = "PKCS12",                       // settings.py:10
    truststoreLocation: String = "/opt/kafka-certs/ca.p12",  // settings.py:11
    truststorePassword: String = "",                         // settings.py:12
    keystoreType: String = "PKCS12",                         // settings.py:13
    keystoreLocation: String = "/opt/kafka-certs/user.p12",  // settings.py:14
    keystorePassword: String = "")                           // settings.py:15

/** Engine settings — mirrors the reference's typed-settings surface
  * (bzkf/fhir-to-lakehouse src/settings.py), same defaults.
  */
final case class Settings(
    kafkaBootstrapServers: String = "localhost:9094", // settings.py:21
    kafkaTopics: Seq[String] = Seq("fhir.msg"),
    maxOffsetsPerTrigger: Long = 10000L,     // settings.py:23
    minOffsetsPerTrigger: Long = 1L,         // settings.py:24
    maxTriggerDelay: String = "15m",         // settings.py:25
    securityProtocol: String = "PLAINTEXT",  // settings.py:26
    kafkaSsl: KafkaSslSettings = KafkaSslSettings(),
    // true like the reference (settings.py:27) — silently tolerating
    // lost Kafka offsets is the unsafe default
    failOnDataLoss: Boolean = true,
    checkpointDir: String = "/tmp/graft/checkpoint",
    deltaDatabaseDir: String = "/tmp/graft/delta/default",
    triggerProcessingTime: String = "0 seconds", // settings.py:40
    // drain-all-then-stop batch mode (backfill/reprocessing runs)
    triggerAvailableNow: Boolean = false,
    resourceTypes: Seq[String] =             // settings.py:69–75
      Seq("Patient", "Observation", "Encounter", "Condition", "Procedure"),
    upkeepInterval: Int = 50,                // settings.py:39
    vacuumRetentionHours: Long = 24L,        // settings.py:62
    clusteringColumns: Map[String, Seq[String]] = Map.empty, // settings.py:51
    outputMode: String = "append",           // settings.py:41
    logResourceCountBySourceTopic: Boolean = false, // settings.py:66–68
    metricsAddr: String = "127.0.0.1",       // settings.py:64
    metricsPort: Int = 8000,                 // settings.py:63
    // OTLP/HTTP push endpoint (collector base url, e.g.
    // http://otel-collector:4318) — None keeps scrape-only, the
    // reference's default deployment
    otlpEndpoint: Option[String] = None,
    otlpIntervalMs: Long = 10000L,
    deltaCheckpointInterval: Int = 100,      // settings.py:48
    autoOptimizeOptimizeWrite: Boolean = false, // settings.py:47
    autoOptimizeAutoCompact: Boolean = false,   // settings.py:46
    // deployment surface (SparkSettings, settings.py:30–41, and the
    // top-level AWS/metastore fields, settings.py:58–64). The S3A and
    // driver-memory values are threaded into the session builder by
    // [[Engine.sessionConfigs]]; inert without a hadoop-aws jar, like
    // the reference's spark.jars.packages line without egress.
    master: String = "local[*]",             // settings.py:32
    s3Endpoint: String = "localhost:9000",   // settings.py:33
    s3ConnectionSslEnabled: String = "false", // settings.py:34 (str there too)
    warehouseDir: String = "warehouse",      // settings.py:35
    driverMemory: String = "4g",             // settings.py:38
    // the reference bakes working MinIO dev credentials in as defaults
    // (settings.py:58–59, "admin"/"miniopass"); deliberately NOT
    // mirrored — session configs are exposed on the Spark UI
    // environment page, so credentials only flow when explicitly set
    // (otherwise the S3A provider chain — env vars, instance profile —
    // applies)
    awsAccessKeyId: String = "",
    awsSecretAccessKey: String = "",
    // when set, every table a batch touches is (re-)registered in the
    // catalog from inside the batch path (settings.py:64 + main.py:96–98)
    metastoreUrl: Option[String] = None,
    // keep each table's exported _delta_log current per batch, so
    // external delta readers track the stream the way they track the
    // reference's real Delta tables (no flag there — its tables ARE
    // delta; here the mirror is opt-in)
    deltaExport: Boolean = false)

/** The streaming shell: N+1 independent `foreachBatch` queries over one
  * prepared source — one per configured resource type plus a default
  * query for everything else (reference main.py:157–188; the fan-out
  * isolates starvation between types, comment main.py:119–124).
  *
  * Source-agnostic: any streaming DataFrame with the Kafka wire schema
  * plugs in — the real Kafka source via [[kafkaOptions]] when the
  * spark-sql-kafka jar is on the classpath, a file source or
  * `MemoryStream[KafkaRecord]` in tests. Each query gets its own
  * checkpoint dir `{checkpointDir}/{resourceType}` so offsets replay
  * independently (T3: at-least-once delivery + idempotent MERGE ⇒
  * exactly-once table state). The micro-batch + idempotent-sink
  * design follows the Structured Streaming model (PAPERS.md:
  * SIGMOD 2018).
  */
object Engine {

  /** Checkpoint locations of queries THIS process started, so a second
    * engine misconfigured onto the same checkpointDir is refused
    * loudly instead of silently stopping the first engine's query
    * (stopActiveRunOnRestart recovers the same query id from the
    * shared checkpoint). The slot is RESERVED atomically (compute)
    * BEFORE the query starts — a check-then-start-then-put sequence
    * would let two concurrent starts both pass the check, and the
    * loser would silently stop the winner, exactly the failure this
    * guard refuses. Values are either an in-flight reservation token
    * or the live query; terminated entries are purged on each start.
    */
  private val activeByCheckpoint =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Smallest-free-numeric-suffix disambiguation of a session-global
    * streaming query name (shared by [[Engine]]'s per-type queries and
    * [[ChangeFeed]] consumers). Best-effort: two concurrent starts can
    * still race to the same free name — Spark then fails the loser
    * loudly, which is acceptable; the helper exists so the NORMAL
    * multi-consumer path doesn't fail at all.
    */
  private[streaming] def uniqueQueryName(
      spark: org.apache.spark.sql.SparkSession, base: String): String = {
    val taken = spark.streams.active.flatMap(q => Option(q.name)).toSet
    if (!taken.contains(base)) base
    else Iterator.from(1).map(i => s"$base-$i")
      .find(!taken.contains(_)).get
  }

  /** Session-builder configuration mirroring the reference's
    * SparkSession.builder chain (main.py:60–100): driver memory,
    * console-progress/Prometheus UI flags, warehouse dir, S3A
    * endpoint + path-style + magic-committer + credentials, and — when
    * `metastoreUrl` is set — the Hive metastore wiring (main.py:96–98).
    * Apply before `getOrCreate`:
    * {{{
    * Engine.sessionConfigs(s).foldLeft(
    *   SparkSession.builder().master(s.master)) {
    *     case (b, (k, v)) => b.config(k, v) }.getOrCreate()
    * }}}
    */
  def sessionConfigs(s: Settings): Map[String, String] = {
    val base = Map(
      "spark.driver.memory" -> s.driverMemory,            // main.py:60–63
      "spark.ui.showConsoleProgress" -> "false",          // main.py:64
      "spark.ui.prometheus.enabled" -> "true",            // main.py:65
      "spark.sql.warehouse.dir" -> s.warehouseDir,        // main.py:70
      "spark.hadoop.fs.s3a.path.style.access" -> "true",  // main.py:79
      "spark.hadoop.fs.s3a.endpoint" -> s.s3Endpoint,     // main.py:82–85
      "spark.hadoop.fs.s3a.connection.ssl.enabled" ->
        s.s3ConnectionSslEnabled,                         // main.py:86–89
      "fs.s3a.committer.name" -> "magic",                 // main.py:90
      "fs.s3a.committer.magic.enabled" -> "true")         // main.py:91
    // credentials only when explicitly configured (main.py:92–93 emits
    // dev defaults unconditionally; see the Settings field comment)
    val creds =
      (if (s.awsAccessKeyId.nonEmpty)
        Map("fs.s3a.access.key" -> s.awsAccessKeyId) else Map.empty) ++
      (if (s.awsSecretAccessKey.nonEmpty)
        Map("fs.s3a.secret.key" -> s.awsSecretAccessKey) else Map.empty)
    val all = base ++ creds
    s.metastoreUrl.fold(all)(url => all ++ Map(           // main.py:96–99
      "spark.hive.metastore.uris" -> url,
      "spark.sql.catalogImplementation" -> "hive"))
  }

  /** The Kafka source option set — identical option names/defaults to
    * the reference (main.py:125–153). Apply to
    * `spark.readStream.format("kafka")` when the connector jar exists.
    * With `securityProtocol = "SSL"` the PKCS12 truststore/keystore
    * client options are emitted exactly as main.py:137–153; any other
    * protocol omits every `kafka.ssl.*` key.
    */
  def kafkaOptions(s: Settings): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> s.kafkaBootstrapServers,
      "subscribe" -> s.kafkaTopics.mkString(","),
      "startingOffsets" -> "earliest",
      "groupIdPrefix" -> "fhir-to-lakehouse", // main.py:131
      "maxOffsetsPerTrigger" -> s.maxOffsetsPerTrigger.toString,
      "minOffsetsPerTrigger" -> s.minOffsetsPerTrigger.toString,
      "maxTriggerDelay" -> s.maxTriggerDelay,
      "failOnDataLoss" -> s.failOnDataLoss.toString,
      "includeHeaders" -> "true")
    if (s.securityProtocol != "SSL") base
    else base ++ Map( // main.py:137–153
      "kafka.security.protocol" -> "SSL",
      "kafka.ssl.truststore.type" -> s.kafkaSsl.truststoreType,
      "kafka.ssl.truststore.location" -> s.kafkaSsl.truststoreLocation,
      "kafka.ssl.truststore.password" -> s.kafkaSsl.truststorePassword,
      "kafka.ssl.keystore.type" -> s.kafkaSsl.keystoreType,
      "kafka.ssl.keystore.location" -> s.kafkaSsl.keystoreLocation,
      "kafka.ssl.keystore.password" -> s.kafkaSsl.keystorePassword)
  }

  /** Start the N+1 fan-out queries over a Kafka-wire-schema streaming
    * DataFrame. Returns the running queries (await with
    * `spark.streams.awaitAnyTermination()`, which crashes the process
    * if any query dies — T7).
    */
  def start(source: DataFrame, settings: Settings,
            metrics: BatchMetrics = BatchMetrics.noop): Seq[StreamingQuery] = {
    val prepared = BundlePipeline.prepare(source)
    // Delta's optimized-write/auto-compact properties (settings.py:46–47,
    // both default false like the reference) are scoped to THIS
    // processor's table handles, never written to the session conf —
    // two engines sharing a session must not race on global flags
    val processor = new BatchProcessor(
      settings.deltaDatabaseDir,
      settings.upkeepInterval,
      settings.vacuumRetentionHours * 3600 * 1000,
      settings.clusteringColumns,
      metrics,
      settings.logResourceCountBySourceTopic,
      settings.deltaCheckpointInterval,
      optimizeWrite = Some(settings.autoOptimizeOptimizeWrite),
      autoCompact = Some(settings.autoOptimizeAutoCompact),
      registerTables = settings.metastoreUrl.isDefined,
      deltaExport = settings.deltaExport)

    val trigger =
      if (settings.triggerAvailableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime(settings.triggerProcessingTime) // T1

    def startQuery(name: String, df: DataFrame): StreamingQuery = {
      // query names are session-global; a second engine on the same
      // session must not fail to start because the first already owns
      // "Patient" — disambiguate with the smallest free numeric suffix
      // (checkpoint paths keep the PLAIN name: they are already scoped
      // by this engine's checkpointDir and must be restart-stable)
      val queryName = uniqueQueryName(source.sparkSession, name)
      // the suffix disambiguates the NAME, but two engines pointed at
      // the SAME checkpointDir would still share this query's
      // checkpoint — the second recovers the first's query id and
      // Spark's stopActiveRunOnRestart SILENTLY stops the running one.
      // Refuse loudly instead (the cross-engine analogue of the
      // duplicate-resourceTypes check below).
      val ckptLoc = s"${settings.checkpointDir}/$name"
      // Drop terminated entries so the map tracks only live queries
      // and in-flight reservations (no unbounded retention).
      activeByCheckpoint.entrySet.removeIf { e =>
        e.getValue match {
          case q: StreamingQuery => !q.isActive
          case _ => false
        }
      }
      // Reserve the slot ATOMICALLY before starting: compute keeps an
      // active prior (or another start's reservation) in place and we
      // refuse; only a free/stale slot yields our token.
      val reservation = new Object
      val claimed = activeByCheckpoint.compute(ckptLoc, (_, cur) =>
        cur match {
          case q: StreamingQuery if q.isActive => cur
          case null | _: StreamingQuery => reservation
          case other => other // another start's in-flight reservation
        })
      if (claimed ne reservation) {
        val who = claimed match {
          case q: StreamingQuery => Option(q.name).getOrElse(q.id).toString
          case _ => "a concurrent Engine.start in this process"
        }
        throw new IllegalStateException(
          s"checkpoint $ckptLoc is already in use by the active query " +
            s"'$who' — two engines " +
            "must not share a checkpointDir; configure a distinct " +
            "Settings.checkpointDir per engine")
      }
      val q =
        try {
          df.writeStream
            .queryName(queryName)
            .outputMode(settings.outputMode) // T2, settings.py:41
            .option("checkpointLocation", ckptLoc)
            .trigger(trigger)
            .foreachBatch { (batch: DataFrame, batchId: Long) =>
              processor.processBatch(batch, batchId): Unit // S2
            }
            .start()
        } catch {
          case t: Throwable =>
            activeByCheckpoint.remove(ckptLoc, reservation)
            throw t
        }
      activeByCheckpoint.replace(ckptLoc, reservation, q)
      q
    }

    // checkpoint paths are keyed by the PLAIN name under this engine's
    // checkpointDir — a duplicate resource type (config typo) or one
    // literally named "default" would give two queries the same
    // checkpoint, and Spark's stopActiveRunOnRestart then SILENTLY
    // stops the first when the second recovers the same query id.
    // Name disambiguation can't help (checkpoints must be
    // restart-stable), so refuse loudly.
    val dupes = settings.resourceTypes
      .groupBy(identity).collect { case (rt, vs) if vs.size > 1 => rt }
    if (dupes.nonEmpty)
      throw new IllegalArgumentException(
        s"duplicate resourceTypes: ${dupes.mkString(", ")}")
    if (settings.resourceTypes.contains("default"))
      throw new IllegalArgumentException(
        "\"default\" is reserved for the catch-all query; rename the " +
          "resource type")
    val typed = settings.resourceTypes.map { rt =>
      startQuery(rt, BundlePipeline.forType(prepared, rt)) // P7
    }
    val default = startQuery("default",
      BundlePipeline.forOtherTypes(prepared, settings.resourceTypes)) // P8
    typed :+ default
  }

  /** True when the spark-sql-kafka connector is resolvable on this
    * classpath (DataSource registration probe — the same lookup
    * `format("kafka")` performs). KafkaActivationSpec keys off this so
    * the live-Kafka path activates automatically the day the jar
    * appears, instead of bit-rotting silently.
    */
  def kafkaConnectorAvailable(spark: SparkSession): Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("kafka", spark.sessionState.conf)
      true
    } catch { case _: Throwable => false }

  /** The live Kafka wire DataFrame exactly as the engine consumes it
    * (reference main.py:125–153): `format("kafka")` + [[kafkaOptions]].
    * Building the unresolved plan needs only the connector jar — no
    * broker contact until the stream starts — so conformance tests can
    * assert the full option surface and wire schema offline.
    */
  def kafkaSource(spark: SparkSession, settings: Settings): DataFrame =
    kafkaOptions(settings)
      .foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }
      .load()

  /** Convenience: full engine from a live Kafka source (requires the
    * spark-sql-kafka connector jar at runtime).
    */
  def startFromKafka(spark: SparkSession, settings: Settings,
                     metrics: BatchMetrics = BatchMetrics.noop): Seq[StreamingQuery] =
    start(kafkaSource(spark, settings), settings, metrics)
}

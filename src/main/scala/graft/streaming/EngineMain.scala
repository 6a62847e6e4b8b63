package graft.streaming

import graft.sources.FileBundleSource
import org.apache.spark.sql.SparkSession

/** Runnable engine: ingest a FHIR bundle journal directory into
  * lakehouse tables — the `python src/main.py` equivalent. Default
  * source is the journal-dir file source; set GRAFT_KAFKA_BOOTSTRAP
  * to ingest from a live broker through `Engine.startFromKafka`
  * (needs the spark-sql-kafka connector jar at runtime).
  *
  * {{{
  * sbt "runMain graft.streaming.EngineMain <journalDir> <dbDir> [--follow]"
  * }}}
  *
  * Default is drain-and-stop (Trigger.AvailableNow); `--follow` keeps
  * the queries running like the reference's long-lived deployment
  * (`awaitAnyTermination` crashes the process if any query dies — T7).
  */
object EngineMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: EngineMain <journalDir> <dbDir> [--follow]")
    val Array(journalDir, dbDir) = args.take(2)
    val follow = args.contains("--follow")
    // a nonexistent journal dir makes the file stream wait forever
    // (streaming sources tolerate missing globs) — fail fast on the
    // obvious typo instead of hanging the first micro-batch
    require(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(journalDir)),
      s"journal dir does not exist: $journalDir")
    val settings = Settings(
      checkpointDir = s"$dbDir/_checkpoints",
      deltaDatabaseDir = dbDir,
      triggerAvailableNow = !follow,
      master = sys.env.getOrElse("SPARK_MASTER", "local[4]"),
      warehouseDir = s"$dbDir/_warehouse",
      metastoreUrl = sys.env.get("GRAFT_METASTORE_URL"),
      // OTLP deployment surface reaches the runnable entrypoint the
      // way the reference wires its collector through settings/env
      // (reference src/settings.py env-first config): endpoint unset
      // keeps the scrape-only default
      otlpEndpoint = sys.env.get("GRAFT_OTLP_ENDPOINT"),
      otlpIntervalMs = sys.env.get("GRAFT_OTLP_INTERVAL_MS")
        .map(v => try v.trim.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"GRAFT_OTLP_INTERVAL_MS must be a millisecond count, got: $v")
        }).getOrElse(10000L),
      // scrape endpoint placement is env-first like the reference
      // (settings.py:63–64 METRICS_PORT / METRICS_ADDR)
      metricsAddr = sys.env.getOrElse("GRAFT_METRICS_ADDR", "127.0.0.1"),
      metricsPort = sys.env.get("GRAFT_METRICS_PORT")
        .map { v =>
          val p = try v.trim.toInt catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"GRAFT_METRICS_PORT must be a port number, got: $v")
          }
          // range-check here, where the fail-fast path lives: an
          // out-of-range port would otherwise surface as an
          // InetSocketAddress error inside MetricsServer and be
          // swallowed by the endpoint-unavailable fallback below —
          // silently dark monitoring instead of a refused misconfig
          if (p < 1 || p > 65535) throw new IllegalArgumentException(
            s"GRAFT_METRICS_PORT must be in 1..65535, got: $v")
          p
        }.getOrElse(8000))
    // the reference's builder chain (main.py:60–100) via sessionConfigs;
    // hive wiring is skipped here — no Hive jars in this environment,
    // and in-engine registration targets the session catalog anyway
    val spark = (Engine.sessionConfigs(settings) -
        "spark.sql.catalogImplementation" - "spark.hive.metastore.uris")
      .foldLeft(SparkSession.builder()
        .master(settings.master)
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new QueryProgressListener
    spark.streams.addListener(listener)
    // Prometheus exposition like the reference's start_http_server
    // (main.py:34) — serves for the life of the engine
    val bridge = new PrometheusBridge
    val metricsServer =
      try Some(new MetricsServer(bridge, Some(listener),
        settings.metricsAddr, settings.metricsPort))
      catch { case e: Throwable =>
        System.err.println(s"metrics endpoint unavailable: ${e.getMessage}")
        None
      }
    if (metricsServer.isDefined)
      println(s"metrics on http://${settings.metricsAddr}:" +
        s"${metricsServer.get.boundPort}/metrics")
    // OTLP push alongside the scrape when a collector is configured
    val otlp = settings.otlpEndpoint.map { ep =>
      val ex = new OtlpExporter(bridge, Some(listener), ep,
        settings.otlpIntervalMs)
      ex.start()
      println(s"otlp push to $ep/v1/metrics every " +
        s"${settings.otlpIntervalMs}ms")
      ex
    }
    // source selection mirrors the reference's deployment: set
    // GRAFT_KAFKA_BOOTSTRAP (+ optional GRAFT_KAFKA_TOPICS /
    // GRAFT_KAFKA_SECURITY_PROTOCOL) to ingest from a live broker via
    // Engine.startFromKafka — requires the spark-sql-kafka connector
    // jar at runtime; the exact option surface is conformance-tested
    // against reference main.py:125-153 in EngineSpec. Unset, the
    // journal-dir file source serves the same wire schema.
    val queries = sys.env.get("GRAFT_KAFKA_BOOTSTRAP") match {
      case Some(bootstrap) =>
        val ks = settings.copy(
          kafkaBootstrapServers = bootstrap,
          kafkaTopics = sys.env.get("GRAFT_KAFKA_TOPICS")
            // empty/whitespace values (common in compose templating)
            // fall back to the default topic instead of subscribe=""
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .filter(_.nonEmpty)
            .getOrElse(settings.kafkaTopics),
          securityProtocol = sys.env
            .getOrElse("GRAFT_KAFKA_SECURITY_PROTOCOL",
              settings.securityProtocol))
        println(s"source: kafka @ $bootstrap " +
          s"topics=${ks.kafkaTopics.mkString(",")}")
        Engine.startFromKafka(spark, ks, bridge)
      case None =>
        Engine.start(
          FileBundleSource.stream(spark, journalDir), settings, bridge)
    }
    try {
      if (follow) spark.streams.awaitAnyTermination()
      else {
        queries.foreach(_.awaitTermination())
        println(s"ingest complete: ${listener.snapshot()}")
      }
    } finally {
      otlp.foreach(_.stop())
      metricsServer.foreach(_.stop())
    }
    spark.stop()
  }
}

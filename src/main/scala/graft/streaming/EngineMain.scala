package graft.streaming

import graft.sources.FileBundleSource
import org.apache.spark.sql.SparkSession

/** Runnable engine: ingest a FHIR bundle journal directory into
  * lakehouse tables — the `python src/main.py` equivalent wired to the
  * file source (swap in `Engine.startFromKafka` when the Kafka
  * connector jar is present).
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
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new QueryProgressListener
    spark.streams.addListener(listener)
    val settings = Settings(
      checkpointDir = s"$dbDir/_checkpoints",
      deltaDatabaseDir = dbDir,
      triggerAvailableNow = !follow)
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
    val queries = Engine.start(
      FileBundleSource.stream(spark, journalDir), settings, bridge)
    try {
      if (follow) spark.streams.awaitAnyTermination()
      else {
        queries.foreach(_.awaitTermination())
        println(s"ingest complete: ${listener.snapshot()}")
      }
    } finally metricsServer.foreach(_.stop())
    spark.stop()
  }
}

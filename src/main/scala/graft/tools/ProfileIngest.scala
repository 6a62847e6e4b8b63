package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stage-by-stage wall-clock profile of the ingest path (the
  * q_ingest_e2e shape): synthesize bundles → prepare → dedup → encode
  * → table upsert → read-back. Each stage is materialized through the
  * noop sink so the measured cost is that stage's marginal work on top
  * of the (re-executed) upstream. Run:
  *   sbt "runMain graft.tools.ProfileIngest /root/testdata/sf0.1"
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val bundles = spark.read.parquet(s"$dir/orders.parquet").select(
      to_json(struct(array(struct(
        to_json(struct(
          lit("Patient").as("resourceType"),
          col("o_orderkey").cast(StringType).as("id"),
          (col("o_orderstatus") === "O").as("active"))).as("resource"),
        struct(lit("PUT").as("method"),
          concat_ws("/", lit("Patient"), col("o_orderkey")).as("url"))
          .as("request"))).as("entry"))).as("value"),
      lit(0).as("partition"),
      col("o_orderkey").as("offset"))

    // warmup pass so JIT/codegen doesn't land on the first stage
    noop(bundles)

    time("synthesize (to_json)")(noop(bundles))
    val prepared = graft.pipeline.BundlePipeline.prepare(bundles)
    time("prepare (from_json+explode)")(noop(prepared))
    val deduped = graft.pipeline.BundlePipeline.deduplicate(prepared)
    time("dedup (window)")(noop(deduped))
    val encoded = graft.fhir.FhirEncoder.encode(
      deduped.filter(col("request_method") === "PUT"), "Patient")
    time("encode (from_json)")(noop(encoded))

    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_profile").toString
    val bp = new graft.pipeline.BatchProcessor(tableDir, upkeepInterval = 0)
    time("full processBatch + upsert") {
      bp.processBatch(prepared, batchId = 1)
    }
    time("table read-back") {
      noop(graft.tables.ResourceTable(
        spark, s"$tableDir/Patient.parquet").read())
    }

    // ---- upsert sub-profile: where do the write-path seconds go? ----
    val cached = encoded.cache()
    noop(cached) // materialize so the timings below are write-only
    val base = java.nio.file.Files
      .createTempDirectory("graft_profile_w").toString
    time("raw write (zstd)") {
      cached.write.mode("overwrite").option("compression", "zstd")
        .parquet(s"$base/zstd")
    }
    time("raw write (snappy)") {
      cached.write.mode("overwrite").option("compression", "snappy")
        .parquet(s"$base/snappy")
    }
    time("raw write (zstd, 4 files)") {
      cached.coalesce(4).write.mode("overwrite")
        .option("compression", "zstd").parquet(s"$base/zstd4")
    }
    time("footer stats (driver)") {
      val conf = spark.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(conf)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/zstd"))
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
        .foreach(p => graft.tables.FileStats.readFooter(conf, p))
    }
    time("upsert into fresh table") {
      val t2 = graft.tables.ResourceTable(spark, s"$base/fresh.parquet")
        .createIfNotExists(cached.schema)
      t2.upsert(cached, "id")
    }
    spark.stop()
  }
}

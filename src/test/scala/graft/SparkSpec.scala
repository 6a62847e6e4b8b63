package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM). */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .withExtensions(new graft.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fhir/$name")
    require(in != null, s"missing fixture $name")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Kafka-wire-shaped batch DataFrame from (bundleJson, partition,
    * offset) triples — what the reference's unit tests construct
    * (tests/unit/test_bundle_processor.py:123–131).
    */
  def kafkaBatch(spark: SparkSession,
                 msgs: Seq[(String, Int, Long)]): DataFrame = {
    val rows = msgs.map { case (json, part, off) =>
      Row("key".getBytes, json.getBytes, "fhir.msg", part, off,
        new java.sql.Timestamp(1700000000000L + off))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      graft.pipeline.BundlePipeline.kafkaWireSchema)
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
}

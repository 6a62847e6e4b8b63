package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The bundle envelope pipeline: Kafka wire records → one row per FHIR
  * bundle entry, with request method/url/type/id extracted and the raw
  * resource JSON kept opaque.
  *
  * Semantics mirror the reference (bzkf/fhir-to-lakehouse
  * src/bundle_processor.py:40–128): a deliberately *partial* bundle schema
  * (only `entry[].resource` as a raw string plus `entry[].request`), inner
  * explode semantics (a bundle with no entries vanishes), and a
  * latest-wins dedup keyed on `request_url` ordered by
  * (partition asc, offset desc) — including the reference's quirk that
  * "latest" is only well-defined per Kafka partition (resources are keyed
  * so one resource id sticks to one partition).
  *
  * All of this is plain `org.apache.spark.sql.functions` — Catalyst pushes
  * the projections/filters into the scan, the dedup is a single hash
  * shuffle on `request_url`, and everything stays inside whole-stage
  * codegen. At 100 TB the only shuffle in this stage is the dedup, which
  * is bounded by micro-batch size (maxOffsetsPerTrigger), not table size.
  */
object BundlePipeline {

  /** Partial bundle schema — `resource` stays a raw JSON string so the
    * full FHIR decode is deferred to [[graft.fhir.FhirEncoder]]
    * (reference: bundle_processor.py:40–63).
    */
  val bundleSchema: StructType = StructType(Seq(
    StructField("entry", ArrayType(StructType(Seq(
      StructField("resource", StringType),
      StructField("request", StructType(Seq(
        StructField("method", StringType),
        StructField("url", StringType))))))))))

  /** Kafka source wire schema (what the tests construct directly;
    * reference tests/unit/test_bundle_processor.py:100–105).
    */
  val kafkaWireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  /** P1–P6: cast → from_json → explode → field access → split/getItem
    * (reference: bundle_processor.py:65–75). Malformed JSON → null parse
    * (PERMISSIVE), whose null `entry` is dropped by the inner explode.
    */
  def prepare(df: DataFrame): DataFrame =
    // spread before the bundle parse: per-row from_json + explode is
    // the expensive step, and a single-partition batch (one journal
    // file, one-task scan) would pay it serially (no-op when the
    // input is already parallel)
    graft.Par.spread(df)
      .withColumn("bundle", col("value").cast(StringType))
      .withColumn("parsed_bundle", from_json(col("bundle"), bundleSchema))
      .withColumn("entry", explode(col("parsed_bundle.entry")))
      .withColumn("resource", col("entry.resource"))
      .withColumn("request_method", col("entry.request.method"))
      .withColumn("request_url", col("entry.request.url"))
      .withColumn("url_parts", split(col("request_url"), "/"))
      .withColumn("resource_type", col("url_parts").getItem(0))
      .withColumn("request_resource_id", col("url_parts").getItem(1))
      .drop("url_parts", "entry", "parsed_bundle", "bundle")

  /** W1: within a micro-batch keep only the most recent operation per
    * `request_url` — highest offset wins; PUT-then-DELETE ⇒ DELETE wins
    * (reference: bundle_processor.py:114–128). The (partition asc,
    * offset desc) ordering is preserved verbatim, including its
    * one-partition-per-key assumption; do NOT "fix" to timestamp order.
    */
  def deduplicate(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("request_url")
      .orderBy(col("partition").asc, col("offset").desc)
    df.withColumn("row_num", row_number().over(w))
      .filter(col("row_num") === 1)
      .drop("row_num")
  }

  /** P7: the per-resource-type stream fan-out filter (main.py:158). */
  def forType(df: DataFrame, resourceType: String): DataFrame =
    df.filter(col("resource_type") === resourceType)

  /** P8: the default-stream filter for all *other* types (main.py:177).
    * `isin` is null-safe-false, so unparseable bundles (null
    * resource_type) are dropped by BOTH branches — preserved exactly.
    */
  def forOtherTypes(df: DataFrame, knownTypes: Seq[String]): DataFrame =
    df.filter(!col("resource_type").isin(knownTypes: _*))
}

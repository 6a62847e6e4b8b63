package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-based bundle source — the drop-in stand-in for the Kafka source
  * (SURVEY.md §7.0: same wire schema behind a pluggable source, so
  * `BundlePipeline`/`Engine` are source-agnostic).
  *
  * Input is a *journal* of NDJSON lines, each carrying its own ordering
  * envelope:
  *
  * {{{ {"topic":"fhir.msg","partition":0,"offset":12,"bundle":"{...}"} }}}
  *
  * Explicit (partition, offset) keeps the latest-wins dedup semantics
  * well-defined on files exactly as on Kafka (the reference's
  * data/bundles.ndjson feed has the same need — ordering must come
  * from the journal, not file listing order). Spark's file stream
  * source provides the incremental discovery + checkpointing.
  */
object FileBundleSource {

  val journalSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("bundle", StringType)))

  private def toWire(lines: DataFrame): DataFrame =
    lines
      .withColumn("j", from_json(col("value"), journalSchema))
      // REJECT malformed lines loudly instead of defaulting them: a
      // line that is not an envelope (from_json → null) or that lacks
      // bundle/offset would otherwise coalesce onto ('file', 0, 0) —
      // ties at offset 0 make the (partition asc, offset desc)
      // latest-wins dedup nondeterministic, silent wrong state. The
      // Kafka wire this source stands in for never produces null
      // values or unordered records, so neither may the stand-in.
      .select(
        lit(null).cast(BinaryType).as("key"),
        encode(raiseWhenNull(col("j.bundle"), col("value"),
          "journal line has no bundle"), "UTF-8").as("value"),
        coalesce(col("j.topic"), lit("file")).as("topic"),
        // partition is as load-bearing for the latest-wins tie-break
        // as offset: a partial envelope missing only partition must
        // fail loudly, not merge into partition 0's offset space where
        // it could tie with a real (0, offset) record.
        raiseWhenNull(col("j.partition"), col("value"),
          "journal line has no partition").as("partition"),
        raiseWhenNull(col("j.offset"), col("value"),
          "journal line has no offset").as("offset"),
        lit(null).cast(TimestampType).as("timestamp"))

  private def raiseWhenNull(c: org.apache.spark.sql.Column,
                            raw: org.apache.spark.sql.Column,
                            what: String): org.apache.spark.sql.Column =
    when(c.isNull, raise_error(concat(
      lit(s"FileBundleSource: $what (not a journal envelope): "),
      substring(raw, 1, 200)))).otherwise(c)

  /** Streaming read of a journal directory (new files picked up
    * incrementally, offsets checkpointed by the engine).
    */
  def stream(spark: SparkSession, dir: String): DataFrame =
    toWire(spark.readStream.format("text")
      .schema(StructType(Seq(StructField("value", StringType))))
      .load(dir))

  /** Batch read of the same journal (for reprocessing/backfill). */
  def batch(spark: SparkSession, dir: String): DataFrame =
    toWire(spark.read.format("text").load(dir)
      .select(col("value").cast(StringType).as("value")))
}

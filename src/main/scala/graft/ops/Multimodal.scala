package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct. The
  * Spark-side machinery — schema, partition-friendly batch shape,
  * row-local feature extraction, frame sampling — is real and tested;
  * the actual media *decode* is a clearly-marked STUB (no codec
  * libraries in this environment) implemented as a deterministic fake
  * so the pipeline shape can be exercised end-to-end.
  *
  * Scale notes: payloads never leave their executor (all ops are
  * row-local projections), and the metadata struct is a separate
  * column, so `select(meta.*)`-only queries prune the binary column at
  * the Parquet scan (verified via ReadSchema in .explain).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** A 60-bit deterministic content hash as a Column: the first 15 hex
    * digits of md5, as a BIGINT. md5 is the one hash DuckDB and Spark
    * compute bit-identically (the Sampling.splitHash pattern), so every
    * stub value derived from it is exactly oracle-able cross-engine —
    * DuckDB spells it `('0x' || substring(md5(x), 1, 15))::BIGINT`.
    */
  private def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Wrap a text corpus as a fake media table: payload = UTF-8 bytes of
    * the text (a deterministic stand-in for image bytes), metadata
    * derived from content. Used by tests/queries since the driver
    * testdata has no binary column.
    */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        // STUB(decode) dimensions: content-hash fakes, md5-derived so
        // the oracle recomputes them exactly (see md5Long)
        pmod(md5Long(col(textCol)), lit(1920L)).cast("int").as("width"),
        pmod(md5Long(concat(col(textCol), lit("#h"))), lit(1080L))
          .cast("int").as("height")).as("meta"))

  /** STUB decode: a real deployment would decode the payload with an
    * image/audio codec here (e.g. via a vectorized native library per
    * partition). This deterministic fake derives an 8-dim feature
    * vector from byte-range hashes — same signature, same batch shape,
    * zero external deps.
    */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame = {
    val feats = (0 until dims).map { d =>
      // STUB(decode): a salted content hash over a character slice
      // stands in for a codec + CNN featurizer; deterministic,
      // row-local, and md5-based so the features oracle exactly
      (pmod(md5Long(concat(lit(s"f$d#"),
          substring(col("payload").cast(StringType), d * 16 + 1, 64))),
        lit(1000000L)).cast("double") / 1000000.0)
    }
    media.withColumn("features", array(feats: _*))
  }

  /** Frame sampling: split the payload into fixed-size "frames" and
    * keep every `stride`-th one — the video-pipeline shape (explode to
    * one row per sampled frame) without a real container parser.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256,
                   stride: Int = 4): DataFrame = {
    val nFrames = ceil(col("meta.n_bytes") / lit(frameBytes)).cast("int")
    // an EMPTY payload has zero frames — without the guard the
    // greatest(-1, 0) clamp emits one phantom frame_idx=0 row of
    // empty bytes for it
    media.where(col("meta.n_bytes") > 0)
      .select(col("media_id"), col("meta"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)))
          .as("frame_idx"),
        col("payload"))
      .withColumn("frame",
        col("payload").substr(col("frame_idx") * frameBytes + 1,
          lit(frameBytes)))
      .drop("payload")
  }

  /** Batched per-partition decode — the Scala analogue of
    * `mapInPandas`: one decoder instance per partition (codec init is
    * expensive in real deployments), iterator-to-iterator so Spark
    * pipelines and spills, batch shape = one row in, one feature row
    * out. The `decoder` argument is where a real codec goes; the
    * default is the deterministic STUB.
    */
  def decodeBatched(media: DataFrame, dims: Int = 8)(
      decoder: Array[Byte] => Array[Double] = stubDecode(dims, _))
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init of the (stub) codec happens here
        rows.map { case (id, payload) => (id, decoder(payload)) }
      }
      .toDF("media_id", "features")
  }

  /** STUB(decode): deterministic feature fake — a real implementation
    * decodes with an image/audio library here.
    */
  def stubDecode(dims: Int, payload: Array[Byte]): Array[Double] =
    Array.tabulate(dims) { d =>
      var h = 1125899906842597L + d
      var i = d * 16
      val end = math.min(payload.length, i + 64)
      while (i < end) { h = h * 31 + payload(i); i += 1 }
      h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
      math.abs(h % 1000000) / 1000000.0
    }

  /** Resize stub: recompute metadata for a target resolution, keeping
    * the payload (a real impl would transcode per partition).
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.format").as("format"),
      col("meta.n_bytes").as("n_bytes"),
      lit(w).as("width"), lit(h).as("height")))
}

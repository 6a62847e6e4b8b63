package graft.tables

import graft.SparkSpec
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
  EqualTo, Literal}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types._

/** Huge-manifest planning (the TahoeLogFileIndex discipline): a
  * snapshot read over a manifest too big to materialize must stream
  * the commit body, prune per entry in flight, and retain only
  * surviving files on the driver. The 1M-file test is synthetic by
  * design — the point is the PLANNING budget, so data files never need
  * to exist (the manifest's recorded bytes/mtime mean zero FS probes).
  */
class StreamingManifestSpec extends SparkSpec {
  import graft.SparkSpec._

  private val tableSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("v", IntegerType)))

  private def statsIndexOf(df: org.apache.spark.sql.DataFrame)
      : StatsFileIndex =
    df.queryExecution.analyzed.collectFirst {
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[HadoopFsRelation] &&
            lr.relation.asInstanceOf[HadoopFsRelation].location
              .isInstanceOf[StatsFileIndex] =>
        lr.relation.asInstanceOf[HadoopFsRelation].location
          .asInstanceOf[StatsFileIndex]
    }.getOrElse(fail("read did not plan through a StatsFileIndex"))

  test("streaming planning path returns the same rows as the eager path") {
    val t = ResourceTable(spark, s"${tmpDir("smspec")}/T.parquet")
      .createIfNotExists(tableSchema)
    val rows = (1 to 500).map(i => Row(s"id$i", i))
    t.upsert(spark.createDataFrame(
      spark.sparkContext.parallelize(rows), tableSchema), "id")
    val eager = t.read().collect().map(_.toString).sorted
    spark.conf.set("graft.manifest.streamPlanBytes", "0")
    try {
      val streamed = t.read()
      assert(statsIndexOf(streamed) ne null)
      assert(streamed.collect().map(_.toString).sorted.sameElements(eager))
      // filtered read through the streaming planner also agrees
      val f = t.read().filter("v = 42").collect()
      assert(f.length == 1 && f.head.getString(0) == "id42")
    } finally spark.conf.unset("graft.manifest.streamPlanBytes")
  }

  test("1M-file manifest plans within a survivor-bounded driver budget") {
    val nFiles = 1000000
    val root = new java.io.File(tmpDir("smhuge"), "H.parquet")
    val logDir = new java.io.File(root, "_log")
    assert(logDir.mkdirs())
    val commit = new java.io.File(logDir, f"${0L}%020d.commit")
    // stream-write the body: never build a 100+ MB string either
    val idSchema = StructType(Seq(StructField("id", LongType))).json
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(commit), 1 << 20)
    val gen = new com.fasterxml.jackson.core.JsonFactory()
      .createGenerator(out)
    gen.writeStartObject()
    gen.writeNumberField("version", 0L)
    gen.writeStringField("op", "WRITE")
    gen.writeNumberField("ts", 1700000000000L)
    gen.writeStringField("dir", "snap-0-synthetic")
    gen.writeFieldName("schema")
    gen.writeRawValue(idSchema)
    gen.writeObjectFieldStart("files")
    var i = 0
    while (i < nFiles) {
      // file i holds ids [i*100, i*100+99] — an id-equality predicate
      // can touch exactly one file
      gen.writeObjectFieldStart(s"snap-0-synthetic/part-$i.parquet")
      gen.writeNumberField("rows", 100L)
      gen.writeNumberField("bytes", 4096L)
      gen.writeNumberField("mtime", 1700000000000L)
      gen.writeObjectFieldStart("cols")
      gen.writeObjectFieldStart("id")
      gen.writeNumberField("min", i.toLong * 100)
      gen.writeNumberField("max", i.toLong * 100 + 99)
      gen.writeNumberField("nulls", 0L)
      gen.writeEndObject()
      gen.writeEndObject()
      gen.writeEndObject()
      i += 1
    }
    gen.writeEndObject()
    gen.writeEndObject()
    gen.close()
    assert(commit.length() > 8L * 1024 * 1024,
      "synthetic manifest must exceed the streaming threshold")

    val t = ResourceTable(spark, root.toString)
    val df = t.readVersion(0) // must take the streaming path (size gate)
    assert(df.schema.fieldNames.sameElements(Array("id")))
    val index = statsIndexOf(df)

    // a selective predicate: stream all 1M entries, materialize ONE
    val pruned = index.listFiles(Seq.empty, Seq(
      EqualTo(AttributeReference("id", LongType)(), Literal(123456L))))
    assert(index.lastScanned == nFiles.toLong)
    assert(index.lastMaterialized == 1L)
    val kept = pruned.flatMap(_.files.map(_.getPath.getName))
    assert(kept == Seq("part-1234.parquet"))

    // a range predicate keeps a contiguous band of files, still tiny
    val band = index.listFiles(Seq.empty, Seq(
      org.apache.spark.sql.catalyst.expressions.And(
        org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
          AttributeReference("id", LongType)(), Literal(500000L)),
        org.apache.spark.sql.catalyst.expressions.LessThan(
          AttributeReference("id", LongType)(), Literal(501000L)))))
    assert(index.lastScanned == nFiles.toLong)
    assert(index.lastMaterialized == 10L)
    assert(band.map(_.files.length).sum == 10)
  }

  test("CommitStream header and entries mirror fromJson on a real commit") {
    val t = ResourceTable(spark, s"${tmpDir("smcs")}/T.parquet")
      .createIfNotExists(tableSchema)
    t.upsert(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("a", 1), Row("b", 2))),
      tableSchema), "id")
    val v = t.latestVersion.get
    val cf = new HPath(s"${t.path}/_log", f"$v%020d.commit")
    val fs = cf.getFileSystem(spark.sessionState.newHadoopConf())
    val body = {
      val in = fs.open(cf)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val eager = FileStats.fromJson(body)
    val cs = new FileStats.CommitStream(() => fs.open(cf))
    try {
      assert(cs.dir == FileStats.dirOf(body))
      assert(cs.schemaJson == FileStats.schemaOf(body))
      assert(cs.ts == FileStats.tsOf(body))
      assert(cs.op == FileStats.opOf(body))
      val streamed = cs.files.toMap
      assert(streamed == eager)
    } finally cs.close()
  }
}

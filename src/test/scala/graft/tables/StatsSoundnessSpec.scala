package graft.tables

import graft.SparkSpec
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Soundness edges of the stats-skipping stack (round-16 review):
  * every case here is a path where "stat absent" must read as
  * UNKNOWABLE, never as a provable fact — the difference between a
  * conservative non-skip and silently wrong results.
  */
class StatsSoundnessSpec extends SparkSpec {
  import graft.SparkSpec._

  private def entry(rows: Long, cols: Map[String, FileStats.ColStats],
                    dv: Option[FileStats.DvInfo] = None) =
    StatsFileIndex.Entry(new HPath("/x/f.parquet"), 1L, 1L,
      Some(FileStats.FileStat(rows, cols, dv = dv)))

  test("exactMinMax: absent min/max is all-null ONLY when nullCount " +
      "proves it") {
    // proof present: nullCount == rows → provably all-null
    val allNull = new StatsFileIndex(new HPath("/x"), Seq(entry(5L,
      Map("c" -> FileStats.ColStats(None, None, Some(5L))))))
    assert(allNull.exactMinMax("c").contains((null, null)))
    // stats simply not collected (no nullCount): unknowable
    val unknown = new StatsFileIndex(new HPath("/x"), Seq(entry(5L,
      Map("c" -> FileStats.ColStats(None, None, None)))))
    assert(unknown.exactMinMax("c").isEmpty)
    // nullCount recorded but < rows: the file HAS values with no
    // min/max (e.g. strings over the stats size cap) — unknowable
    val partial = new StatsFileIndex(new HPath("/x"), Seq(entry(5L,
      Map("c" -> FileStats.ColStats(None, None, Some(3L))))))
    assert(partial.exactMinMax("c").isEmpty)
    // unknown-row-count sentinel (foreign stats without numRecords):
    // the all-null proof can't anchor
    val noRows = new StatsFileIndex(new HPath("/x"), Seq(entry(-1L,
      Map("c" -> FileStats.ColStats(None, None, Some(3L))))))
    assert(noRows.exactMinMax("c").isEmpty)
  }

  test("exactMinMax: a deletion vector on a foreign add refuses the " +
      "exact answer") {
    val dv = FileStats.DvInfo("u", "x", 0, 1, 1L)
    val idx = new StatsFileIndex(new HPath("/x"), Seq(entry(5L,
      Map("c" -> FileStats.ColStats(Some(1L), Some(9L), Some(0L))),
      dv = Some(dv))))
    assert(idx.exactMinMax("c").isEmpty)
  }

  test("fromDeltaStats without numRecords: skipping stays usable, " +
      "exact counts refuse") {
    val st = StatsFileIndex.fromDeltaStats(
      """{"minValues":{"v":3},"maxValues":{"v":7},"nullCount":{"v":0}}""")
      .getOrElse(fail("stats did not parse"))
    assert(st.rows == -1L)
    // min/max still serve file skipping
    assert(FileStats.canSkipRange(st, "v", 100L, 200L))
    assert(!FileStats.canSkipRange(st, "v", 5L, 6L))
    // but the exact-count consumers treat the sentinel as unknowable
    val idx = new StatsFileIndex(new HPath("/x"),
      Seq(StatsFileIndex.Entry(new HPath("/x/f.parquet"), 1L, 1L,
        Some(st))))
    assert(idx.exactRowCount.isEmpty)
    // exactMinMax stays answerable — min/max are PRESENT, so no
    // row-count proof is needed
    assert(idx.exactMinMax("v").contains((3L, 7L)))
  }

  test("fromDeltaStats with numRecords: exact counts work") {
    val st = StatsFileIndex.fromDeltaStats(
      """{"numRecords":4,"minValues":{"v":3},"maxValues":{"v":7},"nullCount":{"v":0}}""")
      .getOrElse(fail("stats did not parse"))
    val idx = new StatsFileIndex(new HPath("/x"),
      Seq(StatsFileIndex.Entry(new HPath("/x/f.parquet"), 1L, 1L,
        Some(st))))
    assert(idx.exactRowCount.contains(4L))
    assert(idx.exactMinMax("v").contains((3L, 7L)))
  }

  test("cmp: signed zero compares equal (SQL semantics), file with " +
      "+0.0 rows never skipped for literal -0.0") {
    assert(FileStats.cmp(-0.0d, 0.0d).contains(0))
    assert(FileStats.cmp(0.0d, -0.0d).contains(0))
    val st = FileStats.FileStat(1L,
      Map("d" -> FileStats.ColStats(Some(0.0d), Some(0.0d), Some(0L))))
    assert(!FileStats.canSkipRange(st, "d", -0.0d, -0.0d))
  }

  test("parquet TIMESTAMP(MILLIS) footer stats land in the micros " +
      "compare domain") {
    val dir = tmpDir("statsms")
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MILLIS")
    try {
      val ts = java.sql.Timestamp.valueOf("2024-01-02 03:04:05")
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(ts)), 1),
        StructType(Seq(StructField("t", TimestampType))))
        .write.mode("overwrite").parquet(dir)
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val st = FileStats.readFooter(
        spark.sessionState.newHadoopConf(),
        new HPath(f.getAbsolutePath))
      val cs = st.cols("t")
      val micros = ts.getTime * 1000L
      assert(cs.min.contains(micros), s"min=${cs.min} want=$micros")
      assert(cs.max.contains(micros))
      // a micros-domain literal equal to the row must NOT skip; one a
      // day later must
      assert(!FileStats.canSkipRange(st, "t", micros, micros))
      assert(FileStats.canSkipRange(st, "t",
        micros + 86400L * 1000000L, micros + 2 * 86400L * 1000000L))
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None =>
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  test("oversized string stats (not collected by parquet-mr) poison " +
      "the column instead of reading as all-null") {
    val dir = tmpDir("statsbig")
    // parquet-mr drops binary min/max above its 4K truncation-free
    // stats cap in this write path; the footer then reports an EMPTY
    // Statistics object for the chunk
    val big = "z" * 8192
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("a", 1L), Row(big, 2L)), 1),
      StructType(Seq(StructField("s", StringType),
        StructField("v", LongType))))
      .write.mode("overwrite").parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val st = FileStats.readFooter(
      spark.sessionState.newHadoopConf(),
      new HPath(f.getAbsolutePath))
    // v keeps exact stats either way
    assert(st.cols("v").min.contains(1L) && st.cols("v").max.contains(2L))
    st.cols.get("s") match {
      case None => () // poisoned: stats absent — conservative
      case Some(cs) =>
        // if this parquet version still records (possibly truncated)
        // string stats, they must be REAL bounds, never the all-null
        // (None, None) misreading
        assert(cs.min.isDefined || cs.numNulls.contains(st.rows),
          s"unsound: $cs read as all-null over real values")
    }
  }
}

package graft.streaming

import graft.SparkSpec
import graft.ops.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class Ev(ts: java.sql.Timestamp, user_id: Long, value: Double)
case class Imp(imp_id: Long, imp_ts: java.sql.Timestamp)
case class Click(c_imp_id: Long, click_ts: java.sql.Timestamp)

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) =
    new java.sql.Timestamp(1700000000000L + minute * 60000L)

  test("watermarked tumbling window counts (append after watermark passes)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StreamOps.windowedCounts(stream.toDF(), "ts", "user_id",
        windowLength = "10 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(Ev(ts(0), 1, 1.0), Ev(ts(1), 1, 2.0), Ev(ts(2), 2, 3.0))
      q.processAllAvailable()
      // advance event time far past the watermark → first window closes
      stream.addData(Ev(ts(60), 1, 1.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
      val u1 = rows.find(_.getAs[Long]("user_id") == 1L)
      assert(u1.isDefined, rows.mkString(";"))
      assert(u1.get.getAs[Long]("cnt") == 2)
      assert(u1.get.getAs[Double]("sum_val") == 3.0)
    } finally q.stop()
  }

  test("stateful sessionize emits sessions for separated event groups") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Sessionize.Event]
    val q = Sessionize.streaming(stream.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000000000L // micros
      // two bursts 10 minutes apart → first burst closes as a session
      // when the second arrives in a later batch
      stream.addData(
        Sessionize.Event(7, t0, 1),
        Sessionize.Event(7, t0 + 30000000L, 2))
      q.processAllAvailable()
      stream.addData(Sessionize.Event(7, t0 + 600000000L, 3))
      q.processAllAvailable()
      val sessions = spark.table("sess").collect()
      assert(sessions.length == 1, sessions.mkString(";"))
      val s = sessions.head
      assert(s.getAs[Long]("nEvents") == 2)
      assert(s.getAs[Long]("firstEventId") == 1)
    } finally q.stop()
  }

  test("dedup within watermark drops redelivered keys, bounded state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StreamOps.dedupWithinWatermark(stream.toDF(), "ts",
        Seq("user_id"), watermark = "5 minutes")
      .writeStream.format("memory").queryName("ddw")
      .outputMode(OutputMode.Append).start()
    try {
      // same key delivered three times within the watermark window
      stream.addData(Ev(ts(0), 1, 1.0), Ev(ts(1), 1, 1.0), Ev(ts(2), 2, 5.0))
      q.processAllAvailable()
      stream.addData(Ev(ts(3), 1, 1.0)) // redelivery, still within delay
      q.processAllAvailable()
      val rows = spark.table("ddw").collect()
      assert(rows.map(_.getAs[Long]("user_id")).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream range join attributes clicks to impressions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clicks = MemoryStream[Click]
    val joined = StreamOps.eventTimeRangeJoin(
      imps.toDF(), clicks.toDF(), "imp_ts", "click_ts",
      org.apache.spark.sql.functions.expr("imp_id = c_imp_id"),
      maxDelay = "1 minute")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      imps.addData(Imp(100, ts(0)), Imp(200, ts(0)))
      clicks.addData(
        Click(100, ts(1)),  // within 1 min → attributed
        Click(200, ts(30))) // 30 min later → outside the range bound
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
      assert(rows.map(_.getAs[Long]("imp_id")).toSeq == Seq(100L),
        rows.mkString(";"))
    } finally q.stop()
  }

  test("left-outer range join releases unmatched impressions after the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clicks = MemoryStream[Click]
    val joined = StreamOps.eventTimeRangeJoinOuter(
      imps.toDF(), clicks.toDF(), "imp_ts", "click_ts",
      org.apache.spark.sql.functions.expr("imp_id = c_imp_id"),
      maxDelay = "1 minute")
    val q = joined.writeStream.format("memory").queryName("attribo")
      .outputMode(OutputMode.Append).start()
    try {
      imps.addData(Imp(100, ts(0)), Imp(200, ts(0)))
      clicks.addData(Click(100, ts(1))) // only 100 gets a click
      q.processAllAvailable()
      // advance BOTH watermarks far past imp_ts + maxDelay so the
      // engine can prove no click for 200 can still arrive
      imps.addData(Imp(999, ts(60)))
      clicks.addData(Click(999, ts(60)))
      q.processAllAvailable()
      imps.addData(Imp(998, ts(62)))
      clicks.addData(Click(998, ts(62)))
      q.processAllAvailable()
      val byImp = spark.table("attribo").collect()
        .map(r => r.getAs[Long]("imp_id") ->
          Option(r.getAs[Any]("c_imp_id"))).toMap
      assert(byImp(100L).contains(100L))        // matched, click joined
      assert(byImp.contains(200L) && byImp(200L).isEmpty,
        s"unmatched imp not released: $byImp")  // released with nulls
    } finally q.stop()
  }

  test("full-outer range join releases unmatched rows from BOTH sides") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clicks = MemoryStream[Click]
    val joined = StreamOps.eventTimeRangeJoin(
      imps.toDF(), clicks.toDF(), "imp_ts", "click_ts",
      org.apache.spark.sql.functions.expr("imp_id = c_imp_id"),
      maxDelay = "1 minute", joinType = "full_outer")
    val q = joined.writeStream.format("memory").queryName("attribf")
      .outputMode(OutputMode.Append).start()
    try {
      imps.addData(Imp(100, ts(0)), Imp(200, ts(0))) // 200 never clicks
      clicks.addData(Click(100, ts(1)),
        Click(300, ts(1))) // 300 has no impression at all
      q.processAllAvailable()
      // advance both watermarks so the engine can evict and release
      // the unmatched buffered rows on each side
      imps.addData(Imp(999, ts(60)))
      clicks.addData(Click(999, ts(60)))
      q.processAllAvailable()
      imps.addData(Imp(998, ts(62)))
      clicks.addData(Click(998, ts(62)))
      q.processAllAvailable()
      val rows = spark.table("attribf").collect()
      val matched = rows.filter(r =>
        Option(r.getAs[Any]("imp_id")).contains(100L))
      assert(matched.exists(r =>
        Option(r.getAs[Any]("c_imp_id")).contains(100L)))
      assert(rows.exists(r => // left release: imp 200 with null click
        Option(r.getAs[Any]("imp_id")).contains(200L) &&
          Option(r.getAs[Any]("c_imp_id")).isEmpty), rows.mkString(";"))
      assert(rows.exists(r => // right release: click 300 with null imp
        Option(r.getAs[Any]("c_imp_id")).contains(300L) &&
          Option(r.getAs[Any]("imp_id")).isEmpty), rows.mkString(";"))
    } finally q.stop()
  }

  test("stream near-dup probe against a static LSH index is stateless and finds dups") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "completely different content about spark engines and scale"))
      .toDF("doc_id", "text")
    val index = graft.ops.Dedup.bandedIndex(corpus, "doc_id", "text",
      k = 16, bands = 8, w = 2)
    val ms = MemoryStream[(Long, String)]
    val cand = graft.ops.Dedup.nearDupAgainstIndex(
      ms.toDF().toDF("doc_id", "text"), index, "doc_id", "text",
      minJaccard = 0.99, k = 16, bands = 8, w = 2)
    val q = cand.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      ms.addData((50L, "the quick brown fox jumps over the lazy dog"),
        (51L, "nothing like anything indexed at all whatsoever"))
      q.processAllAvailable()
      val hits = spark.table("neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(hits.toSet == Set((50L, 0L)), hits.mkString(";"))
      // stateless probe: no stateful operator in the executed plan
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("sessionize with flush: idle key emits when watermark passes gap") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Sessionize.Event]
    val q = Sessionize.streamingWithFlush(stream.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("sessf")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000000000L // micros
      stream.addData(
        Sessionize.Event(7, t0, 1),
        Sessionize.Event(7, t0 + 30000000L, 2))
      q.processAllAvailable()
      assert(spark.table("sessf").isEmpty) // session still open
      // a DIFFERENT key advances the watermark past 7's last+gap; the
      // event-time timer must flush 7's session with no further 7 events
      stream.addData(Sessionize.Event(99, t0 + 600000000L, 3))
      q.processAllAvailable()
      stream.addData(Sessionize.Event(99, t0 + 601000000L, 4))
      q.processAllAvailable()
      val flushed = spark.table("sessf").collect()
        .filter(_.getAs[Long]("userId") == 7L)
      assert(flushed.length == 1, flushed.mkString(";"))
      assert(flushed.head.getAs[Long]("nEvents") == 2)
      assert(flushed.head.getAs[Long]("sessionEndUs") == t0 + 30000000L)
    } finally q.stop()
  }
}

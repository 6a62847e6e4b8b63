package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StatefulOpsSpec extends SparkSpec {
  import StatefulOps._
  import spark.implicits._

  test("transformWithState running totals accumulate across batches " +
      "under the RocksDB provider") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Contribution]
    withRocksDbState(spark) {
      val q = runningTotals(stream.toDS())
        .toDF().writeStream.format("memory").queryName("tws")
        .outputMode(OutputMode.Append).start()
      try {
        stream.addData(Contribution("a", 2), Contribution("a", 3),
          Contribution("b", 10))
        q.processAllAvailable()
        stream.addData(Contribution("a", 5))
        q.processAllAvailable()
        // key untouched in a batch → no emission, state intact
        stream.addData(Contribution("b", -4), Contribution("c", 0))
        q.processAllAvailable()
        val rows = spark.table("tws").as[Totals].collect()
        assert(rows.toSet == Set(
          Totals("a", 1, 2, 5), Totals("b", 1, 1, 10),
          Totals("a", 2, 3, 10), Totals("b", 2, 2, 6),
          Totals("c", 1, 1, 0)), rows.mkString(";"))
        // the provider actually engaged: RocksDB custom metrics appear
        // on the stateful operator's progress
        val metrics = q.lastProgress.stateOperators.head
          .customMetrics.keySet()
        assert(metrics.asInstanceOf[java.util.Set[String]].stream()
          .anyMatch(_.startsWith("rocksdb")),
          s"no rocksdb metrics: $metrics")
      } finally q.stop()
    }
    // confs restored after the scope
    assert(spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").isEmpty ||
      spark.conf.get("spark.sql.streaming.stateStore.providerClass") !=
        RocksDbProvider)
  }

  test("sessionizeTws: gap close on arrival + event-time timer flush " +
      "for idle keys") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.Sessionize
    val stream = MemoryStream[Sessionize.Event]
    withRocksDbState(spark) {
      val q = sessionizeTws(stream.toDS(), gapSeconds = 60)
        .toDF().writeStream.format("memory").queryName("twssess")
        .outputMode(OutputMode.Append).start()
      try {
        val t0 = 1700000000000000L // micros
        stream.addData(
          Sessionize.Event(7, t0, 1),
          Sessionize.Event(7, t0 + 30000000L, 2))
        q.processAllAvailable()
        assert(spark.table("twssess").isEmpty) // still open
        // same-key event past the gap: closes on arrival, opens anew
        stream.addData(Sessionize.Event(7, t0 + 300000000L, 3))
        q.processAllAvailable()
        val closed = spark.table("twssess").collect()
        assert(closed.length == 1)
        assert(closed.head.getAs[Long]("nEvents") == 2 &&
          closed.head.getAs[Long]("firstEventId") == 1)
        // a DIFFERENT key advances the watermark past 7's last+gap:
        // the registered timer must flush 7's second session
        stream.addData(Sessionize.Event(99, t0 + 600000000L, 4))
        q.processAllAvailable()
        stream.addData(Sessionize.Event(99, t0 + 601000000L, 5))
        q.processAllAvailable()
        val flushed = spark.table("twssess").collect()
          .filter(_.getAs[Long]("userId") == 7L)
        assert(flushed.length == 2, flushed.mkString(";"))
        assert(flushed.map(_.getAs[Long]("firstEventId")).toSet ==
          Set(1L, 3L))
      } finally q.stop()
    }
  }

  test("emitted totals are independent of row order within a batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def run(data: Seq[Contribution]): Set[Totals] =
      withRocksDbState(spark) {
        val stream = MemoryStream[Contribution]
        val name = s"tws_ord_${System.nanoTime()}"
        val q = runningTotals(stream.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append).start()
        try {
          stream.addData(data)
          q.processAllAvailable()
          spark.table(name).as[Totals].collect().toSet
        } finally q.stop()
      }
    val data = Seq(Contribution("x", 1), Contribution("x", 7),
      Contribution("y", -2), Contribution("x", 4))
    assert(run(data) == run(data.reverse))
  }
}

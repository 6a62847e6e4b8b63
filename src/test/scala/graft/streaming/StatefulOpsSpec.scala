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

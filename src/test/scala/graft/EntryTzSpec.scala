package graft

/** ADVICE r10: the event-time entry queries must not depend on
  * spark.sql.session.timeZone — a non-UTC caller previously got
  * shifted (and DST-nonlinear) epoch values from the TIMESTAMP_NTZ
  * branch of eventsUs. Both events/eventsUs now use pure NTZ field
  * arithmetic (timestampadd/timestampdiff vs the NTZ epoch literal);
  * this locks that in by re-running under a DST-bearing zone.
  */
class EntryTzSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("event-time queries are session-timezone independent") {
    // q_sessionize exercises eventsUs (NTZ -> epoch micros);
    // q_time_window exercises events (ts kept as TIMESTAMP_NTZ).
    val qs = Seq("q_sessionize", "q_time_window")
    def run(q: String): Seq[String] =
      SparkEntry.queries(q)(spark, dir).collect().toSeq
        .map(_.toString).sorted
    val utc = qs.map(run)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val nyc = qs.map(run)
      qs.indices.foreach { i =>
        assert(utc(i) == nyc(i), s"${qs(i)} differs under non-UTC tz")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }
}

package graft.streaming

import graft.SparkSpec
import graft.tables.{Lakehousekeeper, ResourceTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** KafkaRecord for MemoryStream — the wire schema as a case class. */
case class KafkaRecord(key: Array[Byte], value: Array[Byte], topic: String,
                       partition: Int, offset: Long,
                       timestamp: java.sql.Timestamp)

class EngineSpec extends SparkSpec {
  import graft.SparkSpec._
  import spark.implicits._

  private def rec(json: String, part: Int, off: Long) =
    KafkaRecord("k".getBytes, json.getBytes, "fhir.msg", part, off,
      new java.sql.Timestamp(1700000000000L + off))

  test("end-to-end: MemoryStream → prepare → fan-out → table; PUT then DELETE") {
    val base = tmpDir("engine")
    val settings = Settings(
      checkpointDir = s"$base/checkpoint",
      deltaDatabaseDir = s"$base/delta/default",
      resourceTypes = Seq("Patient"),
      upkeepInterval = 0)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[KafkaRecord]
    val queries = Engine.start(stream.toDF(), settings)
    try {
      stream.addData(rec(fixture("single-patient.json"), 0, 0L))
      queries.foreach(_.processAllAvailable())
      val table = ResourceTable(spark, s"${settings.deltaDatabaseDir}/Patient.parquet")
      assert(table.read().count() == 1)

      stream.addData(rec(fixture("delete-single-patient.json"), 0, 1L))
      queries.foreach(_.processAllAvailable())
      assert(table.read().count() == 0)
    } finally queries.foreach(_.stop())
  }

  test("fan-out: unknown types go to the default query, not the typed one") {
    val base = tmpDir("engine")
    val settings = Settings(
      checkpointDir = s"$base/checkpoint",
      deltaDatabaseDir = s"$base/delta/default",
      resourceTypes = Seq("Patient"),
      upkeepInterval = 0)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[KafkaRecord]
    val queries = Engine.start(stream.toDF(), settings)
    try {
      val obs = """{"resourceType":"Bundle","entry":[{"resource":
        {"resourceType":"Observation","id":"ob1","status":"final"},
        "request":{"method":"PUT","url":"Observation/ob1"}}]}"""
        .replaceAll("\n\\s*", "")
      stream.addData(rec(obs, 0, 0L))
      queries.foreach(_.processAllAvailable())
      val obsTable = ResourceTable(spark,
        s"${settings.deltaDatabaseDir}/Observation.parquet")
      assert(obsTable.read().count() == 1)
      assert(!new java.io.File(
        s"${settings.deltaDatabaseDir}/Patient.parquet").exists())
    } finally queries.foreach(_.stop())
  }

  test("listener records progress rows/s and input rows") {
    val base = tmpDir("engine")
    val listener = new QueryProgressListener
    spark.streams.addListener(listener)
    val settings = Settings(
      checkpointDir = s"$base/checkpoint",
      deltaDatabaseDir = s"$base/delta/default",
      resourceTypes = Seq("Patient"), upkeepInterval = 0)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[KafkaRecord]
    val queries = Engine.start(stream.toDF(), settings)
    try {
      stream.addData(rec(fixture("single-patient.json"), 0, 0L))
      queries.foreach(_.processAllAvailable())
      // listener events are async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (listener.inputRows.isEmpty &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(listener.inputRows.containsKey("Patient"))
      assert(listener.inputRows.get("Patient") >= 1L)
    } finally {
      queries.foreach(_.stop())
      spark.streams.removeListener(listener)
    }
  }

  test("offset-json regex parses the kafka progress shape") {
    val l = new QueryProgressListener
    val m = classOf[QueryProgressListener]
      .getDeclaredMethod("recordOffsets", classOf[String], classOf[String],
        classOf[String])
    m.setAccessible(true)
    m.invoke(l, "q1", "end", """{"fhir.msg":{"0":123,"1":456}}""")
    assert(l.kafkaOffsets.get(("q1", "fhir.msg", "0", "end")) == 123L)
    assert(l.kafkaOffsets.get(("q1", "fhir.msg", "1", "end")) == 456L)
  }

  test("lakehousekeeper discovers, optimizes and registers tables") {
    val base = tmpDir("lhk")
    val dbDir = s"$base/default"
    // build two tables via the batch path
    val bp = new graft.pipeline.BatchProcessor(dbDir, upkeepInterval = 0)
    bp.processBatch(
      graft.pipeline.BundlePipeline.prepare(kafkaBatch(spark,
        Seq((fixture("single-patient.json"), 0, 0L)))), 1)
    assert(Lakehousekeeper.listTables(spark, dbDir).size == 1)

    Lakehousekeeper.optimize(spark, dbDir, numFiles = 1)
    val registered = Lakehousekeeper.register(spark, dbDir)
    assert(registered == Seq("default.Patient"))
    assert(spark.table("`default`.`Patient`").count() == 1)
  }
}

package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Envelope pipeline semantics, mirroring the reference's unit tests
  * (tests/unit/test_bundle_processor.py).
  */
class BundlePipelineSpec extends SparkSpec {
  import graft.SparkSpec._

  test("variant retention: unprojected fields stay typed-queryable") {
    import spark.implicits._
    // a resource with a field NO registered schema knows about
    val df = Seq(
      """{"resourceType":"Patient","id":"p1",
        | "novel":{"scores":[3,9],"flag":true}}""".stripMargin
        .replace("\n", "")).toDF("resource")
    val v = graft.fhir.FhirEncoder.withVariant(df)
    val row = v.select(
      expr("variant_get(resource_variant, '$.id', 'string')").as("id"),
      expr("variant_get(resource_variant, '$.novel.scores[1]', 'int')")
        .as("s1"),
      expr("variant_get(resource_variant, '$.novel.flag', 'boolean')")
        .as("flag")).head()
    assert(row.getString(0) == "p1")
    assert(row.getInt(1) == 9)
    assert(row.getBoolean(2))
    // missing paths are null, not errors (drift-tolerant)
    assert(v.select(
      expr("variant_get(resource_variant, '$.absent', 'string')"))
      .head().isNullAt(0))
  }

  test("prepare explodes bundle entries and parses request urls") {
    val df = kafkaBatch(spark,
      Seq((fixture("single-patient.json"), 0, 0L)))
    val out = BundlePipeline.prepare(df)
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("request_method") == "PUT")
    assert(r.getAs[String]("resource_type") == "Patient")
    assert(r.getAs[String]("request_resource_id") ==
      "cd30dceb-20c8-1e15-ad0c-c9fe2a48ea4e")
    // from_json keeps `resource` as a string field but re-serializes
    // the JSON subtree compactly (no spaces)
    assert(r.getAs[String]("resource").contains("\"resourceType\":\"Patient\""))
  }

  test("prepare: DELETE entries carry no resource but keep url/id") {
    val out = BundlePipeline.prepare(kafkaBatch(spark,
      Seq((fixture("delete-single-patient.json"), 0, 1L))))
    val r = out.collect().head
    assert(r.getAs[String]("request_method") == "DELETE")
    assert(r.getAs[String]("resource") == null)
    assert(r.getAs[String]("request_resource_id") ==
      "cd30dceb-20c8-1e15-ad0c-c9fe2a48ea4e")
  }

  test("prepare: malformed bundles vanish (inner explode)") {
    val out = BundlePipeline.prepare(kafkaBatch(spark,
      Seq(("not json at all", 0, 0L), ("{}", 0, 1L))))
    assert(out.count() == 0)
  }

  test("deduplicate keeps highest offset per request_url (in-batch latest-wins)") {
    // The canonical 7-message scenario (tests:284–348): p0 carries
    // put-0, put-2, put-2-newer(offset 99); p1 carries put-1,
    // delete-1, put-1 again, delete-1 again.
    val msgs = Seq(
      (fixture("batches/put-0.json"), 0, 0L),
      (fixture("batches/put-2.json"), 0, 1L),
      (fixture("batches/put-2-newer.json"), 0, 99L),
      (fixture("batches/put-1.json"), 1, 0L),
      (fixture("batches/delete-1.json"), 1, 1L),
      (fixture("batches/put-1.json"), 1, 2L),
      (fixture("batches/delete-1.json"), 1, 3L))
    val deduped = BundlePipeline.deduplicate(
      BundlePipeline.prepare(kafkaBatch(spark, msgs)))
    val byUrl = deduped.collect()
      .map(r => r.getAs[String]("request_url") ->
        (r.getAs[String]("request_method"), r.getAs[Long]("offset"))).toMap
    assert(byUrl.size == 3)
    assert(byUrl("Patient/0") == (("PUT", 0L)))
    assert(byUrl("Patient/2") == (("PUT", 99L))) // newer PUT wins
    assert(byUrl("Patient/1") == (("DELETE", 3L))) // last DELETE wins
  }

  test("fan-out filters drop null resource_type on both branches") {
    val df = BundlePipeline.prepare(kafkaBatch(spark, Seq(
      (fixture("batches/put-0.json"), 0, 0L),
      ("""{"entry":[{"request":{"method":"PUT"}}]}""", 0, 1L)))) // null url
    assert(BundlePipeline.forType(df, "Patient").count() == 1)
    assert(BundlePipeline.forOtherTypes(df, Seq("Patient")).count() == 0)
  }
}

package graft

import graft.fhir.FhirEncoder

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  simhash64('the quick brown fox') AS s1,
        |  simhash64('the quick brown fox') AS s2,
        |  size(shingle_hashes('a b c d', 2)) AS nsh,
        |  size(minhash_signature(shingle_hashes('a b c d', 2), 8)) AS k,
        |  nfc_normalize('café') AS nfc
        |""".stripMargin).collect().head
    assert(r.getAs[Double]("c") == 1.0)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Long]("s1") == r.getAs[Long]("s2"))
    assert(r.getAs[Int]("nsh") == 3)
    assert(r.getAs[Int]("k") == 8)
    assert(r.getAs[String]("nfc") == "caf\u00e9")
  }

  test("bottom-k sketch: exact jaccard for identical sets, mergeable, bounded") {
    import graft.functions.BottomKSketch.{bottom_k_sketch, jaccard}
    import org.apache.spark.sql.functions._
    val df = Seq.tabulate(1000)(i => (i % 2, s"val${(i / 2) % 300}"))
      .toDF("g", "v") // group 0 and 1 see identical value sets
    val sk = df.repartition(7) // force partial-aggregate merges
      .groupBy("g").agg(bottom_k_sketch(col("v"), 64).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(sk(0).size == 64 && sk(1).size == 64)
    assert(sk(0) == sk(0).sorted)
    assert(sk(0) == sk(1)) // same set → same sketch
    val j = df.groupBy("g").agg(bottom_k_sketch(col("v"), 64).as("sk"))
      .agg(min(col("sk")).as("a"), max(col("sk")).as("b"))
      .select(jaccard(col("a"), col("b"), 64).as("j"))
      .collect().head.getDouble(0)
    assert(j == 1.0)
  }

  test("bottom-k sketch jaccard separates disjoint sets") {
    import graft.functions.BottomKSketch.{bottom_k_sketch, jaccard}
    import org.apache.spark.sql.functions._
    val df = Seq.tabulate(600)(i => (i % 2, s"g${i % 2}_val$i")).toDF("g", "v")
    val j = df.groupBy("g").agg(bottom_k_sketch(col("v"), 64).as("sk"))
      .agg(min(col("sk")).as("a"), max(col("sk")).as("b"))
      .select(jaccard(col("a"), col("b"), 64).as("j"))
      .collect().head.getDouble(0)
    assert(j == 0.0) // disjoint sets share nothing
  }

  test("sql hamming_distance over long arrays") {
    GraftExtensions.register(spark)
    val d = spark.sql(
      "SELECT hamming_distance(array(0L), array(7L)) AS h")
      .collect().head.getAs[Int]("h")
    assert(d == 3)
  }

  test("optimizer rule: naive range join becomes a bin equi-join, results identical") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val pts = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(5000).toLong - 2500L)).toDF("p_id", "ts")
    val ivs = (0 until 50).map { i =>
      val lo = rnd.nextInt(5000).toLong - 2500L
      (900L + i, lo, lo + rnd.nextInt(300) - 20L) // incl. empty/inverted
    }.toDF("iv_id", "lo", "hi")
    def q = pts.join(ivs, col("ts") >= col("lo") && col("ts") < col("hi"))
      .select("p_id", "iv_id")
    val naive = q.collect().toSet // rule inert: BNLJ baseline
    assert(q.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))

    GraftExtensions.register(spark)
    spark.conf.set("graft.rules.intervalJoin.binUs", "128")
    try {
      val rewritten = q
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(rewritten.collect().toSet == naive)
      // closed upper bound (<=) rewrites too, and stays correct
      def qc = pts.join(ivs,
          col("ts") >= col("lo") && col("ts") <= col("hi"))
        .select("p_id", "iv_id")
      spark.conf.unset("graft.rules.intervalJoin.binUs")
      val naiveClosed = qc.collect().toSet
      spark.conf.set("graft.rules.intervalJoin.binUs", "128")
      assert(qc.collect().toSet == naiveClosed)
      assert(!qc.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.unset("graft.rules.intervalJoin.binUs")
  }

  test("optimizer rule: malformed binUs disables the rule instead of poisoning the session") {
    import org.apache.spark.sql.functions.col
    GraftExtensions.register(spark)
    spark.conf.set("graft.rules.intervalJoin.binUs", "2h") // not a long
    try {
      val pts = Seq((1L, 10L), (2L, 50L)).toDF("p_id", "ts")
      val ivs = Seq((9L, 0L, 20L)).toDF("iv_id", "lo", "hi")
      val q = pts.join(ivs, col("ts") >= col("lo") && col("ts") < col("hi"))
        .select("p_id", "iv_id")
      // rule inert (no throw), query correct, and UNRELATED queries in
      // the same session keep working
      assert(q.collect().toSet == Set(org.apache.spark.sql.Row(1L, 9L)))
      assert(spark.range(3).count() == 3)
    } finally spark.conf.unset("graft.rules.intervalJoin.binUs")
  }
}

/** Deeper FHIR encode checks: nested arrays/structs/decimals for
  * Observation and Condition resources.
  */
class FhirEncoderSpec extends SparkSpec {
  import spark.implicits._

  private val obsJson =
    """{"resourceType":"Observation","id":"ob-1","status":"final",
      |"effectiveDateTime":"2020-03-02T09:30:10+01:00",
      |"code":{"coding":[{"system":"http://loinc.org","code":"8867-4",
      |"display":"Heart rate"}],"text":"Heart rate"},
      |"subject":{"reference":"Patient/p1"},
      |"valueQuantity":{"value":71.5,"unit":"beats/minute",
      |"system":"http://unitsofmeasure.org","code":"/min"}}"""
      .stripMargin.replaceAll("\n", "")

  private val condJson =
    """{"resourceType":"Condition","id":"c-1",
      |"recordedDate":"2019-01-05",
      |"clinicalStatus":{"coding":[{"system":"x","code":"active"}]},
      |"code":{"coding":[{"system":"http://snomed.info/sct",
      |"code":"44054006","display":"Diabetes"}]},
      |"subject":{"reference":"Patient/p1"}}"""
      .stripMargin.replaceAll("\n", "")

  test("Observation encode: nested code.coding, reference, decimal quantity") {
    val df = Seq(obsJson).toDF("resource")
    val out = FhirEncoder.encode(df, "Observation").collect().head
    assert(out.getAs[String]("id") == "ob-1")
    assert(out.getAs[String]("status") == "final")
    val code = out.getStruct(out.fieldIndex("code"))
    val coding = code.getSeq[org.apache.spark.sql.Row](0)
    assert(coding.head.getAs[String]("code") == "8867-4")
    val vq = out.getStruct(out.fieldIndex("valueQuantity"))
    assert(vq.getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("71.5")) == 0)
    assert(out.getStruct(out.fieldIndex("subject"))
      .getAs[String]("reference") == "Patient/p1")
  }

  test("Condition encode keeps dates as strings (precision-preserving)") {
    val df = Seq(condJson).toDF("resource")
    val out = FhirEncoder.encode(df, "Condition").collect().head
    assert(out.getAs[String]("recordedDate") == "2019-01-05")
    assert(out.schema("recordedDate").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("encode filters out rows of other resource types") {
    val df = Seq(obsJson, condJson).toDF("resource")
    assert(FhirEncoder.encode(df, "Observation").count() == 1)
    assert(FhirEncoder.encode(df, "Condition").count() == 1)
  }

  test("Patient extensions are captured (us-core-race etc.)") {
    val json = graft.SparkSpec.fixture("single-patient.json")
    // pull the patient resource out of the bundle via the pipeline
    val wire = graft.SparkSpec.kafkaBatch(spark, Seq((json, 0, 0L)))
    val prepared = graft.pipeline.BundlePipeline.prepare(wire)
    val out = FhirEncoder.encode(prepared, "Patient").collect().head
    val exts = out.getSeq[org.apache.spark.sql.Row](out.fieldIndex("extension"))
    assert(exts.nonEmpty)
    val urls = exts.map(_.getAs[String]("url"))
    assert(urls.exists(_.endsWith("us-core-race")))
    val dly = exts.find(_.getAs[String]("url")
      .endsWith("disability-adjusted-life-years")).get
    assert(dly.getAs[java.math.BigDecimal]("valueDecimal") != null)
  }

  test("corrupt resource JSON rows are dropped by encode, not crashing") {
    val df = Seq("not a json {{{", """{"resourceType":"Patient","id":"ok"}""")
      .toDF("resource")
    val out = FhirEncoder.encode(df, "Patient").collect()
    assert(out.map(_.getAs[String]("id")).toSeq == Seq("ok"))
  }

  test("unknown resource types fall back to the generic schema") {
    val df = Seq("""{"resourceType":"Medication","id":"m-1"}""")
      .toDF("resource")
    val out = FhirEncoder.encode(df, "Medication").collect().head
    assert(out.getAs[String]("id") == "m-1")
    assert(out.getAs[String]("resource_json").contains("Medication"))
  }

  // ---- full-R4 schema breadth (Pathling derivation parity): every
  // R4 element of the five parallel types is a real typed column, not
  // just the reference-test subset ----

  test("Patient full-R4 breadth: telecom/communication/meta parse typed") {
    val json = graft.SparkSpec.fixture("single-patient.json")
    val wire = graft.SparkSpec.kafkaBatch(spark, Seq((json, 0, 0L)))
    val prepared = graft.pipeline.BundlePipeline.prepare(wire)
    val out = FhirEncoder.encode(prepared, "Patient").collect().head
    val tel = out.getSeq[org.apache.spark.sql.Row](out.fieldIndex("telecom"))
    assert(tel.head.getAs[String]("system") == "phone")
    assert(tel.head.getAs[String]("value") == "555-981-7850")
    val comm = out.getSeq[org.apache.spark.sql.Row](
      out.fieldIndex("communication"))
    val lang = comm.head.getStruct(comm.head.fieldIndex("language"))
    assert(lang.getSeq[org.apache.spark.sql.Row](0)
      .head.getAs[String]("code") == "en-US")
    val ms = out.getStruct(out.fieldIndex("maritalStatus"))
    assert(ms.getAs[String]("text") == "Married")
    assert(!out.getAs[Boolean]("multipleBirthBoolean"))
    val meta = out.getStruct(out.fieldIndex("meta"))
    assert(meta.getSeq[String](meta.fieldIndex("profile"))
      .head.endsWith("us-core-patient"))
  }

  test("Observation full-R4 breadth: components and choice types") {
    val bp = """{"resourceType":"Observation","id":"bp-1","status":"final",
      |"category":[{"coding":[{"system":"http://terminology.hl7.org/CodeSystem/observation-category",
      |"code":"vital-signs"}]}],
      |"code":{"coding":[{"code":"85354-9"}],"text":"Blood pressure"},
      |"valueCodeableConcept":{"coding":[{"code":"N"}],"text":"normal"},
      |"referenceRange":[{"low":{"value":60,"unit":"mmHg"},
      |"high":{"value":120,"unit":"mmHg"},"text":"60-120"}],
      |"component":[
      | {"code":{"coding":[{"code":"8480-6"}]},
      |  "valueQuantity":{"value":117.5,"unit":"mmHg"}},
      | {"code":{"coding":[{"code":"8462-4"}]},
      |  "valueQuantity":{"value":75.25,"unit":"mmHg"}}]}"""
      .stripMargin.replaceAll("\n", "")
    val out = FhirEncoder.encode(Seq(bp).toDF("resource"), "Observation")
      .collect().head
    val cat = out.getSeq[org.apache.spark.sql.Row](out.fieldIndex("category"))
    assert(cat.head.getSeq[org.apache.spark.sql.Row](0)
      .head.getAs[String]("code") == "vital-signs")
    assert(out.getStruct(out.fieldIndex("valueCodeableConcept"))
      .getAs[String]("text") == "normal")
    val rr = out.getSeq[org.apache.spark.sql.Row](
      out.fieldIndex("referenceRange")).head
    assert(rr.getStruct(rr.fieldIndex("high"))
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("120")) == 0)
    val comps = out.getSeq[org.apache.spark.sql.Row](
      out.fieldIndex("component"))
    assert(comps.size == 2)
    val sys = comps.head.getStruct(comps.head.fieldIndex("valueQuantity"))
    assert(sys.getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("117.5")) == 0)
  }

  test("Encounter/Condition/Procedure full-R4 breadth") {
    val enc = """{"resourceType":"Encounter","id":"e-1","status":"finished",
      |"class":{"system":"http://terminology.hl7.org/CodeSystem/v3-ActCode",
      |"code":"AMB","display":"ambulatory"},
      |"period":{"start":"2020-01-01T09:00:00Z","end":"2020-01-01T09:30:00Z"},
      |"participant":[{"individual":{"reference":"Practitioner/dr-1",
      |"display":"Dr One"}}],
      |"diagnosis":[{"condition":{"reference":"Condition/c-1"},"rank":1}],
      |"hospitalization":{"dischargeDisposition":{"coding":[{"code":"home"}]}},
      |"serviceProvider":{"reference":"Organization/o-1"}}"""
      .stripMargin.replaceAll("\n", "")
    val e = FhirEncoder.encode(Seq(enc).toDF("resource"), "Encounter")
      .collect().head
    assert(e.getStruct(e.fieldIndex("class")).getAs[String]("display")
      == "ambulatory")
    assert(e.getStruct(e.fieldIndex("period")).getAs[String]("end")
      == "2020-01-01T09:30:00Z")
    val dg = e.getSeq[org.apache.spark.sql.Row](e.fieldIndex("diagnosis"))
    assert(dg.head.getAs[Int]("rank") == 1)
    val hosp = e.getStruct(e.fieldIndex("hospitalization"))
    assert(hosp.getStruct(hosp.fieldIndex("dischargeDisposition"))
      .getSeq[org.apache.spark.sql.Row](0).head
      .getAs[String]("code") == "home")

    val cond = """{"resourceType":"Condition","id":"c-2",
      |"severity":{"coding":[{"code":"24484000","display":"Severe"}]},
      |"onsetAge":{"value":54.5,"unit":"a"},
      |"stage":[{"summary":{"coding":[{"code":"IIb"}]}}],
      |"evidence":[{"code":[{"coding":[{"code":"obs"}]}],
      |"detail":[{"reference":"Observation/ob-9"}]}],
      |"subject":{"reference":"Patient/p1"}}"""
      .stripMargin.replaceAll("\n", "")
    val c = FhirEncoder.encode(Seq(cond).toDF("resource"), "Condition")
      .collect().head
    assert(c.getStruct(c.fieldIndex("onsetAge"))
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("54.5")) == 0)
    val ev = c.getSeq[org.apache.spark.sql.Row](c.fieldIndex("evidence"))
    assert(ev.head.getSeq[org.apache.spark.sql.Row](
      ev.head.fieldIndex("detail")).head
      .getAs[String]("reference") == "Observation/ob-9")

    val proc = """{"resourceType":"Procedure","id":"pr-1","status":"completed",
      |"performedPeriod":{"start":"2020-02-02T10:00:00Z",
      |"end":"2020-02-02T11:00:00Z"},
      |"performer":[{"actor":{"reference":"Practitioner/dr-2"}}],
      |"reasonCode":[{"coding":[{"code":"r1"}]}],
      |"followUp":[{"text":"wound check"}]}"""
      .stripMargin.replaceAll("\n", "")
    val p = FhirEncoder.encode(Seq(proc).toDF("resource"), "Procedure")
      .collect().head
    assert(p.getStruct(p.fieldIndex("performedPeriod"))
      .getAs[String]("start") == "2020-02-02T10:00:00Z")
    val perf = p.getSeq[org.apache.spark.sql.Row](p.fieldIndex("performer"))
    assert(perf.head.getStruct(perf.head.fieldIndex("actor"))
      .getAs[String]("reference") == "Practitioner/dr-2")
    assert(p.getSeq[org.apache.spark.sql.Row](p.fieldIndex("followUp"))
      .head.getAs[String]("text") == "wound check")
  }

  test("vector kernels: ragged arrays fail loudly, zero-vector cosine " +
      "is NULL (never NaN), huge bin expansion refuses with the knob " +
      "named") {
    graft.GraftExtensions.register(spark)
    // ragged input: silent prefix math would return a plausible-but-
    // wrong number (e.g. a corrupt PQ codebook row) — must throw
    val e1 = intercept[Exception](spark.sql(
      "SELECT dot_product(array(1.0D,2.0D,3.0D), array(1.0D,2.0D))")
      .collect())
    assert(e1.getMessage != null &&
      (e1.getMessage.contains("length mismatch") ||
        Option(e1.getCause).exists(_.getMessage.contains("length mismatch"))),
      e1.toString)
    // a zero vector has no direction: cosine NULL, not NaN (NaN fails
    // every >= threshold filter silently)
    val c = spark.sql(
      "SELECT cosine_similarity(array(0.0D,0.0D), array(1.0D,2.0D)) AS c")
      .collect()(0)
    assert(c.isNullAt(0), c.toString)
    // range-bin join: one outlier interval beyond maxBinsPerRow must
    // refuse loudly with the confs named, not OOM on the Sequence
    import spark.implicits._
    spark.conf.set("graft.rules.intervalJoin.binUs", "1000000")
    spark.conf.set("graft.rules.intervalJoin.maxBinsPerRow", "1000")
    try {
      val points = Seq(5000000L).toDF("ts")
      val ivals = Seq((0L, 10000000000L)).toDF("lo", "hi") // 10k bins
      val e2 = intercept[Exception](
        points.join(ivals,
          points("ts") >= ivals("lo") && points("ts") < ivals("hi"))
          .collect())
      val msg = Option(e2.getMessage).getOrElse("") +
        Option(e2.getCause).flatMap(c2 => Option(c2.getMessage)).getOrElse("")
      assert(msg.contains("maxBinsPerRow") || msg.contains("binUs"), e2.toString)
    } finally {
      spark.conf.unset("graft.rules.intervalJoin.binUs")
      spark.conf.unset("graft.rules.intervalJoin.maxBinsPerRow")
    }
  }

  test("FileBundleSource rejects non-envelope journal lines loudly " +
      "instead of coalescing them onto offset 0") {
    val dir = graft.SparkSpec.tmpDir("badjournal")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "j.ndjson"),
      "this is not an envelope\n".getBytes("UTF-8"))
    val e = intercept[Exception](
      graft.sources.FileBundleSource.batch(spark, dir).collect())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("journal") || msg.contains("envelope"), e.toString)
    // a well-formed journal still reads
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "j.ndjson"),
      ("""{"topic":"t","partition":0,"offset":7,"bundle":"{}"}""" + "\n")
        .getBytes("UTF-8"))
    val rows = graft.sources.FileBundleSource.batch(spark, dir).collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("offset") == 7L)
  }
}

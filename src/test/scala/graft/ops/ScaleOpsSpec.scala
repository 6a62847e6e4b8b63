package graft.ops

import graft.SparkSpec
import graft.sources.FileBundleSource
import graft.tables.ResourceTable
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join") {
    val big = Seq.tabulate(200)(i => (i % 3L, s"row$i")) // 3 hot keys
      .toDF("k", "payload")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "unused"))
      .toDF("k", "dim")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "dim").collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 4)
      .select("k", "payload", "dim").collect().toSet
    assert(salted == plain)
    assert(salted.size == 200)
  }

  test("triangle-split fuzzy dedup is pair-identical to the unsplit join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val key = org.apache.spark.sql.functions.struct(col("lang"),
      (length(col("text")) / lit(50)).cast("int"))
    def pairs(maxBlockRows: Int) =
      Dedup.editDistancePairs(docs, "doc_id", "text", key,
          maxBlockRows = maxBlockRows)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val plain = pairs(0)
    assert(plain.nonEmpty, "fixture must produce fuzzy pairs")
    // a cap far below the sf0.001 block sizes forces real splits; the
    // triangle distribution must cover every pair exactly once
    assert(pairs(5) == plain)
    assert(pairs(1) == plain)
  }

  test("salted two-phase aggregation matches direct aggregation") {
    val df = Seq.tabulate(500)(i => (i % 2L, (i % 7).toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_val"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedSumCount(df, "k", "v", salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2000L).toDF("id")

  test("hash split: total partition, stable across runs, fractions near") {
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(docs, "id", "s1", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(docs, "id", "s1", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b) // pure function of (salt, id)
    assert(a.size == 2000) // every row assigned exactly one split
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1600) < 100, counts.toString)
    assert(counts("val") > 100 && counts("test") > 100, counts.toString)
    // a different salt reshuffles membership
    val c = Sampling.hashSplit(docs, "id", "s2", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a != c)
  }

  test("hash sample is a subset that matches the split threshold") {
    val sampled = Sampling.hashSample(docs, "id", "s1", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(sampled.nonEmpty && sampled.size < 2000)
    assert(math.abs(sampled.size - 500) < 80, sampled.size.toString)
    // appending new rows never changes membership of existing ones
    val wider = Sampling.hashSample(
        (0L until 4000L).toDF("id"), "id", "s1", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(sampled.subsetOf(wider))
  }

  test("temperature mix: alpha=1 keeps all; low alpha flattens sources") {
    // skewed corpus: 1600 big / 320 mid / 80 small
    val corpus = (0L until 2000L).toDF("id").withColumn("src",
      when($"id" < 1600L, "big")
        .when($"id" < 1920L, "mid").otherwise("small"))
    assert(Sampling.temperatureMix(corpus, "id", "src", "t1", 1.0)
      .count() == 2000) // rate 1 everywhere
    val mixed = Sampling.temperatureMix(corpus, "id", "src", "t1", 0.3)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the smallest source is untouched; others level toward it
    assert(mixed("small") == 80, mixed.toString)
    // expected: 1600*(80/1600)^0.7 ≈ 197, 320*(80/320)^0.7 ≈ 121
    assert(math.abs(mixed("big") - 197) < 60, mixed.toString)
    assert(math.abs(mixed("mid") - 121) < 50, mixed.toString)
    // deterministic: the kept id set reproduces exactly
    val again = Sampling.temperatureMix(corpus, "id", "src", "t1", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    val first = Sampling.temperatureMix(corpus, "id", "src", "t1", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == first)
  }
}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("heap aggregator top-k equals rank-window top-k incl. tie-break") {
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 13) % 17).toFloat / 17f))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 2)
    val c = vecs.filter($"vec_id" >= 2)
    val win = Similarity.bruteForceTopK(q, c, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val agg = TopK.bruteForceTopKAgg(q, c, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(agg == win)
    assert(agg.size == 10) // 2 queries × 5
  }
}

class FileBundleSourceSpec extends SparkSpec {
  import graft.SparkSpec._

  private def journalLine(bundle: String, part: Int, off: Long): String = {
    // bundle JSON embedded as a string value → escape quotes/backslashes
    val esc = bundle.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "")
    s"""{"topic":"fhir.msg","partition":$part,"offset":$off,"bundle":"$esc"}"""
  }

  test("batch journal read produces the kafka wire schema and flows through the pipeline") {
    val dir = tmpDir("journal")
    val lines = Seq(
      journalLine(fixture("batches/put-2.json"), 0, 1),
      journalLine(fixture("batches/put-2-newer.json"), 0, 99))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/j0.ndjson"),
      lines.mkString("\n").getBytes)

    val wire = FileBundleSource.batch(spark, dir)
    assert(wire.schema.fieldNames.toSeq ==
      Seq("key", "value", "topic", "partition", "offset", "timestamp"))
    val deduped = graft.pipeline.BundlePipeline.deduplicate(
      graft.pipeline.BundlePipeline.prepare(wire))
    val rows = deduped.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("offset") == 99L) // newer PUT wins
  }

  test("checkpoint recovery: engine restart resumes from committed offsets") {
    val base = tmpDir("journal-restart")
    val srcDir = s"$base/in"
    new java.io.File(srcDir).mkdirs()
    val settings = graft.streaming.Settings(
      checkpointDir = s"$base/checkpoint",
      deltaDatabaseDir = s"$base/delta/default",
      resourceTypes = Seq("Patient"), upkeepInterval = 0)

    // run 1: ingest the PUT, then stop (simulated crash/redeploy)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$srcDir/j0.ndjson"),
      journalLine(fixture("single-patient.json"), 0, 0).getBytes)
    val run1 = graft.streaming.Engine.start(
      FileBundleSource.stream(spark, srcDir), settings)
    try run1.foreach(_.processAllAvailable()) finally run1.foreach(_.stop())
    val table = ResourceTable(spark,
      s"${settings.deltaDatabaseDir}/Patient.parquet")
    assert(table.read().count() == 1)
    val versionAfterRun1 = table.latestVersion.get

    // run 2: same checkpoint dir; only the NEW file (a DELETE) may be
    // processed — the PUT offsets are already committed
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$srcDir/j1.ndjson"),
      journalLine(fixture("delete-single-patient.json"), 0, 1).getBytes)
    val run2 = graft.streaming.Engine.start(
      FileBundleSource.stream(spark, srcDir), settings)
    try run2.foreach(_.processAllAvailable()) finally run2.foreach(_.stop())
    assert(table.read().count() == 0) // DELETE applied
    // exactly one new batch of mutations, not a replay of file j0
    assert(table.latestVersion.get > versionAfterRun1)
  }

  test("AvailableNow trigger drains the source then stops on its own") {
    val base = tmpDir("available-now")
    val srcDir = s"$base/in"
    new java.io.File(srcDir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$srcDir/j0.ndjson"),
      journalLine(fixture("single-patient.json"), 0, 0).getBytes)
    val settings = graft.streaming.Settings(
      checkpointDir = s"$base/checkpoint",
      deltaDatabaseDir = s"$base/delta/default",
      resourceTypes = Seq("Patient"), upkeepInterval = 0,
      triggerAvailableNow = true)
    val queries = graft.streaming.Engine.start(
      FileBundleSource.stream(spark, srcDir), settings)
    try {
      queries.foreach(_.awaitTermination(60000))
      assert(queries.forall(!_.isActive)) // drained and self-stopped
      assert(ResourceTable(spark,
        s"${settings.deltaDatabaseDir}/Patient.parquet").read().count() == 1)
    } finally queries.foreach(_.stop())
  }

  test("streaming journal source drives the full engine") {
    val base = tmpDir("journal-stream")
    val srcDir = s"$base/in"
    new java.io.File(srcDir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$srcDir/j0.ndjson"),
      journalLine(fixture("single-patient.json"), 0, 0).getBytes)

    val settings = graft.streaming.Settings(
      checkpointDir = s"$base/checkpoint",
      deltaDatabaseDir = s"$base/delta/default",
      resourceTypes = Seq("Patient"), upkeepInterval = 0)
    val queries = graft.streaming.Engine.start(
      FileBundleSource.stream(spark, srcDir), settings)
    try {
      queries.foreach(_.processAllAvailable())
      val t = ResourceTable(spark, s"${settings.deltaDatabaseDir}/Patient.parquet")
      assert(t.read().count() == 1)
    } finally queries.foreach(_.stop())
  }
}

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 100L), (2L, 199L), (3L, 200L), (4L, 350L), (5L, 999L)
  ).toDF("p_id", "ts")
  private lazy val intervals = Seq(
    (10L, 100L, 200L),  // half-open: holds ts 100,199 but NOT 200
    (11L, 150L, 400L),  // spans several bins; holds 199, 200, 350
    (12L, 500L, 500L),  // empty interval: matches nothing
    (13L, 600L, 550L)   // inverted: matches nothing
  ).toDF("iv_id", "start_ts", "end_ts")

  private def pairs(binUs: Long): Set[(Long, Long)] =
    IntervalJoin.joinPointsToIntervals(
        points, "ts", intervals, "start_ts", "end_ts", binUs)
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val expected =
    Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L))

  test("half-open containment, empty/inverted intervals excluded") {
    assert(pairs(binUs = 100L) == expected)
  }

  test("result is bin-size invariant (no duplicate pairs at any bin)") {
    for (bin <- Seq(1L, 7L, 50L, 1000L)) {
      val got = IntervalJoin.joinPointsToIntervals(
          points, "ts", intervals, "start_ts", "end_ts", bin)
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicates at bin=$bin")
      assert(got.toSet == expected, s"wrong pairs at bin=$bin")
    }
  }

  test("plans as an equi-join on the bin, not a nested loop") {
    val plan = IntervalJoin.joinPointsToIntervals(
        points, "ts", intervals, "start_ts", "end_ts", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join"), plan)
  }
}

class IntervalJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: binned join equals brute force on random data") {
    val rnd = new scala.util.Random(7)
    // straddle zero: truncating DIV (not floor) must stay consistent
    // between the point bin and the interval's bin range on negatives
    val pts = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(10000).toLong - 5000L))
    val ivs = (0 until 60).map { i =>
      val start = rnd.nextInt(10000).toLong - 5000L
      // include empty (len 0) and inverted (len < 0) intervals
      (1000L + i, start, start + rnd.nextInt(451) - 50L)
    }
    val expected = (for {
      (pid, ts) <- pts
      (ivId, s, e) <- ivs
      if ts >= s && ts < e
    } yield (pid, ivId)).toSet
    val ptsDf = pts.toDF("p_id", "ts")
    val ivsDf = ivs.toDF("iv_id", "start_ts", "end_ts")
    for (bin <- Seq(1L, 37L, 256L, 100000L)) {
      val got = IntervalJoin.joinPointsToIntervals(
          ptsDf, "ts", ivsDf, "start_ts", "end_ts", bin)
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"dup pairs at bin=$bin")
      assert(got.toSet == expected, s"mismatch at bin=$bin")
    }
  }
}

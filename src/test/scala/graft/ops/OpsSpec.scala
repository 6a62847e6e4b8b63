package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different content about spark engines and scale"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "spark engines and scale are a completely different topic here")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val res = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("dup_cnt")).toMap
    assert(res(0L) == 2) // docs 0 and 3
    assert(res.values.sum == 5)
  }

  test("minhash LSH finds the near-dup pair and the exact pair") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        minJaccard = 0.4, k = 16, bands = 8, w = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L))) // near-dup
    assert(!pairs.contains((0L, 2L)))
  }

  test("identical docs share signatures; signature length is k") {
    val sigs = Dedup.signatures(docs.filter($"doc_id".isin(0, 3)),
        "doc_id", "text", k = 16, w = 2)
      .collect().map(_.getSeq[Long](2))
    assert(sigs(0) == sigs(1))
    assert(sigs.forall(_.size == 16))
  }

  test("simhash: identical docs share simhash; hamming pairs found") {
    val sims = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Long]("simhash")).toMap
    assert(sims(0L) == sims(3L))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("resolveClusters: chained pairs collapse to one canonical id") {
    // chain 1-2, 2-3, 3-4 plus isolated pair 10-11 — resolved twice:
    // once on the driver union-find fast path, once forced through the
    // distributed label-propagation loop (driverEdgeLimit = 0)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    Seq(100000L, 0L).foreach { limit =>
      val res = Dedup.resolveClusters(pairs, driverEdgeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(res(1L) == 1L && res(2L) == 1L && res(3L) == 1L && res(4L) == 1L,
        s"limit=$limit: $res")
      assert(res(10L) == 10L && res(11L) == 10L, s"limit=$limit: $res")
    }
  }

  test("redactPii masks emails and phone runs, leaves prose alone") {
    val df = Seq(
      (1L, "write to jane.doe+x@corp.example.org or call 555 123-4567 now"),
      (2L, "no pii here, just words and the number 7")).toDF("id", "t")
    val out = df.select($"id", TextStats.redactPii($"t").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "write to <EMAIL> or call <PHONE> now")
    assert(out(2L) == "no pii here, just words and the number 7")
  }

  test("ngram jaccard verifies candidates exactly") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        minJaccard = 0.99, k = 16, bands = 8, w = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 3L))) // only the exact dup has jaccard 1.0
  }

  test("segment dedup drops corpus-frequent segments from every doc") {
    val segged = Seq(
      (1L, Seq("unique one", "shared footer", "unique two")),
      (2L, Seq("other text", "shared footer")),
      (3L, Seq("shared footer", "shared footer")) // both occurrences go
    ).toDF("doc_id", "segs")
    val out = Dedup.dedupSegments(segged, "doc_id", "segs")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(out == Set((1L, 0, "unique one"), (1L, 2, "unique two"),
      (2L, 0, "other text")), out.toString)
  }

  test("banded index probe: incoming exact dup always found, distinct miss absent") {
    val index = Dedup.bandedIndex(docs, "doc_id", "text", k = 16,
      bands = 8, w = 2)
    // index cardinality: one row per (doc, band)
    assert(index.count() == docs.count() * 8)
    val incoming = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // dup of 0,3
      (101L, "totally novel text that matches nothing in the corpus xyz")
    ).toDF("doc_id", "text")
    val hits = Dedup.nearDupAgainstIndex(incoming, index, "doc_id",
        "text", minJaccard = 0.99, k = 16, bands = 8, w = 2)
      .select("doc", "corpus_doc").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((100L, 0L), (100L, 3L)), hits.toString)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Array(1.0f, 0.05f, 0.0f, 0.0f))  // very close to 0
  ).toDF("vec_id", "embedding")

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val sims = vecs.crossJoin(
        vecs.select($"vec_id".as("b_id"), $"embedding".as("b")))
      .filter($"vec_id" === 0)
      .select($"b_id", Similarity.cosine($"embedding", $"b").as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(sims(0L) - 1.0) < 1e-9)
    assert(math.abs(sims(2L)) < 1e-9)
    assert(math.abs(sims(3L) + 1.0) < 1e-9)
  }

  test("brute-force top-k ranks by similarity with id tie-break") {
    val res = Similarity.bruteForceTopK(
        vecs.filter($"vec_id" === 0), vecs.filter($"vec_id" > 0), k = 2)
      .collect().map(r => (r.getAs[Long]("n_id"), r.getAs[Int]("rank")))
    assert(res.sortBy(_._2).map(_._1).toSeq == Seq(4L, 1L))
  }

  test("semDedup keeps the first of each within-cell near-dup run") {
    // 0,1,4 are mutually near (cos > 0.9) and land in one cell: only
    // the lowest id (0) survives among them under keep-first; 2 and 3
    // are far from everything and survive. No transitive closure: the
    // semantics are "has an earlier near twin in my cell", which is
    // what the exact DuckDB oracle replays.
    val out = Dedup.semDedup(vecs, threshold = 0.9, nCells = 4, dim = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(0L, 2L, 3L))
    // scale shape: candidates join on the cell key — no cartesian, no
    // nested loop
    val plan = Dedup.semDedup(vecs, threshold = 0.9, nCells = 4,
      dim = 4).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("semantic decontamination drops corpus rows near any benchmark vector") {
    // bench = {0}; corpus 1,4 are near it (cos > 0.99), 2 orthogonal,
    // 3 opposite — only 2 and 3 survive a 0.9 threshold
    val out = Similarity.semanticDecontaminate(
        vecs.filter($"vec_id" > 0), vecs.filter($"vec_id" === 0),
        threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 3L))
    // scale posture: benchmark side broadcast, corpus side streamed —
    // the plan is a left-anti nested loop against a broadcast, with
    // no shuffle of the corpus
    val plan = Similarity.semanticDecontaminate(
      vecs.filter($"vec_id" > 0), vecs.filter($"vec_id" === 0),
      threshold = 0.9).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("LSH pairs find high-cosine neighbors") {
    val pairs = Similarity.lshCosinePairs(vecs, threshold = 0.9,
        planes = 8, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 0-1, 0-4, 1-4 are all > 0.9 cosine; LSH may miss some but must
    // never emit a below-threshold pair
    assert(pairs.subsetOf(Set((0L, 1L), (0L, 4L), (1L, 4L))))
    assert(pairs.nonEmpty)
  }

  test("ivf assigns every vector to a cell") {
    val cells = Similarity.ivfAssign(vecs, nCells = 4, dim = 4)
      .select("cell").collect().map(_.getInt(0))
    assert(cells.length == 5 && cells.forall(c => c >= 0 && c < 4))
  }

  test("ivf multi-probe: probe-1 hits are a subset; probes widen recall") {
    val qs = vecs.filter($"vec_id" === 0)
    val corpus = vecs.filter($"vec_id" > 0)
    def hits(p: Int): Set[Long] =
      Similarity.ivfTopK(qs, corpus, k = 4, nCells = 4, dim = 4, probes = p)
        .collect().map(_.getAs[Long]("n_id")).toSet
    val p1 = hits(1)
    val p4 = hits(4)
    assert(p1.subsetOf(p4), s"$p1 not ⊆ $p4")
    // probing every cell = brute force: all 4 corpus vectors found
    assert(p4 == Set(1L, 2L, 3L, 4L))
    // multi-probe rows per (vector, cell) are the top cells, best first
    val probed = Similarity.ivfProbe(qs, nCells = 4, dim = 4, probes = 2)
      .select("cell").collect().map(_.getInt(0))
    assert(probed.length == 2 && probed.distinct.length == 2)
  }

  test("persisted ivf index: results match direct ivf; scan carries a partition filter") {
    val qs = vecs.filter($"vec_id" === 0)
    val corpus = vecs.filter($"vec_id" > 0)
    val path = graft.SparkSpec.tmpDir("ivfidx")
    Similarity.writeIvfIndex(corpus, path, nCells = 4, dim = 4)
    val index = spark.read.parquet(path)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Int]("rank"))).toSet
    val direct = Similarity.ivfTopK(qs, corpus, k = 4, nCells = 4,
      dim = 4, probes = 2)
    val indexed = Similarity.ivfTopKIndexed(qs, index, k = 4, nCells = 4,
      dim = 4, probes = 2)
    assert(rows(indexed) == rows(direct))
    // the cell IN (...) predicate must reach the scan as a PARTITION
    // filter (directory pruning), not a data filter
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)].*", "$1")
        .contains("cell"), s"no cell partition filter in:\n$plan")
  }
}

class RandomProjectSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("randomProject emits kOut integer components per vector") {
    val out = Similarity.randomProject(emb.limit(50), kOut = 8)
      .select($"vec_id", $"rp").collect()
    assert(out.length == 50)
    assert(out.forall(_.getSeq[Long](1).length == 8))
    // components are genuine sums, not degenerate zeros
    assert(out.flatMap(_.getSeq[Long](1)).count(_ != 0L) > 300)
  }

  test("projection is deterministic across plans/partitionings") {
    val a = Similarity.randomProject(emb, kOut = 8)
      .select($"vec_id", $"rp").collect().map(r =>
        r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Similarity.randomProject(emb.repartition(7), kOut = 8)
      .select($"vec_id", $"rp").collect().map(r =>
        r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }

  test("JL property: projection separates near from far") {
    // A near-duplicate (cos≈0.995) must outrank an orthogonal and an
    // opposite vector in the PROJECTED space — the separation JL
    // guarantees (rank recovery among near-EQUAL similarities is
    // explicitly not promised at kOut=16). Deterministic signs → this
    // is a fixed, reproducible check, not a flaky sample.
    def unit(i: Int): Array[Float] =
      Array.tabulate(64)(d => if (d == i) 1.0f else 0.0f)
    val near = Array.tabulate(64)(d =>
      if (d == 0) 0.995f else if (d == 1) 0.0999f else 0.0f)
    val vecs = Seq(
      (0L, unit(0)), (1L, near), (2L, unit(7)),
      (3L, unit(0).map(-_))).toDF("vec_id", "embedding")
    val ranked = Similarity.rpTopK(
        vecs.filter($"vec_id" === 0), vecs.filter($"vec_id" > 0),
        k = 3, kOut = 16)
      .orderBy($"rank").collect().map(_.getAs[Long]("n_id")).toSeq
    assert(ranked.head == 1L, s"near-dup not first: $ranked")
    assert(ranked.last == 3L, s"opposite not last: $ranked")
  }

  test("rpTopK dot evidence equals the exact integer dot product") {
    val rows = Similarity.rpTopK(
      emb.filter($"vec_id" === 0), emb.filter($"vec_id" > 0),
      k = 3, kOut = 8).collect()
    val rp = Similarity.randomProject(emb, kOut = 8)
      .select($"vec_id", $"rp").collect().map(r =>
        r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { r =>
      val expect = rp(0L).zip(rp(r.getAs[Long]("n_id")))
        .map { case (x, y) => x * y }.sum
      assert(r.getAs[Long]("dot") == expect)
    }
  }
}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("train is deterministic and codebooks are dense k x subDim") {
    val a = Pq.trainOn(emb)
    val b = Pq.trainOn(emb.repartition(5))
    assert(a == b, "training must not depend on partitioning")
    assert(a.cents.length == 8)
    assert(a.cents.forall(s => s.length == 16 &&
      s.forall(_.length == 8)))
  }

  test("empty clusters carry their previous centroid forward") {
    // 20 identical vectors: every subvector assigns to code 0, so
    // clusters 1..15 are empty every iteration — they must keep their
    // (identical) seed centroids, and k stays dense at 16
    val same = Seq.fill(20)(Array.fill(64)(0.25f)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val cb = Pq.trainOn(same, sampleCap = 20)
    assert(cb.cents.forall(_.length == 16))
    val codes = Pq.encode(same, cb).select($"codes").head.getSeq[Int](0)
    assert(codes == Seq.fill(8)(0), "ties must resolve to code 0")
  }

  test("encode: m codes per row, each in [0, k)") {
    val cb = Pq.trainOn(emb)
    val rows = Pq.encode(emb, cb).select($"codes").collect()
    assert(rows.forall { r =>
      val c = r.getSeq[Int](0)
      c.length == 8 && c.forall(x => x >= 0 && x < 16)
    })
    // codes actually discriminate: more than one distinct codeword
    assert(rows.map(_.getSeq[Int](0)).distinct.length > 10)
  }

  test("ADC separates near from far (JL-style separation contract)") {
    def unit(i: Int): Array[Float] =
      Array.tabulate(64)(d => if (d == i) 1.0f else 0.0f)
    val near = Array.tabulate(64)(d =>
      if (d == 0) 0.98f else if (d == 1) 0.199f else 0.0f)
    val far = Array.tabulate(64)(d => -0.7f * unit(0)(d) + 0.7f * unit(5)(d))
    val vecs = Seq((0L, unit(0)), (1L, near), (2L, unit(9)), (3L, far))
      .toDF("vec_id", "embedding")
    // train on a corpus that contains the structure
    val cb = Pq.trainOn(vecs, sampleCap = 4, k = 4)
    val ranked = Pq.adcTopK(vecs.filter($"vec_id" === 0),
        vecs.filter($"vec_id" > 0), cb, topK = 3)
      .orderBy($"rank").collect().map(_.getAs[Long]("n_id")).toSeq
    assert(ranked.head == 1L, s"near-dup not ranked first: $ranked")
  }

  test("ivfAdcTopK with probes = nCells degenerates to exact adcTopK") {
    val cb = Pq.trainOn(emb)
    val q = emb.filter($"vec_id" < 2)
    val c = emb.filter($"vec_id" >= 2)
    val full = Pq.adcTopK(q, c, cb, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getLong(3))).toSet
    val ivf = Pq.ivfAdcTopK(q, c, cb, topK = 5, nCells = 8, probes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getLong(3))).toSet
    assert(ivf == full)
  }

  test("adc evidence equals the exact reconstruction distance") {
    val cb = Pq.trainOn(emb)
    val got = Pq.adcTopK(emb.filter($"vec_id" === 0),
      emb.filter($"vec_id" > 0 && $"vec_id" < 20), cb, topK = 5)
      .collect()
    // recompute on the driver from first principles
    val fp = emb.filter($"vec_id" < 20).collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Float](1).map(v =>
        math.floor(v.toDouble * Pq.Scale).toLong).toSeq).toMap
    val codes = Pq.encode(emb.filter($"vec_id" < 20), cb)
      .select($"vec_id", $"codes").collect().map(r =>
        r.getLong(0) -> r.getSeq[Int](1)).toMap
    got.foreach { r =>
      val q = fp(0L); val n = r.getAs[Long]("n_id")
      val expect = (0 until 8).map { s =>
        val qs = q.slice(s * 8, s * 8 + 8)
        val cv = cb.cents(s)(codes(n)(s))
        qs.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum
      assert(r.getAs[Long]("adc") == expect)
    }
  }
}

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("token count and quality features") {
    val df = Seq((1L, "the quick  brown fox"), (2L, "a"))
      .toDF("doc_id", "text")
    val q = TextStats.qualityFeatures(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(q(1L).getAs[Long]("n_tokens") == 4)
    assert(q(2L).getAs[Long]("n_tokens") == 1)
    assert(q(1L).getAs[Double]("stopword_ratio") == 0.25) // "the"
    assert(q(2L).getAs[Double]("stopword_ratio") == 1.0)  // "a"
  }

  test("langId picks the profile with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog in the house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "el perro y la casa es un lugar")).toDF("doc_id", "text")
    val got = TextStats.langId(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang"))
      .toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "es")
  }

  test("short docs (no shingles) are never near-dup candidates") {
    // minhash of an empty shingle set is an all-sentinel signature;
    // without the filter every pair of unrelated short docs scored
    // est_jaccard 1.0 and collapsed into one cluster
    val short = Seq((10L, "alpha"), (11L, "beta"), (12L, "gamma zz"),
      (13L, "the quick brown fox jumps over the lazy dog"),
      (14L, "the quick brown fox jumps over the lazy cat"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(short, "doc_id", "text",
        minJaccard = 0.4, k = 16, bands = 8, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 <= 12L || p._2 <= 12L),
      s"short docs produced false near-dup pairs: $pairs")
    assert(pairs.contains((13L, 14L))) // the real near-dup still found
    // and the streaming index path applies the same filter
    val idx = Dedup.bandedIndex(short, "doc_id", "text", k = 16,
      bands = 8, w = 3)
    assert(idx.filter(col("doc") <= 12L).isEmpty)
  }

  test("keepBest works with STRING doc ids; equal scores pick the smaller id") {
    val labels = Seq(("a", "a"), ("b", "a"), ("c", "a"))
      .toDF("doc_id", "canonical_id")
    val scores = Seq(("a", 5.0), ("b", 9.0), ("c", 9.0))
      .toDF("doc_id", "score")
    val r = Dedup.keepBest(labels, scores).collect().head
    assert(r.getAs[String]("keep_id") == "b") // top score 9.0, tie -> "b" < "c"
    assert(r.getAs[Double]("keep_score") == 9.0)
    assert(r.getAs[Long]("cluster_size") == 3L)
  }

  test("simhash banding recall follows maxHamming (pigeonhole)") {
    // two docs engineered close in simhash space via near-identical
    // text; with maxHamming=8 the bands must co-bucket every pair the
    // exact hamming filter would keep
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again tonight"))
      .toDF("doc_id", "text")
    val hams = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 20)
      .collect()
    // whatever the distance, if it is <= 20 the pair MUST be present
    val direct = Dedup.simhash(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("simhash"))
    val d = java.lang.Long.bitCount(direct(0) ^ direct(1))
    assert(d > 3, s"fixture too close (hamming $d) to exercise recall")
    if (d <= 20) assert(hams.nonEmpty,
      s"pair at hamming $d missing despite maxHamming=20")
  }

  test("langId ties (zero stopword hits) resolve to the first profile") {
    val df = Seq((1L, "quantum flux capacitor diagnostics"))
      .toDF("doc_id", "text")
    assert(TextStats.langId(df).collect()
      .head.getAs[String]("predicted_lang") == "en")
  }

  test("stopword ratio is case-insensitive; empty docs have 0 tokens") {
    val df = Seq((1L, "The cat sat. The dog ran."), (2L, "   "))
      .toDF("doc_id", "text")
    val q = TextStats.qualityFeatures(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(q(1L).getAs[Double]("stopword_ratio") > 0.0) // "The" counts
    assert(q(2L).getAs[Long]("n_tokens") == 0L)
    assert(q(2L).getAs[Double]("stopword_ratio") == 0.0) // not NaN
  }

  test("hashSplit: trailing zero-fraction split receives ~nothing") {
    val df = spark.range(2000).toDF("id")
    val got = graft.ops.Sampling.hashSplit(df, "id", "s8",
        Seq("a" -> 0.5, "b" -> 0.5, "c" -> 0.0))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // before the fix, cum=1.0 formatted as "10000" and split b's
    // entire share landed in c
    assert(got.getOrElse("c", 0L) == 0L, got.toString)
    assert(got("a") + got("b") == 2000L)
    assert(math.abs(got("a") - 1000L) < 150, got.toString)
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq((1L, "Hello   World"), (2L, "hello world")).toDF("id", "t")
    val fps = df.select(TextStats.fingerprint($"t")).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("shingle fingerprints are sorted distinct hashes") {
    val fp = Seq((1L, "a b c d e f g")).toDF("id", "t")
      .select(TextStats.shingleFingerprints($"t", 3).as("fp"))
      .collect().head.getSeq[Long](0)
    assert(fp == fp.sorted && fp.distinct == fp && fp.size == 5)
  }
}

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): Option[(String, Long)] =
    TextStats.extractMainContent(
      Seq((1L, html)).toDF("doc_id", "html"))
      .collect().headOption.map(r => (r.getString(1), r.getLong(2)))

  test("multi-line script/style blocks strip before line analysis") {
    val html = "<script>\nvar a = 1;\nvar b = 2;\n</script>\n" +
      "<p>the actual article body text goes here</p>"
    assert(extract(html) ==
      Some(("the actual article body text goes here", 1L)))
  }

  test("entity decode is &amp;-last so &amp;lt; cannot double-decode") {
    val html = "<p>literal sequence &amp;lt; stays; real &lt;tag&gt; " +
      "decodes and is not stripped</p>"
    val (content, _) = extract(html).get
    assert(content.contains("&lt; stays"))
    assert(content.contains("<tag>"))
  }

  test("link-dense short lines drop; long low-density lines survive") {
    val nav = "<nav><a href=\"/\">Home</a> <a href=\"/x\">More</a></nav>"
    val para = "<p>one genuine paragraph with <a href=\"/r\">a single " +
      "reference link</a> surrounded by plenty of running text</p>"
    val html = s"$nav\n$para"
    val (content, kept) = extract(html).get
    assert(kept == 1L && content.startsWith("one genuine paragraph"))
  }

  test("a fully-boilerplate page yields no row (empty content set)") {
    assert(extract(
      "<nav><a href=\"/\">Home</a></nav>\n<footer>&copy; now</footer>")
      .isEmpty)
  }

  test("re-assembly is document-ordered regardless of partitioning") {
    val html = (0 until 40).map(i =>
      s"<p>paragraph number $i with enough characters to pass</p>")
      .mkString("\n")
    val df = Seq((1L, html)).toDF("doc_id", "html").repartition(7)
    val (content, kept) = TextStats.extractMainContent(df)
      .collect().map(r => (r.getString(1), r.getLong(2))).head
    assert(kept == 40L)
    val order = "paragraph number (\\d+)".r
      .findAllMatchIn(content).map(_.group(1).toInt).toSeq
    assert(order == (0 until 40))
  }
}

class AllPairsSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("reports exact dot for pairs above threshold") {
    val docs = Seq(
      (0L, "a b b c"),       // tf a:1 b:2 c:1, nn=6
      (1L, "a b b c"),       // identical → cos 1
      (2L, "a b"),           // vs 0: dot=1+2=3, cos 3/sqrt(6*5)=0.547
      (3L, "x y z")          // disjoint
    ).toDF("doc_id", "text")
    val out = TextStats.allPairsSimilarity(docs, threshold = 0.9,
        dfCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L, 6L)))
  }

  test("threshold keeps partial overlaps when lowered") {
    val docs = Seq(
      (0L, "a b b c"), (1L, "a b b c"), (2L, "a b"), (3L, "x y z")
    ).toDF("doc_id", "text")
    val out = TextStats.allPairsSimilarity(docs, threshold = 0.5,
        dfCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("matches the O(n²) brute force when the df-cut is inactive") {
    // deterministic pseudo-random docs from a tiny vocabulary; with
    // dfCap >= n the candidate pass admits every sharing pair, so the
    // result must equal the literal cross-join definition
    val vocab = Vector("red", "blue", "green", "fish", "bird", "tree")
    def doc(i: Int): String = {
      var z = i.toLong * 0x9E3779B97F4A7C15L
      (0 until 6).map { _ =>
        z = z * 6364136223846793005L + 1442695040888963407L
        vocab(((z >>> 33) % vocab.length).toInt)
      }.mkString(" ")
    }
    val docs = (0 until 40).map(i => (i.toLong, doc(i)))
      .toDF("doc_id", "text")
    val got = TextStats.allPairsSimilarity(docs, threshold = 0.7,
        dfCap = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // brute force on the driver
    def tf(s: String): Map[String, Long] =
      s.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val m = (0 until 40).map(i => i.toLong -> tf(doc(i))).toMap
    val expect = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L
      dot = m(a).keySet.intersect(m(b).keySet).toSeq
        .map(w => m(a)(w) * m(b)(w)).sum
      if dot > 0
      na = m(a).values.map(x => x * x).sum
      nb = m(b).values.map(x => x * x).sum
      if dot.toDouble / math.sqrt(na.toDouble * nb.toDouble) >= 0.7
    } yield (a, b, dot)).toSet
    assert(got == expect,
      s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("df-cut: pairs sharing only super-common words are not candidates") {
    // 'a' appears in all 4 docs; with dfCap=3 it generates no
    // candidates, so the identical pair (0,1) — which shares ONLY
    // 'a' — is unreported even at cos 1.0. Docs 2,3 also share 'q'
    // (df=2, rare) and do surface.
    val docs = Seq(
      (0L, "a"), (1L, "a"), (2L, "a q"), (3L, "a q")
    ).toDF("doc_id", "text")
    val out = TextStats.allPairsSimilarity(docs, threshold = 0.99,
        dfCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((2L, 3L)))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "some text payload standing in for image bytes"),
    (2L, "another, longer, text payload that stands in for a larger binary blob " * 10)
  ).toDF("doc_id", "text")

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.asMediaTable(docs).collect()
    assert(m.length == 2)
    val r = m.find(_.getAs[Long]("media_id") == 1L).get
    assert(new String(r.getAs[Array[Byte]]("payload")).startsWith("some text"))
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") == 45L)
  }

  test("feature extraction is deterministic and bounded") {
    val f1 = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .select("features").collect().map(_.getSeq[Double](0))
    val f2 = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .select("features").collect().map(_.getSeq[Double](0))
    assert(f1.toSeq.map(_.toSeq) == f2.toSeq.map(_.toSeq))
    assert(f1.forall(v => v.size == 8 && v.forall(x => x >= 0 && x < 1)))
  }

  test("batched mapPartitions decode yields per-row feature vectors") {
    val media = Multimodal.asMediaTable(docs)
    val feats = Multimodal.decodeBatched(media)()
      .collect().map(r => r.getAs[Long]("media_id") -> r.getSeq[Double](1))
      .toMap
    assert(feats.size == 2)
    assert(feats.values.forall(v => v.size == 8 &&
      v.forall(x => x >= 0 && x < 1)))
    // deterministic across runs
    val again = Multimodal.decodeBatched(media)()
      .collect().map(r => r.getAs[Long]("media_id") -> r.getSeq[Double](1))
      .toMap
    assert(feats.view.mapValues(_.toSeq).toMap ==
      again.view.mapValues(_.toSeq).toMap)
  }

  test("frame sampling yields strided fixed-size frames") {
    val frames = Multimodal.sampleFrames(
        Multimodal.asMediaTable(docs), frameBytes = 100, stride = 2)
      .collect()
    val byId = frames.groupBy(_.getAs[Long]("media_id"))
    assert(byId(2L).length > 1) // long payload → multiple sampled frames
    assert(byId(2L).map(_.getAs[Int]("frame_idx")).forall(_ % 2 == 0))
  }
}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences lays docs head-to-tail per shard and splits at the budget") {
    val docs = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 500L), // stream: 1100 toks
      ("b", 1L, 1200L), ("b", 2L, 10L) // one doc spanning 3 seqs
    ).toDF("shard", "id", "n")
    val out = Packing.packSequences(docs, "shard", "id", "n", budget = 512L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("seq_id"), r.getAs[Long]("seq_pos"),
          r.getAs[Long]("n_seqs")))).toMap
    assert(out(("a", 1L)) == ((0L, 0L, 1L)))   // [0,300)
    assert(out(("a", 2L)) == ((0L, 300L, 2L))) // [300,600) crosses 512
    assert(out(("a", 3L)) == ((1L, 88L, 2L)))  // [600,1100) crosses 1024
    assert(out(("b", 1L)) == ((0L, 0L, 3L)))   // [0,1200) spans 3 budgets
    assert(out(("b", 2L)) == ((2L, 176L, 1L)))
  }

  test("packSequences: zero-token doc occupies one sequence, zero width") {
    val docs = Seq(("a", 1L, 512L), ("a", 2L, 0L), ("a", 3L, 5L))
      .toDF("shard", "id", "n")
    val out = Packing.packSequences(docs, "shard", "id", "n", 512L)
      .collect().map(r => r.getLong(1) ->
        ((r.getAs[Long]("seq_id"), r.getAs[Long]("seq_pos"),
          r.getAs[Long]("n_seqs")))).toMap
    assert(out(2L) == ((1L, 0L, 1L))) // lands exactly on the boundary
    assert(out(3L) == ((1L, 0L, 1L)))
  }

  test("chunkWindows: stride/size tiling with short tail chunk") {
    val docs = Seq((1L, "x" * 250), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val out = Packing.chunkWindows(docs, "doc_id", "text",
        size = 120, stride = 90)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("chunk_id")) ->
        ((r.getAs[Long]("chunk_start"), r.getAs[String]("chunk_text").length)))
      .toMap
    // len 250: starts 1, 91, 181 -> lens 120, 120, 70
    assert(out((1L, 0L)) == ((1L, 120)))
    assert(out((1L, 1L)) == ((91L, 120)))
    assert(out((1L, 2L)) == ((181L, 70)))
    assert(!out.contains((1L, 3L)))
    assert(out((2L, 0L)) == ((1L, 2)))
    assert(out((3L, 0L)) == ((1L, 0))) // empty doc -> one empty chunk
    // overlap invariant: consecutive chunks share size-stride chars
    val texts = Packing.chunkWindows(docs.filter($"doc_id" === 1), "doc_id",
        "text", 120, 90).collect().map(_.getAs[String]("chunk_text"))
    assert(texts(0).substring(90) == texts(1).substring(0, 30))
  }
}

class SamplingStratifiedSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedByHash keeps per-stratum fractions; absent strata drop") {
    val df = (0 until 4000).map(i => (i.toLong, Seq("a", "b", "c")(i % 3)))
      .toDF("id", "grp")
    val kept = Sampling.stratifiedByHash(df, "id", "grp", "s",
        Seq("a" -> 1.0, "b" -> 0.25))
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("a") == 1334) // rate 1.0 keeps EVERY row (no "10000" trap)
    assert(kept("b") > 200 && kept("b") < 470, s"b=${kept("b")}")
    assert(!kept.contains("c"))
  }

  test("stratified sample is stable under re-sharding") {
    val df = (0 until 1000).map(i => (i.toLong, "a")).toDF("id", "grp")
    val once = Sampling.stratifiedByHash(df, "id", "grp", "s",
      Seq("a" -> 0.5)).collect().map(_.getLong(0)).toSet
    val again = Sampling.stratifiedByHash(df.repartition(7), "id", "grp",
      "s", Seq("a" -> 0.5)).collect().map(_.getLong(0)).toSet
    assert(once == again)
  }
}

class PackingPropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: packing reproduces a sequential replay on random corpora") {
    val rnd = new scala.util.Random(42)
    val docs = (0 until 500).map { i =>
      (s"shard${rnd.nextInt(7)}", i.toLong, rnd.nextInt(2000).toLong)
    }
    val out = Packing.packSequences(
        docs.toDF("shard", "id", "n"), "shard", "id", "n", budget = 512L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_pos"),
          r.getAs[Long]("n_seqs")))).toMap
    // sequential replay: lay each shard's docs head-to-tail and derive
    // the expected placement directly
    docs.groupBy(_._1).foreach { case (_, ds) =>
      var off = 0L
      ds.sortBy(_._2).foreach { case (shard, id, n) =>
        val (gotN, seqId, seqPos, nSeqs) = out((shard, id))
        assert(gotN == n)
        assert(seqId == off / 512, s"$shard/$id")
        assert(seqPos == off % 512)
        assert(seqPos >= 0 && seqPos < 512)
        val expSeqs =
          if (n == 0) 1L else (off + n - 1) / 512 - off / 512 + 1
        assert(nSeqs == expSeqs, s"$shard/$id: $nSeqs != $expSeqs")
        off += n
      }
    }
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 pipeline operators: canonical-URL dedup, the fixed-weight
  * quality classifier, and deterministic training-shard assignment.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalize collapses scheme/www/tracking/fragment/slash variants") {
    val urls = Seq(
      "https://www.Site.example.com/p/1?utm_source=feed&id=1",
      "HTTP://site.example.com/p/1?id=1&utm_campaign=x",
      "https://site.example.com/p/1/?id=1#sec-2",
      "https://site.example.com/p/1?id=1"
    ).toDF("url").select(Urls.canonicalize($"url").as("c"))
      .as[String].collect().toSet
    assert(urls == Set("site.example.com/p/1?id=1"))
  }

  test("canonicalize keeps meaningful params and distinct pages apart") {
    val c = Seq(
      "https://site.example.com/p/1?id=1&ref=forum", // ref is meaningful
      "https://site.example.com/p/2?id=2",
      "https://site.example.com" // bare host survives unharmed
    ).toDF("url").select(Urls.canonicalize($"url").as("c"))
      .as[String].collect()
    assert(c(0) == "site.example.com/p/1?id=1&ref=forum")
    assert(c(1) == "site.example.com/p/2?id=2")
    assert(c(2) == "site.example.com")
  }

  test("tracking param in the middle of the query splices cleanly") {
    val c = Seq("https://h.com/x?a=1&utm_medium=mail&b=2")
      .toDF("url").select(Urls.canonicalize($"url").as("c"))
      .as[String].head()
    assert(c == "h.com/x?a=1&b=2")
  }

  test("dedupByUrl keeps the smallest id per canonical url") {
    val df = Seq(
      (10L, "https://www.a.com/x?utm_source=s"),
      (7L, "http://a.com/x"),
      (3L, "https://a.com/x/"),
      (5L, "https://b.com/y")
    ).toDF("doc_id", "url")
    val out = Urls.dedupByUrl(df, "url", "doc_id").collect()
      .map(r => r.getAs[String]("canonical_url") ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_variants"))).toMap
    assert(out("a.com/x") == ((3L, 3L)))
    assert(out("b.com/y") == ((5L, 1L)))
  }
}

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("score separates prose from punctuation soup, empty doc survives") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it is a fine day in the park " * 4),
      (2L, "@@@ ### !!! ??? %% && ** (( )) [[ ]] {{ }}"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextStats.qualityScore(df).select("doc_id", "quality_score", "keep")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out(1L)._2, s"prose should pass, score=${out(1L)._1}")
    assert(!out(2L)._2, s"punct soup should fail, score=${out(2L)._1}")
    assert(!out(3L)._1.isNaN && !out(3L)._2) // empty: defined score, dropped
  }

  test("score is a pure function of the text (stable across repartition)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextStats.qualityScore(docs)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = TextStats.qualityScore(docs.repartition(7))
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }
}

class HashEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("bucket counts sum to the token count; empty doc is the zero vector") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, ""),
      (3L, "  \t  ")
    ).toDF("doc_id", "text")
    val out = TextStats.hashEmbedding(df, dim = 16)
      .select(col("doc_id"), col("hash_vec"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L).sum == 5 && out(1L).length == 16)
    assert(out(2L).forall(_ == 0) && out(3L).forall(_ == 0))
  }

  test("embedding is a pure function of text; identical texts share vectors") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    val v = TextStats.hashEmbedding(df).select("doc_id", "hash_vec")
      .as[(Long, Seq[Int])].collect().toMap
    assert(v(1L) == v(2L))
    assert(v(1L) != v(3L))
  }

  test("cosineIntVectors: self-similarity 1.0, disjoint-bucket texts lower") {
    val df = Seq((1L, "aa bb cc dd ee ff gg hh"),
      (2L, "aa bb cc dd ee ff gg hh"),
      (3L, "zz yy xx ww vv uu tt ss")).toDF("doc_id", "text")
    val emb = TextStats.hashEmbedding(df).select(col("doc_id"), col("hash_vec"))
    val q = emb.filter(col("doc_id") === 1L)
      .select(col("hash_vec").as("q_vec"))
    val cos = emb.crossJoin(broadcast(q))
      .select(col("doc_id"),
        TextStats.cosineIntVectors(col("hash_vec"), col("q_vec")).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(cos(1L) == 1.0 && cos(2L) == 1.0)
    assert(cos(3L) < 0.9)
  }

  test("dim must be a power of two") {
    intercept[IllegalArgumentException] {
      graft.functions.TextExpressions.HashEmbed(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit("x")), 12)
    }
  }
}

class IndexRefreshSpec extends SparkSpec {
  import spark.implicits._

  test("CDF refresh equals from-scratch rebuild across insert/update/delete") {
    val v1docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark engines and scale are a different topic entirely"),
      (3L, "this document will be deleted in version two"),
      (4L, "this document will be updated in version two")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("idx_refresh_spec").toString
    val tab = graft.tables.ResourceTable(spark, s"$dir/d.parquet")
    tab.createIfNotExists(v1docs.schema)
    tab.upsert(v1docs, "doc_id")
    val v1 = tab.latestVersion.get
    tab.upsert(Seq(
      (4L, "now a completely rewritten fourth document body"),
      (5L, "a brand new fifth document arriving in version two")
    ).toDF("doc_id", "text"), "doc_id")
    tab.deleteMatching(Seq(3L).toDF("doc_id"), "doc_id")
    val v2 = tab.latestVersion.get

    val refreshed = graft.ops.Dedup.refreshBandedIndex(
      graft.ops.Dedup.bandedIndex(tab.readVersion(v1), "doc_id", "text"),
      tab.changes(v1, v2, "doc_id"), "doc_id", "text")
    val rebuilt = graft.ops.Dedup.bandedIndex(tab.read(), "doc_id", "text")
    assert(refreshed.exceptAll(rebuilt).count() == 0)
    assert(rebuilt.exceptAll(refreshed).count() == 0)
    // sanity: deleted doc gone, new doc present
    val docsInIdx = refreshed.select("doc").distinct()
      .as[Long].collect().toSet
    assert(docsInIdx == Set(1L, 2L, 4L, 5L))
  }

  test("a refreshed index answers near-dup probes like a rebuilt one") {
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("idx_refresh_probe").toString
    val tab = graft.tables.ResourceTable(spark, s"$dir/d.parquet")
    tab.createIfNotExists(base.schema)
    tab.upsert(base, "doc_id")
    val v1 = tab.latestVersion.get
    // an exact twin of doc 1: jaccard 1.0 co-buckets in EVERY band, so
    // the probe hit is deterministic (a 0.7-jaccard near-dup may
    // legitimately miss all 4 bands — that's LSH recall, not refresh)
    tab.upsert(Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text"), "doc_id")
    val idx = graft.ops.Dedup.refreshBandedIndex(
      graft.ops.Dedup.bandedIndex(tab.readVersion(v1), "doc_id", "text"),
      tab.changes(v1, tab.latestVersion.get, "doc_id"), "doc_id", "text")
    val probe = Seq((99L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val hits = graft.ops.Dedup.nearDupAgainstIndex(probe, idx,
        "doc_id", "text", minJaccard = 0.4)
      .select("corpus_doc").distinct().as[Long].collect().toSet
    assert(hits.contains(1L)) // exact twin, in the index since v1
    assert(hits.contains(3L)) // near-dup that arrived via the refresh
  }
}

class ShardAssignSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("every row gets a shard in range; assignment is deterministic") {
    val a = Sampling.shardAssign(docs, "doc_id", "s", 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(a.values.forall(s => s >= 0 && s < 8))
    val b = Sampling.shardAssign(docs.repartition(5), "doc_id", "s", 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("appends never move existing docs between shards") {
    val first = Sampling.shardAssign(docs.limit(40), "doc_id", "s", 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val full = Sampling.shardAssign(docs, "doc_id", "s", 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(first.forall { case (id, sh) => full(id) == sh })
  }

  test("shards are balanced to a few percent and the manifest sums up") {
    val m = Sampling.shardManifest(
        Sampling.shardAssign(docs, "doc_id", "s", 4), "doc_id", "n_chars")
      .collect()
    assert(m.length == 4)
    val counts = m.map(_.getAs[Long]("n_docs"))
    assert(counts.sum == docs.count())
    // 4 shards over a small fixture: crude balance only
    assert(counts.max < counts.min * 3, counts.mkString(","))
    val totalChars = m.map(_.getAs[Long]("total_size")).sum
    assert(totalChars ==
      docs.agg(sum("n_chars")).head().getLong(0))
  }

  test("nShards bounds enforced") {
    intercept[IllegalArgumentException] {
      Sampling.shardAssign(docs, "doc_id", "s", 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.shardAssign(docs, "doc_id", "s", 65537)
    }
  }
}

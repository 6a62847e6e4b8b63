package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Clustering.kmeansAssign]]: spherical Lloyd's on a fixture with
  * four planted directions must recover them; the update must be
  * partitioning-independent (the fixed-point determinism claim); the
  * cluster cap and leakage-safe split enforce their contracts.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // 4 planted unit-ish directions in 8d, 12 members each with small
  // deterministic perturbations — ids interleave the groups so the
  // init (4 smallest ids) starts with one seed per planted direction
  private lazy val vecs: Seq[(Long, Seq[Float])] = {
    val dirs = Seq(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f))
    (0 until 48).map { i =>
      val g = i % 4
      val base = dirs(g).clone()
      (0 until 8).foreach { d =>
        base(d) = base(d) + 0.05f * math.sin(i * 7 + d * 13).toFloat
      }
      (i.toLong, base.toSeq)
    }
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  test("kmeans recovers planted directions; iterations converge") {
    val out = Clustering.kmeansAssign(df, "vec_id", "embedding",
        k = 4, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.size == 48)
    // every member of a planted group lands with its seed (ids 0-3
    // are the seeds, one per group)
    (0 until 48).foreach { i =>
      assert(out(i.toLong) == out((i % 4).toLong),
        s"vec $i split from its planted direction")
    }
    assert(out.values.toSet.size == 4)
  }

  test("kmeans assignment is invariant to input partitioning") {
    val a = Clustering.kmeansAssign(df.repartition(13), "vec_id",
        "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Clustering.kmeansAssign(df.coalesce(1), "vec_id",
        "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "fixed-point update must make shards irrelevant")
  }

  test("clusterCapped keeps at most k per cluster, deterministically") {
    val assigned = Clustering.kmeansAssign(df, "vec_id", "embedding",
      k = 4, iters = 1)
    val capped = Clustering.clusterCapped(assigned, "vec_id", "s", 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(capped.groupBy(_._2).forall(_._2.length <= 5))
    val again = Clustering.clusterCapped(assigned, "vec_id", "s", 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(capped.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("leakageSafeSplit keeps every duplicate cluster in one split") {
    // near-dup pairs: chain 10-11-12 plus pair 20-21; everything else
    // is a singleton
    val labels = Seq((10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L),
      (21L, 20L)).toDF("doc_id", "canonical_id")
    val ids = (0L until 30L).toDF("vec_id")
    val split = Sampling.leakageSafeSplit(ids, "vec_id", labels,
        "doc_id", "canonical_id", "s1",
        Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(split.size == 30)
    // cluster members share the root's split
    assert(Seq(10L, 11L, 12L).map(split(_)).distinct.size == 1)
    assert(Seq(20L, 21L).map(split(_)).distinct.size == 1)
    // singletons root at themselves
    assert(split(5L)._1 == 5L && split(25L)._1 == 25L)
    // all three splits are populated on 30 ids (md5 spread)
    assert(split.values.map(_._2).toSet.size >= 2)
  }
}

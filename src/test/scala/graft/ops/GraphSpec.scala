package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank: results must equal a naive driver-side
  * replay of the SAME integer recurrence (the property that makes the
  * DuckDB oracle exact), and the classic structural facts must hold.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  /** Driver-side replay of pageRank's exact integer recurrence. */
  private def replay(edges: Seq[(Long, Long)], iters: Int,
                     scale: Long = 1000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(deg.contains).map(r).sum
      val share = dangling / n
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = nodes.map(nd => nd ->
        (15L * scale / 100L +
          85L * (contrib.getOrElse(nd, 0L) + share) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("pageRank equals the integer replay on a cyclic graph") {
    // 4-node graph with a cycle, a dangling node and a parallel edge
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (1, 3), (1, 3), (3, 4))
    assert(run(edges, 3) === replay(edges, 3))
  }

  test("pageRank equals the integer replay on a star (all-dangling sinks)") {
    val edges = Seq[(Long, Long)]((0, 1), (0, 2), (0, 3), (0, 4))
    val got = run(edges, 2)
    assert(got === replay(edges, 2))
    // sinks split the hub's mass equally; the hub only gets base+share
    assert(got(1) === got(2) && got(2) === got(3) && got(3) === got(4))
    assert(got(0) < got(1))
  }

  test("hub accumulates more rank than leaves") {
    // everyone links to node 9; 9 links back to 0
    val edges = (0L to 8L).map(i => (i, 9L)) :+ ((9L, 0L))
    val got = run(edges, 3)
    assert(got(9L) === got.values.max)
  }

  test("result is partitioning-independent (integer arithmetic commutes)") {
    val edges = (0L until 200L).map(i => (i, (i * 7) % 50))
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df13 = edges.toDF("src", "dst").repartition(13)
    val a = Graph.pageRank(df1, "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRank(df13, "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("degrees counts both directions with zero-fill") {
    val d = Graph.degrees(
      Seq[(Long, Long)]((1, 2), (1, 3), (2, 3)).toDF("src", "dst"),
      "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(d === Set((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
  }

  test("keepByHostRank scales per-host quotas by rank") {
    val docs = (0L until 40L).map(i => (i, i % 2)) // 20 docs per host
      .toDF("doc_id", "host")
    val ranks = Seq((0L, 1000000L), (1L, 250000L)).toDF("node", "rank")
    val kept = Graph.keepByHostRank(docs, "host", col("doc_id"),
      ranks, maxPerHost = 8)
    val byHost = kept.groupBy("host").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // host 0 at max rank keeps the full quota of 8;
    // host 1 at 1/4 rank keeps ceil(8/4) = 2 — its LOWEST doc_ids
    assert(byHost === Map(0L -> 8L, 1L -> 2L))
    val host1 = kept.filter(col("host") === 1)
      .select("doc_id").as[Long].collect().sorted
    assert(host1 === Array(1L, 3L))
  }
}

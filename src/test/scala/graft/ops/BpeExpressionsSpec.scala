package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property guards for the native BPE-path expressions (round 18):
  * [[graft.functions.TextExpressions.BpeMergeFold]] and
  * [[graft.functions.TextExpressions.Chars]] replaced interpreted
  * O(word²) HOF phrasings; the gates prove them end-to-end on the
  * corpus, these properties pin the per-row semantics directly —
  * including the edges the corpus may not exercise (runs of equal
  * symbols, multi-byte code points, empty arrays).
  */
class BpeExpressionsSpec extends SparkSpec {

  /** The Sennrich greedy non-overlapping merge, as the obvious
    * sequential reference implementation.
    */
  private def refMerge(syms: List[String], a: String,
                       b: String): List[String] = syms match {
    case x :: y :: rest if x == a && y == b => (a + b) :: refMerge(rest, a, b)
    case x :: rest => x :: refMerge(rest, a, b)
    case Nil => Nil
  }

  test("BpeMergeFold matches the sequential reference merge " +
      "(300 seeded cases, collision-rich alphabet)") {
    import spark.implicits._
    val r = new Random(181)
    val alpha = Vector("a", "b", "ab", "aa", "é", "好", "x")
    val cases = Seq.fill(300) {
      val syms = List.fill(r.nextInt(13))(alpha(r.nextInt(alpha.size)))
      (syms, alpha(r.nextInt(alpha.size)), alpha(r.nextInt(alpha.size)))
    }
    // one job for all cases: each row carries its own (syms, a, b)
    val got = cases.toDF("syms", "a", "b")
      .select(graft.functions.TextExpressions
        .bpe_merge(col("syms"), col("a"), col("b")).as("m"))
      .collect().map(_.getSeq[String](0).toList)
    cases.zip(got).foreach { case ((syms, a, b), m) =>
      assert(m == refMerge(syms, a, b),
        s"merge($syms, $a, $b): got $m, want ${refMerge(syms, a, b)}")
    }
  }

  test("BpeMergeFold: the canonical run-of-equal-symbols edge") {
    import spark.implicits._
    // (a,a) over "aaa" merges positions 1-2 and leaves the 3rd
    val got = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(graft.functions.TextExpressions
        .bpe_merge(col("syms"), lit("a"), lit("a")).as("m"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("aa", "a"))
  }

  test("BpeMergeFold preserves null elements in place and never " +
      "merges across them (public bpe_merge contract)") {
    import spark.implicits._
    // the replaced aggregate-fold silently DROPPED nulls; the native
    // expression's documented behavior is pass-through: a null is an
    // opaque non-symbol, so neither (a, null) nor (null, a) matches.
    // Unreachable via chars() (containsNull=false) but observable —
    // and now pinned — through the public Column API.
    val cases = Seq(
      (Seq[String]("a", null, "a"), Seq[String]("a", null, "a")),
      (Seq[String](null, "a", "a"), Seq[String](null, "aa")),
      (Seq[String]("a", "a", null), Seq[String]("aa", null)),
      (Seq[String](null, null), Seq[String](null, null)))
    val got = cases.map(_._1).toDF("syms")
      .select(graft.functions.TextExpressions
        .bpe_merge(col("syms"), lit("a"), lit("a")).as("m"))
      .collect().map(_.getSeq[String](0))
    cases.zip(got).foreach { case ((in, want), m) =>
      assert(m == want, s"merge($in, a, a): got $m, want $want")
    }
  }

  test("Chars/BpeMergeFold reject mistyped inputs at analysis time, " +
      "not execution time") {
    import spark.implicits._
    val df = Seq((1, Seq(2, 3))).toDF("n", "xs")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.TextExpressions.chars(col("n"))).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("type"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.TextExpressions
        .bpe_merge(col("xs"), lit("a"), lit("b"))).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("type"))
  }

  test("Chars matches transform(sequence(1, length), substring) " +
      "on non-empty words, including multi-byte code points") {
    import spark.implicits._
    val words = Seq("a", "hello", "héllo", "好的好", "a好b", "x" * 300)
    val df = words.toDF("word").select(
      graft.functions.TextExpressions.chars(col("word")).as("fast"),
      expr("transform(sequence(1, length(word)), i -> " +
        "substring(word, i, 1))").as("ref"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("Chars of the empty string is the empty array") {
    import spark.implicits._
    // (the transform phrasing DIVERGES here: sequence(1, 0) descends
    // to [1, 0] and yields two empty strings — tokens are never empty
    // in the pipeline, but the native expression does the right thing)
    val got = Seq("").toDF("word")
      .select(graft.functions.TextExpressions.chars(col("word")).as("c"))
      .collect()(0).getSeq[String](0)
    assert(got.isEmpty)
  }
}

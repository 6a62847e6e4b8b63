package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential fuzzing of OUTER-JOIN semantics vs DuckDB.
  *
  * QueryFuzzSpec draws inner + left equi-joins with pre-filtered
  * build sides; the corners where optimizers classically get outer
  * joins WRONG are predicate-placement ones, and none of the sibling
  * fuzzers generates them:
  *
  *  - residual (non-equi) predicates in the ON clause of LEFT /
  *    RIGHT / FULL joins — on the null-producing side they restrict
  *    MATCHING (more null-extended rows), on the preserved side they
  *    null-extend instead of filtering; both differ from WHERE
  *  - the same predicate moved to WHERE (Catalyst's EliminateOuterJoin
  *    may legally convert outer→inner ONLY when the predicate is
  *    null-intolerant — a wrong conversion changes results)
  *  - IS [NOT] NULL probes on the null-extended side (anti-join
  *    rewrites; NULL-key rows must stay distinguishable from
  *    no-match rows, hence a sentinel COALESCE)
  *  - NULLIF'd join keys: NULL keys match NOTHING on either engine,
  *    and in FULL joins both unmatched slices null-extend
  *  - FULL OUTER with COALESCE'd key output and WHERE on one side
  *  - mixed chains (inner⋈left, left⋈left) with mid-chain residuals
  *  - LEFT JOIN onto a grouped subquery — count(col) vs count(*)
  *    over null-extended groups (the classic 0-vs-NULL confusion)
  *
  * One shared ANSI text per seed (same contract as the sibling
  * fuzzers): integer outputs lifted to BIGINT, qualified column
  * references everywhere, no doubles, no tie-sensitive ordering.
  *
  * CI runs SPARK_GRAFT_JOINFUZZ_N seeds (default 60); recorded
  * campaigns (400 seeds at sf0.01 AND sf0.1) live in BASELINE.md.
  */
class JoinFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_FUZZ_SF", "/root/testdata/sf0.01")
  private val nPlans =
    sys.env.get("SPARK_GRAFT_JOINFUZZ_N").map(_.toInt).getOrElse(60)

  private final case class T(name: String, ints: Seq[String],
                             strs: Seq[String])

  private val lineitem = T("lineitem",
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity"), Seq("l_returnflag", "l_linestatus"))
  private val orders = T("orders", Seq("o_orderkey", "o_custkey"),
    Seq("o_orderstatus", "o_orderpriority"))
  private val customer = T("customer", Seq("c_custkey", "c_nationkey"),
    Seq("c_name", "c_mktsegment"))
  private val nation = T("nation", Seq("n_nationkey", "n_regionkey"),
    Seq("n_name"))
  private val supplier = T("supplier", Seq("s_suppkey", "s_nationkey"),
    Seq("s_name"))
  private val part = T("part", Seq("p_partkey", "p_size"),
    Seq("p_name", "p_brand", "p_type"))

  private val allTables =
    Seq(lineitem, orders, customer, nation, supplier, part)

  /** FK edges (left = probe/preserved side candidate, right = dim).
    * Both directions get drawn — orders LEFT JOIN lineitem fans out,
    * lineitem LEFT JOIN orders is N:1.
    */
  private val edges = Seq(
    (orders, lineitem, "o_orderkey", "l_orderkey"),
    (lineitem, orders, "l_orderkey", "o_orderkey"),
    (customer, orders, "c_custkey", "o_custkey"),
    (orders, customer, "o_custkey", "c_custkey"),
    (nation, customer, "n_nationkey", "c_nationkey"),
    (customer, nation, "c_nationkey", "n_nationkey"),
    (nation, supplier, "n_nationkey", "s_nationkey"),
    (part, lineitem, "p_partkey", "l_partkey"),
    (lineitem, part, "l_partkey", "p_partkey"))

  /** Two-hop chains for the mixed-join shape. */
  private val chains = Seq(
    (lineitem, orders, customer,
      "l_orderkey", "o_orderkey", "o_custkey", "c_custkey"),
    (orders, customer, nation,
      "o_custkey", "c_custkey", "c_nationkey", "n_nationkey"),
    (customer, nation, supplier,
      "c_nationkey", "n_nationkey", "n_nationkey", "s_nationkey"))

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  /** A simple qualified predicate over `t` (alias-qualified). Kept
    * null-INTOLERANT by construction (mod/compare/IN over non-null
    * base columns) so WHERE-side placement legally permits the
    * outer→inner conversion — the point is that both engines must
    * agree on WHEN it applies.
    */
  private def pred(r: Random, t: T, q: String): String = {
    // every alternative keeps a ≥ ~10% hit-rate on ANY int column —
    // including the 0..24-valued nation/region keys (the first cut
    // drew `% 997 BETWEEN 301 ..`, `(c % k) < 0`, and `% 50 IN (47)`
    // and 17/60 boards came back empty); shapes conjoin up to three
    // of these, so per-predicate selectivity is the empties budget
    def intP = {
      val c = q + pick(r, t.ints)
      r.nextInt(3) match {
        case 0 =>
          val k = 2 + r.nextInt(8)
          val m = 1 + r.nextInt(k - 1)
          s"($c % $k) ${pick(r, Seq("=", "<>", "<", ">="))} $m"
        case 1 =>
          val k = 7 + r.nextInt(5)
          val vs = r.shuffle((0 until k).toList).take(3)
          s"($c % $k) IN (${vs.mkString(", ")})"
        case _ =>
          val lo = r.nextInt(4); val hi = lo + 2 + r.nextInt(5)
          s"($c % 10) BETWEEN $lo AND $hi"
      }
    }
    def strP = {
      val c = q + pick(r, t.strs)
      // thresholds capped at 'N': the synthetic flag columns draw
      // from tiny uppercase alphabets and `>= 'Z'` empties them
      if (r.nextBoolean()) s"$c >= '${('A' + r.nextInt(14)).toChar}'"
      else s"length($c) % 2 = 0"
    }
    if (t.strs.nonEmpty && r.nextInt(3) == 0) strP else intP
  }

  /** Null-extended-side output: COALESCE'd to a sentinel so no-match
    * rows are visible in the hash, plus a match flag.
    */
  private def rightOut(r: Random, t: T, q: String): String = {
    val c = q + pick(r, t.ints)
    s"CAST(COALESCE($c, -999999) AS BIGINT) AS rv, " +
      s"CAST(CASE WHEN $c IS NULL THEN 0 ELSE 1 END AS BIGINT) AS m"
  }

  // ------------------------------------------------- plan shapes

  private[graft] def genSql(seed: Int): String = {
    val r = new Random(seed)
    r.nextInt(7000) % 7 match {

      case 0 => // LEFT/RIGHT join, residual predicate in the ON clause
        // on the NULL-PRODUCING side (restricts matching, never rows)
        val (l, rt, lk, rk) = pick(r, edges)
        val right = if (r.nextBoolean()) "LEFT" else "RIGHT"
        // for RIGHT joins the null-producing side is the LEFT input;
        // normalize by always writing l LEFT JOIN rt and emitting the
        // RIGHT variant as rt RIGHT JOIN l — same semantics, both
        // parser paths exercised
        val onRes = s" AND ${pred(r, rt, "b.")}"
        val sel = s"SELECT CAST(a.$lk AS BIGINT) AS k, " +
          s"${rightOut(r, rt, "b.")}"
        if (right == "LEFT")
          s"$sel FROM ${l.name} a LEFT JOIN ${rt.name} b " +
            s"ON a.$lk = b.$rk$onRes WHERE ${pred(r, l, "a.")}"
        else
          s"$sel FROM ${rt.name} b RIGHT JOIN ${l.name} a " +
            s"ON a.$lk = b.$rk$onRes WHERE ${pred(r, l, "a.")}"

      case 1 => // residual ON-predicate on the PRESERVED side of a
        // LEFT join: does NOT filter preserved rows, only null-extends
        // them — the exact opposite of the same predicate in WHERE
        val (l, rt, lk, rk) = pick(r, edges)
        val p = pred(r, l, "a.")
        s"SELECT CAST(a.$lk AS BIGINT) AS k, ${rightOut(r, rt, "b.")} " +
          s"FROM ${l.name} a LEFT JOIN ${rt.name} b " +
          s"ON a.$lk = b.$rk AND $p"

      case 2 => // null-extended-side predicate in WHERE: IS NULL
        // (anti-join form), IS NOT NULL, or a null-intolerant value
        // predicate (the legal outer→inner conversion). The right
        // side is a FILTERED subquery — the FK edges are total in the
        // synthetic data, so an unfiltered build side never
        // null-extends and the IS NULL branch would be vacuous
        val (l, rt, lk, rk) = pick(r, edges)
        val w = r.nextInt(3) match {
          case 0 => s"b.$rk IS NULL"
          case 1 => s"b.$rk IS NOT NULL AND ${pred(r, rt, "b.")}"
          case _ => pred(r, rt, "b.")
        }
        s"SELECT CAST(a.$lk AS BIGINT) AS k, ${rightOut(r, rt, "b.")} " +
          s"FROM ${l.name} a LEFT JOIN (SELECT * FROM ${rt.name} " +
          s"WHERE ${pred(r, rt, "")}) b ON a.$lk = b.$rk " +
          s"WHERE $w AND ${pred(r, l, "a.")}"

      case 3 => // FULL OUTER: COALESCE'd key, residual ON sometimes,
        // optional single-side WHERE (filters that side's preserved
        // AND null-extended rows — both engines must agree which)
        val (l, rt, lk, rk) = pick(r, edges)
        val onRes = if (r.nextBoolean()) s" AND ${pred(r, rt, "b.")}"
          else ""
        val w = r.nextInt(3) match {
          case 0 => ""
          case 1 => s" WHERE a.$lk IS NULL OR ${pred(r, l, "a.")}"
          case _ => s" WHERE b.$rk IS NULL OR ${pred(r, rt, "b.")}"
        }
        s"SELECT CAST(COALESCE(a.$lk, b.$rk, -1) AS BIGINT) AS k, " +
          s"CAST(CASE WHEN a.$lk IS NULL THEN 0 ELSE 1 END AS BIGINT) " +
          s"AS ml, " +
          s"CAST(CASE WHEN b.$rk IS NULL THEN 0 ELSE 1 END AS BIGINT) " +
          s"AS mr, count(*) AS cnt " +
          s"FROM ${l.name} a FULL JOIN ${rt.name} b " +
          s"ON a.$lk = b.$rk$onRes$w GROUP BY 1, 2, 3"

      case 4 => // NULLIF'd join keys: NULL keys match NOTHING — the
        // slice with NULL'd keys must null-extend (LEFT) or appear
        // unmatched from both sides (FULL)
        val (l, rt, lk, rk) = pick(r, edges)
        val (k1, m1) = (2 + r.nextInt(5), r.nextInt(2))
        val lkey = s"NULLIF(a.$lk % $k1, $m1) + (a.$lk - a.$lk % $k1)"
        val jt = if (r.nextBoolean()) "LEFT" else "FULL"
        if (jt == "LEFT")
          s"SELECT CAST(a.$lk AS BIGINT) AS k, " +
            s"${rightOut(r, rt, "b.")} " +
            s"FROM ${l.name} a LEFT JOIN ${rt.name} b " +
            s"ON $lkey = b.$rk WHERE ${pred(r, l, "a.")}"
        else
          s"SELECT CAST(CASE WHEN a.$lk IS NULL THEN 0 ELSE 1 END " +
            s"AS BIGINT) AS ml, " +
            s"CAST(CASE WHEN b.$rk IS NULL THEN 0 ELSE 1 END AS BIGINT) " +
            s"AS mr, count(*) AS cnt " +
            s"FROM ${l.name} a FULL JOIN ${rt.name} b ON $lkey = b.$rk " +
            s"GROUP BY 1, 2"

      case 5 => // mixed two-hop chain: inner⋈left or left⋈left, with
        // a mid-chain residual — null-extension must propagate down
        // the chain (a NULL mid side null-extends the tail too)
        val (l, m, rt, lk, mk1, mk2, rk) = pick(r, chains)
        val j1 = if (r.nextBoolean()) "JOIN" else "LEFT JOIN"
        val midRes = if (j1 == "LEFT JOIN" && r.nextBoolean())
          s" AND ${pred(r, m, "b.")}" else ""
        s"SELECT CAST(a.$lk AS BIGINT) AS k, " +
          s"CAST(CASE WHEN b.$mk1 IS NULL THEN 0 ELSE 1 END AS BIGINT) " +
          s"AS m1, ${rightOut(r, rt, "c.")} " +
          s"FROM ${l.name} a $j1 ${m.name} b ON a.$lk = b.$mk1$midRes " +
          s"LEFT JOIN ${rt.name} c ON b.$mk2 = c.$rk " +
          s"WHERE ${pred(r, l, "a.")}"

      case _ => // LEFT JOIN onto a GROUPED subquery: count(col) vs
        // count(*) over null-extended groups — no-match parents must
        // read NULL (surfaced via a -1 sentinel), never 0-rows-joined
        val (l, rt, lk, rk) = pick(r, edges)
        val v = pick(r, rt.ints)
        s"SELECT CAST(a.$lk AS BIGINT) AS k, " +
          s"CAST(COALESCE(g.cnt, -1) AS BIGINT) AS cnt, " +
          s"CAST(COALESCE(g.sm, -1) AS BIGINT) AS sm " +
          s"FROM ${l.name} a LEFT JOIN (" +
          s"SELECT $rk AS gk, count(*) AS cnt, " +
          s"CAST(sum($v) AS BIGINT) AS sm FROM ${rt.name} " +
          s"WHERE ${pred(r, rt, "")} GROUP BY $rk) g ON a.$lk = g.gk " +
          s"WHERE ${pred(r, l, "a.")}"
    }
  }

  private def duckdbAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb")
      .start().waitFor() == 0
    catch { case _: Exception => false }

  test(s"$nPlans seeded outer-join plans hash-match DuckDB") {
    assume(duckdbAvailable, "python3+duckdb not available")
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    allTables.foreach(t => spark.read.parquet(s"$sfDir/${t.name}.parquet")
      .createOrReplaceTempView(t.name))
    val out = java.nio.file.Files
      .createTempDirectory("graft_joinfuzz").toString
    val oracle = new scala.collection.mutable.LinkedHashMap[String, String]
    var emptyCount = 0
    (1 to nPlans).foreach { seed =>
      val name = f"q_joinfuzz_$seed%03d"
      val sql = genSql(seed)
      val df = spark.sql(sql)
      df.write.mode("overwrite").parquet(s"$out/$name")
      if (spark.read.parquet(s"$out/$name").isEmpty) {
        emptyCount += 1
        info(s"EMPTY $name: $sql")
      }
      oracle(name) = sql
    }
    // IS NULL probes and double-filtered boards can legitimately be
    // empty, but a mostly-empty board proves nothing
    assert(emptyCount <= nPlans / 4,
      s"$emptyCount of $nPlans plans returned zero rows — " +
        "generator drifted toward vacuous predicates")
    val om = new java.io.PrintWriter(s"$out/oracle_sql.json")
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.createObjectNode()
      oracle.foreach { case (k, v) => node.put(k, v) }
      om.write(mapper.writeValueAsString(node))
    } finally om.close()
    val pb = new ProcessBuilder(
      "python3", "tools/check_oracle.py", sfDir, out)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val outText = new String(proc.getInputStream.readAllBytes())
    val code = proc.waitFor()
    val tail = outText.linesIterator.toSeq.takeRight(25).mkString("\n")
    assert(code == 0 && outText.contains(" 0 fail"),
      s"differential outer-join fuzz divergence:\n$tail")
  }
}

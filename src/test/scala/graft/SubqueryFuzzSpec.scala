package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential fuzzing of the SUBQUERY + set-op surface vs DuckDB
  * (round-17 verdict item 3): QueryFuzzSpec covers the DataFrame-API
  * grammar (project/filter/join/agg/window/ROLLUP/CUBE); the corners
  * where engines classically diverge on three-valued logic —
  * correlated EXISTS / NOT EXISTS (including NESTED, two FK hops
  * deep), (NOT) IN with null-producing subqueries (standalone and
  * nested inside an EXISTS body), correlated scalar subqueries,
  * LATERAL, aggregate HAVING, and cross-table set ops over null-rich
  * branches — are not expressible through the public Column API, so
  * this generator emits
  * ONE dual-dialect ANSI SQL text per seed and runs it through BOTH
  * `spark.sql` (over temp views of the sf parquet — Catalyst's
  * RewritePredicateSubquery / scalar-subquery decorrelation paths)
  * and DuckDB (via tools/check_oracle.py, same canonicalization as
  * the t2 gate).
  *
  * Dialect rules baked into the generator (same contract as
  * QueryFuzzSpec): integer outputs lifted to BIGINT on both sides,
  * no doubles, no raw timestamps (years only), no tie-sensitive
  * ordering. NOT IN deliberately draws from NULLIF'd subqueries —
  * the UNKNOWN-propagation case (one NULL in the IN-list annihilates
  * every non-matching row) is exactly where engines drift.
  *
  * CI runs SPARK_GRAFT_SUBFUZZ_N seeds (default 80); the recorded
  * campaigns (400 seeds at sf0.01 AND sf0.1) live in BASELINE.md.
  */
class SubqueryFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_FUZZ_SF", "/root/testdata/sf0.01")
  private val nPlans =
    sys.env.get("SPARK_GRAFT_SUBFUZZ_N").map(_.toInt).getOrElse(80)

  // ------------------------------------------------------- schema

  /** (table, int cols, str cols, year-extractable ts cols). */
  private final case class T(name: String, ints: Seq[String],
                             strs: Seq[String], tss: Seq[String])

  private val lineitem = T("lineitem",
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity"),
    Seq("l_returnflag", "l_linestatus"), Seq("l_shipdate"))
  private val orders = T("orders", Seq("o_orderkey", "o_custkey"),
    Seq("o_orderstatus", "o_orderpriority"), Seq("o_orderdate"))
  private val customer = T("customer", Seq("c_custkey", "c_nationkey"),
    Seq("c_name", "c_mktsegment"), Seq.empty)
  private val nation = T("nation", Seq("n_nationkey", "n_regionkey"),
    Seq("n_name"), Seq.empty)
  private val supplier = T("supplier", Seq("s_suppkey", "s_nationkey"),
    Seq("s_name"), Seq.empty)
  private val part = T("part", Seq("p_partkey", "p_size"),
    Seq("p_name", "p_brand", "p_type"), Seq.empty)
  private val region = T("region", Seq("r_regionkey"), Seq("r_name"),
    Seq.empty)

  private val allTables = Seq(lineitem, orders, customer, nation,
    supplier, part, region)

  /** Correlation edges: (outer parent, inner child, outerKey, innerKey).
    * The INNER side is the many-rows side, so EXISTS/IN subqueries do
    * real semi-join work.
    */
  private val edges = Seq(
    (orders, lineitem, "o_orderkey", "l_orderkey"),
    (customer, orders, "c_custkey", "o_custkey"),
    (nation, customer, "n_nationkey", "c_nationkey"),
    (nation, supplier, "n_nationkey", "s_nationkey"),
    (region, nation, "r_regionkey", "n_regionkey"),
    (part, lineitem, "p_partkey", "l_partkey"))

  /** Two-hop FK chains (outer, mid, inner, outerKey, midFk, midKey,
    * innerFk) for NESTED subqueries. Each level correlates only one
    * hop up (Spark does not decorrelate two-levels-up references; one
    * hop each is the supported — and common — shape).
    */
  /** Edge pool for the DISJUNCTIVE-correlation shapes (10–12): the
    * ORACLE is the scale bottleneck there, not Spark — DuckDB plans
    * disjunctive correlation as a dependent (per-outer-row) join,
    * O(outer×inner): measured at sf0.1, 13/400 seeds each ran >5 s
    * and the orders×lineitem draws sat at 100% CPU for 30+ minutes
    * (triage, BASELINE.md round 19) while Spark — THROUGH the
    * DisjunctiveCorrelationRewrite split — answered the same queries
    * in sub-second hash semi-joins. Tiny-outer edges keep the
    * differential tractable at every SF; the rewrite's own code path
    * is size-independent, and the big-edge case is exact-oracled by
    * the q_disjunctive_* gates.
    */
  private val smallEdges = Seq(
    (nation, customer, "n_nationkey", "c_nationkey"),
    (nation, supplier, "n_nationkey", "s_nationkey"),
    (region, nation, "r_regionkey", "n_regionkey"))

  private val chains = Seq(
    (customer, orders, lineitem,
      "c_custkey", "o_custkey", "o_orderkey", "l_orderkey"),
    (nation, customer, orders,
      "n_nationkey", "c_nationkey", "c_custkey", "o_custkey"),
    (region, nation, customer,
      "r_regionkey", "n_regionkey", "n_nationkey", "c_nationkey"),
    (region, nation, supplier,
      "r_regionkey", "n_regionkey", "n_nationkey", "s_nationkey"))

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  // --------------------------------------------- SQL-text builders

  /** A boolean predicate over `t`'s columns, dual-dialect. */
  private def pred(r: Random, t: T): String = {
    // every alternative floors a ≥ ~10% hit-rate on ANY int column —
    // including 0–24-valued nation/region keys (JoinFuzzSpec learned
    // this the hard way: absolute BETWEEN ranges, `% 50 IN (47)` over
    // small keys, `(c % k) < 0`, and `>= 'Z'` over tiny flag
    // alphabets emptied a quarter of its first board; the round-18
    // pool here had the same flaws, tolerated by a looser bound,
    // and the 18-shape remap pushed empties past it)
    def intP = {
      val c = pick(r, t.ints)
      r.nextInt(4) match {
        case 0 =>
          val k = 2 + r.nextInt(8)
          val m = 1 + r.nextInt(k - 1)
          s"($c % $k) ${pick(r, Seq("=", "<>", "<", ">="))} $m"
        case 1 =>
          // modulo-IN, not raw-literal IN: literals against sparse
          // 6-digit keys select ~nothing; modulus ≤ 11 keeps every
          // drawn value reachable even on 0–24-valued keys
          val k = 7 + r.nextInt(5)
          val vs = r.shuffle((0 until k).toList).take(3)
          s"($c % $k) IN (${vs.mkString(", ")})"
        case 2 =>
          val lo = r.nextInt(4); val hi = lo + 2 + r.nextInt(5)
          s"($c % 10) BETWEEN $lo AND $hi"
        case _ =>
          val (k, m) = (2 + r.nextInt(5), r.nextInt(2))
          s"NULLIF($c % $k, $m) IS ${if (r.nextBoolean()) "" else "NOT "}NULL"
      }
    }
    def strP = {
      val c = pick(r, t.strs)
      r.nextInt(3) match {
        case 0 => s"$c >= '${('A' + r.nextInt(14)).toChar}'"
        case 1 => s"length($c) % 2 = 0"
        case _ => s"$c < '${('a' + r.nextInt(26)).toChar}'"
      }
    }
    def tsP = {
      val c = pick(r, t.tss)
      s"CAST(extract(year FROM $c) AS BIGINT) % ${2 + r.nextInt(3)} = 0"
    }
    val pool = Seq(() => intP) ++
      (if (t.strs.nonEmpty) Seq(() => strP) else Nil) ++
      (if (t.tss.nonEmpty) Seq(() => tsP) else Nil)
    val p1 = pick(r, pool)()
    // composite predicates are FULLY parenthesized: call sites splice
    // them as `<correlation> AND $pred`, and an unparenthesized
    // `(a) OR (b)` would rebind to `(corr AND a) OR b` — a DISJUNCTIVE
    // correlation. That precedence slip in the first 10-shape run was
    // itself a find: the accidental disjunctive-correlation queries
    // are legal SQL that DuckDB executes but Spark 4.1.2's
    // decorrelation CRASHES on (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    // binding a BNLJ existence join for nested EXISTS; None.get for
    // the single-level form) — seeds 93/248/397, triaged in
    // BASELINE.md round 18.
    if (r.nextInt(3) == 0)
      s"(($p1) ${if (r.nextBoolean()) "AND" else "OR"} (${pick(r, pool)()}))"
    else p1
  }

  /** BIGINT-valued output projection over `t` (alias `a` optional). */
  private def intOut(r: Random, t: T, q: String = ""): String = {
    val c = q + pick(r, t.ints)
    r.nextInt(3) match {
      case 0 => s"CAST($c AS BIGINT)"
      case 1 => s"CAST($c % ${2 + r.nextInt(9)} AS BIGINT)"
      case _ => s"CAST(COALESCE(NULLIF($c % ${2 + r.nextInt(5)}, " +
        s"${r.nextInt(2)}), -1) AS BIGINT)"
    }
  }

  // ------------------------------------------------- plan shapes

  /** One seeded dual-dialect SQL text.
    *
    * Shapes 0–9: the round-18 grammar (EXISTS/IN/scalar/LATERAL/
    * HAVING/set-ops, nested two FK hops). Shapes 10–12 (round 19)
    * RE-ENABLE disjunctive correlation — the exact class the round-18
    * generator had to parenthesize around because stock Spark 4.1.2's
    * decorrelation crashes on it — now that
    * [[graft.plans.DisjunctiveCorrelationRewrite]] splits such
    * predicates into OR-of-conjunctive-branches at analysis time;
    * every such seed differentially validates the rewrite against
    * DuckDB's native execution of the unrewritten form. Shapes 13–15
    * are the round-19 corner set: bare (NULL-surfacing) correlated
    * scalar aggregates in SELECT position, subqueries inside
    * CASE/COALESCE arms, and correlated NOT IN with a null-producing
    * projection (three-valued-logic killer under correlation).
    * Shapes 16–17 put disjunctive correlation where the graft rewrite
    * deliberately does NOT apply — scalar aggregates and LATERAL —
    * because Spark's DecorrelateInnerQuery plans those via domain
    * joins (no crash, probe-verified by ScalarDisjRepro); these seeds
    * check that the domain-join results are also CORRECT.
    */
  private[graft] def genSql(seed: Int): String = {
    val r = new Random(seed)
    // NOT nextInt(18): power-of-two-ish bounds take the HIGH bits of
    // the first java.util.Random draw, which are nearly constant
    // across small sequential seeds — 200/200 seeds landed on one
    // shape. nextInt(18000) goes through the modulo (low-bit) path
    // and 18000 is divisible by 18, so the draw stays uniform AND
    // varied.
    r.nextInt(18000) % 18 match {

      case 0 => // correlated EXISTS / NOT EXISTS (semi/anti semantics)
        val (o, i, ok, ik) = pick(r, edges)
        val neg = if (r.nextBoolean()) "NOT " else ""
        val outCols = (Seq(s"CAST($ok AS BIGINT) AS k") ++
          (if (o.strs.nonEmpty) Seq(s"${pick(r, o.strs)} AS s") else Nil))
          .mkString(", ")
        s"SELECT $outCols FROM ${o.name} WHERE ${neg}EXISTS " +
          s"(SELECT 1 FROM ${i.name} WHERE $ik = ${o.name}.$ok " +
          s"AND ${pred(r, i)}) AND ${pred(r, o)}"

      case 1 => // (NOT) IN subquery — NOT IN over a NULLIF'd column is
        // the UNKNOWN-propagation trap: one NULL in the list makes
        // NOT IN never-true, so both engines must return ZERO rows
        // for the null-producing variant
        val (o, i, ok, ik) = pick(r, edges)
        val nullable = r.nextBoolean()
        // NOT IN over a null-producing list is ALWAYS empty (one NULL
        // makes NOT IN never-true) — the semantics is worth asserting
        // but every such seed is a zero-row board entry, so draw the
        // combination sparingly to keep the campaign non-vacuous
        val neg = r.nextBoolean() && (!nullable || r.nextInt(4) == 0)
        val innerExpr = if (nullable) {
          // NULLIF on the modulus + remainder reconstruction: rows with
          // ik % k == m contribute NULL, every other row contributes
          // the REAL key — so the positive IN case still matches rows
          // while a NULL slice exists in the list
          val (k, m) = (2 + r.nextInt(5), r.nextInt(2))
          s"NULLIF($ik % $k, $m) + ($ik - $ik % $k)"
        } else ik
        s"SELECT CAST($ok AS BIGINT) AS k FROM ${o.name} " +
          s"WHERE $ok ${if (neg) "NOT " else ""}IN " +
          s"(SELECT $innerExpr FROM ${i.name} WHERE ${pred(r, i)}) " +
          s"AND ${pred(r, o)}"

      case 2 => // correlated scalar subquery in SELECT (agg over child),
        // COALESCE'd: no-match groups must surface as -1 identically
        val (o, i, ok, ik) = pick(r, edges)
        val agg = pick(r, Seq("count(*)", s"count(${pick(r, i.ints)})",
          s"sum(${pick(r, i.ints)})", s"min(${pick(r, i.ints)})"))
        s"SELECT CAST($ok AS BIGINT) AS k, " +
          s"CAST(COALESCE((SELECT $agg FROM ${i.name} " +
          s"WHERE $ik = ${o.name}.$ok AND ${pred(r, i)}), -1) AS BIGINT) AS v " +
          s"FROM ${o.name} WHERE ${pred(r, o)}"

      case 3 => // uncorrelated scalar subquery in WHERE
        val t = pick(r, allTables)
        val t2 = pick(r, allTables.filterNot(_ == t))
        val c = pick(r, t.ints)
        val aggC = pick(r, t2.ints)
        val agg = pick(r, Seq(s"min($aggC) + ${r.nextInt(100)}",
          s"max($aggC) / ${2 + r.nextInt(5)}",
          s"count(DISTINCT $aggC)"))
        s"SELECT CAST($c AS BIGINT) AS k, count(*) AS cnt FROM ${t.name} " +
          s"WHERE $c > (SELECT $agg FROM ${t2.name} WHERE ${pred(r, t2)}) " +
          s"GROUP BY $c"

      case 4 => // LATERAL correlated aggregate (the decorrelation path)
        val (o, i, ok, ik) = pick(r, edges)
        s"SELECT CAST($ok AS BIGINT) AS k, t.cnt, t.sm " +
          s"FROM ${o.name}, LATERAL (" +
          s"SELECT count(*) AS cnt, " +
          s"CAST(COALESCE(sum(${pick(r, i.ints)}), 0) AS BIGINT) AS sm " +
          s"FROM ${i.name} WHERE $ik = ${o.name}.$ok AND ${pred(r, i)}) t " +
          s"WHERE ${pred(r, o)}"

      case 5 => // aggregate HAVING over real aggregate expressions
        val t = pick(r, Seq(lineitem, orders, customer, part))
        val key = pick(r, t.strs)
        val v1 = pick(r, t.ints); val v2 = pick(r, t.ints)
        val hav = r.nextInt(3) match {
          case 0 => s"CAST(sum($v1) AS BIGINT) > ${100 + r.nextInt(5000)}"
          case 1 => s"count(DISTINCT $v2) >= ${1 + r.nextInt(4)}"
          case _ => s"min($v1) < max($v2) - ${r.nextInt(50)}"
        }
        s"SELECT $key AS k, count(*) AS cnt, " +
          s"CAST(sum($v1) AS BIGINT) AS sm " +
          s"FROM ${t.name} WHERE ${pred(r, t)} GROUP BY $key HAVING $hav"

      case 6 => // cross-table set op over null-rich branches: set-op
        // NULL handling (NULL equals NULL for set-op purposes, rows
        // deduplicated) differs from join/IN null handling by design
        val a = pick(r, allTables)
        val b = pick(r, allTables) // same table allowed — self set-op
        val ea = intOut(r, a); val eb = intOut(r, b)
        val sa = s"SELECT $ea AS v FROM ${a.name} WHERE ${pred(r, a)}"
        val sb = s"SELECT $eb AS v FROM ${b.name} WHERE ${pred(r, b)}"
        val op = pick(r, Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT"))
        if (op == "UNION ALL")
          // ALL preserves duplicates — aggregate afterwards so the
          // hash compare is order-free but multiplicity-sensitive
          s"SELECT v, count(*) AS cnt FROM ($sa UNION ALL $sb) u GROUP BY v"
        else s"$sa $op $sb"

      case 7 => // EXISTS + scalar + HAVING composed (the deep corner)
        val (o, i, ok, ik) = pick(r, edges)
        val g = if (o.strs.nonEmpty) pick(r, o.strs) else ok
        s"SELECT $g AS k, count(*) AS cnt FROM ${o.name} " +
          s"WHERE EXISTS (SELECT 1 FROM ${i.name} " +
          s"WHERE $ik = ${o.name}.$ok AND ${pred(r, i)}) " +
          s"GROUP BY $g HAVING count(*) > ${r.nextInt(3)}"

      case 8 => // NESTED (NOT) EXISTS: two correlation hops down the FK
        // chain, each level referencing only one level up
        val (o, m, i, ok, mfk, mk, ifk) = pick(r, chains)
        // double negation empties small parents fast — bias toward
        // positive outer so nested coverage stays row-bearing
        val negO = if (r.nextInt(3) == 0) "NOT " else ""
        val negI = if (r.nextBoolean()) "NOT " else ""
        s"SELECT CAST($ok AS BIGINT) AS k FROM ${o.name} " +
          s"WHERE ${negO}EXISTS (SELECT 1 FROM ${m.name} " +
          s"WHERE $mfk = ${o.name}.$ok AND ${negI}EXISTS " +
          s"(SELECT 1 FROM ${i.name} WHERE $ifk = ${m.name}.$mk " +
          s"AND ${pred(r, i)}) AND ${pred(r, m)}) AND ${pred(r, o)}"

      case 9 => // (NOT) IN nested INSIDE a correlated EXISTS body —
        // quantified-subquery null semantics evaluated under an
        // outer correlation
        val (o, m, i, ok, mfk, mk, ifk) = pick(r, chains)
        val nullable = r.nextBoolean()
        val neg = r.nextBoolean() && (!nullable || r.nextInt(4) == 0)
        val innerExpr = if (nullable) {
          val (k2, m2) = (2 + r.nextInt(5), r.nextInt(2))
          s"NULLIF($ifk % $k2, $m2) + ($ifk - $ifk % $k2)"
        } else ifk
        s"SELECT CAST($ok AS BIGINT) AS k FROM ${o.name} " +
          s"WHERE EXISTS (SELECT 1 FROM ${m.name} " +
          s"WHERE $mfk = ${o.name}.$ok AND $mk " +
          s"${if (neg) "NOT " else ""}IN (SELECT $innerExpr " +
          s"FROM ${i.name} WHERE ${pred(r, i)})) AND ${pred(r, o)}"

      case 10 => // DISJUNCTIVE-correlation (NOT) EXISTS — two
        // correlated arms with distinct residual predicates,
        // sometimes a third uncorrelated arm; validated against
        // DuckDB's native disjunctive decorrelation
        val (o, i, ok, ik) = pick(r, smallEdges)
        // NOT EXISTS with a row-bearing uncorrelated arm is vacuously
        // empty (the arm makes EXISTS true for every outer row), so
        // negation is drawn sparingly and never with the third arm
        val isNeg = r.nextInt(4) == 0
        val neg = if (isNeg) "NOT " else ""
        val corr = s"$ik = ${o.name}.$ok"
        val arms = Seq(s"($corr AND ${pred(r, i)})",
          s"($corr AND ${pred(r, i)})") ++
          (if (!isNeg && r.nextInt(3) == 0) Seq(s"(${pred(r, i)})")
           else Nil)
        s"SELECT CAST($ok AS BIGINT) AS k FROM ${o.name} " +
          s"WHERE ${neg}EXISTS (SELECT 1 FROM ${i.name} " +
          s"WHERE ${arms.mkString(" OR ")}) AND ${pred(r, o)}"

      case 11 => // disjunctive correlation under AND (the
        // distribution path: shared AND-factor over a correlated OR),
        // plus the plain corr-AND-p1-OR-p2 precedence form of the
        // round-18 triage (seed-397 shape, unparenthesized)
        val (o, i, ok, ik) = pick(r, smallEdges)
        val corr = s"$ik = ${o.name}.$ok"
        val body = if (r.nextBoolean())
          s"(${pred(r, i)}) AND ($corr OR (${pred(r, i)}))"
        else s"$corr AND (${pred(r, i)}) OR ($corr AND ${pred(r, i)})"
        s"SELECT CAST($ok AS BIGINT) AS k FROM ${o.name} " +
          s"WHERE EXISTS (SELECT 1 FROM ${i.name} WHERE $body) " +
          s"AND ${pred(r, o)}"

      case 12 => // disjunctive-correlation IN (ListQuery split path):
        // one correlated arm, one uncorrelated value-set arm
        val (o, i, ok, ik) = pick(r, smallEdges)
        s"SELECT CAST($ok AS BIGINT) AS k FROM ${o.name} " +
          s"WHERE $ok IN (SELECT $ik FROM ${i.name} " +
          s"WHERE $ik = ${o.name}.$ok AND (${pred(r, i)}) " +
          s"OR (${pred(r, i)})) AND ${pred(r, o)}"

      case 13 => // BARE correlated scalar aggregate in SELECT — no
        // COALESCE wrapper (unlike shape 2), so no-match groups must
        // surface as NULL identically on both engines; min/max/sum
        // over an empty correlated slice is the NULL-vs-0 trap
        val (o, i, ok, ik) = pick(r, edges)
        val agg = pick(r, Seq(s"sum(${pick(r, i.ints)})",
          s"min(${pick(r, i.ints)})", s"max(${pick(r, i.ints)})"))
        s"SELECT CAST($ok AS BIGINT) AS k, " +
          s"CAST((SELECT $agg FROM ${i.name} " +
          s"WHERE $ik = ${o.name}.$ok AND ${pred(r, i)}) AS BIGINT) AS v " +
          s"FROM ${o.name} WHERE ${pred(r, o)}"

      case 14 => // subqueries inside CASE / COALESCE arms: EXISTS as
        // a CASE condition and a correlated scalar as a COALESCE
        // fallback — conditional-expression decorrelation
        val (o, i, ok, ik) = pick(r, edges)
        val aggC = pick(r, i.ints)
        if (r.nextBoolean())
          s"SELECT CAST($ok AS BIGINT) AS k, " +
            s"CASE WHEN EXISTS (SELECT 1 FROM ${i.name} " +
            s"WHERE $ik = ${o.name}.$ok AND ${pred(r, i)}) " +
            s"THEN CAST(1 AS BIGINT) " +
            s"WHEN ($ok % ${2 + r.nextInt(5)}) = 0 THEN CAST(2 AS BIGINT) " +
            s"ELSE CAST(0 AS BIGINT) END AS v " +
            s"FROM ${o.name} WHERE ${pred(r, o)}"
        else
          s"SELECT CAST($ok AS BIGINT) AS k, " +
            s"CAST(COALESCE((SELECT min($aggC) FROM ${i.name} " +
            s"WHERE $ik = ${o.name}.$ok AND ${pred(r, i)}), " +
            s"(SELECT max($aggC) FROM ${i.name} WHERE ${pred(r, i)}), " +
            s"-1) AS BIGINT) AS v " +
            s"FROM ${o.name} WHERE ${pred(r, o)}"

      case 15 => // CORRELATED NOT IN with a null-producing projection:
        // the three-valued-logic killer under correlation — a NULL in
        // THIS row's correlated list annihilates that row only, so
        // engines must agree per-row, not just globally (round-18's
        // grammar only drew uncorrelated null lists)
        val (o, i, ok, ik) = pick(r, edges)
        val (k2, m2) = (2 + r.nextInt(5), r.nextInt(2))
        val innerExpr = if (r.nextInt(4) == 0) ik
          else s"NULLIF($ik % $k2, $m2) + ($ik - $ik % $k2)"
        s"SELECT CAST($ok AS BIGINT) AS k FROM ${o.name} " +
          s"WHERE $ok NOT IN (SELECT $innerExpr FROM ${i.name} " +
          s"WHERE $ik = ${o.name}.$ok AND ${pred(r, i)}) " +
          s"AND ${pred(r, o)}"

      case 16 => // DISJUNCTIVE correlation in a SCALAR aggregate — the
        // graft rewrite deliberately leaves this to Spark's
        // DecorrelateInnerQuery domain-join path; these seeds verify
        // that path's RESULTS. Both the precedence form
        // (corr AND p1 OR p2) and the parenthesized two-arm form are
        // drawn; small edges keep DuckDB's dependent join tractable
        val (o, i, ok, ik) = pick(r, smallEdges)
        val corr = s"$ik = ${o.name}.$ok"
        val agg = pick(r, Seq("count(*)", s"min(${pick(r, i.ints)})",
          s"sum(${pick(r, i.ints)})"))
        val body = if (r.nextBoolean())
          s"$corr AND (${pred(r, i)}) OR (${pred(r, i)})"
        else s"($corr AND ${pred(r, i)}) OR ($corr AND ${pred(r, i)})"
        s"SELECT CAST($ok AS BIGINT) AS k, " +
          s"CAST(COALESCE((SELECT $agg FROM ${i.name} WHERE $body), " +
          s"-1) AS BIGINT) AS v FROM ${o.name} WHERE ${pred(r, o)}"

      case _ => // DISJUNCTIVE correlation under LATERAL — same
        // domain-join path, aggregate over a correlated-OR slice
        val (o, i, ok, ik) = pick(r, smallEdges)
        s"SELECT CAST($ok AS BIGINT) AS k, t.cnt, t.sm " +
          s"FROM ${o.name}, LATERAL (" +
          s"SELECT count(*) AS cnt, " +
          s"CAST(COALESCE(sum(${pick(r, i.ints)}), 0) AS BIGINT) AS sm " +
          s"FROM ${i.name} WHERE $ik = ${o.name}.$ok " +
          s"OR (${pred(r, i)})) t WHERE ${pred(r, o)}"
    }
  }

  private def duckdbAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb")
      .start().waitFor() == 0
    catch { case _: Exception => false }

  test(s"$nPlans seeded subquery/set-op plans hash-match DuckDB") {
    assume(duckdbAvailable, "python3+duckdb not available")
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    allTables.foreach(t => spark.read.parquet(s"$sfDir/${t.name}.parquet")
      .createOrReplaceTempView(t.name))
    val out = java.nio.file.Files
      .createTempDirectory("graft_subfuzz").toString
    val oracle = new scala.collection.mutable.LinkedHashMap[String, String]
    var emptyCount = 0
    (1 to nPlans).foreach { seed =>
      val name = f"q_subfuzz_$seed%03d"
      val sql = genSql(seed)
      val df = spark.sql(sql)
      df.write.mode("overwrite").parquet(s"$out/$name")
      if (spark.read.parquet(s"$out/$name").isEmpty) emptyCount += 1
      oracle(name) = sql
    }
    // NOT IN over a null-producing list legitimately yields zero rows,
    // so the vacuous bound is looser than QueryFuzzSpec's — but a
    // board MOSTLY empty would still prove nothing
    assert(emptyCount <= nPlans * 2 / 5,
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
      s"differential subquery fuzz divergence:\n$tail")
  }
}

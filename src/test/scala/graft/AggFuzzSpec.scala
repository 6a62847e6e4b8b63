package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential fuzzing of AGGREGATE semantics vs DuckDB.
  *
  * QueryFuzzSpec draws plain GROUP BY + ROLLUP/CUBE shapes; the
  * corners this layer adds are the aggregate-MODIFIER ones:
  *
  *  - `FILTER (WHERE ...)` clauses — per-aggregate predicates whose
  *    rows differ from the enclosing WHERE (plus count_if, and the
  *    CASE-expression equivalent emitted in the SAME query so the
  *    engines must agree with themselves, not just each other)
  *  - multiple DISTINCT aggregates over different columns in one
  *    SELECT (Catalyst plans an Expand — a classic rewrite-bug site)
  *  - GROUPING SETS over NULLIF'd keys with grouping()/grouping_id
  *    outputs — the natural-NULL vs subtotal-NULL disambiguation
  *  - ROLLUP / CUBE over null-producing keys with grouping() flags
  *  - bool_and / bool_or and min/max over STRINGS (binary collation
  *    on both engines)
  *
  * Dialect rules (probe-verified): no ORDER BY inside aggregates
  * (DuckDB-only), no any_value (nondeterministic), booleans and
  * grouping() flags cast to BIGINT, grouped expressions computed in
  * a subquery so grouping(g) references a plain column on both
  * parsers.
  *
  * CI runs SPARK_GRAFT_AGGFUZZ_N seeds (default 60); recorded
  * campaigns (400 seeds at sf0.01 AND sf0.1) live in BASELINE.md.
  */
class AggFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_FUZZ_SF", "/root/testdata/sf0.01")
  private val nPlans =
    sys.env.get("SPARK_GRAFT_AGGFUZZ_N").map(_.toInt).getOrElse(60)

  private final case class T(name: String, ints: Seq[String],
                             strs: Seq[String])

  private val lineitem = T("lineitem",
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity"), Seq("l_returnflag", "l_linestatus"))
  private val orders = T("orders", Seq("o_orderkey", "o_custkey"),
    Seq("o_orderstatus", "o_orderpriority"))
  private val customer = T("customer", Seq("c_custkey", "c_nationkey"),
    Seq("c_name", "c_mktsegment"))
  private val part = T("part", Seq("p_partkey", "p_size"),
    Seq("p_name", "p_brand", "p_type"))

  private val tables = Seq(lineitem, orders, customer, part)

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  /** Row predicate with a floored hit-rate (same pool discipline as
    * the sibling fuzzers).
    */
  private def pred(r: Random, t: T): String = {
    val c = pick(r, t.ints)
    r.nextInt(3) match {
      case 0 =>
        val k = 2 + r.nextInt(8)
        s"($c % $k) ${pick(r, Seq("=", "<>", ">="))} ${1 + r.nextInt(k - 1)}"
      case 1 =>
        val lo = r.nextInt(4)
        s"($c % 10) BETWEEN $lo AND ${lo + 2 + r.nextInt(5)}"
      case _ => s"length(${pick(r, t.strs)}) % 2 = 0"
    }
  }

  /** A group key: plain bucket or NULL-producing bucket. */
  private def key(r: Random, t: T): String =
    if (r.nextInt(3) == 0)
      s"NULLIF(${pick(r, t.ints)} % ${3 + r.nextInt(5)}, ${r.nextInt(2)})"
    else s"${pick(r, t.ints)} % ${2 + r.nextInt(9)}"

  // ------------------------------------------------- plan shapes

  private[graft] def genSql(seed: Int): String = {
    val r = new Random(seed)
    val t = pick(r, tables)
    r.nextInt(5000) % 5 match {

      case 0 => // FILTER clauses + count_if + the CASE-expression
        // equivalent of one of them IN THE SAME ROW — engines must
        // agree with themselves too
        val g = key(r, t)
        val v = pick(r, t.ints)
        val p1 = pred(r, t); val p2 = pred(r, t)
        s"SELECT g, count(*) AS cnt, " +
          s"count(*) FILTER (WHERE $p1) AS cf, " +
          s"CAST(COALESCE(sum($v) FILTER (WHERE $p2), 0) AS BIGINT) " +
          s"AS sf, " +
          // CAST: DuckDB's count_if returns HUGEINT, which the
          // checker's pandas bridge floats — Spark's is BIGINT
          s"CAST(count_if($p1) AS BIGINT) AS ci, " +
          s"CAST(sum(CASE WHEN $p1 THEN 1 ELSE 0 END) AS BIGINT) " +
          s"AS ce FROM (SELECT *, $g AS g FROM ${t.name}) s GROUP BY g"

      case 1 => // multiple DISTINCT aggregates (Expand plan) mixed
        // with plain aggregates
        val g = key(r, t)
        val a = pick(r, t.ints); val b = pick(r, t.ints)
        val c = pick(r, t.strs)
        s"SELECT g, count(DISTINCT ($a % ${5 + r.nextInt(20)})) AS d1, " +
          s"count(DISTINCT $c) AS d2, count(*) AS cnt, " +
          s"CAST(COALESCE(sum($b % 100), 0) AS BIGINT) AS sm " +
          s"FROM (SELECT *, $g AS g FROM ${t.name}) s GROUP BY g"

      case 2 => // GROUPING SETS over (possibly NULL-producing) keys
        // with grouping() flags — natural NULL vs subtotal NULL
        val g1 = key(r, t); val g2 = s"${pick(r, t.strs)}"
        val sets = pick(r, Seq(
          "((g1), (g2), (g1, g2), ())", "((g1), (g1, g2))",
          "((g1, g2), ())"))
        s"SELECT g1, g2, CAST(grouping(g1) AS BIGINT) AS f1, " +
          s"CAST(grouping(g2) AS BIGINT) AS f2, count(*) AS cnt " +
          s"FROM (SELECT $g1 AS g1, $g2 AS g2 FROM ${t.name} " +
          s"WHERE ${pred(r, t)}) s GROUP BY GROUPING SETS $sets"

      case 3 => // ROLLUP / CUBE over a null-producing key + a string
        // key, grouping() disambiguation
        val g1 = key(r, t); val g2 = pick(r, t.strs)
        val op = if (r.nextBoolean()) "ROLLUP" else "CUBE"
        s"SELECT g1, g2, CAST(grouping(g1) AS BIGINT) AS f1, " +
          s"CAST(grouping(g2) AS BIGINT) AS f2, count(*) AS cnt " +
          s"FROM (SELECT $g1 AS g1, $g2 AS g2 FROM ${t.name} " +
          s"WHERE ${pred(r, t)}) s GROUP BY $op (g1, g2)"

      case _ => // bool_and / bool_or + min/max over strings (binary
        // collation both engines)
        val g = key(r, t)
        val v = pick(r, t.ints); val sc = pick(r, t.strs)
        val k2 = 2 + r.nextInt(9)
        s"SELECT g, CAST(bool_and(($v % $k2) >= 1) AS BIGINT) AS ba, " +
          s"CAST(bool_or(($v % $k2) = ${r.nextInt(k2)}) AS BIGINT) AS bo, " +
          s"min($sc) AS mns, max($sc) AS mxs, count(*) AS cnt " +
          s"FROM (SELECT *, $g AS g FROM ${t.name}) s GROUP BY g"
    }
  }

  private def duckdbAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb")
      .start().waitFor() == 0
    catch { case _: Exception => false }

  test(s"$nPlans seeded aggregate plans hash-match DuckDB") {
    assume(duckdbAvailable, "python3+duckdb not available")
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    tables.foreach(t => spark.read.parquet(s"$sfDir/${t.name}.parquet")
      .createOrReplaceTempView(t.name))
    val out = java.nio.file.Files
      .createTempDirectory("graft_aggfuzz").toString
    val oracle = new scala.collection.mutable.LinkedHashMap[String, String]
    (1 to nPlans).foreach { seed =>
      val name = f"q_aggfuzz_$seed%03d"
      val sql = genSql(seed)
      val df = spark.sql(sql)
      df.write.mode("overwrite").parquet(s"$out/$name")
      // every shape aggregates the whole table (WHERE only inside
      // shapes 2-3, floored pool) — zero rows means a broken generator
      assert(!spark.read.parquet(s"$out/$name").isEmpty,
        s"$name returned zero rows: $sql")
      oracle(name) = sql
    }
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
      s"differential aggregate fuzz divergence:\n$tail")
  }
}

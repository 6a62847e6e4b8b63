package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential fuzzing of the WINDOW-FUNCTION surface vs DuckDB.
  *
  * QueryFuzzSpec's window shape is deliberately TIE-INSENSITIVE
  * (rank/dense_rank/RANGE-unbounded aggregates only) because no
  * column list over the synthetic lineitem guarantees a total order.
  * This spec covers the tie-SENSITIVE corners the board's q_window_*
  * gates exercise only pointwise, by ordering over PRIMARY KEYS whose
  * uniqueness is ASSERTED at setup (orders/customer/part/supplier —
  * verified unique at sf0.001/0.01/0.1), which makes every shape
  * below bit-deterministic:
  *
  *  - bounded ROWS frames (k PRECEDING .. m FOLLOWING, pure-following
  *    and pure-preceding windows, empty frames → NULL sums / 0 counts)
  *  - row_number + ntile over a total order
  *  - lag/lead with offsets and defaults over NULLIF'd values
  *  - RANGE frames with value offsets over TIED integer order keys,
  *    ASC and DESC — peer-group aggregation is deterministic under
  *    ties even though row order is not
  *  - first_value / last_value / nth_value with explicit frames
  *  - percent_rank / cume_dist re-rationalized to exact BIGINTs
  *    (×(n-1) / ×n undoes the division both engines computed)
  *  - two window specs with DIFFERENT partition keys in one SELECT
  *    (Catalyst plans two Window operators + an extra Exchange)
  *  - windows over a GROUP BY subquery (window input = aggregate)
  *
  * Dialect rules (same contract as the sibling fuzzers): one shared
  * ANSI text per seed, integer outputs lifted to BIGINT, explicit
  * NULLS FIRST/LAST on every ORDER BY item (Spark ASC defaults NULLS
  * FIRST, DuckDB NULLS LAST), no doubles except through the exact
  * re-rationalization, no IGNORE NULLS (Spark renders it AFTER the
  * call, DuckDB INSIDE the argument list — one shared text cannot
  * express both).
  *
  * CI runs SPARK_GRAFT_WINFUZZ_N seeds (default 60); recorded
  * campaigns (400 seeds at sf0.01 AND sf0.1) live in BASELINE.md.
  */
class WindowFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_FUZZ_SF", "/root/testdata/sf0.01")
  private val nPlans =
    sys.env.get("SPARK_GRAFT_WINFUZZ_N").map(_.toInt).getOrElse(60)

  /** (table, unique pk, int cols, str cols). The pk's uniqueness is
    * asserted at setup — every tie-sensitive shape orders by it last.
    */
  private final case class T(name: String, pk: String,
                             ints: Seq[String], strs: Seq[String])

  private val orders = T("orders", "o_orderkey",
    Seq("o_orderkey", "o_custkey"),
    Seq("o_orderstatus", "o_orderpriority"))
  private val customer = T("customer", "c_custkey",
    Seq("c_custkey", "c_nationkey"), Seq("c_name", "c_mktsegment"))
  private val part = T("part", "p_partkey",
    Seq("p_partkey", "p_size"), Seq("p_name", "p_brand", "p_type"))
  private val supplier = T("supplier", "s_suppkey",
    Seq("s_suppkey", "s_nationkey"), Seq("s_name"))

  private val tables = Seq(orders, customer, part, supplier)

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  /** Partition expression: modulo bucket, string col, or a
    * null-producing bucket (PARTITION BY groups NULLs together in
    * both engines).
    */
  private def partExpr(r: Random, t: T): String = r.nextInt(4) match {
    case 0 => s"${pick(r, t.ints)} % ${2 + r.nextInt(11)}"
    case 1 if t.strs.nonEmpty => pick(r, t.strs)
    case 2 => s"NULLIF(${pick(r, t.ints)} % ${3 + r.nextInt(5)}, " +
      s"${r.nextInt(2)})"
    case _ => s"${pick(r, t.ints)} % ${2 + r.nextInt(11)}"
  }

  /** A TOTAL order: an optionally-NULLIF'd leading key (exercises the
    * null-ordering split) tie-broken by the asserted-unique pk, each
    * item with explicit direction + null placement.
    */
  private def totalOrder(r: Random, t: T): String = {
    def dir() = if (r.nextBoolean()) "ASC" else "DESC"
    def nulls() = if (r.nextBoolean()) "NULLS FIRST" else "NULLS LAST"
    val lead = r.nextInt(3) match {
      case 0 => None
      case 1 => Some(s"${pick(r, t.ints)} % ${2 + r.nextInt(9)}")
      case _ => Some(s"NULLIF(${pick(r, t.ints)} % ${2 + r.nextInt(5)}, " +
        s"${r.nextInt(2)})")
    }
    (lead.map(e => s"$e ${dir()} ${nulls()}").toSeq :+
      s"${t.pk} ${dir()} ${nulls()}").mkString(", ")
  }

  /** An integer value expression, sometimes null-producing (empty /
    * all-null frames must agree: sum→NULL, count→0).
    */
  private def valExpr(r: Random, t: T): String = {
    val c = pick(r, t.ints)
    if (r.nextInt(3) == 0)
      s"NULLIF($c % ${2 + r.nextInt(5)}, ${r.nextInt(2)})"
    else c
  }

  /** A ROWS/RANGE frame clause. `rows=false` draws value offsets. */
  private def frame(r: Random, rows: Boolean): String = {
    val unit = if (rows) "ROWS" else "RANGE"
    val k = 1 + r.nextInt(4); val m = 1 + r.nextInt(4)
    r.nextInt(6) match {
      case 0 => s"$unit BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
      case 1 => s"$unit BETWEEN $k PRECEDING AND CURRENT ROW"
      case 2 => s"$unit BETWEEN $k PRECEDING AND $m FOLLOWING"
      case 3 => s"$unit BETWEEN CURRENT ROW AND $m FOLLOWING"
      case 4 => s"$unit BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
      case _ => // pure-following / pure-preceding: frames that can be
        // EMPTY for leading/trailing rows — sum NULL, count 0
        if (r.nextBoolean())
          s"$unit BETWEEN $k FOLLOWING AND ${k + m} FOLLOWING"
        else s"$unit BETWEEN ${k + m} PRECEDING AND $k PRECEDING"
    }
  }

  private def agg(r: Random, v: String): String =
    pick(r, Seq(s"sum($v)", s"count($v)", s"min($v)", s"max($v)",
      "count(*)"))

  // ------------------------------------------------- plan shapes

  private[graft] def genSql(seed: Int): String = {
    val r = new Random(seed)
    // modulo draw, not nextInt(8) — see SubqueryFuzzSpec:202 (high
    // bits of the first draw are nearly constant across small seeds)
    val t = pick(r, tables)
    val p = partExpr(r, t)
    r.nextInt(8000) % 8 match {

      case 0 => // bounded ROWS frame aggregate over a total order
        val w = s"PARTITION BY $p ORDER BY ${totalOrder(r, t)} " +
          frame(r, rows = true)
        s"SELECT CAST(${t.pk} AS BIGINT) AS k, " +
          s"CAST(${agg(r, valExpr(r, t))} OVER ($w) AS BIGINT) AS wv " +
          s"FROM ${t.name}"

      case 1 => // row_number + ntile over a total order
        val ord = totalOrder(r, t)
        val n = 2 + r.nextInt(6)
        s"SELECT CAST(${t.pk} AS BIGINT) AS k, " +
          s"CAST(row_number() OVER (PARTITION BY $p ORDER BY $ord) " +
          s"AS BIGINT) AS rn, " +
          s"CAST(ntile($n) OVER (PARTITION BY $p ORDER BY $ord) " +
          s"AS BIGINT) AS nt FROM ${t.name}"

      case 2 => // lag/lead with offset + default over NULLIF'd values
        val ord = totalOrder(r, t)
        val f = if (r.nextBoolean()) "lag" else "lead"
        val off = 1 + r.nextInt(3)
        val dflt = if (r.nextBoolean()) s", ${-1 - r.nextInt(9)}" else ""
        s"SELECT CAST(${t.pk} AS BIGINT) AS k, " +
          s"CAST($f(${valExpr(r, t)}, $off$dflt) " +
          s"OVER (PARTITION BY $p ORDER BY $ord) AS BIGINT) AS wv " +
          s"FROM ${t.name}"

      case 3 => // RANGE frame with value offsets over a TIED int order
        // key: peer groups make the aggregate deterministic even
        // though row order under ties is not; ASC and DESC both drawn
        // (DESC reverses the offset direction — a classic divergence)
        val ordCol = s"${pick(r, t.ints)} % ${5 + r.nextInt(45)}"
        val dir = if (r.nextBoolean()) "ASC" else "DESC"
        val nulls = if (r.nextBoolean()) "NULLS FIRST" else "NULLS LAST"
        val w = s"PARTITION BY $p ORDER BY $ordCol $dir $nulls " +
          frame(r, rows = false)
        s"SELECT CAST(${t.pk} AS BIGINT) AS k, " +
          s"CAST(${agg(r, valExpr(r, t))} OVER ($w) AS BIGINT) AS wv " +
          s"FROM ${t.name}"

      case 4 => // first_value / last_value / nth_value with an explicit
        // frame over a total order (last_value under the DEFAULT frame
        // is the classic footgun — drawn here too, deterministic
        // because the order is total)
        val ord = totalOrder(r, t)
        val v = valExpr(r, t)
        val fv = r.nextInt(3) match {
          case 0 => s"first_value($v)"
          case 1 => s"last_value($v)"
          case _ => s"nth_value($v, ${1 + r.nextInt(4)})"
        }
        val fr = if (r.nextInt(3) == 0) "" // default frame
          else " " + frame(r, rows = true)
        s"SELECT CAST(${t.pk} AS BIGINT) AS k, " +
          s"CAST($fv OVER (PARTITION BY $p ORDER BY $ord$fr) " +
          s"AS BIGINT) AS wv FROM ${t.name}"

      case 5 => // percent_rank / cume_dist re-rationalized: both are
        // exact rationals (rank-1)/(n-1) and peers/n — multiplying
        // back and rounding recovers the integer numerator EXACTLY on
        // both engines regardless of double rounding
        val ord = totalOrder(r, t)
        val w = s"PARTITION BY $p ORDER BY $ord"
        if (r.nextBoolean())
          s"SELECT CAST(${t.pk} AS BIGINT) AS k, " +
            s"CAST(round(percent_rank() OVER ($w) * " +
            s"(count(*) OVER (PARTITION BY $p) - 1)) AS BIGINT) AS wv " +
            s"FROM ${t.name}"
        else
          s"SELECT CAST(${t.pk} AS BIGINT) AS k, " +
            s"CAST(round(cume_dist() OVER ($w) * " +
            s"count(*) OVER (PARTITION BY $p)) AS BIGINT) AS wv " +
            s"FROM ${t.name}"

      case 6 => // two window specs with DIFFERENT partition keys in
        // one SELECT — Catalyst stacks two Window operators with an
        // Exchange between; results must be key-identical anyway
        val p2 = partExpr(r, t)
        val ord = totalOrder(r, t)
        s"SELECT CAST(${t.pk} AS BIGINT) AS k, " +
          s"CAST(${agg(r, valExpr(r, t))} OVER (PARTITION BY $p " +
          s"ORDER BY $ord ${frame(r, rows = true)}) AS BIGINT) AS w1, " +
          s"CAST(row_number() OVER (PARTITION BY $p2 ORDER BY $ord) " +
          s"AS BIGINT) AS w2 FROM ${t.name}"

      case _ => // window over a GROUP BY subquery: the window input is
        // an aggregate (group keys are unique → total order for free)
        val g = s"${pick(r, t.ints)} % ${10 + r.nextInt(90)}"
        val v = pick(r, t.ints)
        s"SELECT g, cnt, " +
          s"CAST(sum(sm) OVER (ORDER BY g ASC NULLS FIRST " +
          s"${frame(r, rows = true)}) AS BIGINT) AS wv FROM (" +
          s"SELECT $g AS g, count(*) AS cnt, " +
          s"CAST(sum($v) AS BIGINT) AS sm FROM ${t.name} GROUP BY 1) s"
    }
  }

  private def duckdbAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb")
      .start().waitFor() == 0
    catch { case _: Exception => false }

  test(s"$nPlans seeded window plans hash-match DuckDB") {
    assume(duckdbAvailable, "python3+duckdb not available")
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/${t.name}.parquet")
      df.createOrReplaceTempView(t.name)
      // every tie-sensitive shape rests on this
      val (n, u) = (df.count(),
        df.select(t.pk).distinct().count())
      assert(n == u, s"${t.name}.${t.pk} not unique at $sfDir " +
        s"($n rows, $u distinct) — tie-sensitive shapes unsound")
    }
    val out = java.nio.file.Files
      .createTempDirectory("graft_winfuzz").toString
    val oracle = new scala.collection.mutable.LinkedHashMap[String, String]
    (1 to nPlans).foreach { seed =>
      val name = f"q_winfuzz_$seed%03d"
      val sql = genSql(seed)
      val df = spark.sql(sql)
      df.write.mode("overwrite").parquet(s"$out/$name")
      // windows emit one row per input row — a zero-row dump means a
      // broken generator, not a legitimately-empty predicate
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
      s"differential window fuzz divergence:\n$tail")
  }
}

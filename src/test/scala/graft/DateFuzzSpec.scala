package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential fuzzing of DATE/TIME semantics vs DuckDB.
  *
  * The sibling fuzzers reduce timestamps to `extract(year ...)`; the
  * calendar corners where engines classically drift — ISO week
  * numbering at year boundaries, date_trunc('week') start-of-week,
  * end-of-month clamping in month arithmetic, leap-day handling,
  * last_day — are untested there. This generator draws them over the
  * two timestamp columns (o_orderdate, l_shipdate — 1995–2001 range
  * in the synthetic data, two leap years) as ONE shared ANSI text per
  * seed.
  *
  * Dialect rules discovered while building (each probe-verified):
  *  - day-of-week is EXCLUDED: DuckDB `dayofweek` = Spark's − 1 (the
  *    q_date_funcs gate normalizes with `+ 1` in its separate oracle
  *    text; a shared text cannot)
  *  - `datediff` is EXCLUDED: Spark is 2-arg (end, start), DuckDB is
  *    3-arg (unit, start, end)
  *  - `date_trunc` returns TIMESTAMP on Spark and DATE on DuckDB —
  *    both sides wrap `CAST(... AS DATE)`
  *  - interval literals use the quoted ANSI form `INTERVAL 'n' MONTH`
  *    (both parsers accept it; Spark rejects some unquoted forms)
  *  - all date outputs leave as STRING — the alias BOTH parsers accept
  *    (Spark rejects bare VARCHAR without a length) — rendered ISO
  *    yyyy-MM-dd on both,
  *    all numeric outputs as BIGINT
  *
  * Shapes: calendar-field extraction (year/quarter/month/day/
  * weekofyear/dayofyear), date_trunc at every unit (year → week →
  * day), day arithmetic (d + n and date_add), month arithmetic with
  * end-of-month clamping (+ INTERVAL 'n' MONTH, n up to 25 so
  * Jan-31-style clamps and leap Februaries are drawn), last_day /
  * greatest / least, and date predicates (BETWEEN literals, trunc
  * equality) driving grouped counts.
  *
  * CI runs SPARK_GRAFT_DATEFUZZ_N seeds (default 60); recorded
  * campaigns (400 seeds at sf0.01 AND sf0.1) live in BASELINE.md.
  */
class DateFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_FUZZ_SF", "/root/testdata/sf0.01")
  private val nPlans =
    sys.env.get("SPARK_GRAFT_DATEFUZZ_N").map(_.toInt).getOrElse(60)

  /** (table, pk for output keying, timestamp col). */
  private val sources = Seq(
    ("orders", "o_orderkey", "o_orderdate"),
    ("lineitem", "l_orderkey || '-' || l_linenumber || '-' || l_suppkey",
      "l_shipdate"))

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  private val truncUnits = Seq("year", "quarter", "month", "week", "day")
  private val fields = Seq("year", "quarter", "month", "dayofmonth",
    "weekofyear", "dayofyear")

  // ------------------------------------------------- plan shapes

  private[graft] def genSql(seed: Int): String = {
    val r = new Random(seed)
    val (tbl, pk, tsc) = pick(r, sources)
    val d = s"CAST($tsc AS DATE)"
    r.nextInt(6000) % 6 match {

      case 0 => // calendar-field extraction — ISO weeks at year
        // boundaries are the headline corner (Jan 1 can be week 52/53
        // of the PREVIOUS ISO year on both engines, identically)
        val f1 = pick(r, fields); val f2 = pick(r, fields)
        s"SELECT $pk AS k, CAST($f1($d) AS BIGINT) AS v1, " +
          s"CAST($f2($d) AS BIGINT) AS v2 FROM $tbl"

      case 1 => // date_trunc at a random unit (Spark returns
        // TIMESTAMP, DuckDB DATE — CAST normalizes both)
        val u = pick(r, truncUnits)
        s"SELECT $pk AS k, " +
          s"CAST(CAST(date_trunc('$u', $d) AS DATE) AS STRING) AS v " +
          s"FROM $tbl"

      case 2 => // day arithmetic: d + n and date_add(d, n), n signed
        val n = r.nextInt(800) - 400
        val expr = if (r.nextBoolean()) s"$d + ($n)"
          else s"date_add($d, $n)"
        s"SELECT $pk AS k, CAST($expr AS STRING) AS v FROM $tbl"

      case 3 => // month arithmetic with end-of-month clamping: both
        // engines clamp Jan 31 + 1 month to Feb 28/29 — n spans >2
        // years so leap Februaries are drawn
        val n = 1 + r.nextInt(25)
        val sign = if (r.nextBoolean()) "+" else "-"
        s"SELECT $pk AS k, " +
          s"CAST(CAST($d $sign INTERVAL '$n' MONTH AS DATE) AS STRING) " +
          s"AS v FROM $tbl"

      case 4 => // last_day / greatest / least over shifted dates
        val n = 1 + r.nextInt(200)
        val f = pick(r, Seq("greatest", "least"))
        s"SELECT $pk AS k, CAST(last_day($d) AS STRING) AS eom, " +
          s"CAST($f($d, date_add($d, ${if (r.nextBoolean()) n else -n})) " +
          s"AS STRING) AS gl FROM $tbl"

      case _ => // date predicates driving grouped counts: BETWEEN
        // date literals and trunc-equality (predicate evaluation over
        // dates, not just projection)
        val y = 1995 + r.nextInt(6)
        val m = 1 + r.nextInt(12)
        val p = r.nextInt(3) match {
          case 0 => s"$d BETWEEN DATE '$y-${f"$m%02d"}-01' AND " +
            s"DATE '$y-${f"$m%02d"}-28'"
          case 1 => s"CAST(date_trunc('quarter', $d) AS DATE) = " +
            s"DATE '$y-${f"${(m - 1) / 3 * 3 + 1}%02d"}-01'"
          case _ => s"weekofyear($d) = ${1 + r.nextInt(53)}"
        }
        s"SELECT CAST(year($d) AS BIGINT) AS y, " +
          s"CAST(month($d) AS BIGINT) AS m, count(*) AS cnt " +
          s"FROM $tbl WHERE $p GROUP BY 1, 2"
    }
  }

  private def duckdbAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb")
      .start().waitFor() == 0
    catch { case _: Exception => false }

  test(s"$nPlans seeded date/time plans hash-match DuckDB") {
    assume(duckdbAvailable, "python3+duckdb not available")
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    Seq("orders", "lineitem").foreach(t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .createOrReplaceTempView(t))
    val out = java.nio.file.Files
      .createTempDirectory("graft_datefuzz").toString
    val oracle = new scala.collection.mutable.LinkedHashMap[String, String]
    var emptyCount = 0
    (1 to nPlans).foreach { seed =>
      val name = f"q_datefuzz_$seed%03d"
      val sql = genSql(seed)
      val df = spark.sql(sql)
      df.write.mode("overwrite").parquet(s"$out/$name")
      if (spark.read.parquet(s"$out/$name").isEmpty) {
        emptyCount += 1
        info(s"EMPTY $name: $sql")
      }
      oracle(name) = sql
    }
    // only the predicate shape can legitimately empty (a week-53 draw
    // in a 52-week year); projections never do
    assert(emptyCount <= nPlans / 10,
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
      s"differential date/time fuzz divergence:\n$tail")
  }
}

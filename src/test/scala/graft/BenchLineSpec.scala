package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard for the bench-output contract: the round driver parses the
  * JSON line out of the last 2000 chars of output, so the line must
  * stay under that window at ANY future query-set size (BENCH_r01/r02
  * were lost to overflow before the trim existed). Round 19 adds the
  * self-describing cold/median split and the failed field (VERDICT
  * r18 task 2 + ADVICE): both must ride in the line without breaking
  * the window.
  */
class BenchLineSpec extends AnyFunSuite {

  private def fakeResults(n: Int): Seq[(String, Double, Double)] =
    Seq.tabulate(n)(i =>
      (f"q_realistically_long_name_$i%03d", i * 1.2345, i * 1.2345))

  test("line stays under the driver's window at 130 queries") {
    val line = Bench.renderLine(fakeResults(130), "/root/testdata/sf0.1")
    assert(line.length <= 1900, s"line is ${line.length} chars")
    assert(line.startsWith("""{"metric":"total""""))
    assert(line.endsWith("""}"""))
  }

  test("trimming keeps the slowest queries and the full total") {
    val results = fakeResults(130)
    val line = Bench.renderLine(results, "/root/testdata/sf0.1")
    // the slowest query always survives the trim; the fastest is the
    // first dropped
    assert(line.contains("q_realistically_long_name_129"))
    assert(!line.contains("q_realistically_long_name_000\""))
    assert(line.contains(""""nq":130"""))
    val total = results.map(_._2).sum
    val shown = """"value":([0-9.]+)""".r
      .findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(shown - total) < 0.001)
  }

  test("small runs are emitted untrimmed") {
    val results = fakeResults(5)
    val line = Bench.renderLine(results, "/tmp/sf")
    results.foreach { case (n, _, _) => assert(line.contains(n)) }
  }

  test("reps and loadavg ride in the line (noise-robust protocol)") {
    val line = Bench.renderLine(fakeResults(5), "/tmp/sf",
      reps = 3, load = (4.25, 8.71))
    assert(line.contains(""""reps":3"""))
    assert(line.contains(""""load":[4.3,8.7]"""))
    // ...and the 130-query trim still fits the driver window with the
    // extra fields present
    val big = Bench.renderLine(fakeResults(130), "/tmp/sf",
      reps = 3, load = (4.25, 8.71))
    assert(big.length <= 1900, s"line is ${big.length} chars")
  }

  test("cold/median split is self-describing in the artifact") {
    // q_b's rep-1 is fixture-heavy (2.37 s cold vs 0.05 s median, the
    // q_dv_purge shape): value stays the median sum, value_cold the
    // rep-1 sum, and the cold map names exactly the amortized gate
    val results = Seq(("q_a", 1.0, 1.05), ("q_b", 0.05, 2.37))
    val line = Bench.renderLine(results, "/tmp/sf", reps = 3)
    assert(line.contains(""""value":1.05"""))
    assert(line.contains(""""value_cold":3.42"""))
    assert(line.contains(""""protocol":""""))
    assert(line.contains(""""cold":{"q_b":2.370}"""), line)
    // q_a's cold ~= median: not repeated in the trimmed cold map
    assert(!line.contains(""""q_a":1.05"""))
  }

  test("full-budget render carries every cold entry") {
    val results = Seq(("q_a", 1.0, 1.05), ("q_b", 0.05, 2.37))
    val line = Bench.renderLine(results, "/tmp/sf",
      budget = Int.MaxValue, reps = 3)
    assert(line.contains(""""cold":{"q_a":1.050,"q_b":2.370}"""), line)
  }

  test("failed queries are auditable in the artifact itself") {
    val line = Bench.renderLine(fakeResults(5), "/tmp/sf",
      failed = Seq("q_realistically_long_name_003"))
    assert(line.contains(
      """"failed":["q_realistically_long_name_003"]"""))
    val clean = Bench.renderLine(fakeResults(5), "/tmp/sf")
    assert(clean.contains(""""failed":[]"""))
  }

  test("median discards a single ambient outlier") {
    assert(Bench.median(Seq(1.0, 30.0, 1.2)) === 1.2)
    assert(Bench.median(Seq(2.0)) === 2.0)
    assert(Bench.median(Seq(1.0, 2.0)) === 1.0) // lower-median for even n
    assert(Bench.median(Nil) === 0.0)
  }
}

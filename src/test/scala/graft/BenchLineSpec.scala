package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard for the bench-output contract: the round driver parses the
  * JSON line out of the last 2000 chars of output, so the line must
  * stay under that window at ANY future query-set size (BENCH_r01/r02
  * were lost to overflow before the trim existed).
  */
class BenchLineSpec extends AnyFunSuite {

  private def fakeResults(n: Int): Seq[(String, Double)] =
    Seq.tabulate(n)(i => (f"q_realistically_long_name_$i%03d", i * 1.2345))

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
    results.foreach { case (n, _) => assert(line.contains(n)) }
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

  test("median discards a single ambient outlier") {
    assert(Bench.median(Seq(1.0, 30.0, 1.2)) === 1.2)
    assert(Bench.median(Seq(2.0)) === 2.0)
    assert(Bench.median(Seq(1.0, 2.0)) === 1.0) // lower-median for even n
    assert(Bench.median(Nil) === 0.0)
  }
}

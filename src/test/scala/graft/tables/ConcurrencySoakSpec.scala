package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Ingest-vs-maintenance soak (VERDICT r13 item 7): a writer thread
  * streams keyed upsert batches while a maintenance thread loops
  * lakehousekeeper's verbs (optimize, compact, vacuum, delta export)
  * against the SAME table for a wall-clock budget. OccRebaseSpec
  * proves the pairwise races; this proves the composition under
  * sustained concurrency:
  *
  *  - linear history: every version number 0..head exists exactly
  *    once (no forked or skipped commits);
  *  - zero lost rows: the final snapshot equals the writer's own
  *    key→value bookkeeping exactly (maintenance must never change
  *    logical content);
  *  - the exported `_delta_log` replays to the same snapshot through
  *    the independent python reader (DuckDB + stdlib json, zero graft
  *    code) when python3 is available, else through
  *    [[DeltaExport.readSnapshot]].
  *
  * CI runs a short budget; set SPARK_GRAFT_SOAK_SECONDS for a real
  * soak (e.g. 300).
  */
class ConcurrencySoakSpec extends SparkSpec {
  import graft.SparkSpec._

  test("streaming upserts vs optimize+vacuum+export soak: linear " +
      "history, zero lost rows, replayable export") {
    val budgetMs = sys.env.get("SPARK_GRAFT_SOAK_SECONDS")
      .map(_.toInt).getOrElse(15) * 1000L
    val dir = tmpDir("soak")
    val path = s"$dir/docs.parquet"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    ResourceTable(spark, path).createIfNotExists(schema)

    val expected = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val deadline = System.currentTimeMillis() + budgetMs
    @volatile var writing = true

    val writer = new Thread(() => {
      val t = ResourceTable(spark, path)
      var batch = 0L
      try while (System.currentTimeMillis() < deadline) {
        // each batch: 40 fresh keys + 10 overwrites of older keys —
        // both the append path and the file-overlap rewrite path stay
        // continuously exercised
        val fresh = (0L until 40L).map(i => batch * 40L + i)
        val over = if (batch == 0) Seq.empty
          else (0L until 10L).map(i => (batch - 1) * 40L + i * 3L)
        val keys = fresh ++ over
        val rows = keys.map(k => Row(k, batch))
        t.upsert(spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 2), schema), "id")
        // bookkeeping AFTER the commit returns: upsert is atomic, so
        // a successful return means this batch's values are current
        keys.foreach(k => expected.put(k, batch))
        batch += 1
      } catch { case e: Throwable => failures.add(e) }
      finally writing = false
    }, "soak-writer")

    val maintenance = new Thread(() => {
      val t = ResourceTable(spark, path)
      var i = 0
      try while (writing || i == 0) {
        i += 1
        i % 4 match {
          case 0 => t.optimize(numFiles = 2): Unit
          case 1 => t.compactSmallFiles(minBytes = 1L << 20): Unit
          // retention > the soak budget: vacuum may not reap files a
          // concurrent reader (or the exported log) still references
          case 2 => t.vacuum(retentionMs = 3600L * 1000): Unit
          case 3 => DeltaExport.export(t): Unit
        }
        Thread.sleep(50)
      } catch { case e: Throwable => failures.add(e) }
    }, "soak-maintenance")

    writer.start(); maintenance.start()
    writer.join(budgetMs * 4); maintenance.join(budgetMs * 4)
    assert(failures.isEmpty,
      s"soak thread failed: ${Option(failures.peek()).map(_.toString)}")

    val t = ResourceTable(spark, path)
    val head = t.latestVersion.get
    assert(head >= 5, s"soak produced only $head commits")
    // linear history: every version exists (no gaps, no forks — two
    // writers publishing the same version would have lost one body)
    assert((0L to head).forall(t.versionExists),
      "commit chain has gaps")

    // zero lost rows: snapshot == the writer's bookkeeping
    val got = t.read().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    import scala.jdk.CollectionConverters._
    val want = expected.asScala.toMap
    assert(got.size == want.size,
      s"row count ${got.size} != expected ${want.size}")
    assert(got == want, {
      val lost = want.keySet -- got.keySet
      val extra = got.keySet -- want.keySet
      val stale = want.keys.filter(k =>
        got.contains(k) && got(k) != want(k))
      s"lost=${lost.take(5)} extra=${extra.take(5)} stale=${stale.take(5)}"
    })

    // the export brought current replays to the same snapshot
    DeltaExport.export(t)
    val replayed = DeltaExport.readSnapshot(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replayed == want, "exported _delta_log diverges from table")

    // independent python reader (the check_delta_export.py harness)
    // when the environment has it — CI does; a bare JVM env skips
    val py = new java.io.File("tools/check_delta_export.py")
    if (py.exists() && scala.util.Try(
        new ProcessBuilder("python3", "-c", "import duckdb")
          .start().waitFor()).toOption.contains(0)) {
      val expDir = s"$dir/expected.parquet"
      t.read().repartition(1).write.mode("overwrite").parquet(expDir)
      val proc = new ProcessBuilder(
        "python3", py.getPath, path, expDir)
        .redirectErrorStream(true).start()
      val out = new String(proc.getInputStream.readAllBytes())
      assert(proc.waitFor() == 0, s"python reader failed:\n$out")
      assert(out.contains("MATCH"), out)
    }
  }
}

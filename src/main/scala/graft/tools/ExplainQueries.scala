package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named queries to per-query files —
  * the optimization-round before/after plan evidence.
  *
  * {{{
  * sbt "runMain graft.tools.ExplainQueries <dataDir> <outDir> <suffix> q_a,q_b"
  * }}}
  *
  * Writes `<outDir>/<query>_<suffix>.txt`. Runs on the bench session
  * shape (local[cpus from SPARK_GRAFT_CPUS], extensions active,
  * shuffle.partitions = cpus) so the dumped plans are the plans the
  * bench executes.
  */
object ExplainQueries {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: ExplainQueries <dataDir> <outDir> <suffix> <q1,q2,...>")
    val Array(dir, outDir, suffix, names) = args
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val plan =
        try SparkEntry.queries(name)(spark, dir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"ERROR: ${e.getMessage}\n" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

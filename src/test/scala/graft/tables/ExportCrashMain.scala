package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Subprocess target for [[DeltaExportCrashSpec]]: builds a table and
  * exports its `_delta_log` commit-by-commit until the 10-commit
  * checkpoint cadence fires, with `checkpointPartActions=1` so the
  * checkpoint publishes as MANY multi-part files — a wide window for
  * the parent spec to SIGKILL this JVM mid-publish (after the log
  * entry, before `_last_checkpoint` flips). Prints DRAINED only if it
  * survives to the end, so the spec can detect a missed kill.
  *
  * Usage: ExportCrashMain <tablePath> <sfDir>
  */
object ExportCrashMain {
  def main(args: Array[String]): Unit = {
    val tablePath = args(0)
    val sfDir = args(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.export.checkpointPartActions", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"))
    val t = ResourceTable(spark, tablePath)
      .createIfNotExists(cust.schema)
    t.upsert(cust, "c_custkey")
    DeltaExport.export(t)
    // one export per commit: delta version tracks graft version, so
    // the checkpoint fires inside the 11th-ish export call below and
    // the parent kills us inside writeCheckpoint/publishCheckpoint
    (1 to 14).foreach { i =>
      t.upsert(cust.filter(col("c_custkey") % 17 === i % 17)
        .withColumn("c_acctbal", col("c_acctbal") + i * 10.0),
        "c_custkey")
      DeltaExport.export(t)
    }
    println("DRAINED")
    spark.stop()
  }
}

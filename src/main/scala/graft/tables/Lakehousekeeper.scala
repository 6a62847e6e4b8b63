package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Batch maintenance CLI over every table under a database dir — the
  * reference's `lakehousekeeper` (bzkf/fhir-to-lakehouse
  * src/lakehousekeeper.py:101–291): vacuum / optimize / register, one
  * command over all discovered tables.
  *
  * Table discovery (S7) uses the Hadoop FS API (works on HDFS/S3A the
  * same as local disk), replacing the reference's boto3
  * `list_objects_v2` prefix walk (lakehousekeeper.py:59–98).
  *
  * Registration (S6) mirrors the reference's string-derived naming
  * (lakehousekeeper.py:255–291): `.../default/Patient.parquet` →
  * schema `default`, table `Patient` — `CREATE SCHEMA IF NOT EXISTS` +
  * `CREATE TABLE IF NOT EXISTS ... USING parquet LOCATION`, pointed at
  * the table's current snapshot directory.
  */
object Lakehousekeeper {

  /** List table roots (directories containing a `_log`) under `dir`. */
  def listTables(spark: SparkSession, dir: String): Seq[String] = {
    val root = new HPath(dir)
    val fs: FileSystem = root.getFileSystem(
      spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => fs.exists(new HPath(p, "_log")))
      .map(_.toString)
      .sorted
  }

  def vacuum(spark: SparkSession, dir: String,
             retentionHours: Long = 24, dryRun: Boolean = false): Seq[(String, Int)] =
    listTables(spark, dir).map { p =>
      val t = ResourceTable(spark, p)
      val n = if (dryRun) 0 else t.vacuum(retentionHours * 3600 * 1000)
      p -> n
    }

  def optimize(spark: SparkSession, dir: String,
               numFiles: Int = 4): Seq[String] =
    listTables(spark, dir).map { p =>
      ResourceTable(spark, p).optimize(numFiles); p
    }

  /** schema/table name from the path, exactly the reference's string
    * derivation: parent dir name → schema, file stem → table.
    */
  def tableName(path: String): (String, String) = {
    val p = new HPath(path)
    val table = p.getName.stripSuffix(".parquet")
    val schema = p.getParent.getName
    (schema, table)
  }

  def register(spark: SparkSession, dir: String): Seq[String] =
    listTables(spark, dir).map { p =>
      val (schema, table) = tableName(p)
      val t = ResourceTable(spark, p)
      // resolve the dir through the commit log — snapshot dirs are
      // writer-unique (snap-<v>-<uuid>), never derived by naming
      val snap = t.latestVersion
        .map(t.snapshotLocation)
        .getOrElse(throw new IllegalStateException(s"no snapshot in $p"))
      spark.sql(s"CREATE SCHEMA IF NOT EXISTS `$schema`")
      // point the external table at the current snapshot; re-register
      // after mutations to roll the pointer forward
      spark.sql(s"DROP TABLE IF EXISTS `$schema`.`$table`")
      spark.sql(
        s"CREATE TABLE `$schema`.`$table` USING parquet LOCATION '$snap'")
      s"$schema.$table"
    }

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("help")
    val dir = args.lift(1).getOrElse("/tmp/graft/delta/default")
    if (cmd == "help") {
      System.err.println(
        "usage: lakehousekeeper vacuum|optimize|register <databaseDir> [retentionHours|numFiles]")
      return
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      cmd match {
        case "vacuum" =>
          val hours = args.lift(2).map(_.toLong).getOrElse(24L)
          val dry = args.lift(3).contains("dry") // VACUUM ... DRY RUN parity
          vacuum(spark, dir, hours, dry).foreach { case (p, n) =>
            println(s"vacuumed $p: $n snapshots removed" +
              (if (dry) " (dry run)" else ""))
          }
        case "optimize" =>
          val files = args.lift(2).map(_.toInt).getOrElse(4)
          optimize(spark, dir, files).foreach(p => println(s"optimized $p"))
        case "register" =>
          register(spark, dir).foreach(n => println(s"registered $n"))
        case other =>
          System.err.println(s"unknown command: $other"); sys.exit(2)
      }
    } finally spark.stop()
  }
}

package graft

/** Scratch driver: run each generated subquery SQL through spark.sql
  * and report seeds that CRASH (as opposed to diverge) — used to
  * triage planner errors the fuzz campaign surfaces.
  * `Test/runMain graft.SubfuzzRepro [n]`
  */
object SubfuzzRepro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400)
    val spark = SparkSpec.spark
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_FUZZ_SF",
      "/root/testdata/sf0.01")
    val s = new SubqueryFuzzSpec
    Seq("lineitem", "orders", "customer", "nation", "supplier", "part",
      "region").foreach(t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t))
    val empt = scala.collection.mutable.Map.empty[Int, Int]
    val tot = scala.collection.mutable.Map.empty[Int, Int]
    (1 to n).foreach { seed =>
      val shape = new scala.util.Random(seed).nextInt(18000) % 18
      tot(shape) = tot.getOrElse(shape, 0) + 1
      val sql = s.genSql(seed)
      try {
        if (spark.sql(sql).isEmpty) empt(shape) = empt.getOrElse(shape, 0) + 1
      }
      catch { case e: Throwable =>
        println(s"CRASH seed=$seed: ${e.getMessage.take(200)}")
        println(s"SQL: $sql")
      }
    }
    (0 to 17).foreach(k => println(s"shape $k: ${empt.getOrElse(k,0)}/${tot.getOrElse(k,0)} empty"))
    println("DONE")
    spark.stop()
  }
}

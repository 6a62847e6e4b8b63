package graft

/** Scratch probe: does Spark 4.1.2 survive DISJUNCTIVE correlation in
  * scalar-aggregate and LATERAL subqueries (the shapes
  * DisjunctiveCorrelationCheck deliberately leaves alone on the claim
  * that DecorrelateInnerQuery plans them via domain joins)?
  * `Test/runMain graft.ScalarDisjRepro`
  */
object ScalarDisjRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_FUZZ_SF",
      "/root/testdata/sf0.01")
    Seq("nation", "customer", "supplier").foreach(t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t))
    val probes = Seq(
      "scalar agg, corr AND p1 OR p2 (seed-397 precedence shape)" ->
        """SELECT n_nationkey,
          |  (SELECT count(*) FROM customer
          |   WHERE c_nationkey = nation.n_nationkey
          |     AND (c_custkey % 3) = 0 OR (c_custkey % 7) = 1) AS v
          |FROM nation""".stripMargin,
      "scalar agg, (corr AND p1) OR (corr AND p2)" ->
        """SELECT n_nationkey,
          |  (SELECT max(c_custkey) FROM customer
          |   WHERE (c_nationkey = nation.n_nationkey AND (c_custkey % 3) = 0)
          |      OR (c_nationkey = nation.n_nationkey AND (c_custkey % 7) = 1)) AS v
          |FROM nation""".stripMargin,
      "scalar agg, corr OR uncorrelated arm" ->
        """SELECT n_nationkey,
          |  (SELECT count(*) FROM customer
          |   WHERE c_nationkey = nation.n_nationkey OR (c_custkey % 100) = 5) AS v
          |FROM nation""".stripMargin,
      "LATERAL agg with disjunctive correlation" ->
        """SELECT n_nationkey, t.cnt FROM nation,
          |LATERAL (SELECT count(*) AS cnt FROM supplier
          |         WHERE s_nationkey = nation.n_nationkey
          |            OR (s_suppkey % 9) = 2) t""".stripMargin)
    probes.foreach { case (label, sql) =>
      try {
        val n = spark.sql(sql).count()
        println(s"OK    [$label] rows=$n")
      } catch { case e: Throwable =>
        println(s"CRASH [$label] ${e.getClass.getSimpleName}: " +
          e.getMessage.take(300).replace('\n', ' '))
      }
    }
    println("DONE")
    spark.stop()
  }
}

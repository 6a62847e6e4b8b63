package graft

/** Scratch driver for the disjunctive-correlation rewrite: runs the
  * triaged crash shapes (BASELINE.md round 18, SubfuzzRepro seeds
  * 93/248/397) plus variants through the extension-built session and
  * prints row counts for a DuckDB cross-check.
  * `Test/runMain graft.DisjunctiveRepro`
  */
object DisjunctiveRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_FUZZ_SF",
      "/root/testdata/sf0.01")
    Seq("lineitem", "orders", "customer", "nation", "supplier", "part",
      "region").foreach(t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t))
    val cases = Seq(
      "single_level" ->
        ("SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM " +
          "orders WHERE o_custkey = customer.c_custkey AND " +
          "(o_orderkey % 7) = 2 OR (o_orderkey % 11) = 3)"),
      "not_exists" ->
        ("SELECT c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 " +
          "FROM orders WHERE o_custkey = customer.c_custkey AND " +
          "(o_orderkey % 7) = 2 OR (o_orderkey % 11) = 3)"),
      "in_disjunctive" ->
        ("SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT " +
          "o_custkey FROM orders WHERE o_custkey = customer.c_custkey " +
          "AND (o_orderkey % 7) = 2 OR (o_orderkey % 11) = 3)"),
      "nested" ->
        ("SELECT n_nationkey FROM nation WHERE EXISTS (SELECT 1 FROM " +
          "customer WHERE c_nationkey = nation.n_nationkey AND EXISTS " +
          "(SELECT 1 FROM orders WHERE o_custkey = customer.c_custkey " +
          "AND (o_orderkey % 7) = 2) AND (c_custkey % 3) = 1 OR " +
          "(c_custkey % 5) = 2)"),
      "three_way" ->
        ("SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM " +
          "orders WHERE (o_custkey = customer.c_custkey AND " +
          "(o_orderkey % 7) = 2) OR (o_custkey = customer.c_custkey " +
          "AND (o_orderkey % 5) = 1) OR (o_orderkey % 13) = 4)"),
      "and_over_or" ->
        ("SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM " +
          "orders WHERE (o_orderkey % 2) = 0 AND (o_custkey = " +
          "customer.c_custkey OR (o_orderkey % 11) = 3))"),
      "not_over_or" ->
        ("SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM " +
          "orders WHERE NOT (o_custkey = customer.c_custkey OR " +
          "(o_orderkey % 3) = 1))"),
      "scalar_disjunctive" ->
        ("SELECT c_custkey, (SELECT count(*) FROM orders WHERE " +
          "o_custkey = customer.c_custkey OR (o_orderkey % 997) = 3) " +
          "AS v FROM customer"),
      "conjunctive_control" ->
        ("SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM " +
          "orders WHERE o_custkey = customer.c_custkey AND " +
          "((o_orderkey % 7) = 2 OR (o_orderkey % 11) = 3))"))
    cases.foreach { case (name, sql) =>
      val res =
        try spark.sql(sql).count().toString
        catch { case e: Throwable =>
          s"ERROR ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).replace('\n', ' ').take(300)
        }
      println(s"CASE $name -> $res")
    }
    println("DONE")
    spark.stop()
  }
}

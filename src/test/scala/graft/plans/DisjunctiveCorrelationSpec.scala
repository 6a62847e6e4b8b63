package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{AnalysisException, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Exists, Or}
import org.apache.spark.sql.functions._

/** The disjunctive-correlation rewrite (BASELINE.md round-18 triage:
  * stock Spark 4.1.2 dies with None.get /
  * INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on these legal shapes).
  * Identity checks run the SQL through the extension-rewritten path
  * and compare against the same semantics composed from semi-joins on
  * the DataFrame API (no subquery decorrelation involved); refusal
  * checks pin the clean named error for out-of-scope shapes.
  */
class DisjunctiveCorrelationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val customer = spark.read.parquet(s"$sf/customer.parquet")
  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")
  private lazy val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")

  private def views(): Unit = {
    customer.createOrReplaceTempView("customer_djs")
    orders.createOrReplaceTempView("orders_djs")
  }

  private def keySet(df: DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("disjunctive EXISTS splits to OR of conjunctive branches " +
    "and matches semi-join semantics") {
    views()
    val got = spark.sql(
      """SELECT CAST(c_custkey AS BIGINT) AS k FROM customer_djs
        |WHERE EXISTS (SELECT 1 FROM orders_djs
        |  WHERE o_custkey = customer_djs.c_custkey
        |    AND (o_orderkey % 7) = 2 OR (o_orderkey % 5) = 1
        |        AND o_custkey = customer_djs.c_custkey)""".stripMargin)
    // same semantics, no subqueries: customers having an order with
    // orderkey%7==2 or orderkey%5==1
    val matching = orders
      .filter(col("o_orderkey") % 7 === 2 || col("o_orderkey") % 5 === 1)
      .select(col("o_custkey"))
    val expected = customer
      .join(matching, col("c_custkey") === col("o_custkey"), "leftsemi")
      .select(col("c_custkey").cast("long"))
    assert(keySet(got) == keySet(expected))
    assert(keySet(got).nonEmpty, "vacuous fixture")
    // and the branches really are split: the analyzed filter carries
    // an OR of two conjunctive Exists, not one disjunctive Exists
    val existsCnt = got.queryExecution.analyzed.collect { case op =>
      op.expressions.map(_.collect { case e: Exists => e }.size).sum
    }.sum
    assert(existsCnt == 2, s"expected 2 split branches, got $existsCnt")
  }

  test("disjunctive NOT EXISTS (De Morgan over the split) matches " +
    "anti-join semantics") {
    views()
    val got = spark.sql(
      """SELECT CAST(c_custkey AS BIGINT) AS k FROM customer_djs
        |WHERE NOT EXISTS (SELECT 1 FROM orders_djs
        |  WHERE o_custkey = customer_djs.c_custkey
        |    AND (o_orderkey % 7) = 2 OR (o_orderkey % 5) = 1
        |        AND o_custkey = customer_djs.c_custkey)""".stripMargin)
    val matching = orders
      .filter(col("o_orderkey") % 7 === 2 || col("o_orderkey") % 5 === 1)
      .select(col("o_custkey"))
    val expected = customer
      .join(matching, col("c_custkey") === col("o_custkey"), "leftanti")
      .select(col("c_custkey").cast("long"))
    assert(keySet(got) == keySet(expected))
  }

  test("disjunctive IN splits on the ListQuery path and matches") {
    views()
    val got = spark.sql(
      """SELECT CAST(c_custkey AS BIGINT) AS k FROM customer_djs
        |WHERE c_custkey IN (SELECT o_custkey FROM orders_djs
        |  WHERE o_custkey = customer_djs.c_custkey
        |    AND (o_orderkey % 7) = 2 OR (o_orderkey % 11) = 3)""".stripMargin)
    // branch 1: correlated — custkeys with an order orderkey%7==2;
    // branch 2: uncorrelated value set — custkeys of orders with
    // orderkey%11==3 (IN c_custkey = semi-join against that set)
    val matching = orders
      .filter(col("o_orderkey") % 7 === 2 || col("o_orderkey") % 11 === 3)
      .select(col("o_custkey"))
    val expected = customer
      .join(matching, col("c_custkey") === col("o_custkey"), "leftsemi")
      .select(col("c_custkey").cast("long"))
    assert(keySet(got) == keySet(expected))
    assert(keySet(got).nonEmpty, "vacuous fixture")
  }

  test("AND distributes over the correlated OR (not a plain " +
    "top-level split)") {
    views()
    val got = spark.sql(
      """SELECT CAST(c_custkey AS BIGINT) AS k FROM customer_djs
        |WHERE EXISTS (SELECT 1 FROM orders_djs
        |  WHERE (o_orderkey % 2) = 0
        |    AND (o_custkey = customer_djs.c_custkey
        |         OR (o_orderkey % 11) = 3))""".stripMargin)
    val evenOrders = orders.filter(col("o_orderkey") % 2 === 0)
    val anyEvenMod11 = !evenOrders
      .filter(col("o_orderkey") % 11 === 3).isEmpty
    val expected =
      if (anyEvenMod11)
        customer.select(col("c_custkey").cast("long"))
      else customer.join(evenOrders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "leftsemi")
        .select(col("c_custkey").cast("long"))
    assert(keySet(got) == keySet(expected))
  }

  test("conjunctive correlation is left untouched (no false trigger)") {
    views()
    val got = spark.sql(
      """SELECT CAST(c_custkey AS BIGINT) AS k FROM customer_djs
        |WHERE EXISTS (SELECT 1 FROM orders_djs
        |  WHERE o_custkey = customer_djs.c_custkey
        |    AND ((o_orderkey % 7) = 2 OR (o_orderkey % 5) = 1))""".stripMargin)
    val filterExprs = got.queryExecution.analyzed.collect { case op =>
      op.expressions
    }.flatten
    val existsCnt = filterExprs.map(_.collect { case e: Exists => e }.size).sum
    assert(existsCnt == 1, "conjunctive shape must not be split")
    val orOfExists = filterExprs.exists(_.collect {
      case Or(_: Exists, _) => true
      case Or(_, _: Exists) => true
    }.nonEmpty)
    assert(!orOfExists)
  }

  test("a NESTED one-hop-correlated EXISTS under an OR is not " +
    "this-level correlation: no split, no refusal, correct result") {
    views()
    // the nested subquery's outerAttrs wrap OuterReferences to the
    // MID scope (orders) — precision regression guard: detection must
    // stop at nested subquery boundaries or this legal,
    // Spark-supported shape would split needlessly (or refuse in
    // non-splittable positions)
    lineitem.createOrReplaceTempView("lineitem_djs")
    val got = spark.sql(
      """SELECT CAST(c_custkey AS BIGINT) AS k FROM customer_djs
        |WHERE EXISTS (SELECT 1 FROM orders_djs
        |  WHERE o_custkey = customer_djs.c_custkey
        |    AND ((o_orderkey % 3) = 1
        |         OR EXISTS (SELECT 1 FROM lineitem_djs
        |                    WHERE l_orderkey = orders_djs.o_orderkey
        |                      AND l_quantity > 45)))""".stripMargin)
    val outerExists = got.queryExecution.analyzed.collect { case op =>
      op.expressions.map(_.collect { case e: Exists => e }.size).sum
    }.sum
    assert(outerExists == 1,
      s"outer filter split needlessly: $outerExists Exists nodes")
    val bigItems = lineitem.filter(col("l_quantity") > 45)
      .select(col("l_orderkey"))
    val matching = orders
      .join(bigItems, col("o_orderkey") === col("l_orderkey"), "leftsemi")
      .select(col("o_custkey"))
      .union(orders.filter(col("o_orderkey") % 3 === 1)
        .select(col("o_custkey")))
    val expected = customer
      .join(matching, col("c_custkey") === col("o_custkey"), "leftsemi")
      .select(col("c_custkey").cast("long"))
    assert(keySet(got) == keySet(expected))
    assert(keySet(got).nonEmpty, "vacuous fixture")
  }

  test("out-of-scope shape (LIMIT above the filter) refuses with the " +
    "named error, not an internal one") {
    views()
    val e = intercept[AnalysisException] {
      spark.sql(
        """SELECT c_custkey FROM customer_djs
          |WHERE EXISTS (SELECT 1 FROM orders_djs
          |  WHERE o_custkey = customer_djs.c_custkey
          |    AND (o_orderkey % 7) = 2 OR (o_orderkey % 5) = 1
          |        AND o_custkey = customer_djs.c_custkey
          |  LIMIT 5)""".stripMargin).collect()
    }
    assert(e.getMessage.contains("GRAFT_DISJUNCTIVE_CORRELATION"),
      s"wanted the named refusal, got: ${e.getMessage.take(200)}")
  }

  test("past the expansion cap refuses cleanly") {
    views()
    // (corr OR a1) AND ... five times = 2^5 = 32 branches > cap 16
    val factors = (1 to 5).map(i =>
      s"(o_custkey = customer_djs.c_custkey OR (o_orderkey % ${i + 2}) = 1)")
      .mkString(" AND ")
    val e = intercept[AnalysisException] {
      spark.sql(
        s"""SELECT c_custkey FROM customer_djs
           |WHERE EXISTS (SELECT 1 FROM orders_djs
           |  WHERE $factors)""".stripMargin).collect()
    }
    assert(e.getMessage.contains("GRAFT_DISJUNCTIVE_CORRELATION"),
      s"wanted the named refusal, got: ${e.getMessage.take(200)}")
  }

  test("within-cap multi-factor distribution still executes and matches") {
    views()
    // (corr OR a1) AND (corr OR a2) = 4 branches, under the cap
    val got = spark.sql(
      """SELECT CAST(c_custkey AS BIGINT) AS k FROM customer_djs
        |WHERE EXISTS (SELECT 1 FROM orders_djs
        |  WHERE (o_custkey = customer_djs.c_custkey
        |         OR (o_orderkey % 7) = 2)
        |    AND (o_custkey = customer_djs.c_custkey
        |         OR (o_orderkey % 5) = 1))""".stripMargin)
    // rows satisfying the product: corr, or (o%7==2 AND o%5==1 on the
    // same order), or... — easiest faithful model: filter orders per
    // customer via a join and test the original predicate directly
    val expected = customer.as("c")
      .join(orders.as("o"),
        (col("o.o_custkey") === col("c.c_custkey") ||
          col("o.o_orderkey") % 7 === 2) &&
          (col("o.o_custkey") === col("c.c_custkey") ||
            col("o.o_orderkey") % 5 === 1), "leftsemi")
      .select(col("c_custkey").cast("long"))
    assert(keySet(got) == keySet(expected))
  }
}

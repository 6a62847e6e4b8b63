package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Conditional MERGE builder: clause order, conditions over t./s.,
  * pre-merge assignment semantics, insert conditions, scope rules.
  */
class MergeBuilderSpec extends SparkSpec {
  import graft.SparkSpec._

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("v", IntegerType)))

  private def df(rows: (String, Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)

  private def fresh(prefix: String, rows: (String, Int)*): ResourceTable = {
    val t = ResourceTable(spark, s"${tmpDir(prefix)}/T.parquet")
      .createIfNotExists(schema)
    t.upsert(df(rows: _*), "id")
    t
  }

  test("conditional update + delete + conditional insert in one commit") {
    val t = fresh("mb", "a" -> 1, "b" -> 2, "c" -> 30, "d" -> 40)
    val v = t.latestVersion.get
    // source: touch a (small, update), c (big, delete), e (new, keep),
    // f (new, filtered out by the insert condition)
    t.merge(df("a" -> 100, "c" -> 0, "e" -> 5, "f" -> -5), "id")
      .whenMatchedDelete(col("t.v") >= 10)
      .whenMatchedUpdate(Map("v" -> (col("t.v") + col("s.v"))))
      .whenNotMatchedInsert(col("s.v") > 0)
      .execute()
    assert(t.latestVersion.contains(v + 1), "exactly one commit")
    assert(t.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 101, "b" -> 2, "d" -> 40, "e" -> 5))
  }

  test("clause ORDER decides: first-true wins") {
    val t = fresh("mbord", "x" -> 7)
    // update listed first: the row updates even though the delete's
    // condition would also hold
    t.merge(df("x" -> 1), "id")
      .whenMatchedUpdate(Map("v" -> lit(0)))
      .whenMatchedDelete()
      .execute()
    assert(t.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap == Map("x" -> 0))
    val t2 = fresh("mbord2", "x" -> 7)
    t2.merge(df("x" -> 1), "id")
      .whenMatchedDelete()
      .whenMatchedUpdate(Map("v" -> lit(0)))
      .execute()
    assert(t2.read().count() == 0)
  }

  test("matched row selected by no clause carries unchanged") {
    val t = fresh("mbskip", "a" -> 1, "b" -> 2)
    t.merge(df("a" -> 9, "b" -> 9), "id")
      .whenMatchedUpdate(Map("v" -> lit(99)), col("t.v") >= 2)
      .execute()
    assert(t.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap == Map("a" -> 1, "b" -> 99))
  }

  test("assignments see PRE-merge values on both sides") {
    val t = fresh("mbpre", "a" -> 10)
    t.merge(df("a" -> 3), "id")
      .whenMatchedUpdate(Map("v" -> (col("t.v") * col("s.v"))))
      .execute()
    assert(t.read().head.getInt(1) == 30)
  }

  test("builder works through a column-mapping rename") {
    val t = fresh("mbcm", "a" -> 1, "b" -> 20)
    t.enableColumnMapping()
    t.renameColumn("v", "value")
    t.merge(df("a" -> 5, "z" -> 9).toDF("id", "value"), "id")
      .whenMatchedUpdate(Map("value" -> (col("t.value") + col("s.value"))))
      .whenNotMatchedInsert()
      .execute()
    assert(t.read().collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 6, "b" -> 20, "z" -> 9))
  }

  test("no clauses refuses; source-only merge inserts nothing matched") {
    val t = fresh("mbref", "a" -> 1)
    intercept[IllegalArgumentException](t.merge(df("a" -> 2), "id").execute())
    // delete-only merge with no match is a copy-forward commit
    t.merge(df("zzz" -> 0), "id").whenMatchedDelete().execute()
    assert(t.read().count() == 1)
  }
}

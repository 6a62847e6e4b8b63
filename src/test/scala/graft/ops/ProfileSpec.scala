package graft.ops

import graft.SparkSpec

/** Hand-computed column profiles: nulls, exact distincts, string-cast
  * min/max, modal value with deterministic ties.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, distincts, min/max, modal value") {
    val df = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 20L),
      (3L, None, 10L), (4L, Some("a"), 30L), (5L, Some("b"), 10L)
    ).toDF("id", "tag", "v")
    val m = Profile.profile(df, Seq("id", "tag", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m.keySet == Set("id", "tag", "v"))
    val id = m("id")
    assert(id.getAs[Long]("n") == 5 && id.getAs[Long]("n_null") == 0)
    assert(id.getAs[Long]("n_distinct") == 5)
    assert(id.getAs[String]("min_value") == "1")
    assert(id.getAs[String]("max_value") == "5")
    assert(id.getAs[Long]("top_count") == 1)
    assert(id.getAs[String]("top_value") == "1") // all tie → value asc
    val tag = m("tag")
    assert(tag.getAs[Long]("n_null") == 1)
    assert(tag.getAs[Long]("n_distinct") == 2)
    // a/b both appear twice (nulls excluded) → tie breaks to "a"
    assert(tag.getAs[String]("top_value") == "a")
    assert(tag.getAs[Long]("top_count") == 2)
    val v = m("v")
    assert(v.getAs[String]("top_value") == "10")
    assert(v.getAs[Long]("top_count") == 3)
    assert(v.getAs[String]("min_value") == "10")
    assert(v.getAs[String]("max_value") == "30")
  }

  test("profile: an all-null column has no modal row (left join keeps it)") {
    val df = Seq((1L, Option.empty[String]), (2L, None))
      .toDF("id", "dead")
    val m = Profile.profile(df, Seq("dead")).collect()
    assert(m.length == 1)
    assert(m(0).getAs[Long]("n_null") == 2)
    assert(m(0).getAs[Long]("n_distinct") == 0)
    assert(m(0).isNullAt(m(0).fieldIndex("top_value")))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused curation funnel against its unfused building blocks, and
  * the incremental refresh against full recomputation — including the
  * cross-doc couplings the synthetic corpus cannot produce by chance:
  * exact-duplicate texts whose keeper is deleted (successor election)
  * or undercut by a smaller inserted id (keeper theft).
  */
class CurationSpec extends SparkSpec {
  import graft.SparkSpec._

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // varied enough to trip every stage: the/stopword-rich English that
  // passes quality, terse junk that fails it, German that fails the
  // language gate, exact duplicates, and one doc sharing a long
  // passage with the benchmark
  private val passage =
    "the quick brown fox jumps over the lazy dog again and again"
  private def longEn(tag: String) =
    s"the cat is in the house and it is a good day to read $tag " +
      "because the weather is nice and the coffee is warm today"
  private val corpus = Seq(
    1L -> longEn("one"),
    2L -> longEn("two"),
    3L -> longEn("dup"), // duplicate group {3, 5, 9}
    5L -> longEn("dup"),
    9L -> longEn("dup"),
    6L -> s"the story begins here $passage and the story ends here ok",
    7L -> "der hund ist nicht ein gutes beispiel und das ist schade",
    8L -> "x! y? z.",
    10L -> "") // empty doc: no tokens, no shingles
  private val bench = Seq(100L -> s"benchmark holdout $passage tail")

  test("qualityScoreCol and langIdCol match their DataFrame forms " +
      "bit-for-bit") {
    val df = docsDf(corpus: _*)
    val fused = df.select(col("doc_id"),
      TextStats.qualityScoreCol(col("text")).as("s"),
      TextStats.langIdCol(col("text")).as("l"))
    val unfused = TextStats.langId(TextStats.qualityScore(df))
      .select(col("doc_id"), col("quality_score").as("s"),
        col("predicted_lang").as("l"))
    assert(fused.exceptAll(unfused).isEmpty &&
      unfused.exceptAll(fused).isEmpty)
  }

  test("charShinglesCol: distinct first-occurrence shingles, empty " +
      "below the width") {
    val df = docsDf(1L -> "abcabc", 2L -> "abc", 3L -> "", 4L -> "abcd")
    val got = df.select(col("doc_id"),
        TextStats.charShinglesCol(col("text"), 4).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("abca", "bcab", "cabc")) // "abca" once
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq.empty)
    assert(got(4L) == Seq("abcd"))
  }

  test("bloom_admitted_shingles ≡ filter(charShinglesCol, " +
      "might_contain(xxhash64)) — ASCII and multi-byte UTF-8") {
    import graft.functions.BloomExpressions._
    val texts = docsDf(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "的是了在和有的是了在和有 mixed 宽字符 with ascii tail",
      3L -> "ééééé àààà ü five wide chars repeated ééééé",
      4L -> "short",
      5L -> "aaaaaaaaaaaaaaaaaaaaaaaa") // all windows identical
    val n = 7
    val benchSh = texts.filter(col("doc_id").isin(1L, 2L, 3L))
      .select(explode(TextStats.charShinglesCol(col("text"), n)).as("sh"))
      .distinct()
    val bf = benchSh.select(xxhash64(col("sh")).as("l"))
      .stat.bloomFilter("l", math.max(benchSh.count(), 1L), 0.01)
    val native = texts.select(col("doc_id"),
      bloom_admitted_shingles(bf, col("text"), n).as("sh"))
    val hof = texts.select(col("doc_id"),
      filter(TextStats.charShinglesCol(col("text"), n),
        sh => might_contain_long(bf, xxhash64(sh))).as("sh"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // doc 5: every window is "aaaaaaa" — admitted at most once
    val d5 = native.filter(col("doc_id") === 5L)
      .select(col("sh")).collect()(0).getSeq[String](0)
    assert(d5.distinct == d5)
  }

  test("flags matches the unfused stage-by-stage reference") {
    val c = docsDf(corpus: _*)
    val b = docsDf(bench: _*)
    val got = Curation.flags(c, b, n = 10)
    // unfused reference: each stage from first principles
    val lang = TextStats.langId(c)
      .select(col("doc_id"), (col("predicted_lang") === "en").as("f1"))
    val qual = TextStats.qualityScore(c)
      .select(col("doc_id"), col("keep"))
    val cont = TextStats.contamination(c, b, n = 10)
      .select(col("doc_id"), (col("n_overlap") === 0).as("clean"))
    val base = c.select(col("doc_id"), md5(col("text")).as("h"))
      .join(lang, Seq("doc_id")).join(qual, Seq("doc_id"))
      .join(cont, Seq("doc_id"))
      .withColumn("f2", col("f1") && col("keep"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val ref = base
      .withColumn("f3", col("f2") &&
        col("doc_id") === min(when(col("f2"), col("doc_id"))).over(w))
      .withColumn("f4", col("f3") && col("clean"))
      .select(col("doc_id"), col("h"), col("f1"), col("f2"),
        col("clean"), col("f3"), col("f4"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    // sanity on the fixture itself: the dup group elected doc 3, the
    // German doc failed f1, the contaminated doc 6 failed f4 only
    val m = got.collect().map(r => r.getLong(0) ->
      (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6))).toMap
    assert(m(3L) == ((true, true, true, true, true)))
    assert(m(5L)._4 == false && m(9L)._4 == false) // lost keepership
    assert(m(7L)._1 == false)
    assert(m(6L) == ((true, true, false, true, false)))
  }

  test("refreshFlags ≡ full recompute under keeper deletion, keeper " +
      "theft, update re-hash, and plain churn") {
    val c0 = docsDf(corpus: _*)
    val b = docsDf(bench: _*)
    val bx = Curation.benchmarkIndex(b, n = 10)
    val flags0 = Curation.flags(c0, bx, "doc_id", "text")
      .localCheckpoint(true)
    // the batch: delete keeper 3 (group {3,5,9} would re-elect 5),
    // insert 4 with the dup text (steals keepership from 5), update
    // doc 1's text (hash moves groups), delete singleton 8, insert
    // fresh 11
    val changes = docsDf(
        3L -> longEn("dup"),
        8L -> "x! y? z.")
      .withColumn("_change_type", lit("delete"))
      .unionByName(docsDf(
          4L -> longEn("dup"),
          11L -> longEn("eleven"))
        .withColumn("_change_type", lit("insert")))
      .unionByName(docsDf(1L -> longEn("one"))
        .withColumn("_change_type", lit("update_preimage")))
      .unionByName(docsDf(1L -> longEn("one rewritten"))
        .withColumn("_change_type", lit("update_postimage")))
    val refreshed = Curation.refreshFlags(flags0, changes, bx,
      "doc_id", "text")
    val post = docsDf((corpus.filterNot(r =>
        Set(3L, 8L, 1L).contains(r._1)) ++
      Seq(4L -> longEn("dup"), 11L -> longEn("eleven"),
        1L -> longEn("one rewritten"))): _*)
    val rebuilt = Curation.flags(post, bx, "doc_id", "text")
    assert(refreshed.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(refreshed).isEmpty)
    // the theft actually happened: 4 is the new keeper, 5 and 9 are not
    val m = refreshed.collect().map(r => r.getLong(0) ->
      r.getBoolean(5)).toMap
    assert(m(4L) && !m(5L) && !m(9L))
    assert(!m.contains(3L) && !m.contains(8L))
  }

  test("stages of refreshed flags equals stages of rebuilt flags") {
    val c0 = docsDf(corpus: _*)
    val b = docsDf(bench: _*)
    val bx = Curation.benchmarkIndex(b, n = 10)
    val flags0 = Curation.flags(c0, bx, "doc_id", "text")
      .localCheckpoint(true)
    val changes = docsDf(6L ->
        s"the story begins here $passage and the story ends here ok")
      .withColumn("_change_type", lit("delete"))
    val a = Curation.stages(
      Curation.refreshFlags(flags0, changes, bx, "doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val post = docsDf(corpus.filterNot(_._1 == 6L): _*)
    val e = Curation.stages(Curation.flags(post, bx, "doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == e)
    assert(a("corpus") == corpus.size - 1L)
  }

  test("property: three rounds of seeded random churn keep the " +
      "refreshed state identical to a rebuild — duplicates, empty " +
      "docs, re-deliveries and all") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("the", "a", "of", "and", "to", "in", "is", "it",
      "der", "und", "fox", "dog", "table", "query", "stream", "value")
    def text(): String = {
      val n = rnd.nextInt(30)
      // ~1/5 docs share one of 8 canned texts: real duplicate groups
      if (rnd.nextInt(5) == 0)
        s"the shared passage number ${rnd.nextInt(8)} of this corpus " +
          "is long enough to pass the quality gate and it is in " +
          "english for the language gate"
      else Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    var live = scala.collection.mutable.Map(
      (0L until 120L).map(i => i -> text()): _*)
    val bench = docsDf(9000L ->
      ("benchmark " + Seq.fill(40)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    val bx = Curation.benchmarkIndex(bench, n = 10)
    var state = Curation.flags(
      docsDf(live.toSeq.sortBy(_._1): _*), bx, "doc_id", "text")
      .localCheckpoint(true)
    var nextId = 200L
    (1 to 3).foreach { round =>
      // random churn: deletes of live ids, inserts of fresh ids,
      // updates (delete+insert at the CDF level) of live ids
      val ids = live.keys.toVector.sorted
      val dels = rnd.shuffle(ids).take(10)
      val upds = rnd.shuffle(ids.filterNot(dels.contains)).take(10)
      val ins = (0 until 15).map { _ => val id = nextId; nextId += 1
        id -> text() }
      val updRows = upds.map(id => id -> text())
      val changes = docsDf(dels.map(id => id -> live(id)) ++
          upds.map(id => id -> live(id)): _*)
        .withColumn("_change_type", lit("delete"))
        .unionByName(docsDf(ins ++ updRows: _*)
          .withColumn("_change_type", lit("insert")))
      dels.foreach(live.remove)
      updRows.foreach { case (id, tx) => live(id) = tx }
      ins.foreach { case (id, tx) => live(id) = tx }
      state = Curation.refreshFlags(state, changes, bx,
        "doc_id", "text").localCheckpoint(true)
      val rebuilt = Curation.flags(
        docsDf(live.toSeq.sortBy(_._1): _*), bx, "doc_id", "text")
      assert(state.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(state).isEmpty,
        s"round $round: refreshed state diverged from rebuild")
    }
  }
}

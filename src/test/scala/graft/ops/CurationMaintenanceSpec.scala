package graft.ops

import graft.SparkSpec
import graft.tables.ResourceTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Continuous curation as table maintenance: [[Curation.maintainFlags]]
  * folds docs-table commits into a standing ACID flags table exactly
  * once — the watermark rides the SAME commit as the mutation, so
  * replays no-op and crashes cannot split compute from record.
  */
class CurationMaintenanceSpec extends SparkSpec {
  import graft.SparkSpec._
  import spark.implicits._

  private val flagSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("h", StringType),
    StructField("f1", BooleanType), StructField("f2", BooleanType),
    StructField("clean", BooleanType), StructField("f3", BooleanType),
    StructField("f4", BooleanType)))

  private def text(i: Long): String =
    if (i % 4 == 0)
      s"the shared passage number ${i % 3} is long enough to pass " +
        "the quality gate and it is in english for the language gate"
    else
      s"the document $i is about a fox and a dog in the house and " +
        "it is a good day to read because the weather is nice today"

  test("maintainFlags: seed, two incremental folds, idempotent " +
      "replay, flags always equal a rebuild") {
    val dir = tmpDir("curmaint")
    val docs = ResourceTable(spark, s"$dir/docs.parquet")
      .createIfNotExists(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType))))
    val flagsT = ResourceTable(spark, s"$dir/flags.parquet")
      .createIfNotExists(flagSchema)
    val bench = Seq(9000L -> ("benchmark holdout passage that is " +
      "quite long and unique")).toDF("doc_id", "text")
    val bx = Curation.benchmarkIndex(bench, n = 10)

    def checkAgainstRebuild(): Unit = {
      val rebuilt = Curation.flags(docs.read(), bx, "doc_id", "text")
      val state = flagsT.read()
      assert(state.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(state).isEmpty,
        "flags table diverged from a rebuild")
    }

    // seed
    docs.upsert((0L until 60L).map(i => i -> text(i)).toDF(
      "doc_id", "text"), "doc_id")
    val (v1, n1) = Curation.maintainFlags(docs, flagsT, bx)
    assert(v1 == docs.latestVersion.get && n1 == 60L)
    assert(flagsT.txnVersion("graft-curation").contains(v1))
    checkAgainstRebuild()

    // replay: nothing new — version unchanged, zero rows, no commit
    val headBefore = flagsT.latestVersion.get
    assert(Curation.maintainFlags(docs, flagsT, bx) == ((v1, 0L)))
    assert(flagsT.latestVersion.get == headBefore)

    // incremental fold over TWO docs commits: churn (updates move
    // hashes / duplicate keepers) then deletes
    docs.upsert(((60L until 80L).map(i => i -> text(i)) ++
        Seq(0L -> (text(0) + " v2"), 8L -> text(4))).toDF(
      "doc_id", "text"), "doc_id")
    docs.deleteWhere(col("doc_id") % 9 === 0)
    val (v2, n2) = Curation.maintainFlags(docs, flagsT, bx)
    assert(v2 == docs.latestVersion.get && v2 > v1)
    assert(n2 > 0L)
    assert(flagsT.txnVersion("graft-curation").contains(v2))
    checkAgainstRebuild()

    // an at-least-once re-drive of the same range is a no-op even if
    // called with a fresh table handle (watermark read from the head)
    val again = Curation.maintainFlags(docs,
      ResourceTable(spark, s"$dir/flags.parquet"), bx)
    assert(again == ((v2, 0L)))
    checkAgainstRebuild()

    // third fold after one more commit keeps converging
    docs.upsert(Seq(100L -> text(100), 101L -> "x! y? z.").toDF(
      "doc_id", "text"), "doc_id")
    val (v3, _) = Curation.maintainFlags(docs, flagsT, bx)
    assert(v3 == docs.latestVersion.get)
    checkAgainstRebuild()

    // docs history trimmed past the watermark: the CDF slice is gone —
    // maintenance falls back to a full reseed through the same
    // single-commit merge (watermark still rides the mutation) and
    // converges again afterwards
    docs.upsert(Seq(200L -> text(200)).toDF("doc_id", "text"),
      "doc_id")
    docs.deleteWhere(col("doc_id") === 100L)
    docs.vacuum(retentionMs = 0L)
    docs.cleanupMetadata(keepLast = 1)
    assert(!docs.versionExists(v3), "fixture should have trimmed v3")
    val (v4, n4) = Curation.maintainFlags(docs, flagsT, bx)
    assert(v4 == docs.latestVersion.get && n4 > 0L)
    assert(flagsT.txnVersion("graft-curation").contains(v4))
    checkAgainstRebuild()
    // and the fold after the reseed is incremental again
    docs.upsert(Seq(201L -> text(201)).toDF("doc_id", "text"),
      "doc_id")
    val (v5, _) = Curation.maintainFlags(docs, flagsT, bx)
    assert(v5 == docs.latestVersion.get)
    checkAgainstRebuild()
  }
}

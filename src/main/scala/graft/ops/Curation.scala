package graft.ops

import graft.functions.BloomExpressions.bloom_admitted_shingles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end curation funnel (FineWeb/RefinedWeb shape) as a
  * FUSED pipeline: language gate → quality-classifier keep → exact
  * keep-first dedup → benchmark decontamination, with per-doc stage
  * flags as the first-class product and per-stage survivor counts as
  * the report.
  *
  * Plan shape at 100 TB — the whole point of this module:
  *
  *  - ONE projection over ONE corpus scan computes every row-local
  *    stage input: content hash, language flag, quality flag, and the
  *    bloom-admitted shingle candidates ([[TextStats.langIdCol]] /
  *    [[TextStats.qualityScoreCol]] / [[TextStats.charShinglesCol]]
  *    are all codegen'd Column forms — the unfused funnel paid four
  *    corpus scans plus three doc-keyed joins for the same flags).
  *  - Decontamination splits Bloom-probe from exact-confirm: the
  *    probe runs INSIDE the projection over the doc's distinct
  *    shingle array (no explode for the clean ~99% of the corpus);
  *    only bloom-admitted shingles (true overlaps + the fpp fraction)
  *    are exploded and exact-confirmed against the benchmark set, so
  *    the expensive arm's input is benchmark-overlap-sized, not
  *    corpus-sized. Results are identical to the exploded
  *    [[TextStats.contaminationBloom]] path — the filter only admits
  *    a superset and survivors confirm exactly.
  *  - The only corpus-wide shuffle is the keep-first dedup window on
  *    the content hash (inherent: keeper election is per hash group),
  *    and the confirm verdict joins back as a broadcast.
  *
  * [[refreshFlags]] is the INCREMENTAL form over a table's change
  * feed: stage flags recompute only for changed docs, keeper election
  * re-runs only in hash groups the batch touched, everything else is
  * carried — O(state scan + changed docs), the corpus text is never
  * re-read (the [[Dedup.refreshBandedIndex]] contract; reference
  * inventory: the reference recomputes its pipeline per run and has
  * no incremental path — bzkf/fhir-to-lakehouse src/main.py runs the
  * full prepare/dedup chain on every batch).
  */
object Curation {

  /** Wide shingles by default: same-distribution synthetic prose
    * shares most 5-grams by chance — only real cross-split passages
    * match at 25 chars (q_curation_funnel's documented choice).
    */
  val DefaultShingleN = 25

  /** The decontamination side of the funnel, built ONCE and reused
    * across [[flags]]/[[refreshFlags]] calls: the benchmark's distinct
    * shingle set (the exact-confirm join side) plus its Bloom filter
    * (the in-projection gate). In a standing deployment this is the
    * artifact to persist — the benchmark is static across corpus
    * refreshes, and rebuilding it per call pays the explode + distinct
    * + treeAggregate jobs again for nothing.
    */
  final case class BenchmarkIndex(
      shingles: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      n: Int)

  /** Build a [[BenchmarkIndex]] from the raw benchmark/holdout docs.
    * The shingle set is materialized once (localCheckpoint cuts the
    * count, bloom build, and every later confirm join to one
    * computation).
    */
  def benchmarkIndex(bench: DataFrame, textCol: String = "text",
                     n: Int = DefaultShingleN, fpp: Double = 0.01)
      : BenchmarkIndex = {
    val bs = bench.filter(length(col(textCol)) >= n)
      .select(explode(TextStats.charShinglesCol(col(textCol), n))
        .as("sh"))
      .distinct().localCheckpoint(true)
    val expected = math.max(bs.count(), 1L)
    val bf = bs.select(xxhash64(col("sh")).as("shl"))
      .stat.bloomFilter("shl", expected, fpp)
    BenchmarkIndex(bs, bf, n)
  }

  /** Row-local stage flags for ANY doc set (full corpus or a CDF
    * micro-batch): (idCol, h, f1, f2, clean). One scan of `docs`; the
    * bloom probe runs over the shingle array inside the projection,
    * and only admitted candidates pay the explode + exact confirm.
    * f1 = language gate, f2 = f1 ∧ quality keep; keeper election (f3)
    * is cross-doc and belongs to [[electKeepers]].
    */
  private def docFlags(docs: DataFrame, bench: BenchmarkIndex,
                       idCol: String, textCol: String,
                       spread: Boolean = true)
      : DataFrame = {
    val text = col(textCol)
    // materialized ONCE (eager local checkpoint): base feeds both the
    // main flag assembly and the dirty-confirm arm — without the cut,
    // the confirm arm would re-scan the corpus TEXT to recompute every
    // flag. base is flag-sized (id + 32-char hash + booleans + the
    // bloom-admitted shingles of the contaminated few), ~60 bytes/doc
    // against KBs of text, so the checkpoint is the cheap side of the
    // trade at any scale
    // spread before the fused flag pass: md5 + langid + quality +
    // bloom shingle probe are all per-row CPU, serial on a one-task
    // input (no-op when already parallel). The incremental refresh
    // arm opts OUT: its input is micro-batch-bounded by contract, and
    // a per-batch exchange there is pure overhead.
    val base = (if (spread) graft.Par.spread(docs) else docs).select(
      col(idCol),
      md5(text).as("h"),
      (TextStats.langIdCol(text) === "en").as("f1"),
      (TextStats.qualityScoreCol(text) >= lit(0.5)).as("keep"),
      // native codegen'd two-pointer pass: never materializes the
      // full shingle array, allocates only for admitted windows
      bloom_admitted_shingles(bench.bloom, text, bench.n)
        .as("cand_sh"))
      .localCheckpoint(true)
    // exact confirm strips the filter's false positives; its input is
    // overlap-sized. The verdict join is left to AQE: on the usual
    // benchmark-overlap-sized dirty set it converts to a broadcast
    // join at runtime (the distinct gives it exact stats), while a
    // heavily-contaminated corpus — where the dirty set is
    // corpus-sized — degrades to a shuffle join instead of OOMing the
    // driver with a forced broadcast
    val dirty = base.filter(size(col("cand_sh")) > 0)
      .select(col(idCol), explode(col("cand_sh")).as("sh"))
      .join(bench.shingles, Seq("sh"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("_dirty", lit(true))
    base.join(dirty, Seq(idCol), "left")
      .select(col(idCol), col("h"), col("f1"),
        (col("f1") && col("keep")).as("f2"),
        col("_dirty").isNull.as("clean"))
  }

  /** Keep-first keeper election within content-hash groups over
    * quality survivors, then the decontamination verdict:
    * f3 = f2 ∧ (doc is the min-id f2 survivor of its hash group),
    * f4 = f3 ∧ clean. The one corpus-wide shuffle in the funnel.
    */
  private def electKeepers(flagged: DataFrame, idCol: String)
      : DataFrame = {
    val w = Window.partitionBy(col("h"))
    flagged
      .withColumn("f3", col("f2") &&
        col(idCol) === min(when(col("f2"), col(idCol))).over(w))
      .withColumn("f4", col("f3") && col("clean"))
      .select(col(idCol), col("h"), col("f1"), col("f2"),
        col("clean"), col("f3"), col("f4"))
  }

  /** Per-doc curation flags for the whole corpus —
    * (idCol, h, f1, f2, clean, f3, f4) — the persistable funnel STATE
    * that [[refreshFlags]] maintains incrementally.
    */
  def flags(corpus: DataFrame, bench: BenchmarkIndex,
            idCol: String, textCol: String): DataFrame =
    electKeepers(docFlags(corpus, bench, idCol, textCol), idCol)

  def flags(corpus: DataFrame, bench: DataFrame,
            idCol: String = "doc_id", textCol: String = "text",
            n: Int = DefaultShingleN, fpp: Double = 0.01): DataFrame =
    flags(corpus, benchmarkIndex(bench, textCol, n, fpp),
      idCol, textCol)

  /** The funnel report: per-stage survivor counts from a flag set. */
  def stages(flagDf: DataFrame): DataFrame =
    flagDf.agg(
        count(lit(1)).as("corpus"),
        sum(when(col("f1"), 1L).otherwise(0L)).as("lang_en"),
        sum(when(col("f2"), 1L).otherwise(0L)).as("quality"),
        sum(when(col("f3"), 1L).otherwise(0L)).as("exact_dedup"),
        sum(when(col("f4"), 1L).otherwise(0L)).as("decontaminated"))
      .select(expr("stack(5, 'corpus', corpus, 'lang_en', lang_en, " +
        "'quality', quality, 'exact_dedup', exact_dedup, " +
        "'decontaminated', decontaminated) AS (stage, n)"))

  /** Batch funnel: [[stages]] of [[flags]] — one corpus scan, one
    * hash-window shuffle, one aggregate.
    */
  def funnel(corpus: DataFrame, bench: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             n: Int = DefaultShingleN, fpp: Double = 0.01): DataFrame =
    stages(flags(corpus, bench, idCol, textCol, n, fpp))

  /** Incrementally maintain [[flags]] from a table's change feed
    * ([[graft.tables.ResourceTable.changes]] rows carrying
    * `_change_type`): deleted and update-preimage docs leave the
    * state, inserted and update-postimage docs get fresh row-local
    * flags (ONE scan of the changed docs only), and keeper election
    * re-runs ONLY in content-hash groups the batch touched — a
    * deleted keeper re-elects its successor, an inserted smaller id
    * steals keepership, and every untouched group's f3/f4 are carried
    * verbatim. Row-identical to recomputing [[flags]] on the
    * post-change corpus (CurationSpec + the q_funnel_incremental gate
    * assert set equality), at O(state scan + changed docs): the
    * changed-id set and touched-hash set are micro-batch-bounded so
    * they BROADCAST, the untouched arm never shuffles, and the
    * re-election shuffle carries touched groups only. The benchmark
    * side is static across refreshes (persist [[benchSet]]/the Bloom
    * in a real deployment; rebuilt here because the op takes the raw
    * benchmark frame).
    */
  def refreshFlags(flagDf: DataFrame, changes: DataFrame,
                   bench: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   n: Int = DefaultShingleN, fpp: Double = 0.01)
      : DataFrame =
    refreshFlags(flagDf, changes, benchmarkIndex(bench, textCol, n, fpp),
      idCol, textCol)

  def refreshFlags(flagDf: DataFrame, changes: DataFrame,
                   bench: BenchmarkIndex,
                   idCol: String, textCol: String)
      : DataFrame = {
    val (removed, reElected0) =
      refreshDelta(flagDf, changes, bench, idCol, textCol)
    // reElected is consumed TWICE below (the touched-hash probe that
    // splits carried from re-elected, and the output union) and its
    // plan re-reads the flag state + re-runs the re-election window;
    // it is micro-batch-bounded by contract, so pin it once (eager
    // local checkpoint) instead of evaluating the delta twice
    val reElected = reElected0.localCheckpoint(true)
    val touchedH = broadcast(reElected.select(col("h")).distinct())
    val carried = flagDf
      .join(broadcast(removed), Seq(idCol), "left_anti")
      .join(touchedH, Seq("h"), "left_anti")
      .select(col(idCol), col("h"), col("f1"), col("f2"),
        col("clean"), col("f3"), col("f4"))
    carried.unionByName(reElected)
  }

  /** The refresh as a WRITE-SIZED delta instead of a full state:
    * (removed ids, re-elected rows) — what [[maintainFlags]] merges
    * into a standing ACID flags table. `reElected` carries every row
    * of every TOUCHED hash group (so its hash set doubles as the
    * carried/re-elected split key), which is micro-batch-bounded.
    */
  def refreshDelta(flagDf: DataFrame, changes: DataFrame,
                   bench: BenchmarkIndex,
                   idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val removed = changes
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .select(col(idCol)).distinct()
    val added = changes
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(col(idCol), col(textCol))
    // spread = true since round 20: the flag pass (md5 + langid +
    // quality + bloom shingle probe) is per-row expensive, and a
    // foreachBatch micro-batch arrives as ONE partition — profiled
    // 0.54 s/batch serial on the stream-funnel gate. Par.spread is
    // still a no-op when the batch is already parallel, and for a
    // genuinely tiny batch the one narrow (id, text) exchange costs
    // ~tens of ms against the serial flag pass it replaces.
    val addedFlags = docFlags(added, bench, idCol, textCol)
    val removedB = broadcast(removed)
    // hash groups whose membership changed: removed docs' old hashes
    // + added docs' hashes — bounded by the micro-batch
    val touchedH = broadcast(
      flagDf.join(removedB, Seq(idCol), "left_semi").select(col("h"))
        .unionByName(addedFlags.select(col("h"))).distinct())
    val reElected = electKeepers(
      flagDf.join(removedB, Seq(idCol), "left_anti")
        .join(touchedH, Seq("h"), "left_semi")
        .select(col(idCol), col("h"), col("f1"), col("f2"),
          col("clean"))
        .unionByName(addedFlags),
      idCol)
    (removed, reElected)
  }

  /** CONTINUOUS curation as table maintenance: fold every docs-table
    * commit since the last maintained version into a standing ACID
    * flags table, exactly once. The watermark is the docs version the
    * flags last reflect, carried as a Delta-style
    * txnAppId/txnVersion on the flags table itself — recorded IN the
    * same commit as the flag mutation, so a driver crash between
    * "compute" and "record" cannot exist, and an at-least-once
    * re-drive of the same range replays as a no-op.
    *
    * First call (no watermark) seeds the full flag state; later calls
    * read ONLY the docs CDF slice plus the flag state — O(state scan
    * + changed docs), the corpus text is never re-read (the measured
    * x_funnel_incremental shape: 3.8× at 1000× data). Mutations land
    * as ONE merge commit: removed docs delete, touched groups
    * upsert, everything else is untouched files carried by reference.
    *
    * Returns (docs version now reflected, rows written).
    */
  def maintainFlags(docs: graft.tables.ResourceTable,
                    flagsTable: graft.tables.ResourceTable,
                    bench: BenchmarkIndex,
                    idCol: String = "doc_id",
                    textCol: String = "text",
                    appId: String = "graft-curation")
      : (Long, Long) = {
    val cur = docs.latestVersion.getOrElse(
      throw new IllegalStateException(s"no snapshot in ${docs.path}"))
    val last = flagsTable.txnVersion(appId)
    if (last.exists(_ >= cur)) return (cur, 0L)
    last match {
      case w if w.forall(v => !docs.versionExists(v)) =>
        // seed (no watermark yet — a pre-populated flags table, a
        // manual backfill, a lost watermark, reconciles instead of
        // duplicating: on an empty table the merge is a pure insert)
        // OR reseed (docs history trimmed past the watermark by
        // cleanupMetadata: the CDF slice is gone) — both are a full
        // rebuild THROUGH the same single-commit merge, the flags
        // table stays continuously readable and the watermark rides
        // the mutation. Read AT the pinned version `cur`, never the
        // live head: a concurrent docs commit between latestVersion
        // and the read would otherwise land in the flags under a
        // watermark that says it didn't, and the next run would
        // replay its changes into duplicate rows.
        val full = flags(docs.readVersion(cur), bench, idCol, textCol)
        val removed = flagsTable.read().select(col(idCol))
          .join(full.select(col(idCol)), Seq(idCol), "left_anti")
        (cur, foldDelta(flagsTable, removed, full, idCol, appId, cur))
      case Some(from) =>
        val changes = docs.changes(from, cur, idCol)
        val state = flagsTable.read()
        val (removed, reElected) =
          refreshDelta(state, changes, bench, idCol, textCol)
        (cur, foldDelta(flagsTable, removed, reElected, idCol, appId,
          cur))
    }
  }

  /** One exactly-once merge commit folding a (removed ids, upserted
    * rows) delta into the flags table with the docs-version watermark.
    */
  private def foldDelta(flagsTable: graft.tables.ResourceTable,
                        removed: DataFrame, upserts: DataFrame,
                        idCol: String, appId: String,
                        docsVersion: Long): Long = {
    val flagCols = Seq("h", "f1", "f2", "clean", "f3", "f4")
    val source = upserts.withColumn("_del", lit(false))
      .unionByName(removed
        .withColumn("h", lit(null).cast("string"))
        .withColumn("f1", lit(null).cast("boolean"))
        .withColumn("f2", lit(null).cast("boolean"))
        .withColumn("clean", lit(null).cast("boolean"))
        .withColumn("f3", lit(null).cast("boolean"))
        .withColumn("f4", lit(null).cast("boolean"))
        .withColumn("_del", lit(true)))
      // every maintainFlags arm derives `source` from flagsTable.read()
      // — the SAME table the merge below mutates. Pin it eagerly
      // (localCheckpoint cuts lineage AND materializes now): relying on
      // executeMerge's src.cache() would recompute against post-merge
      // state under cache eviction or a conflict-rebase re-drive
      .localCheckpoint(true)
    flagsTable.merge(source, idCol)
      .whenMatchedDelete(col("s._del"))
      .whenMatchedUpdate(
        flagCols.map(c => c -> col(s"s.$c")).toMap,
        !col("s._del"))
      .whenNotMatchedInsert(!col("s._del"))
      .withTransaction(appId, docsVersion)
      .execute()
  }
}

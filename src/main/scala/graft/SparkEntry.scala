package graft

import graft.ops.{Curation, Dedup, Multimodal, Similarity, TextStats, TopK}
import graft.tables.ResourceTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — the operator inventory of SURVEY.md §2 plus the
  * LLM-data-pipeline extensions, each as a named query over the driver
  * testdata with (where SQL-expressible) a DuckDB oracle.
  *
  * Determinism rules used throughout so the oracle hash-compare is
  * byte-stable:
  *  - double sums over unordered groups go through DECIMAL (exact,
  *    order-independent) and are cast back to DOUBLE at the end;
  *  - integral-valued double columns (l_quantity) may be summed
  *    directly (exact in IEEE754 below 2^53);
  *  - every window/top-k has a unique tie-break key;
  *  - counts/sizes are cast to BIGINT on both sides.
  */
object SparkEntry {

  /** Parquet footer schema, inferred once per (path, len, mtime,
    * nanos-conf) and reused: the testdata files are immutable, and a
    * 230-query bench run otherwise re-infers each table's schema on
    * every t() call — driver-side footer reads that add up across
    * ~1,500 invocations per run while telling us nothing new. The key
    * carries the file's length+mtime (one cheap local stat) so a
    * rewritten file at the same path in a long-lived JVM can never
    * serve a stale schema, and the nanosAsLong conf because
    * events.parquet's TIMESTAMP(NANOS) column infers to a different
    * Spark type under it. Other inference-affecting session confs
    * (binaryAsString, int96AsTimestamp, caseSensitive) are fixed
    * across every session this loader serves — Verify/Bench/gates all
    * leave them at defaults (schema is metadata only — every query
    * still computes from the parquet bytes).
    */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long, String), StructType]()

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val nanosConf = s.conf
      .get("spark.sql.legacy.parquet.nanosAsLong", "false")
    val f = new java.io.File(path)
    val schema = schemaCache.computeIfAbsent(
      (path, f.length(), f.lastModified(), nanosConf),
      _ => s.read.parquet(path).schema)
    s.read.schema(schema).parquet(path)
    // NOTE (round 19): a blanket repartition-after-read here was tried
    // for the single-row-group (unsplittable, one-task) testdata files
    // and MEASURED NET-NEGATIVE on the full board (+37 s): it fixes
    // the serial first stage of single-pass compute-heavy queries, but
    // it also inflates every cached table to cluster-width partitions
    // (each of an iterative op's k rounds then schedules 32× the
    // tasks) and fans every ACID commit's write into 32 small files
    // (slower manifests, read-backs and change feeds for the rest of
    // the gate). The spread now lives INSIDE the per-row-expensive
    // operators (Par.spread — FhirEncoder.encode, BundlePipeline
    // parse, editDistancePairs probe, curation flag pass), where the
    // exchange is paid exactly once, right before the work it
    // parallelizes.
  }

  /** events.parquet carries TIMESTAMP(NANOS) which Spark only reads as
    * long (spark.sql.legacy.parquet.nanosAsLong=true, set in
    * Verify/Bench). Rebuild a microsecond TIMESTAMP_NTZ with integer
    * division (ns epoch values overflow double precision — never go
    * through double) — matching DuckDB's ns→µs truncation exactly.
    */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      // timestampadd on a TIMESTAMP_NTZ literal is pure field
      // arithmetic — no session-timezone dependence, unlike a
      // TIMESTAMP→NTZ cast which reads spark.sql.session.timeZone.
      raw.withColumn("ts",
        expr("timestampadd(MICROSECOND, ts DIV 1000, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
    else raw.withColumn("ts", col("ts").cast(TimestampNTZType))
  }

  /** events with an epoch-microseconds long column (integral
    * timestamps end-to-end; DuckDB's `epoch_us` matches exactly).
    */
  private[graft] def eventsUs(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts_us", expr("ts DIV 1000"))
    else
      // TIMESTAMP_NTZ (micros testdata): microseconds since the NTZ
      // epoch via timestampdiff — pure field arithmetic, independent
      // of spark.sql.session.timeZone (a TIMESTAMP cast here would
      // shift, and DST-bend, the epoch values for non-UTC sessions).
      raw.withColumn("ts_us",
        expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
  }

  /** sum(CAST(x AS DECIMAL(18,s))) cast back to double — exact,
    * order-independent aggregation of a double column.
    */
  private[graft] def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Moment statistics recomputed from exact decimal sums — one SQL
    * text valid in BOTH Spark and DuckDB, so every double operation
    * (the only inexact steps) is literally the same expression tree on
    * both sides and the results hash-match bit-for-bit.
    */
  private[graft] def statsFormulaSql(table: String): String =
    s"""WITH s AS (
       |  SELECT l_returnflag AS flag, count(*) AS n,
       |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
       |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
       |             * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
       |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
       |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
       |             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
       |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
       |             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
       |  FROM $table GROUP BY l_returnflag)
       |SELECT flag, n,
       |  ROUND(sx / CAST(n AS DOUBLE), 9) AS mean_qty,
       |  ROUND(sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
       |             / CAST(n - 1 AS DOUBLE)), 9) AS stddev_qty,
       |  ROUND((sxy - sx * sy / CAST(n AS DOUBLE)) /
       |    sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
       |         * (syy - sy * sy / CAST(n AS DOUBLE))), 9)
       |    AS corr_qty_price
       |FROM s""".stripMargin
  // ^ the derived statistics are ROUNDed to 9 dp: the sums are
  // decimal-exact on both engines, but DuckDB's wide-decimal → DOUBLE
  // cast double-rounds (int128 → double, then ÷10^scale in double),
  // and the corr/stddev cancellation (sxx − sx²/n) amplifies that
  // 1-ulp wiggle into a visible last-digit divergence — surfaced by
  // the round-19 sf0.001 board sweep, invisible at sf0.01/sf0.1 only
  // because the rounding happened to agree there.

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // =================================================================
  // Queries — one per implemented operator from SURVEY.md §2 (+ LLM ops)
  // =================================================================
  /** Driver contract: the per-domain gate maps composed back into one
    * surface (the split is organizational only — same 226 keys).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.gates.RelationalGates.queries ++
      graft.gates.TableGates.queries ++
      graft.gates.StreamGates.queries ++
      graft.gates.LlmGates.queries ++
      graft.gates.FhirGates.queries


  /** Shared fixture for the time-travel/CDF queries: a versioned table
    * built from `customer` with three deterministic commits — base
    * load, an update+insert upsert, then a segment delete. Returns the
    * table plus the three commit versions.
    */
  private[graft] val versionedDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (ResourceTable, Long, Long, Long)]()

  private[graft] val dvDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, ResourceTable]()

  private[graft] val cdfDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, ResourceTable]()

  // learned BPE merges per testdata dir (deterministic; q_bpe_encode
  // reuses q_bpe_train's result instead of re-running the rounds)
  private[graft] val bpeMergesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  // PQ codebooks per testdata dir (deterministic sample training;
  // q_pq_encode and q_pq_topk share one training run)
  private[graft] val pqMemo =
    new java.util.concurrent.ConcurrentHashMap[String, graft.ops.Pq.Codebook]()

  // q_pq_refresh's versioned embedding table (insert/update/delete
  // commits built once; the timed operator is the CDF-driven code
  // refresh + re-encode equality proof, not the fixture commits).
  // Returns (table, v1, v2).
  private[graft] val pqRefreshDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (ResourceTable, Long, Long)]()

  // q_index_refresh's versioned docs table (same contract: the timed
  // operator is the banded-index refresh + rebuild equality, the
  // fixture commits are input). Returns (table, v1, v2).
  private[graft] val idxRefreshDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (ResourceTable, Long, Long)]()

  // q_funnel_incremental's versioned docs table (timed operator =
  // flags-at-v1 + CDF refresh; fixture commits are input).
  private[graft] val funnelIncrDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (ResourceTable, Long, Long)]()

  // read-side skipping fixtures: tables are IMMUTABLE after build —
  // the gates time the pruned read, never another commit
  private[graft] val skipDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, ResourceTable]()
  private[graft] val bloomDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, ResourceTable]()
  private[graft] val dfpDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, ResourceTable]()
  private[graft] val ppartDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // q_replace_where's segment-clustered table (content-idempotent
  // under repeated overwriteWhere calls, so one fixture per dir)
  private[graft] val replaceDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, ResourceTable]()

  // q_rename_column's column-mapped table (rename + merge built once)
  private[graft] val renameDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, ResourceTable]()

  // q_delete_update_where's table (both predicate DMLs in the build)
  private[graft] val dmlDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, ResourceTable]()

  // q_merge_builder's table (the three-clause merge in the build)
  private[graft] val mergeDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, ResourceTable]()

  /** Change-data-feed export fixture: CDF-enabled customer table,
    * anchored export, then an UPDATE upsert (c_acctbal + 1000 for
    * keys ≡0 mod 13) and a DV delete (keys ≡0 mod 17) — the second
    * export materializes both commits' row-level changes as
    * `_change_data/` files with cdc actions. Memoized per dir.
    */
  private[graft] def cdfDemo(s: SparkSession, dir: String): ResourceTable =
    cdfDemoMemo.computeIfAbsent(dir, _ => {
      val base = t(s, dir, "customer").repartition(4)
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdf").toString
      val tab = ResourceTable(s, s"$tmp/customer.parquet")
        .createIfNotExists(base.schema).enableChangeDataFeed()
      tab.upsert(base, "c_custkey")
      graft.tables.DeltaExport.export(tab) // anchor: later commits replay
      tab.upsert(base.filter(col("c_custkey") % 13 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 1000.0), "c_custkey")
      tab.enableDeletionVectors()
      tab.deleteMatchingDv(base.filter(col("c_custkey") % 17 === 0)
        .select("c_custkey"), "c_custkey")
      graft.tables.DeltaExport.export(tab)
      tab
    })

  private[graft] val retroDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (ResourceTable, Long, Long)]()

  /** Retro-decontamination fixture: the corpus docs are ingested into
    * an ACID table FIRST, then the benchmark "arrives" and every doc
    * whose char-25-gram overlap ratio ≥ 0.5 is purged through the
    * deletion-vector delete path. 25-char shingles (vs the report
    * gates' 5) because the criterion here drives row DELETION: a
    * 5-gram ratio saturates toward 1.0 as the corpus grows (short
    * shingles stop being discriminative once the benchmark's shingle
    * vocabulary covers the language), and the purge would doom every
    * doc at sf0.1 — wide shingles only fire on genuinely shared
    * passages, so the doomed fraction stays scale-stable (~1%).
    * Returns (table, pre-purge version, post-purge version). Two
    * contracts asserted here because no oracle can see them: the
    * purge deletes at least one doc, and it rewrites ZERO data files
    * (manifest unchanged — the whole point of DV deletes for a
    * benchmark-refresh purge over 100 TB).
    * Memoized per dir like [[versionedDemo]].
    */
  private[graft] def retroDemo(
      s: SparkSession, dir: String): (ResourceTable, Long, Long) =
    retroDemoMemo.computeIfAbsent(dir, _ => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val bench = docs.filter(col("doc_id") % 10 === 0)
      val tmp =
        java.nio.file.Files.createTempDirectory("graft_retro").toString
      val tab = ResourceTable(s, s"$tmp/documents.parquet")
      tab.createIfNotExists(corpus.schema)
      tab.upsert(corpus.repartition(4), "doc_id")
      tab.enableDeletionVectors()
      val v1 = tab.latestVersion.get
      val before = tab.fileManifest(v1).toSet
      val doomed = graft.ops.TextStats.contamination(corpus, bench, n = 25)
        .filter(col("contamination") >= 0.5).select("doc_id")
      val n = tab.deleteMatching(doomed, "doc_id")
      val v2 = tab.latestVersion.get
      require(n > 0, "retro fixture must purge at least one doc")
      require(tab.fileManifest(v2).toSet == before,
        "retro purge rewrote data files — the O(purged rows) DV " +
          "contract broke")
      (tab, v1, v2)
    })

  /** Deletion-vector fixture: customer loaded once, then TWO DV
    * deletes (every 7th key, then every 11th — the second unions into
    * the first file's bitmap). No data file is ever rewritten; reads
    * drop the dead positions. Memoized per dir like [[versionedDemo]].
    */
  private[graft] def dvDemo(s: SparkSession, dir: String): ResourceTable =
    dvDemoMemo.computeIfAbsent(dir, _ => {
      val base = t(s, dir, "customer").repartition(4)
      val tmp = java.nio.file.Files.createTempDirectory("graft_dv").toString
      val tab = ResourceTable(s, s"$tmp/customer.parquet")
      tab.createIfNotExists(base.schema)
      tab.upsert(base, "c_custkey")
      val before = tab.fileManifest(tab.latestVersion.get).toSet
      tab.deleteMatchingDv(
        base.filter(col("c_custkey") % 7 === 0).select("c_custkey"),
        "c_custkey")
      tab.deleteMatchingDv(
        base.filter(col("c_custkey") % 11 === 0).select("c_custkey"),
        "c_custkey")
      // the gate's whole point: the deletes touched ZERO data files
      require(tab.fileManifest(tab.latestVersion.get).toSet == before,
        "DV delete rewrote files — the O(deleted rows) contract broke")
      tab
    })

  private[graft] val dvPurgeDemoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, ResourceTable]()

  /** REORG-PURGE fixture: the [[dvDemo]] construction (two DV deletes,
    * zero rewrites) followed by `purgeDeletionVectors` at a threshold
    * every DV'd file crosses. Asserted here because no oracle can see
    * it: the purge rewrites at least one file and clears every DV; the
    * gate then proves via DuckDB that the rewrite preserved logical
    * content bit-for-bit.
    */
  private[graft] def dvPurgeDemo(s: SparkSession, dir: String): ResourceTable =
    dvPurgeDemoMemo.computeIfAbsent(dir, _ => {
      val base = t(s, dir, "customer").repartition(4)
      val tmp =
        java.nio.file.Files.createTempDirectory("graft_dvp").toString
      val tab = ResourceTable(s, s"$tmp/customer.parquet")
      tab.createIfNotExists(base.schema)
      tab.upsert(base, "c_custkey")
      tab.enableDeletionVectors()
      tab.deleteMatching(
        base.filter(col("c_custkey") % 7 === 0).select("c_custkey"),
        "c_custkey")
      tab.deleteMatching(
        base.filter(col("c_custkey") % 11 === 0).select("c_custkey"),
        "c_custkey")
      val before = tab.fileManifest(tab.latestVersion.get).toSet
      val (purged, _) = tab.purgeDeletionVectors(minDeadFraction = 0.01)
      require(purged > 0, "purge fixture must rewrite at least one file")
      // every-DV-cleared is asserted manifest-deep in DvPurgeSpec;
      // here the public surface: the purge really committed a rewrite
      require(tab.fileManifest(tab.latestVersion.get).toSet != before,
        "purge must replace the DV'd files")
      tab
    })

  private[graft] def versionedDemo(
      s: SparkSession, dir: String): (ResourceTable, Long, Long, Long) =
    // one immutable fixture per input dir & JVM: q_time_travel and
    // q_change_feed read DIFFERENT versions of the SAME version
    // history, so building it twice is pure waste
    versionedDemoMemo.computeIfAbsent(dir, _ => buildVersionedDemo(s, dir))

  private[graft] def buildVersionedDemo(
      s: SparkSession, dir: String): (ResourceTable, Long, Long, Long) = {
    // the fixture table is small (customer rows); 4-file snapshots keep
    // the per-commit footer-stat reads proportionate
    val base = t(s, dir, "customer").repartition(4)
    val tmp = java.nio.file.Files.createTempDirectory("graft_tt").toString
    val tab = ResourceTable(s, s"$tmp/customer.parquet")
    tab.createIfNotExists(base.schema)
    tab.upsert(base, "c_custkey")
    val v1 = tab.latestVersion.get
    val mods = base.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), upper(col("c_name")).as("c_name"),
        col("c_nationkey"), (col("c_acctbal") + 1000).as("c_acctbal"),
        col("c_mktsegment"))
    val news = base.filter(col("c_custkey") % 100 === 1)
      .select((col("c_custkey") + 1000000).as("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"),
        lit("NEWSEG").as("c_mktsegment"))
    tab.upsert(mods.unionByName(news), "c_custkey")
    val v2 = tab.latestVersion.get
    tab.deleteMatching(
      base.filter(col("c_mktsegment") === "MACHINERY").select("c_custkey"),
      "c_custkey")
    val v3 = tab.latestVersion.get
    (tab, v1, v2, v3)
  }

  /** IVF oracle: the deterministic coarse quantization inlined as SQL.
    * The centroid constants are rendered shortest-round-trip (Double
    * .toString parses back to the identical bits on any engine), cell
    * argmax is ORDER BY dot DESC, cell DESC (array_max's struct
    * tie-break), queries fan out to their `probes` best cells via
    * LATERAL, and the corpus pins to its single best cell — exactly
    * [[graft.ops.Similarity.ivfTopK]].
    */
  private[graft] def ivfOracle(k: Int, probes: Int): String = {
    val values = graft.ops.Similarity.ivfCentroids(8, 64).zipWithIndex
      .map { case (c, i) => s"($i, [${c.mkString(",")}]::DOUBLE[])" }
      .mkString(",\n        ")
    s"""WITH cents(cell, cvec) AS (VALUES $values),
       |qa AS (
       |  SELECT q.vec_id AS q_id, q.embedding AS q_vec, c.cell
       |  FROM embeddings q, LATERAL (
       |    SELECT cell FROM cents
       |    ORDER BY list_dot_product(q.embedding::DOUBLE[], cvec) DESC,
       |             cell DESC
       |    LIMIT $probes) c
       |  WHERE q.vec_id < 3),
       |ca AS (
       |  SELECT n.vec_id AS n_id, n.embedding AS n_vec, c.cell
       |  FROM embeddings n, LATERAL (
       |    SELECT cell FROM cents
       |    ORDER BY list_dot_product(n.embedding::DOUBLE[], cvec) DESC,
       |             cell DESC
       |    LIMIT 1) c
       |  WHERE n.vec_id >= 3)
       |SELECT q_id, n_id, rank FROM (
       |  SELECT qa.q_id, ca.n_id,
       |    row_number() OVER (PARTITION BY qa.q_id
       |      ORDER BY list_cosine_similarity(qa.q_vec, ca.n_vec) DESC,
       |               ca.n_id ASC) AS rank
       |  FROM ca JOIN qa USING (cell))
       |WHERE rank <= $k""".stripMargin
  }

  /** DuckDB replay of the library's splitmix64 hash family
    * (TextExpressions.splitmix / tokenHashes / shingleHashesEval,
    * VectorExpressions.minhashEval) as single-statement SQL. Java's
    * wrap-around 64-bit arithmetic is emulated in HUGEINT mod 2^64 on
    * UBIGINT columns; `mulmod` splits the left operand into 32-bit
    * halves so no intermediate product overflows the signed 128-bit
    * HUGEINT. Signed-long comparisons (the minhash `min`, Java long
    * order) convert back to BIGINT first. Every hash stage is a flat
    * CTE column — nesting the steps as one expression duplicates
    * subtrees exponentially (DuckDB does not CSE), measured 100×
    * slower.
    */
  /** q_cms_heavy probe keys: frequent generator-vocab words, one
    * mid-frequency, one guaranteed-absent (collision-only estimate).
    */
  private[graft] val CmsProbeWords: Seq[String] =
    Seq("table", "query", "customer", "the", "value", "stream",
      "quantumxyz")

  private[graft] object SplitmixOracle {
    private val Gamma = "11400714819323198485" // 0x9E3779B97F4A7C15
    private val C2 = "13787848793156543929"    // 0xBF58476D1CE4E5B9
    private val C3 = "10723151780598845931"    // 0x94D049BB133111EB
    private val FnvP = "1099511628211"         // 0x100000001B3
    private val Mod = "18446744073709551616"   // 2^64

    private def mm(a: String, b: String): String =
      s"CAST(((CAST($a AS HUGEINT) % 4294967296) * CAST($b AS HUGEINT) + " +
        s"((CAST($a AS HUGEINT) // 4294967296) * CAST($b AS HUGEINT) % 4294967296) * 4294967296) " +
        s"% $Mod AS UBIGINT)"
    private def am(a: String, b: String): String =
      s"CAST((CAST($a AS HUGEINT) + CAST($b AS HUGEINT)) % $Mod AS UBIGINT)"
    private def s64(u: String): String =
      s"CAST(CASE WHEN $u >= 9223372036854775808 THEN CAST($u AS HUGEINT) - $Mod " +
        s"ELSE CAST($u AS HUGEINT) END AS BIGINT)"

    /** CTEs `doc_toks..th`: per-token splitmix hashes of `documents`
      * (whitespace-run tokenization, 31-poly char fold seeded
      * 1125899906842597 — TextExpressions.tokenHashes).
      */
    private val tokenCtes: String = {
      val rawTok =
        "list_reduce(list_prepend(CAST(1125899906842597 AS UBIGINT), " +
          "list_transform(generate_series(1, length(tok)), i -> CAST(unicode(substr(tok, i, 1)) AS UBIGINT))), " +
          s"(h, c) -> ${am(mm("h", "31"), "c")})"
      s"""doc_toks AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> length(t) > 0) AS tlist
         |  FROM documents),
         |tok_rows AS (
         |  SELECT doc_id, g.i AS tok_idx, tlist[g.i] AS tok
         |  FROM doc_toks, unnest(generate_series(1, len(tlist))) AS g(i)),
         |th0 AS (SELECT doc_id, tok_idx, ${am(rawTok, Gamma)} AS z0 FROM tok_rows),
         |th1 AS (SELECT doc_id, tok_idx, ${mm("xor(z0, z0 >> 30)", C2)} AS z1 FROM th0),
         |th2 AS (SELECT doc_id, tok_idx, ${mm("xor(z1, z1 >> 27)", C3)} AS z2 FROM th1),
         |th  AS (SELECT doc_id, tok_idx, xor(z2, z2 >> 31) AS th FROM th2)""".stripMargin
    }

    /** CTEs `tl..shr`: distinct w=3 shingle hashes (FNV-prime fold of
      * 3 token hashes, splitmix finalize — shingleHashesEval) and
      * `pz0..cand`: k=16 minhash signatures, 4×4 LSH bands, bucket
      * cap 1024, canonical candidate pairs (Dedup.candidatePairs).
      * Band keys group on the signature slice itself; Spark buckets
      * on xxhash64 of the slice, identical up to 64-bit collisions.
      */
    private val shingleAndCandCtes: String = {
      val shFold = am(am(mm(am(mm("ths[i]", FnvP), "ths[i+1]"), FnvP), "ths[i+2]"), Gamma)
      s"""tl AS (SELECT doc_id, list(th ORDER BY tok_idx) AS ths FROM th GROUP BY doc_id),
         |sh0 AS (
         |  SELECT doc_id, $shFold AS z0
         |  FROM tl, unnest(generate_series(1, len(ths) - 2)) AS g(i)
         |  WHERE len(ths) >= 3),
         |sh1 AS (SELECT doc_id, ${mm("xor(z0, z0 >> 30)", C2)} AS z1 FROM sh0),
         |sh2 AS (SELECT doc_id, ${mm("xor(z1, z1 >> 27)", C3)} AS z2 FROM sh1),
         |shr AS (SELECT DISTINCT doc_id, xor(z2, z2 >> 31) AS sh FROM sh2),
         |pz0 AS (
         |  SELECT doc_id, p.i AS perm, ${am("sh", mm("p.i", Gamma))} AS z0
         |  FROM shr, unnest(generate_series(1, 16)) AS p(i)),
         |pz1 AS (SELECT doc_id, perm, ${mm("xor(z0, z0 >> 30)", C2)} AS z1 FROM pz0),
         |pz2 AS (SELECT doc_id, perm, ${mm("xor(z1, z1 >> 27)", C3)} AS z2 FROM pz1),
         |pz  AS (SELECT doc_id, perm, ${s64("xor(z2, z2 >> 31)")} AS hv FROM pz2),
         |sigs AS (
         |  SELECT doc_id, list(minv ORDER BY perm) AS sig
         |  FROM (SELECT doc_id, perm, min(hv) AS minv FROM pz GROUP BY doc_id, perm)
         |  GROUP BY doc_id),
         |members AS (
         |  SELECT b, CAST(list_slice(sig, b*4+1, b*4+4) AS VARCHAR) AS bk, doc_id
         |  FROM sigs, unnest(generate_series(0, 3)) AS gs(b)),
         |sized AS (
         |  SELECT b, bk, doc_id, count(*) OVER (PARTITION BY b, bk) AS bsz FROM members),
         |cand AS (
         |  SELECT DISTINCT m1.doc_id AS doc_a, m2.doc_id AS doc_b
         |  FROM sized m1 JOIN sized m2
         |    ON m1.b = m2.b AND m1.bk = m2.bk AND m1.doc_id < m2.doc_id
         |  WHERE m1.bsz BETWEEN 2 AND 1024)""".stripMargin
    }

    /** CTE `scored`: estimated jaccard (matching signature fraction)
      * per candidate pair — Dedup.estimatedJaccard.
      */
    private val scoredCte: String =
      """scored AS (
        |  SELECT c.doc_a, c.doc_b,
        |    CAST(len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2])) AS DOUBLE) / 16.0 AS est_jaccard
        |  FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_a JOIN sigs sb ON sb.doc_id = c.doc_b)""".stripMargin

    /** Exact replay of Dedup.minhashPairs(minJaccard=0.2, k=16,
      * bands=4, w=3) over `documents`.
      */
    val minhashPairs: String =
      s"""WITH $tokenCtes,
         |$shingleAndCandCtes,
         |$scoredCte
         |SELECT doc_a, doc_b, est_jaccard FROM scored WHERE est_jaccard >= 0.2""".stripMargin

    /** Exact replay of Dedup.resolveClusters over the minhashPairs
      * output: the same pair replay as [[minhashPairs]], then min-label
      * connected components as a recursive CTE (the same CC oracle
      * shape q_dedup_resolve_exact uses over cosine pairs). Replaces
      * the round-7 sf0.01-pinned VALUES list — SF-parametric, so the
      * full board can go green at any scale factor (VERDICT r17 #2).
      */
    val minhashResolve: String =
      s"""WITH RECURSIVE $tokenCtes,
         |$shingleAndCandCtes,
         |$scoredCte,
         |mh AS (SELECT doc_a, doc_b FROM scored WHERE est_jaccard >= 0.2),
         |edges AS (SELECT doc_a AS ea, doc_b AS eb FROM mh
         |          UNION SELECT doc_b, doc_a FROM mh),
         |cnodes AS (SELECT DISTINCT ea AS doc FROM edges),
         |reach(doc, lbl) AS (
         |  SELECT doc, doc FROM cnodes
         |  UNION
         |  SELECT e.ea, r.lbl FROM edges e JOIN reach r ON r.doc = e.eb)
         |SELECT CAST(doc AS BIGINT) AS doc_id,
         |       CAST(min(lbl) AS BIGINT) AS canonical_id
         |FROM reach GROUP BY doc""".stripMargin

    /** Exact replay of Dedup.ngramJaccardPairs(minJaccard=0.1):
      * same LSH candidates, exact shingle-set Jaccard.
      */
    val ngramJaccardPairs: String =
      s"""WITH $tokenCtes,
         |$shingleAndCandCtes,
         |shl AS (SELECT doc_id, list(sh) AS shset FROM shr GROUP BY doc_id),
         |scored AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(len(list_intersect(ha.shset, hb.shset)) AS DOUBLE) /
         |    CAST(len(ha.shset) + len(hb.shset) - len(list_intersect(ha.shset, hb.shset)) AS DOUBLE) AS jaccard
         |  FROM cand c JOIN shl ha ON ha.doc_id = c.doc_a JOIN shl hb ON hb.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.1""".stripMargin

    /** Exact replay of Dedup.simhashPairs(maxHamming=3): 64-bit
      * simhash from the token hashes (signed per-bit counts,
      * TextExpressions.simhash64Eval), 4×16-bit bands, hamming via
      * bit_count(xor).
      */
    val simhashPairs: String =
      s"""WITH $tokenCtes,
         |bits AS (
         |  SELECT doc_id, b.b AS bit, CAST((th >> b.b) & 1 AS INTEGER) AS isset
         |  FROM th, unnest(generate_series(0, 63)) AS b(b)),
         |cnt AS (
         |  SELECT doc_id, bit, 2 * sum(isset) - count(*) AS score FROM bits GROUP BY doc_id, bit),
         |fp AS (
         |  SELECT doc_id, CAST(sum(CASE WHEN score > 0 THEN CAST(CAST(1 AS UBIGINT) << bit AS HUGEINT) ELSE 0 END) AS UBIGINT) AS fp
         |  FROM cnt GROUP BY doc_id),
         |members AS (
         |  SELECT b.b AS band, CAST((fp >> (16 * b.b)) & 65535 AS BIGINT) AS bv, doc_id, fp
         |  FROM fp, unnest(generate_series(0, 3)) AS b(b)),
         |sized AS (
         |  SELECT band, bv, doc_id, fp, count(*) OVER (PARTITION BY band, bv) AS bsz FROM members),
         |cand AS (
         |  SELECT DISTINCT m1.doc_id AS doc_a, m2.doc_id AS doc_b, m1.fp AS fa, m2.fp AS fb
         |  FROM sized m1 JOIN sized m2
         |    ON m1.band = m2.band AND m1.bv = m2.bv AND m1.doc_id < m2.doc_id
         |  WHERE m1.bsz BETWEEN 2 AND 1024)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(fa, fb)) <= 3""".stripMargin

    /** Per-(doc, bucket) counts of the 16-bucket hash embedding from
      * the token hashes — th % 16 equals the signed hash & 15
      * (TextExpressions.hashEmbedEval) because 16 divides 2^64. The
      * grid left-join keeps all-zero vectors for tokenless docs.
      */
    private val embedCtes: String =
      s"""$tokenCtes,
         |grid AS (
         |  SELECT d.doc_id, g.b AS bucket
         |  FROM documents d, unnest(generate_series(0, 15)) AS g(b)),
         |bcnt AS (
         |  SELECT doc_id, CAST(th % 16 AS INTEGER) AS bucket,
         |    count(*) AS c
         |  FROM th GROUP BY doc_id, bucket),
         |emb AS (
         |  SELECT g.doc_id, g.bucket, COALESCE(bcnt.c, 0) AS c
         |  FROM grid g LEFT JOIN bcnt
         |    ON bcnt.doc_id = g.doc_id AND bcnt.bucket = g.bucket)"""
        .stripMargin

    /** Replay of q_hash_embed's vector-derived scalars. */
    val hashEmbedStats: String =
      s"""WITH $embedCtes
         |SELECT doc_id,
         |  CAST(sum(c * c) AS BIGINT) AS l2sq,
         |  CAST(count(*) FILTER (WHERE c > 0) AS BIGINT) AS nnz,
         |  CAST(min(bucket) FILTER (WHERE c = mx) AS BIGINT) AS top_bucket
         |FROM (SELECT doc_id, bucket, c,
         |        max(c) OVER (PARTITION BY doc_id) AS mx FROM emb)
         |GROUP BY doc_id""".stripMargin

    /** Replay of q_hash_embed_sim: exact integer dot/norms against
      * doc 0's vector, one IEEE division + sqrt.
      */
    val hashEmbedSim: String =
      s"""WITH $embedCtes,
         |l2 AS (SELECT doc_id, sum(c * c) AS l2 FROM emb GROUP BY doc_id),
         |qv AS (SELECT bucket, c FROM emb WHERE doc_id = 0),
         |ql AS (SELECT l2 FROM l2 WHERE doc_id = 0),
         |dots AS (
         |  SELECT e.doc_id, sum(e.c * q.c) AS dot
         |  FROM emb e JOIN qv q USING (bucket) GROUP BY e.doc_id)
         |SELECT d.doc_id,
         |  CAST(d.dot AS DOUBLE)
         |    / sqrt(CAST(l.l2 AS DOUBLE) * CAST(ql.l2 AS DOUBLE)) AS cos
         |FROM dots d JOIN l2 l ON l.doc_id = d.doc_id CROSS JOIN ql
         |WHERE d.doc_id != 0 AND l.l2 > 0 AND ql.l2 > 0
         |  AND CAST(d.dot AS DOUBLE)
         |    / sqrt(CAST(l.l2 AS DOUBLE) * CAST(ql.l2 AS DOUBLE)) >= 0.75"""
        .stripMargin

    /** Exact replay of Dedup.duplicatedWindowSpans(w=8, minDupCount=2):
      * positional w=8 window hashes (FNV fold of 8 token hashes,
      * splitmix finalize — positionalShingleHashesEval), duplicated
      * hashes by global count, per-doc interval union via the same
      * running-max gaps-and-islands. Positions are 1-based here vs
      * 0-based in Spark; the union LENGTH is translation-invariant
      * and positions are not output.
      */
    val substringDedupSpans: String = {
      val fold = (1 to 7).foldLeft("ths[i]") { (acc, j) =>
        am(mm(acc, FnvP), s"ths[i+$j]")
      }
      s"""WITH $tokenCtes,
         |tl AS (SELECT doc_id, list(th ORDER BY tok_idx) AS ths FROM th GROUP BY doc_id),
         |w0 AS (
         |  SELECT doc_id, g.i AS pos, ${am(fold, Gamma)} AS z0
         |  FROM tl, unnest(generate_series(1, len(ths) - 7)) AS g(i)
         |  WHERE len(ths) >= 8),
         |w1 AS (SELECT doc_id, pos, ${mm("xor(z0, z0 >> 30)", C2)} AS z1 FROM w0),
         |w2 AS (SELECT doc_id, pos, ${mm("xor(z1, z1 >> 27)", C3)} AS z2 FROM w1),
         |whs AS (SELECT doc_id, pos, xor(z2, z2 >> 31) AS wh FROM w2),
         |dup AS (SELECT wh FROM whs GROUP BY wh HAVING count(*) >= 2),
         |cov AS (
         |  SELECT doc_id, pos,
         |    max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM whs JOIN dup USING (wh)),
         |spans AS (
         |  SELECT doc_id, count(*) AS dup_windows,
         |    sum(greatest(pos + 8 - greatest(pos, coalesce(prev_end, pos)), 0)) AS removed
         |  FROM cov GROUP BY doc_id)
         |SELECT t.doc_id AS doc,
         |  CAST(len(t.tlist) AS BIGINT) AS total_tokens,
         |  CAST(COALESCE(s.dup_windows, 0) AS BIGINT) AS dup_windows,
         |  CAST(COALESCE(s.removed, 0) AS BIGINT) AS removed_tokens,
         |  CAST(len(t.tlist) - COALESCE(s.removed, 0) AS BIGINT) AS kept_tokens
         |FROM doc_toks t LEFT JOIN spans s USING (doc_id)""".stripMargin
    }

    /** Removal twin of [[substringDedupSpans]]: same window hashes and
      * duplicated set, then the COVERED token-index set (1-based here,
      * 0-based in Spark — both name the same tokens) anti-joins the
      * token rows and the survivors re-join in index order. The
      * rebuilt text itself is compared, not just counts.
      */
    val substringRemove: String = {
      val fold = (1 to 7).foldLeft("ths[i]") { (acc, j) =>
        am(mm(acc, FnvP), s"ths[i+$j]")
      }
      s"""WITH $tokenCtes,
         |tl AS (SELECT doc_id, list(th ORDER BY tok_idx) AS ths FROM th GROUP BY doc_id),
         |w0 AS (
         |  SELECT doc_id, g.i AS pos, ${am(fold, Gamma)} AS z0
         |  FROM tl, unnest(generate_series(1, len(ths) - 7)) AS g(i)
         |  WHERE len(ths) >= 8),
         |w1 AS (SELECT doc_id, pos, ${mm("xor(z0, z0 >> 30)", C2)} AS z1 FROM w0),
         |w2 AS (SELECT doc_id, pos, ${mm("xor(z1, z1 >> 27)", C3)} AS z2 FROM w1),
         |whs AS (SELECT doc_id, pos, xor(z2, z2 >> 31) AS wh FROM w2),
         |dup AS (SELECT wh FROM whs GROUP BY wh HAVING count(*) >= 2),
         |dead AS (
         |  SELECT DISTINCT doc_id, pos + g.j AS idx
         |  FROM whs JOIN dup USING (wh),
         |    unnest(generate_series(0, 7)) AS g(j)),
         |kept AS (
         |  SELECT r.doc_id, r.tok_idx, r.tok
         |  FROM tok_rows r LEFT JOIN dead d
         |    ON d.doc_id = r.doc_id AND d.idx = r.tok_idx
         |  WHERE d.idx IS NULL)
         |SELECT t.doc_id AS doc,
         |  COALESCE(k.clean_text, '') AS clean_text,
         |  CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
         |FROM doc_toks t LEFT JOIN (
         |  SELECT doc_id,
         |    string_agg(tok, ' ' ORDER BY tok_idx) AS clean_text,
         |    count(*) AS kept_tokens
         |  FROM kept GROUP BY doc_id) k USING (doc_id)""".stripMargin
    }

    /** Exact replay of TextStats.cmsSketch(d=4, w=1024) +
      * cmsEstimate over the probe words: every (token, hash-row)
      * lands in cell `i·1024 + (splitmix(th + i·γ) % 1024)` — the
      * permutation chain is splitmix with the row offset pre-added,
      * so z0 = th + (i+1)·γ — and the estimate is the min of the
      * probe's 4 cell counts. Counts are integer sums: bit-exact.
      */
    def cmsHeavy(words: Seq[String]): String = {
      def permChain(src: String, thExpr: String): String =
        s"""${src}p0 AS (SELECT *, ${am(thExpr, mm("(i + 1)", Gamma))} AS z0 FROM ${src}cells),
           |${src}p1 AS (SELECT *, ${mm("xor(z0, z0 >> 30)", C2)} AS z1 FROM ${src}p0),
           |${src}p2 AS (SELECT *, ${mm("xor(z1, z1 >> 27)", C3)} AS z2 FROM ${src}p1),
           |${src}pf AS (SELECT *, CAST(i * 1024 + xor(z2, z2 >> 31) % 1024 AS INTEGER) AS cell FROM ${src}p2)""".stripMargin
      val rawWord =
        "list_reduce(list_prepend(CAST(1125899906842597 AS UBIGINT), " +
          "list_transform(generate_series(1, length(word)), j -> CAST(unicode(substr(word, j, 1)) AS UBIGINT))), " +
          s"(h, c) -> ${am(mm("h", "31"), "c")})"
      val vals = words.map(w => s"('$w')").mkString(", ")
      s"""WITH $tokenCtes,
         |ccells AS (SELECT th, g.i AS i FROM th,
         |           unnest(generate_series(0, 3)) AS g(i)),
         |${permChain("c", "th")},
         |sk AS (SELECT cell, count(*) AS cnt FROM cpf GROUP BY cell),
         |probes(word) AS (VALUES $vals),
         |pw0 AS (SELECT word, ${am(rawWord, Gamma)} AS z0w FROM probes),
         |pw1 AS (SELECT word, ${mm("xor(z0w, z0w >> 30)", C2)} AS z1w FROM pw0),
         |pw2 AS (SELECT word, ${mm("xor(z1w, z1w >> 27)", C3)} AS z2w FROM pw1),
         |pwh AS (SELECT word, xor(z2w, z2w >> 31) AS th FROM pw2),
         |qcells AS (SELECT word, th, g.i AS i FROM pwh,
         |           unnest(generate_series(0, 3)) AS g(i)),
         |${permChain("q", "th")},
         |est AS (
         |  SELECT q.word, min(COALESCE(sk.cnt, 0)) AS est
         |  FROM qpf q LEFT JOIN sk USING (cell) GROUP BY q.word),
         |exact AS (SELECT tok, count(*) AS c FROM tok_rows GROUP BY tok)
         |SELECT e.word, CAST(e.est AS BIGINT) AS est,
         |  CAST(COALESCE(x.c, 0) AS BIGINT) AS exact
         |FROM est e LEFT JOIN exact x ON x.tok = e.word""".stripMargin
    }

    /** True dual implementation of Sampling.dsirSelect(target =
      * lang 'de', corpus = the rest, B = 64, k = 50): bucket counts
      * from the same splitmix token hashes (th % 64 ≡ the signed
      * & 63 — 64 divides 2^64), add-1 models with per-bucket ln
      * rounded to 9 BEFORE the difference, and the per-doc importance
      * weight folded in bucket order 0..63 via an ORDERED
      * list_reduce — the identical IEEE sequence Spark's positional
      * zip_with fold runs, so the double ranks reproduce exactly.
      */
    val dsirSelect: String =
      s"""WITH $tokenCtes,
         |b AS (
         |  SELECT t.doc_id, d.lang, CAST(t.th % 64 AS INTEGER) AS bucket
         |  FROM th t JOIN documents d USING (doc_id)),
         |tgt AS (SELECT bucket, count(*) AS c FROM b
         |        WHERE lang = 'de' GROUP BY bucket),
         |raw AS (SELECT bucket, count(*) AS c FROM b
         |        WHERE lang <> 'de' GROUP BY bucket),
         |tt AS (SELECT count(*) + 64 AS t FROM b WHERE lang = 'de'),
         |tr AS (SELECT count(*) + 64 AS t FROM b WHERE lang <> 'de'),
         |grid AS (SELECT g.b AS bucket
         |         FROM unnest(generate_series(0, 63)) AS g(b)),
         |delta AS (
         |  SELECT grid.bucket,
         |    round(ln(CAST(COALESCE(tgt.c, 0) + 1 AS DOUBLE)
         |             / CAST((SELECT t FROM tt) AS DOUBLE)), 9) -
         |    round(ln(CAST(COALESCE(raw.c, 0) + 1 AS DOUBLE)
         |             / CAST((SELECT t FROM tr) AS DOUBLE)), 9) AS d
         |  FROM grid LEFT JOIN tgt USING (bucket)
         |            LEFT JOIN raw USING (bucket)),
         |dc AS (SELECT doc_id, bucket, count(*) AS c FROM b
         |       WHERE lang <> 'de' GROUP BY doc_id, bucket),
         |dgrid AS (
         |  SELECT d.doc_id, g.b AS bucket
         |  FROM documents d, unnest(generate_series(0, 63)) AS g(b)
         |  WHERE d.lang <> 'de'),
         |terms AS (
         |  SELECT dg.doc_id, dg.bucket,
         |    CAST(COALESCE(dc.c, 0) AS DOUBLE) * delta.d AS x
         |  FROM dgrid dg LEFT JOIN dc USING (doc_id, bucket)
         |                JOIN delta USING (bucket)),
         |lw AS (
         |  SELECT doc_id,
         |    list_reduce(
         |      list_prepend(CAST(0.0 AS DOUBLE),
         |                   list(x ORDER BY bucket)),
         |      (a, x) -> a + x) AS lw
         |  FROM terms GROUP BY doc_id),
         |nt AS (SELECT doc_id, count(*) AS n FROM b
         |       WHERE lang <> 'de' GROUP BY doc_id)
         |SELECT l.doc_id,
         |  CAST(row_number() OVER (ORDER BY l.lw DESC, l.doc_id ASC)
         |       AS INTEGER) AS dsir_rank,
         |  CAST(COALESCE(nt.n, 0) AS BIGINT) AS n_toks
         |FROM lw l LEFT JOIN nt USING (doc_id)
         |QUALIFY dsir_rank <= 50""".stripMargin

    /** Exact replay of [[graft.ops.Classifier.perceptronFilter]]
      * (buckets=64, epochs unrolled): hashed token-count features
      * (th % 64) plus the constant bias bucket 64, batch-perceptron
      * weight updates over the even-doc_id train slice, final margins
      * for every document. All integer — the replay is bit-exact.
      */
    def perceptronFilter(epochs: Int): String = {
      // every CTE in the epoch chain is MATERIALIZED: w{t} references
      // w{t-1}, and inlining (DuckDB's default for single-use CTEs)
      // would expand the chain into an exponentially duplicated scan
      // tree — 2^epochs parquet opens
      val epochCtes = (0 until epochs).map { t =>
        s"""m$t AS MATERIALIZED (
           |  SELECT l.doc_id, l.y, sum(dc.c * w.w) AS m
           |  FROM lab l JOIN dc ON dc.doc_id = l.doc_id
           |             JOIN w$t w ON w.bucket = dc.bucket
           |  WHERE l.is_train GROUP BY 1, 2),
           |u$t AS MATERIALIZED (
           |  SELECT dc.bucket, sum(m.y * dc.c) AS u
           |  FROM m$t m JOIN dc ON dc.doc_id = m.doc_id
           |  WHERE m.y * m.m <= 0 GROUP BY 1),
           |w${t + 1} AS MATERIALIZED (
           |  SELECT w.bucket, CAST(w.w + COALESCE(u.u, 0) AS BIGINT) AS w
           |  FROM w$t w LEFT JOIN u$t u ON u.bucket = w.bucket)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $tokenCtes,
         |dc AS MATERIALIZED (
         |  SELECT doc_id, CAST(th % 64 AS INTEGER) AS bucket,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM th GROUP BY 1, 2
         |  UNION ALL
         |  SELECT doc_id, 64, 16 FROM documents),
         |lab AS MATERIALIZED (
         |  SELECT doc_id,
         |    CAST(CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END AS BIGINT)
         |      AS y,
         |    doc_id % 2 = 0 AS is_train
         |  FROM documents),
         |w0 AS (
         |  SELECT g.b AS bucket, CAST(0 AS BIGINT) AS w
         |  FROM unnest(generate_series(0, 64)) AS g(b)),
         |$epochCtes
         |SELECT l.doc_id, l.y,
         |  CAST(sum(dc.c * w.w) AS BIGINT) AS margin,
         |  sum(dc.c * w.w) > 0 AS pred
         |FROM lab l JOIN dc ON dc.doc_id = l.doc_id
         |           JOIN w$epochs w ON w.bucket = dc.bucket
         |GROUP BY 1, 2""".stripMargin
    }
  }

  /** DuckDB replay of [[graft.ops.BpeTrainer.train]]: k unrolled
    * rounds, each recomputing weighted pair counts, the
    * (cnt desc, w1, w2) argmax, and the greedy non-overlapping merge.
    * Greedy selection is expressed relationally: occurrences of the
    * winning pair at consecutive positions form islands (only
    * possible when w1 = w2), and greedy left-to-right keeps the
    * even offsets from each island start — the same function the
    * Spark side computes with its row-local fold.
    */
  private[graft] object BpeOracle {
    def merges(rounds: Int): String =
      s"""${chain(rounds)}
         |${(1 to rounds).map(r =>
             s"SELECT CAST($r AS INTEGER) AS round, w1, w2, pair_cnt FROM b$r")
           .mkString("\nUNION ALL ")}""".stripMargin

    /** Per-doc BPE token counts under the learned merges: join the
      * corpus's words onto v{rounds}' segmented lengths.
      */
    def encodeCounts(rounds: Int): String =
      s"""${chain(rounds)},
         |toks AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split_regex(trim(text), '\\s+'),
         |                       t -> t <> '')) AS word
         |  FROM documents)
         |SELECT t.doc_id,
         |  CAST(sum(len(v.syms)) AS BIGINT) AS bpe_tokens,
         |  count(*) AS words
         |FROM toks t JOIN v$rounds v USING (word)
         |GROUP BY t.doc_id""".stripMargin

    /** Corpus text → token-id sequences under the learned merges:
      * piece ids by weighted-frequency rank, per-doc (word pos,
      * piece pos) ordering — the [[graft.ops.BpeTrainer.tokenIds]]
      * replay.
      */
    def tokenIds(rounds: Int): String =
      s"""${chain(rounds)},
         |pid AS (
         |  SELECT piece, CAST(row_number() OVER (
         |      ORDER BY total DESC, piece ASC) AS INTEGER) AS token_id
         |  FROM (SELECT s.piece, sum(w.cnt) AS total
         |        FROM (SELECT word, unnest(syms) AS piece FROM v$rounds) s
         |        JOIN wc w USING (word) GROUP BY s.piece)),
         |tok AS (
         |  SELECT doc_id, wpos, word FROM (
         |    SELECT doc_id,
         |      unnest(list_filter(string_split_regex(trim(text), '\\s+'),
         |                         t -> t <> '')) AS word,
         |      unnest(range(0, len(list_filter(
         |        string_split_regex(trim(text), '\\s+'),
         |        t -> t <> '')))) AS wpos
         |    FROM documents)),
         |pc AS (
         |  SELECT t.doc_id, t.wpos, pp.ppos, pp.piece
         |  FROM tok t JOIN (
         |    SELECT word, unnest(syms) AS piece,
         |      unnest(range(0, len(syms))) AS ppos
         |    FROM v$rounds) pp USING (word))
         |SELECT pc.doc_id,
         |  CAST(row_number() OVER (PARTITION BY pc.doc_id
         |    ORDER BY pc.wpos, pc.ppos) - 1 AS BIGINT) AS pos,
         |  p.token_id
         |FROM pc JOIN pid p USING (piece)""".stripMargin

    /** Shared WITH-chain: word counts, char split, `rounds` unrolled
      * count/argmax/merge rounds (materialized CTEs).
      */
    private def chain(rounds: Int): String = {
      val roundCtes = (1 to rounds).map { r =>
        val prev = s"v${r - 1}"
        s"""p$r AS MATERIALIZED (
           |  SELECT v.syms[g.i] AS w1, v.syms[g.i + 1] AS w2,
           |    CAST(sum(v.cnt) AS BIGINT) AS pair_cnt
           |  FROM $prev v, unnest(generate_series(1, len(v.syms) - 1)) AS g(i)
           |  WHERE len(v.syms) >= 2 GROUP BY 1, 2),
           |b$r AS MATERIALIZED (SELECT w1, w2, pair_cnt FROM p$r
           |        ORDER BY pair_cnt DESC, w1, w2 LIMIT 1),
           |o$r AS MATERIALIZED (
           |  SELECT v.word, g.i AS pos
           |  FROM $prev v, b$r b,
           |    unnest(generate_series(1, len(v.syms) - 1)) AS g(i)
           |  WHERE v.syms[g.i] = b.w1 AND v.syms[g.i + 1] = b.w2),
           |s$r AS MATERIALIZED (
           |  SELECT word, pos FROM (
           |    SELECT word, pos,
           |      min(pos) OVER (PARTITION BY word, isl) AS isl_start
           |    FROM (SELECT word, pos,
           |            pos - row_number() OVER (PARTITION BY word
           |              ORDER BY pos) AS isl
           |          FROM o$r))
           |  WHERE (pos - isl_start) % 2 = 0),
           |v$r AS MATERIALIZED (
           |  SELECT e.word, min(e.cnt) AS cnt,
           |    list(CASE WHEN s.pos IS NOT NULL
           |              THEN (SELECT w1 || w2 FROM b$r)
           |              ELSE e.sym END ORDER BY e.pos) AS syms
           |  FROM (SELECT v.word, v.cnt, g.i AS pos, v.syms[g.i] AS sym
           |        FROM $prev v,
           |          unnest(generate_series(1, len(v.syms))) AS g(i)) e
           |  LEFT JOIN s$r s ON s.word = e.word AND s.pos = e.pos
           |  LEFT JOIN s$r q ON q.word = e.word AND q.pos = e.pos - 1
           |  WHERE q.pos IS NULL
           |  GROUP BY e.word)""".stripMargin
      }.mkString(",\n")
      s"""WITH wc AS MATERIALIZED (
         |  SELECT word, count(*) AS cnt FROM (
         |    SELECT unnest(list_filter(
         |        string_split_regex(trim(text), '\\s+'),
         |        t -> t <> '')) AS word
         |    FROM documents) GROUP BY word),
         |v0 AS MATERIALIZED (
         |  SELECT word, cnt,
         |    list_transform(generate_series(1, length(word)),
         |                   i -> substr(word, i, 1)) AS syms
         |  FROM wc),
         |$roundCtes""".stripMargin
    }
  }

  /** DuckDB replay of [[graft.ops.Clustering.kmeansAssign]] (k=4,
    * iters=2): init from the 4 smallest ids, LATERAL argmax-cosine
    * assignment (tie → smaller cluster, same as Spark's
    * first-match `array_position`), fixed-point centroid update
    * (identical integer sums and double divisions), repeated.
    */
  /** Johnson–Lindenstrauss random-projection replay: the Rademacher
    * sign rows are inlined (±1.0 renders losslessly) and the
    * fixed-point components are exact BIGINT arithmetic end-to-end,
    * so projection AND projected-space ranking hash-match
    * [[graft.ops.Similarity.randomProject]]/[[rpTopK]] bit-for-bit.
    */
  private[graft] object RpOracle {
    private def compCte(kOut: Int): String = {
      val rows = graft.ops.Similarity.rpSigns(kOut).zipWithIndex
        .map { case (sv, j) => s"($j, [${sv.mkString(",")}]::DOUBLE[])" }
        .mkString(",\n        ")
      s"""WITH signs(j, svec) AS (VALUES $rows),
         |comp AS (
         |  SELECT vec_id, j,
         |    CAST(sum(CAST(v AS BIGINT) * CAST(sv AS BIGINT)) AS BIGINT)
         |      AS comp
         |  FROM (
         |    SELECT e.vec_id, s.j,
         |      unnest(list_transform(e.embedding,
         |        x -> floor(CAST(x AS DOUBLE) * 1048576))) AS v,
         |      unnest(s.svec) AS sv
         |    FROM embeddings e, signs s)
         |  GROUP BY vec_id, j)""".stripMargin
    }

    val projectSql: String =
      s"""${compCte(8)}
         |SELECT vec_id, CAST(j AS BIGINT) AS pos, comp FROM comp""".stripMargin

    val topkSql: String =
      s"""${compCte(16)},
         |dots AS (
         |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
         |    CAST(sum(a.comp * b.comp) AS BIGINT) AS dot
         |  FROM comp a JOIN comp b USING (j)
         |  WHERE a.vec_id < 3 AND b.vec_id >= 3
         |  GROUP BY 1, 2),
         |norms AS (SELECT vec_id, CAST(sum(comp * comp) AS BIGINT) AS nn
         |          FROM comp GROUP BY vec_id)
         |SELECT q_id, n_id, rank, dot FROM (
         |  SELECT d.q_id, d.n_id, d.dot,
         |    row_number() OVER (PARTITION BY d.q_id ORDER BY
         |      CAST(d.dot AS DOUBLE) /
         |        sqrt(CAST(qn.nn AS DOUBLE) * CAST(nn2.nn AS DOUBLE)) DESC,
         |      d.n_id ASC) AS rank
         |  FROM dots d JOIN norms qn ON qn.vec_id = d.q_id
         |              JOIN norms nn2 ON nn2.vec_id = d.n_id)
         |WHERE rank <= 10""".stripMargin
  }

  /** Product-quantization replay: the ENTIRE pipeline — fixed-point
    * subvectors, per-subspace Lloyd's training on the vec_id<64 sample
    * (seeds = 16 smallest ids, 2 unrolled iterations, empty clusters
    * carried forward), encode, and ADC scoring — is integer-exact, so
    * DuckDB replays [[graft.ops.Pq]] bit-for-bit with BIGINT
    * arithmetic and one floor(sum/n) per centroid update (values
    * ≤ 2^27, exact in double on any engine). All subspaces train in
    * ONE set-based chain keyed by `sub` — no per-subspace unrolling.
    */
  private[graft] object PqOracle {
    private def iter(r: Int): String = {
      val p = r - 1
      s"""d$r AS (
         |  SELECT t.vec_id, t.sub, c.cl,
         |    sum((t.q - c.q) * (t.q - c.q)) AS dist
         |  FROM train t JOIN c$p c ON c.sub = t.sub AND c.spos = t.spos
         |  GROUP BY 1, 2, 3),
         |a$r AS (
         |  SELECT vec_id, sub, cl FROM (
         |    SELECT vec_id, sub, cl, row_number() OVER (
         |      PARTITION BY vec_id, sub ORDER BY dist, cl) AS rk
         |    FROM d$r)
         |  WHERE rk = 1),
         |m$r AS MATERIALIZED (
         |  SELECT a.sub, a.cl, t.spos,
         |    CAST(floor(CAST(sum(t.q) AS DOUBLE) / count(*)) AS BIGINT)
         |      AS q
         |  FROM a$r a JOIN train t
         |    ON t.vec_id = a.vec_id AND t.sub = a.sub
         |  GROUP BY 1, 2, 3),
         |c$r AS MATERIALIZED (
         |  SELECT * FROM m$r
         |  UNION ALL
         |  SELECT c.sub, c.cl, c.spos, c.q FROM c$p c
         |  WHERE NOT EXISTS (SELECT 1 FROM m$r x
         |                    WHERE x.sub = c.sub AND x.cl = c.cl))"""
        .stripMargin
    }

    private val prelude: String =
      s"""WITH fp AS MATERIALIZED (
         |  SELECT vec_id,
         |    CAST(pos // 8 AS INTEGER) AS sub,
         |    CAST(pos % 8 AS INTEGER) AS spos,
         |    CAST(floor(CAST(v AS DOUBLE) * 1048576) AS BIGINT) AS q
         |  FROM (SELECT vec_id, unnest(embedding) AS v,
         |          unnest(range(0, len(embedding))) AS pos
         |        FROM embeddings)),
         |tsel AS MATERIALIZED (
         |  SELECT vec_id, md5(CAST(vec_id AS VARCHAR) || 'pq') AS s
         |  FROM (SELECT DISTINCT vec_id FROM embeddings)
         |  ORDER BY s, vec_id LIMIT 64),
         |train AS MATERIALIZED (
         |  SELECT f.* FROM fp f JOIN tsel USING (vec_id)),
         |seedids AS (
         |  SELECT vec_id,
         |    CAST(row_number() OVER (ORDER BY s, vec_id) - 1 AS INTEGER)
         |      AS cl
         |  FROM tsel
         |  QUALIFY row_number() OVER (ORDER BY s, vec_id) <= 16),
         |c0 AS (SELECT s.cl, f.sub, f.spos, f.q
         |       FROM seedids s JOIN train f USING (vec_id)),
         |${iter(1)},
         |${iter(2)}""".stripMargin

    /** Argmin-code assignment of `src`'s fixed-point vectors against
      * the trained c2 codebook — parameterized so [[refreshSql]] can
      * encode the POST-change vectors under the ORIGINAL training.
      */
    private def encodeTail(src: String): String =
      s"""enc_d AS (
         |  SELECT f.vec_id, f.sub, c.cl,
         |    sum((f.q - c.q) * (f.q - c.q)) AS dist
         |  FROM $src f JOIN c2 c ON c.sub = f.sub AND c.spos = f.spos
         |  GROUP BY 1, 2, 3),
         |codes AS MATERIALIZED (
         |  SELECT vec_id, sub, cl AS code FROM (
         |    SELECT vec_id, sub, cl, row_number() OVER (
         |      PARTITION BY vec_id, sub ORDER BY dist, cl) AS rk
         |    FROM enc_d)
         |  WHERE rk = 1)""".stripMargin

    private val chain: String = s"$prelude,\n${encodeTail("fp")}"

    /** [[graft.ops.Pq.refreshCodes]]'s replay: training pinned to the
      * ORIGINAL corpus (the codebook is not retrained by a refresh),
      * encoding over the post-change vectors.
      */
    val refreshSql: String =
      s"""$prelude,
         |post AS (
         |  SELECT vec_id,
         |    CASE WHEN vec_id % 7 = 0 AND vec_id % 10 != 0
         |         THEN list_transform(embedding, v -> -v)
         |         ELSE embedding END AS embedding
         |  FROM embeddings WHERE vec_id % 9 != 0),
         |fpp AS MATERIALIZED (
         |  SELECT vec_id,
         |    CAST(pos // 8 AS INTEGER) AS sub,
         |    CAST(pos % 8 AS INTEGER) AS spos,
         |    CAST(floor(CAST(v AS DOUBLE) * 1048576) AS BIGINT) AS q
         |  FROM (SELECT vec_id, unnest(embedding) AS v,
         |          unnest(range(0, len(embedding))) AS pos
         |        FROM post)),
         |${encodeTail("fpp")}
         |SELECT vec_id, sub, code, TRUE AS refresh_equals_reencode
         |FROM codes""".stripMargin

    val encodeSql: String =
      s"""$chain
         |SELECT vec_id, sub, code FROM codes""".stripMargin

    private val scoreCtes: String =
      s"""qd AS (
         |  SELECT f.vec_id AS q_id, f.sub, c.cl,
         |    sum((f.q - c.q) * (f.q - c.q)) AS dist
         |  FROM fp f JOIN c2 c ON c.sub = f.sub AND c.spos = f.spos
         |  WHERE f.vec_id < 3
         |  GROUP BY 1, 2, 3),
         |scores AS (
         |  SELECT qd.q_id, co.vec_id AS n_id,
         |    CAST(sum(qd.dist) AS BIGINT) AS adc
         |  FROM codes co JOIN qd ON qd.sub = co.sub AND qd.cl = co.code
         |  WHERE co.vec_id >= 3
         |  GROUP BY 1, 2)""".stripMargin

    val topkSql: String =
      s"""$chain,
         |$scoreCtes
         |SELECT q_id, n_id, rank, adc FROM (
         |  SELECT q_id, n_id, adc, row_number() OVER (
         |    PARTITION BY q_id ORDER BY adc ASC, n_id ASC) AS rank
         |  FROM scores)
         |WHERE rank <= 10""".stripMargin

    /** ADC shortlist (top 40 = k·rerank) re-scored with the exact
      * fixed-point squared distance over the fp CTE — the full
      * [[graft.ops.Pq.adcRerankTopK]] chain replayed.
      */
    val rerankSql: String =
      s"""$chain,
         |$scoreCtes,
         |cand AS (
         |  SELECT q_id, n_id, adc FROM (
         |    SELECT q_id, n_id, adc, row_number() OVER (
         |      PARTITION BY q_id ORDER BY adc ASC, n_id ASC) AS rank
         |    FROM scores)
         |  WHERE rank <= 40),
         |exct AS (
         |  SELECT c.q_id, c.n_id, c.adc,
         |    CAST(sum((fq.q - fc.q) * (fq.q - fc.q)) AS BIGINT)
         |      AS exact
         |  FROM cand c
         |  JOIN fp fq ON fq.vec_id = c.q_id
         |  JOIN fp fc ON fc.vec_id = c.n_id
         |    AND fc.sub = fq.sub AND fc.spos = fq.spos
         |  GROUP BY 1, 2, 3)
         |SELECT q_id, n_id, rank, exact, adc FROM (
         |  SELECT q_id, n_id, exact, adc, row_number() OVER (
         |    PARTITION BY q_id ORDER BY exact ASC, adc ASC, n_id ASC)
         |      AS rank
         |  FROM exct)
         |WHERE rank <= 10""".stripMargin

    /** IVF-PQ: the same ADC scores restricted to coarse-cell-matched
      * candidates (qa probes 2 cells, corpus pins to 1 — the
      * [[ivfOracle]] LATERAL shape with its cell-DESC tie-break).
      */
    /** Streaming-gate replay: every (query vec_id%25=0, corpus) pair
      * whose cells match (2-probe) and whose exact ADC is within the
      * threshold — [[graft.ops.Pq.adcHitsStream]]'s semantics.
      */
    val streamSql: String = {
      val values = graft.ops.Similarity.ivfCentroids(8, 64).zipWithIndex
        .map { case (c, i) => s"($i, [${c.mkString(",")}]::DOUBLE[])" }
        .mkString(",\n        ")
      s"""$chain,
         |qd AS (
         |  SELECT f.vec_id AS qv, f.sub, c.cl,
         |    sum((f.q - c.q) * (f.q - c.q)) AS dist
         |  FROM fp f JOIN c2 c ON c.sub = f.sub AND c.spos = f.spos
         |  WHERE f.vec_id % 25 = 0
         |  GROUP BY 1, 2, 3),
         |scores AS (
         |  SELECT qd.qv, co.vec_id AS n_id,
         |    CAST(sum(qd.dist) AS BIGINT) AS adc
         |  FROM codes co JOIN qd ON qd.sub = co.sub AND qd.cl = co.code
         |  GROUP BY 1, 2),
         |cents(cell, cvec) AS (VALUES $values),
         |qcell AS (
         |  SELECT q.vec_id AS qv, c.cell
         |  FROM embeddings q, LATERAL (
         |    SELECT cell FROM cents
         |    ORDER BY list_dot_product(q.embedding::DOUBLE[], cvec) DESC,
         |             cell DESC
         |    LIMIT 2) c
         |  WHERE q.vec_id % 25 = 0),
         |ncell AS (
         |  SELECT n.vec_id AS n_id, c.cell
         |  FROM embeddings n, LATERAL (
         |    SELECT cell FROM cents
         |    ORDER BY list_dot_product(n.embedding::DOUBLE[], cvec) DESC,
         |             cell DESC
         |    LIMIT 1) c)
         |SELECT s.qv + 200000 AS q_id, s.n_id, s.adc
         |FROM scores s
         |JOIN qcell q ON q.qv = s.qv
         |JOIN ncell n ON n.n_id = s.n_id AND n.cell = q.cell
         |WHERE s.adc <= 900000000000""".stripMargin
    }

    val ivfSql: String = {
      val values = graft.ops.Similarity.ivfCentroids(8, 64).zipWithIndex
        .map { case (c, i) => s"($i, [${c.mkString(",")}]::DOUBLE[])" }
        .mkString(",\n        ")
      s"""$chain,
         |$scoreCtes,
         |cents(cell, cvec) AS (VALUES $values),
         |qcell AS (
         |  SELECT q.vec_id AS q_id, c.cell
         |  FROM embeddings q, LATERAL (
         |    SELECT cell FROM cents
         |    ORDER BY list_dot_product(q.embedding::DOUBLE[], cvec) DESC,
         |             cell DESC
         |    LIMIT 2) c
         |  WHERE q.vec_id < 3),
         |ncell AS (
         |  SELECT n.vec_id AS n_id, c.cell
         |  FROM embeddings n, LATERAL (
         |    SELECT cell FROM cents
         |    ORDER BY list_dot_product(n.embedding::DOUBLE[], cvec) DESC,
         |             cell DESC
         |    LIMIT 1) c
         |  WHERE n.vec_id >= 3)
         |SELECT q_id, n_id, rank, adc FROM (
         |  SELECT s.q_id, s.n_id, s.adc, row_number() OVER (
         |    PARTITION BY s.q_id ORDER BY s.adc ASC, s.n_id ASC) AS rank
         |  FROM scores s
         |  JOIN qcell q ON q.q_id = s.q_id
         |  JOIN ncell n ON n.n_id = s.n_id AND n.cell = q.cell)
         |WHERE rank <= 5""".stripMargin
    }
  }

  private[graft] object KmeansOracle {
    private def assignCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT e.vec_id, e.embedding, c.cl
         |  FROM embeddings e, LATERAL (
         |    SELECT cl FROM $cents
         |    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], cvec) DESC,
         |             cl ASC
         |    LIMIT 1) c)""".stripMargin

    private def updateCte(name: String, from: String): String =
      s"""${name}_s AS (
         |  SELECT cl, pos,
         |    CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS DOUBLE)
         |      / 1048576.0 / count(*) AS cv
         |  FROM (SELECT cl, unnest(embedding) AS v,
         |          unnest(range(0, len(embedding))) AS pos FROM $from)
         |  GROUP BY cl, pos),
         |$name AS (SELECT cl, list(cv ORDER BY pos) AS cvec
         |          FROM ${name}_s GROUP BY cl)""".stripMargin

    private val chain: String =
      s"""WITH c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cl,
         |         embedding::DOUBLE[] AS cvec
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |        ORDER BY vec_id LIMIT 4)),
         |${assignCte("a1", "c0")},
         |${updateCte("c1", "a1")},
         |${assignCte("a2", "c1")},
         |${updateCte("c2", "a2")},
         |${assignCte("af", "c2")}""".stripMargin

    val assignSql: String =
      s"""$chain
         |SELECT CAST(vec_id AS BIGINT) AS vec_id, cl AS cluster
         |FROM af""".stripMargin

    val cappedSql: String =
      s"""$chain
         |SELECT vec_id, cluster FROM (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id, cl AS cluster,
         |    row_number() OVER (PARTITION BY cl
         |      ORDER BY md5('cap1:' || CAST(vec_id AS VARCHAR)), vec_id)
         |      AS rk
         |  FROM af)
         |WHERE rk <= 10""".stripMargin
  }

  // =================================================================
  // DuckDB oracles — same column names/types as the Spark results.
  // =================================================================
  def oracleSql: Map[String, String] =
    graft.gates.RelationalGates.oracleSql ++
      graft.gates.TableGates.oracleSql ++
      graft.gates.StreamGates.oracleSql ++
      graft.gates.LlmGates.oracleSql ++
      graft.gates.FhirGates.oracleSql

}

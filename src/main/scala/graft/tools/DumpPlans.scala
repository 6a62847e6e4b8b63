package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes PLANS.md: formatted physical plans of the headline queries
  * with the scale-relevant properties called out. Run after plan
  * changes: `sbt "runMain graft.tools.DumpPlans"`.
  */
object DumpPlans {
  private val headline = Seq(
    "q1_agg" -> "partial+final hash aggregation, pruned scan",
    "q_filter_proj" -> "predicate pushdown into the parquet scan (incl. the date cast)",
    "q_broadcast_join" -> "dimension side broadcast, no shuffle of the fact table",
    "q_window_dedup" -> "single hash shuffle on the dedup key",
    "q_window_frames" -> "one Exchange on the 1000-way bucket key serves all three frame specs (one Window operator, no re-shuffle per frame)",
    "q_outer_join_residual" -> "residual ON predicate stays inside the LEFT join condition — no outer->inner rewrite, preserved rows intact",
    "q_fhir_pipeline" -> "whole envelope pipeline fused into codegen stages",
    "q_dedup_minhash" -> "LSH banding: projection pass + one bucket groupBy, no cross join",
    "q_ann_topk" -> "broadcast queries over a single corpus scan",
    "q_asof_join" -> "union + one (key,time) window pass, no join explosion",
    "q_bucketed_join" -> "co-located bucketed join: SortMergeJoin, no Exchange on either side",
    "q_skew_join" -> "salted join: hot keys scattered over (key, salt), small side replicated",
    "q_lateral" -> "LATERAL decorrelated into a ranked-window plan, no per-row subquery",
    "q_dedup_fuzzy" -> "blocked fuzzy dedup: one shuffle on the block key, banded levenshtein verify",
    "q_ann_ivf_indexed" -> "persisted IVF index probe: cell partition filter prunes directories before IO",
    "q_seq_pack" -> "per-shard running-sum window: one shuffle on the shard key, N shards pack in parallel",
    "q_chunk_windows" -> "row-local generator (posexplode over substrings): scan-parallel, no shuffle",
    "q_stratified_sample" -> "hash-threshold filter fused into the scan projection: row-local, no shuffle",
    "q_doc_repetition" -> "two-level hash aggregate keyed (doc_id, gram) then (doc_id): partial agg map-side, skew bounded by one doc's vocabulary",
    "q_vocab_build" -> "wordcount + TakeOrderedAndProject: no global sort of the vocabulary",
    "q_bm25" -> "row-local tf scans + one scalar aggregate broadcast back: no key shuffle",
    "q_sample_per_group" -> "single hash shuffle on the group key, per-group rank window",
    "q_change_feed" -> "snapshot diff as ONE full-outer join on the key, image explode",
    "q_tpch_q18" -> "HAVING rollup, then the tiny big-order set broadcast into both enrichment joins",
    "q_funnel" -> "three conditional min-aggregations chained on one shuffle key",
    "q_decontaminate_bloom" -> "bloom membership gate fused into the corpus scan; exact confirm join sees only survivors",
    "q_interval_join" -> "bin-bucketed interval join: range predicate turned into a hash equi-join on the bin key, no nested loop",
    "q_quantize_embedding" -> "int8 quantization: row-local generator over the scan, zero shuffles",
    "q_tpch_q6" -> "scan+filter+agg with every predicate pushed into the parquet scan",
    "q_temperature_mix" -> "per-source rates broadcast back onto the scan; corpus never shuffles before the filter",
    "q_dedup_segments" -> "segment-frequency aggregate + anti-join: two hash shuffles keyed on the segment, no doc x doc work",
    "q_hybrid_retrieval" -> "per-side TakeOrderedAndProject top-k BEFORE ranking: rank/fusion windows run over <=2k rows with a defined single-bucket partition, never the corpus",
    "q_dedup_keepbest" -> "survivor selection: ONE max_by aggregate keyed on the cluster label — no window, no per-cluster sort; the scores join onto the (already tiny) resolved-cluster set",
    "q_delta_export" -> "exported _delta_log read-back: plain pruned parquet scan of exactly the live add-set files, no graft code on the read path",
    "q_decontaminate_semantic" -> "IVF-prefiltered: benchmark probes broadcast, anti-join is a BroadcastHashJoin on the cell equi-key with the cosine threshold as residual — corpus streams once, zero corpus shuffles, no nested loop",
    "q_delta_export_skip" -> "selective exported-log read: StatsFileIndex prunes files by the log's min/max stats before any footer opens",
    "q_dedup_semdedup" -> "SemDeDup: candidates hash-join on the IVF cell key (one shuffle), cosine verify inside the join — no corpus x corpus work",
    "q_kmeans" -> "k-means final assignment: argmax-cosine against LITERAL centroids — one scan, zero joins, zero shuffles; each Lloyd's update was one k*dim hash aggregate",
    "q_delete_dv" -> "deletion-vector snapshot read: manifest-planned scan anti-joined against executor-decoded DV positions (broadcast while cardinality is manifest-bounded) — the deletes themselves wrote bitmaps, zero data files",
    "q_split_leakage_safe" -> "leakage-safe split: cluster-root map broadcast onto the corpus, md5 threshold row-local — corpus never shuffles",
    "q_dedup_url" -> "canonical-URL dedup: regexp canonicalization fused into the scan projection, ONE hash aggregate on the near-unique canonical key — the cheapest dedup pass runs first",
    "q_train_shards" -> "training-shard manifest: row-local md5 shard assignment, one nShards-group hash aggregate — the corpus shuffles zero times to PLAN the layout",
    "q_quality_classifier" -> "linear quality gate: every feature and the score fused into one codegen'd scan projection — row-local, zero shuffles, zero UDFs",
    "q_hash_embed_sim" -> "hash-embedding retrieval: one broadcast query vector over a single corpus scan, native HashEmbed expression inside codegen — zero corpus shuffles",
    "q_decontaminate_retro" -> "retro-purged snapshot read: manifest-planned scan minus executor-decoded DV positions — the purge itself wrote O(purged rows) bitmap bytes, zero data-file rewrites",
    "q_decontaminate_retro_cdf" -> "purge change feed: only files whose DV changed between the versions are read (file-granular CDF), one full-outer key join emits the delete pre-images — O(purged files), never a table rescan",
    "q_substring_dedup" -> "exact-substring dedup: native positional window hashes in the scan projection, one count aggregate + one hash join on the 8-byte hash key, per-doc span union as a window over DUPLICATED rows only — shuffle bytes independent of document length",
    "q_lm_score" -> "LM quality scoring: bigram/unigram LM tables hash-join onto the candidate bigrams (AQE broadcasts LM-sized sides), sorted-fold log-prob aggregate — corpus-sized side streams, only LM-table-sized state",
    "q_bpe_train" -> "BPE training: ONE corpus word-count shuffle, then every merge round is a vocabulary-sized pair aggregate + 1-row argmax collect + row-local fold apply — corpus never re-read, vocab never collected",
    "q_count_metadata" -> "metadata-only COUNT(*): the Catalyst rule collapses the pre-DV snapshot's count to a LocalRelation (zero files opened); the DV-bearing head keeps its anti-join and counts through it",
    "q_profile" -> "one-pass profiling: k exact countDistincts in ONE Expand-backed aggregate (no per-column scans), modal values from a single pair-count pass + per-column top-1 window over aggregated counts",
    "q_cdf_export" -> "change-data read-back: plain parquet scan of the exported _change_data files — the cdc payloads ARE the feed, no graft code on the consumer path",
    "q_bpe_encode" -> "tokenizer encode: vocabulary segmented once under the learned merges (row-local folds), corpus words join the vocab-sized pieces table — one scan + one small join, text never re-segmented per occurrence",
    "q_rp_project" -> "JL random projection: literal ±1 sign matrix, kOut codegen'd dot products per row — row-local, zero shuffles/joins/broadcasts, integer-exact fixed point",
    "q_rp_topk" -> "top-k in projected space: project both sides row-locally, broadcast queries, rank window — corpus never shuffles and each comparison touches kOut ints instead of dim floats",
    "q_allpairs_sim" -> "all-pairs similarity join: ONE term-table shuffle, candidates from a df-capped inverted-index self-join (fanout bounded at dfCap² per word — never a cross join), exact confirm via two hash joins back onto the term table",
    "q_shallow_clone" -> "shallow clone: O(manifest) metadata commit, zero data bytes copied — clone reads plan the SOURCE's files by absolute reference through the same StatsFileIndex; divergent mutations localize only their rewrite scope",
    "q_pq_encode" -> "PQ encode: sample-trained codebooks become literals in ONE codegen'd argmin scan — row-local, zero shuffles; 4-bit codes replace float32 (64x memory cut for the ANN index)",
    "q_pq_topk" -> "PQ ADC top-k: broadcast queries, corpus encoded row-locally, each comparison is m integer table lookups instead of a dim-float loop — corpus never shuffles, rank window per query",
    "q_pq_ivf" -> "IVF-PQ: coarse cell restricts ADC to probes/nCells of the corpus via a BroadcastHashJoin on the cell key — the full FAISS query shape, probes=nCells degenerates to exact ADC (spec-proven)",
    "q_html_extract" -> "HTML boilerplate removal: codegen'd regex projections + row-local line filter; the only shuffle is the per-doc reassembly aggregate (order restored by array_sort, partition-independent)",
    "q_replace_where" -> "REPLACE WHERE: stats-pruned rewrite scope — files provably outside the predicate carry by reference, only may-overlap files rewrite with their non-matching survivors; O(overlapping files), never O(table)",
    "q_rename_column" -> "RENAME COLUMN: one metadata-only commit (zero data IO at any table size) — reads scan physical names and alias back to logical; stats pruning translates predicates at the name boundary",
    "q_delete_update_where" -> "predicate DML (DELETE WHERE / UPDATE SET WHERE): stats-split rewrite scope, UPDATE is one conditional projection over only the may-match files — O(overlapping files), never O(table)",
    "q_tokenize_ids" -> "end-to-end tokenization: one corpus word-count shuffle, vocab-sized segmentation + id tables joined back (broadcast-sized), one per-doc ordering window — text is never re-segmented per occurrence",
    "q_stream_pq" -> "streaming PQ probe: stateless stream-static join on the coarse-cell equi-key with the exact integer ADC threshold as residual — no state store, corpus encoded row-locally, per-batch work bounded by probes/nCells",
    "q_merge_builder" -> "conditional MERGE: one left-outer join of only the key-overlapping files vs the broadcast source; first-true clause index + per-column conditional projection decide every row in ONE pass — no per-clause scans",
    "q_substring_remove" -> "exact-substring REMOVAL: only hashes shuffle (window-hash count + per-doc dead-index sets); the text rebuild is a codegen'd ROW-LOCAL positional filter — clean docs left-join an absent set and pass through untouched",
    "q_curation_funnel" -> "curation funnel (FUSED r14): every row-local stage flag — md5 hash, lang gate, quality keep, native bloom-probed shingle candidates — in ONE projection over ONE corpus scan (eagerly checkpointed flag-sized); the only corpus-wide shuffle is the keep-first hash window, the exact confirm broadcasts back. 23x at 100x data, was 143x",
    "q_funnel_incremental" -> "CDF-incremental curation: changed docs get fresh row-local flags, keeper election re-runs only in touched hash groups (broadcast semi/anti splits), untouched state carries verbatim — O(state scan + changed docs), 1.4x at 100x with a scale-constant batch",
    "q_pq_rerank" -> "PQ ADC shortlist (k·4) re-scored with the exact fixed-point distance — the exact pass touches candidates only (broadcast query vectors), never a second corpus scan",
    "q_pq_refresh" -> "CDF-maintained PQ codes: removed ids anti-join out (broadcast), new vectors encode row-locally under the unchanged codebook — O(code-table scan + changed vectors)",
    "q_cdf_tvf" -> "table_changes TVF: resolves at analysis to the same full-outer snapshot diff as the API call — SQL surface adds zero plan overhead",
    // ---- round 15: every remaining query above 4 s in the bench
    //      record gets an audited section (VERDICT r14 item 5). For
    //      the composite/streaming gates the dump is the final
    //      read-back plan; the in-gate cost is the fixture + proof
    //      harness, called out per entry ----
    "q_stream_funnel" -> "continuous streaming curation: each micro-batch folds the docs-table commits since the last watermark into the standing flags table via ONE exactly-once merge (txn watermark in the same commit); the gate's cost is dominated by its PROOF harness — a second full flag computation and a two-sided exceptAll equality — not the operator; the dumped plan is the final flags read-back",
    "q_pagerank" -> "host-graph PageRank: edges/degrees built once and CACHED across iterations, each Lloyd-style step is one hash aggregate on dst + a broadcast one-row dangling-mass aggregate (integer fixed point, no driver collect per iteration) — the dumped plan is the final rank read; per-iteration plans are the cached-scan + agg shape",
    "q_fhir_encode_immunization" -> "typed FHIR encode round trip: to_json synthesis + from_json(JsonToStructs) + nested-field projection all in ONE codegen'd row-local projection over the scan — zero shuffles, zero UDFs; the 4-6 s bench cost is an honest 150k-row JSON parse under the full-R4 Immunization schema",
    "q_fhir_encode_foreign" -> "generic-backbone FHIR encode (unregistered type): same single-projection from_json shape plus a get_json_object retention probe — row-local, zero shuffles",
    "q_fhir_encode_servicerequest" -> "tier-6 typed encode under the widest new schema (ServiceRequest: 38 top-level elements, 3 choice-type groups): still ONE codegen'd row-local projection — from_json breadth costs parse time, never a shuffle",
    "q_fhir_encode_coverage" -> "tier-6 typed encode with Money decimals and 2-level class/costToBeneficiary backbones: single projection over the supplier scan, zero shuffles",
    "q_ingest_e2e" -> "end-to-end ingest: envelope pipeline (cast/from_json/explode/window dedup) feeds per-type MERGE upserts into ACID tables — per batch: one window shuffle on the resource URL + one key-overlap-pruned merge join per touched table; the dumped plan is the final table read-back through StatsFileIndex (zero FS listings)",
    "q_train_ingest_e2e" -> "training-corpus ingest: the same exactly-once envelope → typed-encode → MERGE path over the documents stream — per-batch cost is the window dedup shuffle + the key-pruned merge; read-back plans as a manifest-planned scan",
    "q_stream_outer_join" -> "stream-stream OUTER join: watermarked state-store join — per-batch work is state lookups + watermark eviction (the honest stateful-streaming fixed cost the bench tail documents); the dumped plan is the drained result read",
    "q_stream_tws_session" -> "transformWithState sessionization: per-key timer-driven state (RocksDB-backed variant covered by q_stream_rocksdb) — per-batch work is one keyed state shuffle; the dumped plan is the drained session output read",
    "q_bloom_skipping" -> "file-level bloom membership index: the IN-list probe consults per-file bloom sidecars AFTER min/max stats (which cannot prune a non-clustered key) — files that provably lack all probed keys never open; the dumped plan shows the pruned parquet scan",
    "q_incremental_cluster" -> "liquid clustering on the incremental path: ONE compactSmallFiles pass range-sorts the coalesced bins on the cluster key (never a full optimize) — the same range predicate goes from scanning every file to <=2 of N; the dumped plan is the post-compaction pruned scan + aggregate")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/root/repo/PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# PLANS — headline physical plans (generated by graft.tools.DumpPlans)\n\n")
    sb.append(s"Input: `$dir`. Regenerate after plan-affecting changes.\n")
    headline.foreach { case (name, why) =>
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name — $why\n\n```\n$p```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}

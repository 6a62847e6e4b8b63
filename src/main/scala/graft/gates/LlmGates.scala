package graft.gates

import graft.ops.{Curation, Dedup, Multimodal, Similarity, TextStats, TopK}
import graft.tables.ResourceTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkEntry._

/** LLM-data-pipeline gates: dedup stacks, ANN/PQ similarity,
  * text quality/decontamination/curation, tokenization, sampling,
  * graphs, sketches and multimodal columns (the north-star suite).
  *
  * Split out of SparkEntry (round 17, verdict item 8) with ZERO
  * behavior change: same keys, same lambdas, same oracle SQL —
  * SparkEntry composes the per-domain maps back into the driver
  * contract. Helpers/fixtures stay in [[graft.SparkEntry]] (imported
  * above) so memoization remains JVM-global across domains.
  */
private[graft] object LlmGates {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- PII redaction (emails/phone runs → placeholders) ----
    "q_pii_redact" -> ((s, dir) => {
      events(s, dir).select(
        col("event_id"),
        TextStats.redactPii(concat_ws(" ",
          lit("contact"),
          concat(col("event_type"), lit("@example.com")),
          lit("tel"),
          (col("user_id") * 1234567).cast(StringType))).as("redacted"))
    }),


    // ---- dedup cluster resolution over minhash near-dup pairs,
    //      exact-oracled end-to-end (splitmix pair replay + recursive
    //      CC CTE) at any SF ----
    "q_dedup_resolve" -> ((s, dir) =>
      Dedup.resolveClusters(
        Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
          minJaccard = 0.2))),


    // ---- cluster resolution over EXACT cosine pairs — the same
    //      resolveClusters, but with a deterministic pair producer so a
    //      DuckDB recursive CTE (min-label connected components) can
    //      oracle the clustering itself ----
    "q_dedup_resolve_exact" -> ((s, dir) =>
      Dedup.resolveClusters(
        Similarity.cosinePairs(t(s, dir, "embeddings"), threshold = 0.45)
          .select(col("a_id").as("doc_a"), col("b_id").as("doc_b")))
        .select(col("doc_id").cast(LongType).as("doc_id"),
          col("canonical_id").cast(LongType).as("canonical_id"))),


    // ---- survivor selection after clustering: keep the best-quality
    //      member of each duplicate cluster (score = n_chars of the
    //      matching document, deterministic in both engines), ties to
    //      the smaller id. ONE max_by aggregate — no corpus window ----
    "q_dedup_keepbest" -> ((s, dir) => {
      val labels = Dedup.resolveClusters(
        Similarity.cosinePairs(t(s, dir, "embeddings"), threshold = 0.45)
          .select(col("a_id").as("doc_a"), col("b_id").as("doc_b")))
        .select(col("doc_id").cast(LongType).as("doc_id"),
          col("canonical_id").cast(LongType).as("canonical_id"))
      val scores = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast(DoubleType).as("score"))
      Dedup.keepBest(labels, scores)
    }),


    // ---- rank-weighted per-host keep quotas (the consumption side
    //      of host ranking): each source keeps ceil(10·rank/maxRank)
    //      docs by ascending id — integer ceil-DIV quota math over a
    //      broadcast host table + one per-host ranking window ----
    "q_host_quota" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val ranks = docs.groupBy(col("source").as("node"))
        .agg(sum(col("n_chars")).as("rank"))
      graft.ops.Graph.keepByHostRank(docs, "source", col("doc_id"),
          ranks, maxPerHost = 10)
        .select(col("doc_id"), col("source"))
    }),


    // ---- count-min sketch (Cormode-Muthukrishnan): d=4 × w=1024
    //      integer-count frequency sketch of the corpus token
    //      distribution — bounded memory however large the key space;
    //      probed estimates are overestimate-only (est >= exact).
    //      Integer sums + the splitmix hash family make the WHOLE
    //      sketch exactly oracle-replayable, unlike HLL/GK ----
    "q_cms_heavy" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val sketch = graft.ops.TextStats.cmsSketch(docs, "text")
      val probes = CmsProbeWords.toDF("word")
      val est = graft.ops.TextStats.cmsEstimate(sketch, probes)
      val exact = docs
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("exact"))
      est.join(exact, est("word") === exact("tok"), "left")
        .select(col("word"), col("est"),
          coalesce(col("exact"), lit(0L)).as("exact"))
    }),


    // ---- DSIR importance-resampling selection (Xie et al. 2023):
    //      hashed-token bag models of target (lang 'de') vs raw
    //      corpus, add-1 smoothed; per-doc importance log-weight is a
    //      ROW-LOCAL dot product against the 64 inlined model deltas
    //      (zero joins — the literal-model k-means pattern), then one
    //      bounded top-k. Doubles fold in fixed bucket order, so the
    //      oracle's ordered list_reduce replays the ranking exactly ----
    "q_dsir_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Sampling.dsirSelect(
        docs.filter(col("lang") =!= "de"),
        docs.filter(col("lang") === "de"),
        "doc_id", "text", k = 50)
    }),


    // ---- trained quality classifier (fastText-shaped linear model,
    //      batch perceptron over hash_embed buckets): integer-exact
    //      training on the even-doc_id half against a length-quality
    //      label (the corpus's lang/source columns are DRAWN FROM ONE
    //      WORD POOL — unlearnable by construction; n_chars ≥ 300 is
    //      a genuinely linear target the model hits ~97% on), every
    //      doc scored by the learned margin. The discriminative
    //      member of the quality triad (heuristics / LM / learned) ----
    "q_perceptron_filter" -> ((s, dir) =>
      graft.ops.Classifier.perceptronFilter(t(s, dir, "documents"),
        labelCol = col("n_chars") >= 300L,
        trainPred = col("doc_id") % 2 === 0)),


    // ---- host-graph PageRank (fixed-point integer, 3 iterations):
    //      the link-analysis quality signal web-scale pipelines weight
    //      documents by. Edges: customer→supplier per lineitem (with
    //      multiplicity — the raw link-graph shape) + supplier→customer
    //      back-edges for first line items, so mass propagates through
    //      real cycles; node ids namespaced (cust*10 / supp*10+1).
    //      Integer ranks are order-independent, so DuckDB replays all
    //      3 unrolled iterations bit-for-bit with BIGINT // division ----
    "q_pagerank" -> ((s, dir) => {
      val j = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
      val fwd = j.select((col("o_custkey") * 10).as("src"),
        (col("l_suppkey") * 10 + 1).as("dst"))
      val rev = j.filter(col("l_linenumber") === 1)
        .select((col("l_suppkey") * 10 + 1).as("src"),
          (col("o_custkey") * 10).as("dst"))
      graft.ops.Graph.pageRank(fwd.unionByName(rev), "src", "dst",
          iterations = 3)
        .select(col("node"), col("rank"))
    }),


    // ---- distributed k-means (spherical Lloyd's, k=4, 2 iterations):
    //      row-local argmax-cosine assignment against inlined literal
    //      centroids (zero joins/shuffles per scan) + one exact
    //      fixed-point aggregate per update. DuckDB replays the whole
    //      chain — init from the 4 smallest ids, both updates, final
    //      assignment — from the same parquet ----
    "q_kmeans" -> ((s, dir) =>
      graft.ops.Clustering.kmeansAssign(t(s, dir, "embeddings"),
        k = 4, iters = 2)
        .select(col("vec_id").cast(LongType).as("vec_id"),
          col("cluster"))),


    // ---- cluster-balanced downsample: at most 10 members per k-means
    //      cluster, chosen by salted-md5 rank (engine-replayable) —
    //      the topic-capping step after clustering ----
    "q_cluster_capped" -> ((s, dir) =>
      graft.ops.Clustering.clusterCapped(
        graft.ops.Clustering.kmeansAssign(t(s, dir, "embeddings"),
          k = 4, iters = 2)
          .select(col("vec_id").cast(LongType).as("vec_id"),
            col("cluster")),
        "vec_id", "cap1", perCluster = 10)),


    // ---- leakage-safe split: split by the near-dup CLUSTER root, so
    //      train/test never shares a near-duplicate pair — the
    //      contamination uniform hash splits cannot prevent ----
    "q_split_leakage_safe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val labels = Dedup.resolveClusters(
        Similarity.cosinePairs(emb, threshold = 0.45)
          .select(col("a_id").as("doc_a"), col("b_id").as("doc_b")))
        .select(col("doc_id").cast(LongType).as("doc_id"),
          col("canonical_id").cast(LongType).as("canonical_id"))
      graft.ops.Sampling.leakageSafeSplit(
        emb.select(col("vec_id").cast(LongType).as("vec_id")),
        "vec_id", labels, "doc_id", "canonical_id", "ls1",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("vec_id"), col("root_id"), col("split"))
    }),


    // ---- watermarked stream-stream LEFT-OUTER range join in the gate:
    //      views attributed to purchases within 10 minutes; unmatched
    //      views are RELEASED with null once the watermark proves no
    //      purchase can arrive (two far-future sentinel batches advance
    //      it; sentinels are filtered back out). MemoryStream feeding
    //      is gate harness plumbing, not operator semantics — the
    //      operator itself holds bounded state keyed by the watermark ----
    // ---- benchmark decontamination: char-5-gram overlap of the
    //      corpus (doc_id % 50 != 0) against a broadcast holdout set
    //      (doc_id % 50 == 0) ----
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextStats.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0))
    }),


    // ---- decontamination at unbroadcastable benchmark scale: Bloom
    //      membership gate on the corpus scan (codegen'd two-hash
    //      probe, no join) + exact confirm on the survivors only.
    //      Shares q_decontaminate's oracle — bloom+confirm must equal
    //      the exact set intersection bit-for-bit ----
    "q_decontaminate_bloom" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextStats.contaminationBloom(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0))
    }),


    // ---- SemDeDup: IVF-cell coarse quantization, then keep-first
    //      embedding dedup within each cell (drop a vector if an
    //      EARLIER same-cell vector is within cosine 0.4). Candidate
    //      work is O(sum cell^2) on the cell shuffle key, never
    //      corpus^2. Exact-oracled: the deterministic centroids are
    //      inlined into the SQL and DuckDB replays the same
    //      assignment + NOT EXISTS predicate (nearest within-cell
    //      pair sits ~1.7e-3 from the threshold at sf0.01) ----
    "q_dedup_semdedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ops.Dedup.semDedup(emb, threshold = 0.4, nCells = 8,
          dim = 64)
        .select(col("vec_id"), col("label"))
    }),


    // ---- semantic decontamination: corpus embeddings within cosine
    //      0.45 of a benchmark embedding probing their IVF cell are
    //      dropped — the leakage n-gram decontamination misses.
    //      Benchmark side fans out to its 2 nearest cells and is
    //      broadcast; the anti-join carries `cell` as a hash equi-key
    //      (BroadcastHashJoin, not a nested loop), so each corpus row
    //      scores only against benchmark vectors sharing its cell —
    //      O(N·B·probes/nCells) and the corpus never shuffles.
    //      Exact-oracled: the deterministic centroids are inlined and
    //      DuckDB replays the same assignment + NOT EXISTS predicate ----
    "q_decontaminate_semantic" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ops.Similarity.semanticDecontaminateIvf(
          emb.filter(col("vec_id") >= 50),
          emb.filter(col("vec_id") < 50), threshold = 0.45,
          nCells = 8, dim = 64, probes = 2)
        .select(col("vec_id"), col("label"))
    }),


    // ---- RETROACTIVE decontamination of a live table: the benchmark
    //      arrives AFTER ingest, contaminated docs (char-25-gram
    //      overlap ratio >= 0.5) are purged via deletion-vector
    //      deletes — zero data files rewritten (the fixture asserts
    //      the manifest is unchanged), O(purged rows) not O(table).
    //      At 100 TB a benchmark refresh otherwise means rewriting
    //      every file that holds a contaminated doc. The oracle
    //      replays identify+delete as a NOT-IN filter over the same
    //      deterministic shingle overlap ----
    "q_decontaminate_retro" -> ((s, dir) =>
      retroDemo(s, dir)._1.read()
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"))),


    // ---- the same purge as seen by a DOWNSTREAM consumer: CDF of
    //      the delete commit emits exactly the purged docs as delete
    //      events (file-granular — only files whose DV changed are
    //      read), so incremental consumers (LSH index refresh, shard
    //      rebuild) process O(purged) rows, never a table rescan ----
    "q_decontaminate_retro_cdf" -> ((s, dir) => {
      val (tab, v1, v2) = retroDemo(s, dir)
      tab.changes(v1, v2, "doc_id")
        .select(col("doc_id"), col("lang"),
          col("_change_type").as("change_type"))
    }),


    // =============================================================
    // LLM-data-pipeline operators (north star, first-class)
    // =============================================================

    // ---- exact dedup: hash groupBy ----
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")),


    // ---- normalized content fingerprint (md5, oracle-matched) ----
    "q_dedup_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
    }),


    // ---- MinHash + LSH near-dup candidates (no SQL oracle) ----
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
        minJaccard = 0.2)),


    // ---- SimHash near-dup pairs (no SQL oracle) ----
    "q_dedup_simhash" -> ((s, dir) =>
      // maxHamming=3 — the canonical 64-bit simhash near-dup distance
      // (Manku et al., WWW'07): 4 bands of 16 bits, small buckets.
      // The operator's banding scales to any maxHamming (pigeonhole,
      // maxHamming+1 bands), but wider distances legitimately cost
      // more candidates — the gate exercises the standard config.
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3)),


    // ---- exact n-gram Jaccard on LSH candidates (no SQL oracle) ----
    "q_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        minJaccard = 0.1)),


    // ---- HTML main-content extraction (boilerplate removal): the
    //      docs wrapped in a deterministic page template (script/
    //      style/nav/ad/footer chrome), then the extractor must
    //      recover exactly the paragraph content — a true dual
    //      implementation (Spark column algebra vs DuckDB SQL), not
    //      an inlined-constant replay ----
    "q_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><script>var x = 1 < 2;</script>" +
          "<style>p{margin:0}</style></head>\n"),
        lit("<!-- rendered by graft -->\n"),
        lit("<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>\n"),
        lit("<h1>"), col("source"), lit("</h1>\n"),
        lit("<p>"), col("text"), lit(" &amp; more</p>\n"),
        lit("<div><a href=\"/ad\">Sponsored</a></div>\n"),
        lit("<footer>&copy; 2026 <a href=\"/t\">Terms</a></footer>\n"),
        lit("</html>"))
      TextStats.extractMainContent(
        t(s, dir, "documents").withColumn("html", html))
    }),


    // ---- all-pairs bag-of-words similarity join: df-cut inverted-
    //      index candidates (Bayardo WWW'07 shape) + exact integer
    //      confirm; dot evidence column is exact BIGINT ----
    "q_allpairs_sim" -> ((s, dir) =>
      TextStats.allPairsSimilarity(t(s, dir, "documents"),
        threshold = 0.8, dfCap = 100)),


    // ---- embedding cosine near-dup pairs (exact, oracle-matched) ----
    "q_dedup_embedding" -> ((s, dir) =>
      Similarity.cosinePairs(t(s, dir, "embeddings"), threshold = 0.45)),


    // ---- per-label embedding centroids (k-means E-step / IVF coarse
    //      quantizer training): DECIMAL sums → order-independent,
    //      engine-reproducible ----
    "q_centroids" -> ((s, dir) =>
      Similarity.centroids(t(s, dir, "embeddings"), "label", "embedding")),


    // ---- int8 symmetric embedding quantization (the training-serving
    //      compression step), exploded to scalar rows so the gate
    //      hash-compares pure integers. q = floor(v·127/max|v| + 0.5):
    //      identical-expression half-up rounding in both engines;
    //      row-local, zero shuffles, codegen'd end to end ----
    "q_quantize_embedding" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .withColumn("_maxabs",
          array_max(transform(col("embedding"), v => abs(v)))
            .cast(DoubleType))
        .select(col("vec_id"), col("_maxabs"),
          posexplode(col("embedding")).as(Seq("idx", "v")))
        .select(col("vec_id"), col("idx"),
          floor(col("v").cast(DoubleType) * lit(127.0) / col("_maxabs")
            + lit(0.5)).cast(IntegerType).as("qv"))
    }),


    // ---- ANN: brute-force cosine top-k (oracle-matched) ----
    "q_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 3), emb.filter(col("vec_id") >= 3),
        k = 10)
    }),


    // ---- Johnson–Lindenstrauss random projection 64→8 dims (exact:
    //      Rademacher signs × fixed-point inputs — every component is
    //      an integer), exploded to scalar rows for the hash compare ----
    "q_rp_project" -> ((s, dir) =>
      Similarity.randomProject(t(s, dir, "embeddings"), kOut = 8)
        .select(col("vec_id"),
          posexplode(col("rp")).as(Seq("pos", "comp")))
        .select(col("vec_id"), col("pos").cast(LongType).as("pos"),
          col("comp"))),


    // ---- top-k in the 16-dim PROJECTED space (the JL memory/IO
    //      trade); integer dots/norms make rank + dot evidence exact ----
    "q_rp_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.rpTopK(
        emb.filter(col("vec_id") < 3), emb.filter(col("vec_id") >= 3),
        k = 10, kOut = 16)
    }),


    // ---- product quantization encode: sample-trained codebooks
    //      (vec_id < 64, FAISS's bounded-sample contract), row-local
    //      argmin over literal centroids — all integer-exact ----
    "q_pq_encode" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = pqMemo.computeIfAbsent(dir, _ => graft.ops.Pq.trainOn(emb))
      graft.ops.Pq.encode(emb, cb)
        .select(col("vec_id"),
          posexplode(col("codes")).as(Seq("sub", "code")))
    }),


    // ---- PQ ADC top-k: m integer table lookups per candidate instead
    //      of a dim-float loop; exact BIGINT adc evidence ----
    "q_pq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = pqMemo.computeIfAbsent(dir, _ => graft.ops.Pq.trainOn(emb))
      graft.ops.Pq.adcTopK(emb.filter(col("vec_id") < 3),
        emb.filter(col("vec_id") >= 3), cb, topK = 10)
    }),


    // ---- PQ re-rank: ADC shortlists k·4 candidates, the exact
    //      fixed-point distance re-ranks them — Jégou's accuracy
    //      rescue, integer-exact through the oracle ----
    "q_pq_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = pqMemo.computeIfAbsent(dir, _ => graft.ops.Pq.trainOn(emb))
      graft.ops.Pq.adcRerankTopK(emb.filter(col("vec_id") < 3),
        emb.filter(col("vec_id") >= 3), cb, topK = 10, rerank = 4)
    }),


    // ---- CDF-maintained PQ codes: deleted/re-delivered vectors
    //      leave the code table, new ones encode row-locally under
    //      the UNCHANGED codebook (FAISS add/remove_ids shape) — the
    //      gate proves refresh ≡ re-encode row-identically via a real
    //      table's change feed, and the oracle replays the encode
    //      chain over the post-change vectors with training pinned to
    //      the original corpus ----
    "q_pq_refresh" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val cb = pqMemo.computeIfAbsent(dir, _ => graft.ops.Pq.trainOn(emb))
      // fixture commits memoized per dir (the board convention for
      // ACID-table gates): the timed operator is the refresh itself
      val (tab, v1, v2) = pqRefreshDemoMemo.computeIfAbsent(dir, _ => {
        val tableDir = java.nio.file.Files
          .createTempDirectory("graft_pq_refresh").toString
        val tb = graft.tables.ResourceTable(s, s"$tableDir/emb.parquet")
        tb.createIfNotExists(emb.select("vec_id", "embedding").schema)
        tb.upsert(emb.select("vec_id", "embedding")
          .filter(col("vec_id") % 10 =!= 0), "vec_id")
        val a = tb.latestVersion.get
        // inserts (the held-out %10 tranche) + updates (%7 vectors
        // negated — a content change the old codes cannot cover)
        tb.upsert(emb.select("vec_id", "embedding")
          .filter(col("vec_id") % 10 === 0)
          .unionByName(emb.select("vec_id", "embedding")
            .filter(col("vec_id") % 7 === 0 && col("vec_id") % 10 =!= 0)
            .withColumn("embedding",
              transform(col("embedding"), v => -v))), "vec_id")
        tb.deleteWhere(col("vec_id") % 9 === 0)
        (tb, a, tb.latestVersion.get)
      })
      val codes1 = graft.ops.Pq.encode(tab.readVersion(v1), cb)
        .select(col("vec_id"), col("codes"))
      val refreshed = graft.ops.Pq.refreshCodes(codes1,
        tab.changes(v1, v2, "vec_id"), cb).cache()
      val reencoded = graft.ops.Pq.encode(tab.read(), cb)
        .select(col("vec_id"), col("codes"))
      // multiset equality in ONE pass: signed-count symmetric diff —
      // exactly the exceptAll-both-directions-empty predicate, at half
      // the scans and one aggregate instead of two (guide §2.3/§2.4)
      val equal = refreshed.withColumn("_s", lit(1L))
        .unionByName(reencoded.withColumn("_s", lit(-1L)))
        .groupBy(col("vec_id"), col("codes"))
        .agg(sum(col("_s")).as("_d"))
        .filter(col("_d") =!= 0L)
        .isEmpty
      val out = refreshed
        .select(col("vec_id"),
          posexplode(col("codes")).as(Seq("sub", "code")))
        .withColumn("refresh_equals_reencode", lit(equal)).cache()
      out.count()
      refreshed.unpersist()
      out
    }),


    // ---- IVF-PQ: coarse-cell candidate restriction + ADC scoring,
    //      the full FAISS query shape; probes=2 of 8 cells ----
    "q_pq_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = pqMemo.computeIfAbsent(dir, _ => graft.ops.Pq.trainOn(emb))
      graft.ops.Pq.ivfAdcTopK(emb.filter(col("vec_id") < 3),
        emb.filter(col("vec_id") >= 3), cb, topK = 5, probes = 2)
    }),


    // ---- ANN scale path: LSH-bucketed near-dup. Exact oracle: the
    //      deterministic hyperplanes are inlined into the SQL ----
    "q_ann_lsh" -> ((s, dir) =>
      Similarity.lshCosinePairs(t(s, dir, "embeddings"), threshold = 0.3,
        planes = 8)),


    // ---- token counting ----
    "q_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextStats.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast(LongType).as("n_chars"))
    }),


    // ---- quality scoring ----
    "q_text_quality" -> ((s, dir) => {
      TextStats.qualityFeatures(t(s, dir, "documents"))
        .select("doc_id", "n_tokens", "avg_word_len", "stopword_ratio")
    }),


    // ---- deterministic hash split (train/val/test): stable across
    //      re-runs/appends; md5 makes it engine-reproducible ----
    "q_hash_split" -> ((s, dir) => {
      graft.ops.Sampling.hashSplit(t(s, dir, "documents"), "doc_id", "s1",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("cnt"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
    }),


    // ---- stratified deterministic sampling: sampleBy semantics with a
    //      content hash — per-source up/down-weighting of a corpus ----
    "q_stratified_sample" -> ((s, dir) => {
      graft.ops.Sampling.stratifiedByHash(t(s, dir, "documents"),
          "doc_id", "lang", "mix1",
          Seq("en" -> 0.25, "de" -> 1.0, "fr" -> 0.5, "zh" -> 0.1))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
    }),


    // ---- corpus-level segment dedup (C4-style boilerplate removal):
    //      fixed 8-word windows; any window text appearing >= 2 times
    //      ACROSS the corpus is dropped from every document ----
    "q_dedup_segments" -> ((s, dir) => {
      val segmented = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), expr(
          "transform(sequence(0, (size(w)-1) DIV 8), " +
            "i -> array_join(slice(w, i*8+1, 8), ' '))").as("segs"))
      Dedup.dedupSegments(segmented, "doc_id", "segs", minDupCount = 2)
    }),


    // ---- exact-substring dedup at window granularity (Lee et al.
    //      "Deduplicating Training Data" shape): every 8-token window
    //      repeated anywhere in the corpus marks its span; per-doc
    //      union of marked spans → removable-token bookkeeping.
    //      All-integer output; the oracle replays the splitmix window
    //      hashes bit-for-bit ----
    "q_substring_dedup" -> ((s, dir) =>
      Dedup.duplicatedWindowSpans(t(s, dir, "documents"),
        "doc_id", "text", w = 8)),


    // ---- the TRANSFORM half of exact-substring dedup: each doc
    //      rewritten with every duplicated 8-token span CUT, survivors
    //      re-joined in order (the corpus a trainer feeds). Oracle
    //      replays hash → dup → covered-index set → ordered string_agg
    //      reassembly — the full rewritten TEXT hash-matches ----
    "q_substring_remove" -> ((s, dir) =>
      Dedup.removeDuplicatedSpans(t(s, dir, "documents"),
        "doc_id", "text", w = 8)),


    // ---- CCNet-style LM quality filter: bigram stupid-backoff LM
    //      trained on the even-doc_id half (the "Wikipedia" reference
    //      corpus), odd-doc_id half scored by avg token log-prob;
    //      top-25 most-reference-like docs. The double score ranks
    //      but is NOT output (ln() is not bit-portable across
    //      engines — the q_bm25 convention); rank + the exact integer
    //      evidence hash-match ----
    "q_lm_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 2 === 0)
      val cand = docs.filter(col("doc_id") % 2 === 1)
      val scored = graft.ops.LangModel.scoreDocs(cand,
        graft.ops.LangModel.bigramLm(train),
        graft.ops.LangModel.unigramLm(train))
      scored.orderBy(col("avg_logp").desc, col("doc").asc).limit(25)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("avg_logp").desc, col("doc").asc)))
        .select(col("rank"), col("doc"), col("n_bigrams"),
          col("n_hits"), col("n_backoff"), col("n_oov"))
    }),


    // ---- temperature-based source mixing: per-source keep rates
    //      (n_min/n_s)^(1-α) flatten a skewed corpus toward uniform;
    //      hash-threshold selection, corpus never shuffles. The
    //      stratum is synthesized skewed (6:3:1) because the fixture's
    //      real sources are uniform ----
    "q_temperature_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("src_grp",
        when(col("doc_id") % 10 < 6, "big")
          .when(col("doc_id") % 10 < 9, "mid")
          .otherwise("small"))
      graft.ops.Sampling.temperatureMix(docs, "doc_id", "src_grp",
          salt = "mix2", alpha = 0.5)
        .groupBy(col("src_grp"))
        .agg(count(lit(1)).as("kept_cnt"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
    }),


    // ---- GPT-style sequence packing: per-shard token stream cut into
    //      fixed 512-token training sequences; window running sum ----
    "q_seq_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        TextStats.tokenCount(col("text")).as("n_tokens"))
      graft.ops.Packing.packSequences(docs, "source", "doc_id",
        "n_tokens", budget = 512L)
    }),


    // ---- fixed-size overlapping chunk windows (RAG/context prep) ----
    "q_chunk_windows" -> ((s, dir) => {
      graft.ops.Packing.chunkWindows(
        t(s, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", size = 120, stride = 90)
    }),


    // ---- language ID heuristic (stopword-fraction argmax; oracled:
    //      the same scoring is plain SQL over a profiles VALUES list) --
    "q_lang_id" -> ((s, dir) =>
      TextStats.langId(t(s, dir, "documents"))
        .select("doc_id", "lang", "predicted_lang")),


    // ---- ANN via typed per-partition-heap Aggregator — must equal
    //      the rank-window result exactly (same oracle) ----
    "q_ann_topk_agg" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ops.TopK.bruteForceTopKAgg(
        emb.filter(col("vec_id") < 3), emb.filter(col("vec_id") >= 3),
        k = 10)
    }),


    // ---- ANN scale path 2: IVF cell-pruned top-k (no oracle) ----
    "q_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(
        emb.filter(col("vec_id") < 3), emb.filter(col("vec_id") >= 3),
        k = 5)
    }),


    // ---- IVF multi-probe: queries fan out to their 3 best cells —
    //      the recall knob of the scale path. Exact oracle: the
    //      deterministic centroids are inlined into the SQL ----
    "q_ann_ivf_probe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(
        emb.filter(col("vec_id") < 3), emb.filter(col("vec_id") >= 3),
        k = 5, probes = 3)
    }),


    // ---- persisted IVF index: corpus partitioned by coarse cell at
    //      write time, probes prune partitions before IO; identical
    //      results to q_ann_ivf_probe by construction (same oracle) ----
    "q_ann_ivf_indexed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idx = java.nio.file.Files
        .createTempDirectory("graft_ivf").toString
      Similarity.writeIvfIndex(emb.filter(col("vec_id") >= 3), idx)
      Similarity.ivfTopKIndexed(emb.filter(col("vec_id") < 3),
        s.read.parquet(idx), k = 5, probes = 3)
    }),


    // ---- BPE-ish subword counting (the lookahead split itself is not
    //      RE2-expressible; the oracle counts token starts instead) ----
    "q_subword_count" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextStats.subwordCount(col("text")).as("n_subwords"))
    }),


    // ---- KMV bottom-k sketches: per-language vocabulary sketch and
    //      pairwise Jaccard between languages (TypedImperativeAggregate;
    //      deterministic; no SQL oracle — DuckDB has no KMV) ----
    "q_sketch_jaccard" -> ((s, dir) => {
      import graft.functions.BottomKSketch.{bottom_k_sketch, jaccard}
      val k = 128
      val words = t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      val sketches = words.groupBy("lang")
        .agg(bottom_k_sketch(col("word"), k).as("sketch"))
      val a = sketches.select(col("lang").as("lang_a"),
        col("sketch").as("sk_a"))
      val b = sketches.select(col("lang").as("lang_b"),
        col("sketch").as("sk_b"))
      a.join(b, col("lang_a") < col("lang_b"))
        .select(col("lang_a"), col("lang_b"),
          jaccard(col("sk_a"), col("sk_b"), k).as("est_jaccard"))
    }),


    // ---- multimodal frame sampling: explode payload into strided
    //      fixed-size frames, aggregate per media (integer math only,
    //      so the frame arithmetic oracles exactly) ----
    "q_multimodal_frames" -> ((s, dir) => {
      Multimodal.sampleFrames(
          Multimodal.asMediaTable(t(s, dir, "documents")),
          frameBytes = 64, stride = 2)
        .groupBy(col("media_id"))
        .agg(first(col("meta.n_bytes")).as("n_bytes"),
          count(lit(1)).as("n_frames"),
          max(col("frame_idx")).cast(LongType).as("max_idx"))
    }),


    // ---- multimodal metadata path: format + byte count only (the
    //      md5-derived width/height fakes are oracled end-to-end by
    //      q_multimodal_features). Reading meta.* only also proves the
    //      binary payload column is pruned at the scan ----
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.asMediaTable(t(s, dir, "documents"))
        .select(col("media_id"), col("meta.format").as("format"),
          col("meta.n_bytes").as("n_bytes"))),


    // ---- multimodal exact dedup: checksum the opaque BINARY payload
    //      (the first dedup pass of any image/audio corpus — no decode
    //      needed, one hash-aggregate shuffle) ----
    "q_multimodal_dedup" -> ((s, dir) =>
      Multimodal.asMediaTable(t(s, dir, "documents"))
        .groupBy(md5(col("payload")).as("payload_md5"))
        .agg(min(col("media_id")).as("keep_id"),
          count(lit(1)).as("dup_cnt"))),


    // ---- multimodal plumbing: binary payloads + features — exact
    //      oracle since the stub decode is md5-derived ----
    "q_multimodal_features" -> ((s, dir) => {
      // Scalars only in the output: the driver's rows-only stability
      // check sorts the result with pandas, and an array column crashes
      // that sort (round-1 q_multimodal_features err). The array itself
      // is exercised by reducing it, not by returning it.
      Multimodal.extractFeatures(
          Multimodal.asMediaTable(t(s, dir, "documents")))
        .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          size(col("features")).cast("long").as("n_features"),
          aggregate(col("features"), lit(0.0d), (a, x) => a + x)
            .as("feat_sum"),
          element_at(col("features"), 1).as("feat0"))
    }),


    // ---- string edit/transform functions (levenshtein & friends) ----
    "q_string_edit" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_custkey"),
        levenshtein(col("c_name"), lit("Customer#000000001"))
          .cast(LongType).as("edit_dist"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"),
        reverse(col("c_name")).as("name_rev"),
        instr(col("c_name"), "9").cast(LongType).as("pos9"),
        repeat(col("c_mktsegment"), 2).as("seg2"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"))
    }),


    // ---- KMV (k-minimum-values) distinct sketch, oracled: md5 is
    //      bit-identical across engines, so the kth-smallest-hash
    //      estimate is an EXACT cross-engine match — the oracle-able
    //      twin of the HLL path in q_approx_distinct ----
    "q_kmv_distinct" -> ((s, dir) => {
      // fact-table spread (the RelationalGates loader-shadow pattern):
      // the scan+partial-distinct otherwise runs as the single task of
      // the one-row-group file (guide §2.5). Placement only.
      graft.Par.spreadIfLarge(t(s, dir, "lineitem"))
        .createOrReplaceTempView("lineitem_kmv")
      s.sql(
        """WITH keys AS (
          |  SELECT DISTINCT l_returnflag AS flag, l_partkey
          |  FROM lineitem_kmv),
          |hashed AS (
          |  SELECT DISTINCT flag,
          |    CAST(conv(substring(md5(CAST(l_partkey AS STRING)), 1, 15),
          |         16, 10) AS BIGINT) AS h
          |  FROM keys),
          |ranked AS (
          |  SELECT flag, h,
          |    row_number() OVER (PARTITION BY flag ORDER BY h ASC) AS rn,
          |    count(*) OVER (PARTITION BY flag) AS total
          |  FROM hashed)
          |SELECT flag,
          |  CAST(CASE WHEN total < 256 THEN CAST(total AS DOUBLE)
          |       ELSE 255.0 / (CAST(h AS DOUBLE) / 1152921504606846976.0)
          |       END AS DOUBLE) AS est_distinct,
          |  CAST(total AS BIGINT) AS n_hashes
          |FROM ranked WHERE rn = least(256, total)""".stripMargin)
    }),


    // ---- exact character-3-gram Jaccard, all pairs over a pinned
    //      subset — the oracle-able anchor for the LSH candidate paths
    //      (q_dedup_minhash / q_ngram_jaccard estimate this) ----
    "q_ngram_exact" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("documents_ng")
      s.sql(
        """WITH docs AS (
          |  SELECT doc_id,
          |    array_distinct(transform(sequence(1, char_length(text) - 2),
          |      i -> substring(text, i, 3))) AS sh
          |  FROM documents_ng WHERE doc_id < 60 AND char_length(text) >= 3)
          |SELECT doc_a, doc_b, jaccard FROM (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |    CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE) /
          |    CAST(size(a.sh) + size(b.sh)
          |         - size(array_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
          |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id)
          |WHERE jaccard >= 0.1""".stripMargin)
    }),


    // ---- TF-IDF-style top term per document (tf weighted by inverse
    //      document frequency; exact int ratio so it oracles) ----
    "q_tfidf" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val tf = toks.groupBy("doc_id", "word")
        .agg(count(lit(1)).as("tf"))
      val dfreq = toks.groupBy("word")
        .agg(countDistinct(col("doc_id")).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("word").asc)
      tf.join(dfreq, Seq("word"))
        .withColumn("score",
          col("tf").cast(DoubleType) / col("df").cast(DoubleType))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("word").as("top_word"),
          col("tf"), col("df"), col("score"))
    }),


    // ---- Gopher-style repetition filters per document: distinct-word
    //      ratio, top word share, top bigram share (word-granular — the
    //      corpus is single-line). Boilerplate/degenerate-generation
    //      detection that exact and near dedup both miss ----
    "q_doc_repetition" -> ((s, dir) =>
      TextStats.repetitionFeatures(t(s, dir, "documents"))),


    // ---- CCNet-style LM perplexity filter (Wenzek 2019): bigram LM
    //      trained on the clean English slice, every doc scored by
    //      integer-exact mean surprisal (fixed-point p, binary-length
    //      log2 — no libm), bucketed head/middle/tail ----
    "q_lm_perplexity" -> ((s, dir) =>
      TextStats.lmPerplexity(t(s, dir, "documents"),
        col("lang") === "en" && col("source").isin(
          "src0", "src1", "src2", "src3"),
        headMaxMilliBits = 6200L, tailMinMilliBits = 7200L)),


    // ---- frequency-ranked vocabulary (tokenizer-training precursor):
    //      global wordcount, top-100 by (count desc, word) ----
    "q_vocab_build" -> ((s, dir) =>
      TextStats.vocabulary(t(s, dir, "documents"), topN = 100)),


    // ---- one-pass data profiling (deequ-style QA): per column —
    //      n / nulls / exact distinct / min / max / modal value.
    //      One Expand-backed aggregate + one pair-count pass ----
    "q_profile" -> ((s, dir) =>
      graft.ops.Profile.profile(t(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars", "text"))),


    // ---- BPE tokenizer training (6 merge rounds over the corpus
    //      word-frequency table): weighted pair counts, lexicographic
    //      tie-break, greedy non-overlapping apply; output is the
    //      merge table a tokenizer ships. The oracle replays every
    //      round's counts, argmax, and merge application ----
    "q_bpe_train" -> ((s, dir) =>
      graft.ops.BpeTrainer.train(
        graft.ops.BpeTrainer.wordCounts(t(s, dir, "documents")),
        rounds = 6)),


    // ---- tokenizer ENCODE under the learned merges: segment the
    //      VOCABULARY once (a word's BPE split is a function of the
    //      word), then per-doc token counts are one vocab-sized join —
    //      corpus text is never re-segmented per occurrence ----
    "q_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val wc = graft.ops.BpeTrainer.wordCounts(docs)
      val merges = bpeMergesMemo.computeIfAbsent(dir, _ =>
        graft.ops.BpeTrainer.train(wc, rounds = 6)
          .orderBy("round").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq)
      val pieces = graft.ops.BpeTrainer.segment(wc, merges)
      docs.select(col("doc_id"),
          explode(TextStats.tokens(col("text"))).as("word"))
        .join(pieces, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n_pieces")).as("bpe_tokens"),
          count(lit(1)).as("words"))
    }),


    // ---- END-TO-END tokenization: corpus text → BPE token-ID
    //      sequences (frequency-ranked ids), fully in-engine ----
    "q_tokenize_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = bpeMergesMemo.computeIfAbsent(dir, _ =>
        graft.ops.BpeTrainer.train(
            graft.ops.BpeTrainer.wordCounts(docs), rounds = 6)
          .orderBy("round").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq)
      graft.ops.BpeTrainer.tokenIds(docs, merges)
    }),


    // ---- BM25 retrieval scoring for a 3-term query, top-25 docs.
    //      The double score ranks but is NOT output (ln() is not
    //      bit-portable across engines); rank + the exact integer
    //      evidence (dl, per-term tf) hash-match ----
    "q_bm25" -> ((s, dir) => {
      val scored = TextStats.bm25(t(s, dir, "documents"),
        Seq("spark", "merge", "window"))
      scored.orderBy(col("score").desc, col("doc_id")).limit(25)
        .withColumn("rank", row_number().over(
          Window.partitionBy(TopK.singleBucket(col("doc_id")))
            .orderBy(col("score").desc, col("doc_id"))).cast(LongType))
        .select(col("rank"), col("doc_id"), col("dl"),
          col("tf_spark"), col("tf_merge"), col("tf_window"))
    }),


    // ---- hybrid retrieval: BM25 lexical ranks fused with embedding
    //      cosine ranks (reciprocal-rank-fusion shape, integer rank
    //      arithmetic so it oracles exactly). Each side is top-k'd
    //      FIRST (TakeOrderedAndProject — per-partition heaps, no
    //      global sort, no corpus-sized window); ranks within a top-k
    //      list equal the global ranks (prefix of the same total
    //      order), a doc absent from one list takes rank k+1, and the
    //      fusion window runs over the ≤2k-row candidate union ----
    "q_hybrid_retrieval" -> ((s, dir) => {
      val k = 50
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qvec = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_vec"))
      val scored = TextStats.bm25(docs, Seq("spark", "merge", "window"))
        .select(col("doc_id"), col("score"))
      val cos = emb.crossJoin(broadcast(qvec))
        .select(col("vec_id").as("doc_id"),
          Similarity.cosine(col("embedding"), col("q_vec")).as("cos"))
      val one = TopK.singleBucket(col("doc_id"))
      val bmTop = scored.orderBy(col("score").desc, col("doc_id")).limit(k)
        .withColumn("bm25_rank", row_number().over(
          Window.partitionBy(one)
            .orderBy(col("score").desc, col("doc_id"))).cast(LongType))
        .select(col("doc_id"), col("bm25_rank"))
      val annTop = cos.orderBy(col("cos").desc, col("doc_id")).limit(k)
        .withColumn("ann_rank", row_number().over(
          Window.partitionBy(one)
            .orderBy(col("cos").desc, col("doc_id"))).cast(LongType))
        .select(col("doc_id"), col("ann_rank"))
      val fused = bmTop.join(annTop, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("bm25_rank"), lit(k + 1L)).as("bm25_rank"),
          coalesce(col("ann_rank"), lit(k + 1L)).as("ann_rank"))
      fused.withColumn("rank", row_number().over(
          Window.partitionBy(one)
            .orderBy((col("bm25_rank") + col("ann_rank")).asc,
              col("doc_id").asc)).cast(LongType))
        .filter(col("rank") <= 10)
        .select(col("rank"), col("doc_id"), col("bm25_rank"),
          col("ann_rank"))
    }),


    // ---- NFC unicode normalization via the native codegen'd
    //      expression; decomposed combining marks appended to corpus
    //      text so the normalization is observable (composed output is
    //      shorter in codepoints) ----
    "q_unicode_norm" -> ((s, dir) => {
      // combining marks e+U+0301, n+U+0303, u+U+0308 — NFC composes
      // them to é/ñ/ü, so len_nfc < len_raw proves the pass ran
      val decomposed = concat(substring(col("text"), 1, 16),
        lit(" cafe\u0301 nin\u0303o plu\u0308s"))
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextExpressions.nfc_normalize(decomposed)
          .as("norm"),
        length(decomposed).cast(LongType).as("len_raw"),
        length(graft.functions.TextExpressions.nfc_normalize(decomposed))
          .cast(LongType).as("len_nfc"))
    }),


    // ---- URL parsing (host / path / query param) + per-host rollup;
    //      URLs synthesized from source/doc_id/lang so the oracle can
    //      regex the same parts ----
    "q_url_extract" -> ((s, dir) => {
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/d/"), col("doc_id").cast(StringType),
        lit("?ref="), col("lang"))
      t(s, dir, "documents")
        .select(parse_url(url, lit("HOST")).as("host"),
          parse_url(url, lit("PATH")).as("path"),
          parse_url(url, lit("QUERY"), lit("ref")).as("ref"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("ref")).as("n_refs"),
          min(col("path")).as("first_path"))
    }),


    // ---- deterministic k-per-group sample (reservoir semantics,
    //      content-hash order instead of an RNG) ----
    "q_sample_per_group" -> ((s, dir) =>
      graft.ops.Sampling.samplePerGroup(
          t(s, dir, "documents"), "doc_id", "source", k = 5)
        .select(col("source"), col("doc_id"), col("sample_rank"))),


    // ---- deterministic training-shard manifest: stable md5 shard
    //      assignment + the per-shard summary a dataloader reads ----
    "q_train_shards" -> ((s, dir) =>
      graft.ops.Sampling.shardManifest(
        graft.ops.Sampling.shardAssign(
          t(s, dir, "documents"), "doc_id", "sh1", nShards = 16),
        "doc_id", "n_chars")),


    // ---- canonical-URL dedup: the crawl's re-fetch variants (scheme
    //      case, www, tracking params, fragments, trailing slash)
    //      collapse onto one canonical key; first-crawled doc wins.
    //      Variants are synthesized 3-per-page from doc_id since the
    //      fixture has no URL column ----
    "q_dedup_url" -> ((s, dir) => {
      val page = expr("doc_id DIV 3").cast("string")
      val host = concat(lit("h"), expr("(doc_id DIV 3) % 50").cast("string"))
      val url = when(col("doc_id") % 3 === 0,
          concat(lit("https://www."), host,
            lit(".example.com/p/"), page, lit("?utm_source=feed&id="), page))
        .when(col("doc_id") % 3 === 1,
          concat(lit("HTTP://"), host,
            lit(".EXAMPLE.com/p/"), page, lit("?id="), page,
            lit("&utm_campaign=x")))
        .otherwise(
          concat(lit("https://"), host,
            lit(".example.com/p/"), page, lit("/?id="), page,
            lit("#sec-2")))
      graft.ops.Urls.dedupByUrl(
        t(s, dir, "documents").withColumn("url", url), "url", "doc_id")
    }),


    // ---- fixed-weight linear quality classifier: the fasttext-style
    //      keep/drop gate between heuristic filters and dedup ----
    "q_quality_classifier" -> ((s, dir) =>
      TextStats.qualityScore(t(s, dir, "documents"))
        .select(col("doc_id"), col("quality_score"), col("keep"))),


    // ---- the GOPHER quality rules (Rae et al. 2021): each published
    //      threshold as a per-doc flag, every comparison an integer
    //      cross-multiplication — no float ratio anywhere, so the
    //      oracle replay is bit-exact by construction. One codegen'd
    //      row-local projection. The stopword set is the one the
    //      synthetic corpus's vocabulary pool can express (Gopher's
    //      published 8 words are the op's default; only 'the' exists
    //      in this corpus, which would inert-fail every doc) ----
    "q_gopher_rules" -> ((s, dir) =>
      TextStats.gopherRules(t(s, dir, "documents"),
        stopWords = Seq("the", "a", "of", "and", "to", "in", "is",
          "it"))),


    // ---- C4 line-level cleaning (Raffel et al. 2020 §2.2): keep
    //      lines ending in terminal punctuation with >=5 words and no
    //      curly brace; drop docs with <3 surviving sentences. The
    //      corpus is a bag of words, so the fixture SYNTHESIZES line
    //      structure deterministically (8-word lines, every line
    //      whose index % 3 != 0 gets a period — both engines replay
    //      the construction); the op itself is one row-local
    //      projection returning the REWRITTEN text ----
    "q_c4_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = graft.ops.TextStats.tokens(col("text"))
      val lineArr = when(size(toks) === 0,
          array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0L),
            floor((size(toks) - lit(1)) / lit(8)).cast(LongType)),
          i => concat(
            array_join(slice(toks, (i * 8 + 1).cast(IntegerType),
              lit(8)), " "),
            when(i % 3 =!= 0, lit(".")).otherwise(lit("")))))
      val lined = docs.select(col("doc_id"),
        array_join(lineArr, "\n").as("text"))
      TextStats.c4LineFilter(lined)
    }),


    // ---- END-TO-END CURATION FUNNEL (the FineWeb/RefinedWeb shape,
    //      batch form): language gate -> quality-classifier keep ->
    //      exact keep-first dedup -> benchmark decontamination, each
    //      stage feeding the next, with per-stage survivor counts as
    //      the decidable output. Every stage is an existing operator
    //      whose oracle already hash-matches standalone; the funnel
    //      proves they COMPOSE (semi/anti joins carry the full rows,
    //      no collects between stages — at 100 TB each arrow is one
    //      shuffle or less, and the text column is never widened) ----
    "q_curation_funnel" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // FUSED since round 14: every row-local stage flag (lang,
      // quality, content hash, bloom-probed shingle candidates) is
      // computed in ONE projection over ONE corpus scan — the unfused
      // form paid 4 corpus scans + 3 doc-keyed joins for the same
      // numbers (see ops/Curation.scala for the plan-shape contract;
      // the oracle and output hash are unchanged)
      Curation.funnel(docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), n = 25)
    }),


    // ---- INCREMENTAL curation over the change feed: flags at v2 are
    //      maintained from the v1 flag state + CDF rows only — changed
    //      docs get fresh row-local flags, keeper election re-runs
    //      only in touched content-hash groups, everything else is
    //      carried. The oracle recomputes the full funnel over the
    //      post-change corpus, so the hash match proves the refreshed
    //      stage counts equal a rebuild's (row-identity is proven in
    //      CurationSpec/CurationMaintenanceSpec — not re-proven in the
    //      timed gate); cost is O(state + changed docs) where the
    //      batch touches ~19% of docs ----
    "q_funnel_incremental" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 50 === 0)
      val corpusAt = (v: org.apache.spark.sql.DataFrame) =>
        v.filter(col("doc_id") % 50 =!= 0)
      // fixture commits memoized per dir (board convention): the
      // timed operator is flags@v1 + the CDF-driven refresh
      val (tab, v1, v2) = funnelIncrDemoMemo.computeIfAbsent(dir, _ => {
        val tableDir = java.nio.file.Files
          .createTempDirectory("graft_funnel_incr").toString
        val tb = graft.tables.ResourceTable(s, s"$tableDir/docs.parquet")
        tb.createIfNotExists(docs.schema)
        tb.upsert(docs.filter(col("doc_id") % 10 =!= 0), "doc_id")
        val a = tb.latestVersion.get
        // inserts (the %10 tranche), updates (%7 docs get new text —
        // new content hash, so their old group re-elects), deletes
        // (%9 docs leave — deleted keepers re-elect successors)
        tb.upsert(docs.filter(col("doc_id") % 10 === 0)
          .unionByName(docs
            .filter(col("doc_id") % 7 === 0 && col("doc_id") % 10 =!= 0)
            .withColumn("text", concat(col("text"), lit(" upd v2")))),
          "doc_id")
        tb.deleteWhere(col("doc_id") % 9 === 0)
        (tb, a, tb.latestVersion.get)
      })
      // the benchmark index is STATIC across refreshes — built once,
      // shared by the v1 flags, the refresh, and the rebuild
      val bx = Curation.benchmarkIndex(bench)
      // the v1 flag state is the refresh's STANDING input (in a real
      // deployment it's a flags-table read — maintainFlags); the
      // refresh consumes it three times (touched-hash probe,
      // re-election, carried arm), so materialize it once instead of
      // re-running the v1 funnel per consumption
      val flags1 = Curation.flags(corpusAt(tab.readVersion(v1)), bx,
        "doc_id", "text").localCheckpoint(true)
      val changes = tab.changes(v1, v2, "doc_id")
        .filter(col("doc_id") % 50 =!= 0)
      // refresh ≡ rebuild (row-identical) is proven in the spec suite
      // (CurationSpec "refreshFlags ≡ full recompute...",
      // CurationMaintenanceSpec) — the gate times ONLY the refresh;
      // the oracle's full-funnel replay over the post-change corpus
      // remains the exact hash check of the refreshed stage counts
      val refreshed = Curation.refreshFlags(flags1, changes, bx,
        "doc_id", "text").cache()
      val out = Curation.stages(refreshed)
        .select(col("stage"), col("n")).cache()
      out.count()
      refreshed.unpersist()
      out
    }),


    // ---- term-frequency hash embedding (hashing trick): model-free
    //      deterministic text vectors, exact-oracled via the splitmix
    //      token-hash replay; output scalars derived from the vector ----
    "q_hash_embed" -> ((s, dir) => {
      val emb = TextStats.hashEmbedding(t(s, dir, "documents"))
      emb.select(col("doc_id"),
        aggregate(col("hash_vec"), lit(0L),
          (a, v) => a + v.cast(LongType) * v.cast(LongType)).as("l2sq"),
        size(filter(col("hash_vec"), v => v > 0)).cast(LongType).as("nnz"),
        (array_position(col("hash_vec"), array_max(col("hash_vec"))) - 1)
          .as("top_bucket"))
    }),


    // ---- retrieval over hash embeddings: one broadcast query vector
    //      against the corpus scan, exact integer dot/norms, one IEEE
    //      division + sqrt — float cosines hash-match the oracle ----
    "q_hash_embed_sim" -> ((s, dir) => {
      val emb = TextStats.hashEmbedding(t(s, dir, "documents"))
        .select(col("doc_id"), col("hash_vec"))
      val qv = broadcast(emb.filter(col("doc_id") === 0L)
        .select(col("hash_vec").as("q_vec")))
      emb.crossJoin(qv)
        .withColumn("cos",
          TextStats.cosineIntVectors(col("hash_vec"), col("q_vec")))
        .filter(col("doc_id") =!= 0L &&
          size(filter(col("hash_vec"), v => v > 0)) > 0 &&
          size(filter(col("q_vec"), v => v > 0)) > 0 &&
          col("cos") >= 0.75)
        .select(col("doc_id"), col("cos"))
    }),


    // ---- incremental LSH-index maintenance from the change feed:
    //      refresh(index@v1, CDF v1->v2) must equal a from-scratch
    //      rebuild over v2 — the gate ASSERTS the equality (multiset,
    //      signatures included) and emits the decidable row the
    //      oracle replays: 4 band rows per >=3-token doc ----
    "q_index_refresh" -> ((s, dir) => {
      import s.implicits._
      // fixture commits memoized per dir (board convention): the
      // timed operator is the index refresh + rebuild equality
      val (tab, v1, v2) = idxRefreshDemoMemo.computeIfAbsent(dir, _ => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val tableDir = java.nio.file.Files
          .createTempDirectory("graft_idx_refresh").toString
        val tb = graft.tables.ResourceTable(s, s"$tableDir/docs.parquet")
        tb.createIfNotExists(docs.schema)
        tb.upsert(docs.filter(col("doc_id") % 10 =!= 0), "doc_id")
        val a = tb.latestVersion.get
        val batch = docs.filter(col("doc_id") % 10 === 0)
          .unionByName(docs
            .filter(col("doc_id") % 7 === 0 && col("doc_id") % 10 =!= 0)
            .withColumn("text", concat(col("text"), lit(" upd v2"))))
        tb.upsert(batch, "doc_id")
        (tb, a, tb.latestVersion.get)
      })
      val idx1 = Dedup.bandedIndex(tab.readVersion(v1), "doc_id", "text")
      val refreshed = Dedup.refreshBandedIndex(idx1,
        tab.changes(v1, v2, "doc_id"), "doc_id", "text")
      val rebuilt = Dedup.bandedIndex(tab.read(), "doc_id", "text").cache()
      // multiset equality in ONE pass (signed-count symmetric diff ≡
      // exceptAll empty both ways, half the scans — guide §2.3/§2.4)
      val keys = refreshed.columns.map(col).toSeq
      val equal = refreshed.withColumn("_s", lit(1L))
        .unionByName(rebuilt.withColumn("_s", lit(-1L)))
        .groupBy(keys: _*)
        .agg(sum(col("_s")).as("_d"))
        .filter(col("_d") =!= 0L)
        .isEmpty
      val n = rebuilt.count()
      rebuilt.unpersist()
      Seq((equal, n)).toDF("refresh_equals_rebuild", "n_index_rows")
    }),


    // ---- blocked fuzzy dedup: (lang, length-bucket) blocking, banded
    //      levenshtein verify over a 100-char prefix ----
    "q_dedup_fuzzy" -> ((s, dir) =>
      Dedup.editDistancePairs(t(s, dir, "documents"), "doc_id", "text",
        blockKey = struct(col("lang"),
          (length(col("text")) / lit(50)).cast(IntegerType)))),

  )

  def oracleSql: Map[String, String] = Map(

    // frame arithmetic: nFrames = ceil(bytes/64), sampled every 2nd
    "q_multimodal_frames" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  (greatest(CAST(ceil(octet_length(CAST(text AS BLOB)) / 64.0)
        |     AS BIGINT) - 1, 0) // 2) + 1 AS n_frames,
        |  (greatest(CAST(ceil(octet_length(CAST(text AS BLOB)) / 64.0)
        |     AS BIGINT) - 1, 0) // 2) * 2 AS max_idx
        |FROM documents
        |WHERE octet_length(CAST(text AS BLOB)) > 0""".stripMargin,


    // thresholds: floor(0.8*65536)=52428=0xcccc, floor(0.9*65536)=58982=0xe666
    "q_hash_split" ->
      """SELECT split, count(*) AS cnt,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN md5('s1:' || CAST(doc_id AS VARCHAR)) < 'cccc' THEN 'train'
        |         WHEN md5('s1:' || CAST(doc_id AS VARCHAR)) < 'e666' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |GROUP BY split""".stripMargin,


    "q_stratified_sample" ->
      """SELECT lang, count(*) AS cnt,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents
        |WHERE md5('mix1:' || CAST(doc_id AS VARCHAR)) <
        |  CASE lang WHEN 'en' THEN '4000' WHEN 'de' THEN 'g'
        |            WHEN 'fr' THEN '8000' WHEN 'zh' THEN '1999'
        |            ELSE '0000' END
        |GROUP BY lang""".stripMargin,


    // shard = (first 16 md5 bits) mod 16 — exact integer arithmetic
    "q_train_shards" ->
      """SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_size,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM (
        |  SELECT doc_id, n_chars,
        |    ('0x' || substr(md5('sh1:' || CAST(doc_id AS VARCHAR)), 1, 4))
        |      ::BIGINT % 16 AS shard
        |  FROM documents)
        |GROUP BY shard""".stripMargin,


    "q_dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3
        |      WHEN 0 THEN 'https://www.h' || CAST((doc_id // 3) % 50 AS VARCHAR)
        |        || '.example.com/p/' || CAST(doc_id // 3 AS VARCHAR)
        |        || '?utm_source=feed&id=' || CAST(doc_id // 3 AS VARCHAR)
        |      WHEN 1 THEN 'HTTP://h' || CAST((doc_id // 3) % 50 AS VARCHAR)
        |        || '.EXAMPLE.com/p/' || CAST(doc_id // 3 AS VARCHAR)
        |        || '?id=' || CAST(doc_id // 3 AS VARCHAR) || '&utm_campaign=x'
        |      ELSE 'https://h' || CAST((doc_id // 3) % 50 AS VARCHAR)
        |        || '.example.com/p/' || CAST(doc_id // 3 AS VARCHAR)
        |        || '/?id=' || CAST(doc_id // 3 AS VARCHAR) || '#sec-2'
        |    END AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      lower(url),
        |      '^[a-z][a-z0-9+.-]*://', '', 'g'),
        |      '^www\.', '', 'g'),
        |      '#.*$', '', 'g'),
        |      '(utm_[a-z]+|fbclid|gclid|msclkid)=[^&#]*&?', '', 'g'),
        |      '[?&]+$', '', 'g'),
        |      '/\?', '?', 'g'),
        |      '/$', '', 'g') AS canonical_url
        |  FROM u)
        |SELECT canonical_url, min(doc_id) AS doc_id,
        |  count(*) AS n_variants
        |FROM c GROUP BY canonical_url""".stripMargin,


    // same feature expressions as q_text_quality, same left-assoc
    // double arithmetic as TextStats.qualityScore — bit-identical
    "q_c4_filter" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x != '') AS ts
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) = 0 THEN []
        |    ELSE list_transform(
        |      generate_series(0, CAST((len(ts) - 1) // 8 AS BIGINT)),
        |      i -> array_to_string(ts[i*8+1 : i*8+8], ' ') ||
        |           CASE WHEN i % 3 <> 0 THEN '.' ELSE '' END)
        |    END AS la
        |  FROM f),
        |kept AS (
        |  SELECT doc_id, list_filter(la, l ->
        |    regexp_matches(l, '[.!?"'']\s*$')
        |    AND len(list_filter(string_split_regex(trim(l), '\s+'),
        |      x -> x != '')) >= 5
        |    AND NOT contains(l, '{') AND NOT contains(l, '}')) AS ka
        |  FROM lined)
        |SELECT doc_id, CAST(len(ka) AS BIGINT) AS n_lines_kept,
        |  CASE WHEN len(ka) >= 3 THEN array_to_string(ka, chr(10))
        |       ELSE '' END AS clean_text,
        |  len(ka) >= 3 AS keep
        |FROM kept""".stripMargin,


    "q_gopher_rules" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x != '') AS ts,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
        |      AS nonspace,
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[#…]', '', 'g')) AS BIGINT)
        |      AS symbols,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CAST(len(ts) AS BIGINT) AS words, nonspace, symbols,
        |    CAST(len(list_filter(ts,
        |      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)
        |      AS alpha_words,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines,
        |      l -> regexp_matches(l, '^\s*[-•*]'))) AS BIGINT)
        |      AS bullet_lines,
        |    CAST(len(list_filter(lines,
        |      l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS BIGINT)
        |      AS ellipsis_lines,
        |    CAST(len(list_intersect(
        |      list_distinct(list_transform(ts, t -> lower(t))),
        |      ['the','a','of','and','to','in','is','it']))
        |      AS BIGINT) AS stop_hits
        |  FROM f)
        |SELECT doc_id,
        |  words >= 50 AND words <= 100000 AS f_word_count,
        |  3 * words <= nonspace AND nonspace <= 10 * words
        |    AS f_mean_word_len,
        |  symbols * 10 <= words AS f_symbol_ratio,
        |  bullet_lines * 10 <= n_lines * 9 AS f_bullet_lines,
        |  ellipsis_lines * 10 <= n_lines * 3 AS f_ellipsis_lines,
        |  alpha_words * 10 >= words * 8 AS f_alpha_words,
        |  stop_hits >= 2 AS f_stop_words,
        |  (words >= 50 AND words <= 100000)
        |    AND (3 * words <= nonspace AND nonspace <= 10 * words)
        |    AND symbols * 10 <= words
        |    AND bullet_lines * 10 <= n_lines * 9
        |    AND ellipsis_lines * 10 <= n_lines * 3
        |    AND alpha_words * 10 >= words * 8
        |    AND stop_hits >= 2 AS keep
        |FROM g""".stripMargin,


    "q_quality_classifier" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> x != '')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
        |      AS n_nonspace,
        |    CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> lower(x) IN ('the','a','of','and','to','in','is','it')))
        |      AS BIGINT) AS stop_cnt,
        |    CAST(length(list_filter(string_split(text, ''),
        |        x -> regexp_matches(x, '[[:punct:]]'))) AS BIGINT) AS punct_cnt
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(n_nonspace AS DOUBLE)
        |      / CAST(greatest(n_tokens, 1) AS DOUBLE) AS awl,
        |    CAST(stop_cnt AS DOUBLE)
        |      / CAST(greatest(n_tokens, 1) AS DOUBLE) AS swr,
        |    CAST(punct_cnt AS DOUBLE)
        |      / CAST(greatest(n_chars, 1) AS DOUBLE) AS pr,
        |    CAST(n_tokens AS DOUBLE)
        |      / (CAST(n_tokens AS DOUBLE) + 50.0) AS lt
        |  FROM f)
        |SELECT doc_id,
        |  -0.6 + 0.12 * awl + 2.4 * swr - 1.8 * pr + 0.9 * lt
        |    AS quality_score,
        |  (-0.6 + 0.12 * awl + 2.4 * swr - 1.8 * pr + 0.9 * lt) >= 0.5
        |    AS keep
        |FROM s""".stripMargin,


    // the funnel composes four already-hash-matched stage oracles:
    // lang-id argmax (q_lang_id), the quality linear model
    // (q_quality_classifier), md5 keep-first (q_dedup_exact) and
    // 5-gram holdout overlap (q_decontaminate), each over the
    // previous stage's survivors
    "q_curation_funnel" ->
      """WITH corpus0 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
        |profiles(plang, pidx, stops) AS (VALUES
        |  ('en', 0, ['the','and','of','to','a','in','is','it','that']),
        |  ('de', 1, ['der','die','das','und','ist','nicht','ein','zu']),
        |  ('fr', 2, ['le','la','les','et','est','un','une','que']),
        |  ('es', 3, ['el','la','los','y','es','un','una','que']),
        |  ('zh', 4, ['的','是','了','在','和','有'])),
        |ltoks AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        |  FROM corpus0),
        |s1 AS (
        |  SELECT c.doc_id, c.text FROM corpus0 c JOIN (
        |    SELECT doc_id FROM (
        |      SELECT t.doc_id, p.plang, row_number() OVER (
        |          PARTITION BY t.doc_id ORDER BY
        |          CAST(len(list_filter(t.ts, x -> list_contains(p.stops, x))) AS DOUBLE)
        |            / greatest(len(t.ts), 1) DESC, p.pidx ASC) AS rn
        |      FROM ltoks t CROSS JOIN profiles p)
        |    WHERE rn = 1 AND plang = 'en') e USING (doc_id)),
        |qf AS (
        |  SELECT doc_id,
        |    CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> x != '')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
        |      AS n_nonspace,
        |    CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> lower(x) IN ('the','a','of','and','to','in','is','it')))
        |      AS BIGINT) AS stop_cnt,
        |    CAST(length(list_filter(string_split(text, ''),
        |        x -> regexp_matches(x, '[[:punct:]]'))) AS BIGINT) AS punct_cnt
        |  FROM s1),
        |qs AS (
        |  SELECT doc_id,
        |    -0.6 + 0.12 * (CAST(n_nonspace AS DOUBLE)
        |        / CAST(greatest(n_tokens, 1) AS DOUBLE))
        |      + 2.4 * (CAST(stop_cnt AS DOUBLE)
        |        / CAST(greatest(n_tokens, 1) AS DOUBLE))
        |      - 1.8 * (CAST(punct_cnt AS DOUBLE)
        |        / CAST(greatest(n_chars, 1) AS DOUBLE))
        |      + 0.9 * (CAST(n_tokens AS DOUBLE)
        |        / (CAST(n_tokens AS DOUBLE) + 50.0)) AS score
        |  FROM qf),
        |s2 AS (
        |  SELECT s1.doc_id, s1.text FROM s1
        |  JOIN qs USING (doc_id) WHERE qs.score >= 0.5),
        |s3 AS (
        |  SELECT s2.doc_id, s2.text FROM s2 JOIN (
        |    SELECT min(doc_id) AS doc_id FROM s2 GROUP BY md5(text)
        |  ) k USING (doc_id)),
        |bsh AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(1, length(text) - 23),
        |    i -> substr(text, CAST(i AS INT), 25)))) AS sh
        |  FROM documents WHERE doc_id % 50 = 0 AND length(text) >= 25),
        |dirty AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, unnest(list_distinct(list_transform(
        |      range(1, length(text) - 23),
        |      i -> substr(text, CAST(i AS INT), 25)))) AS sh
        |    FROM s3 WHERE length(text) >= 25)
        |  WHERE sh IN (SELECT sh FROM bsh)),
        |s4 AS (
        |  SELECT doc_id FROM s3
        |  WHERE doc_id NOT IN (SELECT doc_id FROM dirty))
        |SELECT 'corpus' AS stage, count(*) AS n FROM corpus0
        |UNION ALL SELECT 'lang_en', count(*) FROM s1
        |UNION ALL SELECT 'quality', count(*) FROM s2
        |UNION ALL SELECT 'exact_dedup', count(*) FROM s3
        |UNION ALL SELECT 'decontaminated', count(*) FROM s4""".stripMargin,


    // refresh ≡ rebuild (row-identical) is proven in CurationSpec /
    // CurationMaintenanceSpec; the gate times only the refresh. The
    // oracle replays the post-change corpus construction and the
    // full funnel over it — identical CTE chain to q_curation_funnel
    // with `post` swapped in for the raw table — so the hash check
    // still proves the refreshed counts equal a full recompute's
    "q_funnel_incremental" ->
      """WITH post AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 AND doc_id % 10 != 0
        |         THEN text || ' upd v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 9 != 0),
        |corpus0 AS (
        |  SELECT doc_id, text FROM post WHERE doc_id % 50 <> 0),
        |profiles(plang, pidx, stops) AS (VALUES
        |  ('en', 0, ['the','and','of','to','a','in','is','it','that']),
        |  ('de', 1, ['der','die','das','und','ist','nicht','ein','zu']),
        |  ('fr', 2, ['le','la','les','et','est','un','une','que']),
        |  ('es', 3, ['el','la','los','y','es','un','una','que']),
        |  ('zh', 4, ['的','是','了','在','和','有'])),
        |ltoks AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        |  FROM corpus0),
        |s1 AS (
        |  SELECT c.doc_id, c.text FROM corpus0 c JOIN (
        |    SELECT doc_id FROM (
        |      SELECT t.doc_id, p.plang, row_number() OVER (
        |          PARTITION BY t.doc_id ORDER BY
        |          CAST(len(list_filter(t.ts, x -> list_contains(p.stops, x))) AS DOUBLE)
        |            / greatest(len(t.ts), 1) DESC, p.pidx ASC) AS rn
        |      FROM ltoks t CROSS JOIN profiles p)
        |    WHERE rn = 1 AND plang = 'en') e USING (doc_id)),
        |qf AS (
        |  SELECT doc_id,
        |    CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> x != '')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
        |      AS n_nonspace,
        |    CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> lower(x) IN ('the','a','of','and','to','in','is','it')))
        |      AS BIGINT) AS stop_cnt,
        |    CAST(length(list_filter(string_split(text, ''),
        |        x -> regexp_matches(x, '[[:punct:]]'))) AS BIGINT) AS punct_cnt
        |  FROM s1),
        |qs AS (
        |  SELECT doc_id,
        |    -0.6 + 0.12 * (CAST(n_nonspace AS DOUBLE)
        |        / CAST(greatest(n_tokens, 1) AS DOUBLE))
        |      + 2.4 * (CAST(stop_cnt AS DOUBLE)
        |        / CAST(greatest(n_tokens, 1) AS DOUBLE))
        |      - 1.8 * (CAST(punct_cnt AS DOUBLE)
        |        / CAST(greatest(n_chars, 1) AS DOUBLE))
        |      + 0.9 * (CAST(n_tokens AS DOUBLE)
        |        / (CAST(n_tokens AS DOUBLE) + 50.0)) AS score
        |  FROM qf),
        |s2 AS (
        |  SELECT s1.doc_id, s1.text FROM s1
        |  JOIN qs USING (doc_id) WHERE qs.score >= 0.5),
        |s3 AS (
        |  SELECT s2.doc_id, s2.text FROM s2 JOIN (
        |    SELECT min(doc_id) AS doc_id FROM s2 GROUP BY md5(text)
        |  ) k USING (doc_id)),
        |bsh AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(1, length(text) - 23),
        |    i -> substr(text, CAST(i AS INT), 25)))) AS sh
        |  FROM documents WHERE doc_id % 50 = 0 AND length(text) >= 25),
        |dirty AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, unnest(list_distinct(list_transform(
        |      range(1, length(text) - 23),
        |      i -> substr(text, CAST(i AS INT), 25)))) AS sh
        |    FROM s3 WHERE length(text) >= 25)
        |  WHERE sh IN (SELECT sh FROM bsh)),
        |s4 AS (
        |  SELECT doc_id FROM s3
        |  WHERE doc_id NOT IN (SELECT doc_id FROM dirty))
        |SELECT 'corpus' AS stage, count(*) AS n FROM corpus0
        |UNION ALL SELECT 'lang_en', count(*) FROM s1
        |UNION ALL SELECT 'quality', count(*) FROM s2
        |UNION ALL SELECT 'exact_dedup', count(*) FROM s3
        |UNION ALL SELECT 'decontaminated', count(*) FROM s4"""
        .stripMargin,


    // the TRUE asserts refresh == rebuild inside the gate; the row
    // count is 4 bands x every post-change doc with >= 3 tokens
    "q_index_refresh" ->
      """WITH post AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 AND doc_id % 10 != 0
        |         THEN text || ' upd v2' ELSE text END AS text
        |  FROM documents)
        |SELECT TRUE AS refresh_equals_rebuild,
        |  CAST(4 * count(*) AS BIGINT) AS n_index_rows
        |FROM post
        |WHERE length(list_filter(string_split_regex(trim(text), '\s+'),
        |  x -> x != '')) >= 3""".stripMargin,


    "q_dedup_segments" ->
      """WITH segs AS (
        |  SELECT doc_id AS doc, CAST(t.i AS INTEGER) AS seg_idx,
        |    array_to_string(words[t.i*8+1 : t.i*8+8], ' ') AS segment
        |  FROM (SELECT doc_id, string_split(text, ' ') AS words
        |        FROM documents),
        |    UNNEST(generate_series(0, (len(words)-1)//8)) AS t(i)),
        |freq AS (
        |  SELECT segment FROM segs GROUP BY segment HAVING count(*) >= 2)
        |SELECT s.doc, s.seg_idx, s.segment FROM segs s
        |WHERE s.segment NOT IN (SELECT segment FROM freq)""".stripMargin,


    "q_substring_dedup" -> SplitmixOracle.substringDedupSpans,


    "q_substring_remove" -> SplitmixOracle.substringRemove,


    "q_bpe_train" -> BpeOracle.merges(6),


    "q_bpe_encode" -> BpeOracle.encodeCounts(6),


    "q_tokenize_ids" -> BpeOracle.tokenIds(6),


    "q_profile" -> {
      val cols = Seq("doc_id", "lang", "source", "n_chars", "text")
      val scal = cols.map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value
           |FROM documents""".stripMargin).mkString("\nUNION ALL\n")
      val pairs = cols.map(c =>
        s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS value FROM documents")
        .mkString("\nUNION ALL\n")
      s"""WITH scal AS (
         |$scal
         |),
         |pairs AS (
         |$pairs
         |),
         |tops AS (
         |  SELECT col_name, value AS top_value, cnt AS top_count FROM (
         |    SELECT col_name, value, cnt, row_number() OVER (
         |        PARTITION BY col_name ORDER BY cnt DESC, value ASC) AS rk
         |    FROM (SELECT col_name, value, count(*) AS cnt FROM pairs
         |          WHERE value IS NOT NULL GROUP BY col_name, value))
         |  WHERE rk = 1)
         |SELECT s.col_name, s.n, s.n_null, s.n_distinct, s.min_value,
         |  s.max_value, t.top_value, t.top_count
         |FROM scal s LEFT JOIN tops t USING (col_name)""".stripMargin
    },


    // bigram stupid-backoff LM scoring: counts and joins replay
    // exactly; per-doc log-prob sums fold in ascending value order in
    // BOTH engines (sort_array+aggregate vs list ORDER BY+list_reduce)
    // so the double ranks deterministically; only rank + integer
    // evidence are output (the q_bm25 ln-portability convention)
    "q_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |                t -> t <> '') AS ts
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, ts[g.i] AS w1, ts[g.i + 1] AS w2
        |  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
        |  WHERE len(ts) >= 2),
        |tru AS (SELECT unnest(ts) AS w FROM toks WHERE doc_id % 2 = 0),
        |uni AS (SELECT w, count(*) AS c_w FROM tru GROUP BY w),
        |tot AS (SELECT count(*) AS t_tok FROM tru),
        |bic AS (SELECT w1, w2, count(*) AS c_bi FROM bi
        |        WHERE doc_id % 2 = 0 GROUP BY w1, w2),
        |w1c AS (SELECT w1, count(*) AS c_w1 FROM bi
        |        WHERE doc_id % 2 = 0 GROUP BY w1),
        |lp AS (
        |  SELECT b.doc_id, round(CASE
        |      WHEN bc.c_bi IS NOT NULL THEN
        |        ln(CAST(bc.c_bi AS DOUBLE) / CAST(wc.c_w1 AS DOUBLE))
        |      WHEN u.c_w IS NOT NULL THEN
        |        ln(0.4 * CAST(u.c_w AS DOUBLE) / CAST(t.t_tok AS DOUBLE))
        |      ELSE ln(0.4 / CAST(t.t_tok AS DOUBLE)) END, 9) AS lp,
        |    (bc.c_bi IS NOT NULL) AS hit,
        |    (bc.c_bi IS NULL AND u.c_w IS NOT NULL) AS back
        |  FROM bi b
        |  LEFT JOIN bic bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
        |  LEFT JOIN w1c wc ON wc.w1 = b.w1
        |  LEFT JOIN uni u ON u.w = b.w2
        |  CROSS JOIN tot t
        |  WHERE b.doc_id % 2 = 1),
        |agg AS (
        |  SELECT doc_id AS doc, count(*) AS n_bigrams,
        |    count(*) FILTER (WHERE hit) AS n_hits,
        |    count(*) FILTER (WHERE back) AS n_backoff,
        |    count(*) FILTER (WHERE NOT hit AND NOT back) AS n_oov,
        |    list_reduce(list_prepend(0.0::DOUBLE, list(lp ORDER BY lp)),
        |                (a, x) -> a + x) / count(*) AS avg_logp
        |  FROM lp GROUP BY doc_id)
        |SELECT CAST(row_number() OVER (ORDER BY avg_logp DESC, doc ASC)
        |         AS INTEGER) AS rank,
        |  doc, n_bigrams, n_hits, n_backoff, n_oov
        |FROM agg ORDER BY avg_logp DESC, doc ASC LIMIT 25""".stripMargin,


    "q_temperature_mix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 6 THEN 'big'
        |         WHEN doc_id % 10 < 9 THEN 'mid'
        |         ELSE 'small' END AS src_grp
        |  FROM documents),
        |n AS (SELECT src_grp, count(*) AS cnt FROM d GROUP BY src_grp),
        |r AS (SELECT src_grp,
        |        pow(CAST((SELECT min(cnt) FROM n) AS DOUBLE) / cnt,
        |            0.5) AS rate
        |      FROM n),
        |r4 AS (SELECT src_grp,
        |         CAST(floor(rate * 10000 + 0.5) AS BIGINT) AS rate1e4
        |       FROM r),
        |kept AS (
        |  SELECT d.doc_id, d.src_grp FROM d JOIN r4 USING (src_grp)
        |  WHERE md5('mix2:' || CAST(d.doc_id AS VARCHAR)) <
        |    CASE WHEN r4.rate1e4 >= 10000 THEN 'g'
        |         ELSE lower(lpad(hex(CAST(floor(r4.rate1e4 * 65536 / 10000.0)
        |           AS BIGINT)), 4, '0')) END)
        |SELECT src_grp, count(*) AS kept_cnt,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM kept GROUP BY src_grp""".stripMargin,


    "q_seq_pack" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |placed AS (
        |  SELECT doc_id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
        |  FROM docs)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor(start_offset / 512) AS BIGINT) AS seq_id,
        |  CAST(start_offset % 512 AS BIGINT) AS seq_pos,
        |  CASE WHEN n_tokens = 0 THEN 1
        |       ELSE CAST(floor((start_offset + n_tokens - 1) / 512)
        |              - floor(start_offset / 512) + 1 AS BIGINT)
        |  END AS n_seqs
        |FROM placed""".stripMargin,


    "q_chunk_windows" ->
      """SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
        |  substring(text, CAST(1 + k * 90 AS INT), 120) AS chunk_text,
        |  CAST(1 + k * 90 AS BIGINT) AS chunk_start,
        |  CAST(length(substring(text, CAST(1 + k * 90 AS INT), 120))
        |    AS BIGINT) AS chunk_len
        |FROM documents,
        |  LATERAL unnest(range(0, CAST(ceil(greatest(length(text), 1)
        |    / 90.0) AS BIGINT))) AS t(k)
        |WHERE doc_id < 100""".stripMargin,


    "q_pii_redact" ->
      """SELECT event_id,
        |  regexp_replace(regexp_replace(
        |    concat('contact ', event_type, '@example.com tel ',
        |           CAST(user_id * 1234567 AS VARCHAR)),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9][0-9 ()+.-]{6,}[0-9]', '<PHONE>', 'g') AS redacted
        |FROM events""".stripMargin,


    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        |  count(*) AS dup_cnt
        |FROM documents GROUP BY md5(text)""".stripMargin,


    "q_dedup_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,


    "q_dedup_embedding" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45""".stripMargin,


    // the SAME page template and extraction pipeline re-expressed in
    // DuckDB: RE2-safe patterns verbatim, entities decoded &amp;-last,
    // jusText-style nLinks*20 < len(clean) line filter, order-stable
    // string_agg re-assembly
    "q_html_extract" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    '<html><head><script>var x = 1 < 2;</script>' ||
        |    '<style>p{margin:0}</style></head>' || chr(10) ||
        |    '<!-- rendered by graft -->' || chr(10) ||
        |    '<nav><a href="/">Home</a> <a href="/a">About</a></nav>' ||
        |    chr(10) || '<h1>' || source || '</h1>' || chr(10) ||
        |    '<p>' || text || ' &amp; more</p>' || chr(10) ||
        |    '<div><a href="/ad">Sponsored</a></div>' || chr(10) ||
        |    '<footer>&copy; 2026 <a href="/t">Terms</a></footer>' ||
        |    chr(10) || '</html>' AS html
        |  FROM documents),
        |noblocks AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |    html,
        |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g') AS h
        |  FROM raw),
        |lines AS (
        |  SELECT doc_id,
        |    unnest(range(0, len(string_split(h, chr(10))))) AS pos,
        |    unnest(string_split(h, chr(10))) AS ln
        |  FROM noblocks),
        |feat AS (
        |  SELECT doc_id, pos,
        |    CAST(len(string_split_regex(ln, '<a[ >]')) - 1 AS INTEGER)
        |      AS n_links,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(ln, '<[^>]+>', ' ', 'g'),
        |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
        |        '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
        |      '[ \t]+', ' ', 'g')) AS clean
        |  FROM lines)
        |SELECT doc_id,
        |  string_agg(clean, ' ' ORDER BY pos) AS content,
        |  count(*) AS n_kept
        |FROM feat
        |WHERE len(clean) >= 20 AND n_links * 20 < len(clean)
        |GROUP BY doc_id""".stripMargin,


    // identical candidate semantics (pairs sharing a df<=100 word) and
    // exact BIGINT dot/norm arithmetic as TextStats.allPairsSimilarity
    "q_allpairs_sim" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
        |                       x -> x <> '')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2),
        |rare AS (SELECT w FROM (SELECT w, count(*) AS df FROM tf
        |                        GROUP BY 1) WHERE df <= 100),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM tf a JOIN tf b USING (w) JOIN rare USING (w)
        |  WHERE a.doc_id < b.doc_id),
        |dots AS (
        |  SELECT c.a_id, c.b_id, CAST(sum(ta.tf * tb.tf) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN tf ta ON ta.doc_id = c.a_id
        |  JOIN tf tb ON tb.doc_id = c.b_id AND tb.w = ta.w
        |  GROUP BY 1, 2),
        |norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS nn
        |          FROM tf GROUP BY 1)
        |SELECT d.a_id, d.b_id, d.dot
        |FROM dots d
        |JOIN norms na ON na.doc_id = d.a_id
        |JOIN norms nb ON nb.doc_id = d.b_id
        |WHERE CAST(d.dot AS DOUBLE) /
        |  sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) >= 0.8""".stripMargin,


    // fixed-point accumulation: ×2^20 (exact for float→double), floor,
    // exact integer sum, ÷2^20 — order- and engine-independent
    "q_centroids" ->
      """SELECT label, pos,
        |  CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1048576) AS BIGINT))
        |       AS DOUBLE) / 1048576.0 AS sum_v,
        |  count(*) AS n_vecs
        |FROM (SELECT label, unnest(embedding) AS v,
        |        unnest(range(0, len(embedding))) AS pos
        |      FROM embeddings)
        |GROUP BY label, pos""".stripMargin,


    // SF-PARAMETRIC oracle (VERDICT r17 #2, replacing the round-7
    // sf0.01-pinned VALUES list): the full splitmix minhash pair
    // replay (the q_dedup_minhash oracle) feeding the same recursive
    // min-label connected-components CTE q_dedup_resolve_exact uses —
    // DuckDB now recomputes BOTH the pair producer and the clustering
    // at any scale factor, so the board can go 226/226 at sf0.01 AND
    // sf0.1.
    "q_dedup_resolve" -> SplitmixOracle.minhashResolve,


    // connected components (min reachable id) over the exact cosine
    // pairs, as a recursive CTE — oracles resolveClusters' semantics
    "q_dedup_resolve_exact" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS pa, b.vec_id AS pb
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < b.vec_id
        |    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45),
        |edges AS (SELECT pa AS ea, pb AS eb FROM pairs
        |          UNION SELECT pb, pa FROM pairs),
        |nodes AS (SELECT DISTINCT ea AS doc FROM edges),
        |reach(doc, lbl) AS (
        |  SELECT doc, doc FROM nodes
        |  UNION
        |  SELECT e.ea, r.lbl FROM edges e JOIN reach r ON r.doc = e.eb)
        |SELECT CAST(doc AS BIGINT) AS doc_id,
        |       CAST(min(lbl) AS BIGINT) AS canonical_id
        |FROM reach GROUP BY doc""".stripMargin,


    // same connected components, then argmax-by-(score, -id) per
    // cluster — oracles keepBest's survivor pick and tie-break
    "q_dedup_keepbest" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS pa, b.vec_id AS pb
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < b.vec_id
        |    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45),
        |edges AS (SELECT pa AS ea, pb AS eb FROM pairs
        |          UNION SELECT pb, pa FROM pairs),
        |nodes AS (SELECT DISTINCT ea AS doc FROM edges),
        |reach(doc, lbl) AS (
        |  SELECT doc, doc FROM nodes
        |  UNION
        |  SELECT e.ea, r.lbl FROM edges e JOIN reach r ON r.doc = e.eb),
        |labels AS (
        |  SELECT CAST(doc AS BIGINT) AS doc_id,
        |         CAST(min(lbl) AS BIGINT) AS canonical_id
        |  FROM reach GROUP BY doc),
        |scored AS (
        |  SELECT l.canonical_id, l.doc_id,
        |         CAST(d.n_chars AS DOUBLE) AS score
        |  FROM labels l JOIN documents d ON d.doc_id = l.doc_id)
        |SELECT canonical_id, keep_id, keep_score, cluster_size
        |FROM (
        |  SELECT canonical_id, doc_id AS keep_id, score AS keep_score,
        |    count(*) OVER (PARTITION BY canonical_id) AS cluster_size,
        |    row_number() OVER (PARTITION BY canonical_id
        |      ORDER BY score DESC, doc_id ASC) AS rn
        |  FROM scored) WHERE rn = 1""".stripMargin,


    // full Lloyd's replay — see KmeansOracle
    "q_kmeans" -> KmeansOracle.assignSql,

    "q_cluster_capped" -> KmeansOracle.cappedSql,


    // fixed-point integer PageRank: 3 unrolled iterations, BIGINT //
    // division everywhere — the engine's long DIV arithmetic replays
    // exactly (dangling mass redistributed as dang // N per node)
    "q_pagerank" -> {
      def iter(k: Int): String = {
        val prev = if (k == 1) "r0" else s"r${k - 1}"
        s"""d$k AS (
           |  SELECT COALESCE(sum(r.rank), 0) AS dang FROM $prev r
           |  LEFT JOIN deg ON deg.src = r.node WHERE deg.src IS NULL),
           |c$k AS (
           |  SELECT e.dst AS node, sum(r.rank // d.deg) AS c
           |  FROM e JOIN deg d ON d.src = e.src
           |  JOIN $prev r ON r.node = e.src GROUP BY e.dst),
           |r$k AS (
           |  SELECT n.node, 150000 + (85 * (COALESCE(c$k.c, 0) +
           |    (SELECT dang FROM d$k) // (SELECT n FROM nn))) // 100
           |    AS rank
           |  FROM nodes n LEFT JOIN c$k ON c$k.node = n.node)""".stripMargin
      }
      s"""WITH j AS (
         |  SELECT o_custkey * 10 AS c, l_suppkey * 10 + 1 AS sp,
         |    l_linenumber
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (
         |  SELECT c AS src, sp AS dst FROM j
         |  UNION ALL
         |  SELECT sp AS src, c AS dst FROM j WHERE l_linenumber = 1),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT src AS node FROM e
         |  UNION ALL SELECT dst AS node FROM e)),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank
         |       FROM nodes),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)}
         |SELECT CAST(node AS BIGINT) AS node,
         |  CAST(rank AS BIGINT) AS rank FROM r3""".stripMargin
    },


    // same connected components as q_dedup_resolve_exact, singletons
    // rooted at themselves, then the md5 split threshold on the root
    "q_split_leakage_safe" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS pa, b.vec_id AS pb
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < b.vec_id
        |    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45),
        |edges AS (SELECT pa AS ea, pb AS eb FROM pairs
        |          UNION SELECT pb, pa FROM pairs),
        |nodes AS (SELECT DISTINCT ea AS doc FROM edges),
        |reach(doc, lbl) AS (
        |  SELECT doc, doc FROM nodes
        |  UNION
        |  SELECT e.ea, r.lbl FROM edges e JOIN reach r ON r.doc = e.eb),
        |labels AS (
        |  SELECT doc AS vid, min(lbl) AS root FROM reach GROUP BY doc),
        |rooted AS (
        |  SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
        |         CAST(coalesce(l.root, e.vec_id) AS BIGINT) AS root_id
        |  FROM embeddings e LEFT JOIN labels l ON l.vid = e.vec_id)
        |SELECT vec_id, root_id,
        |  CASE WHEN md5('ls1:' || CAST(root_id AS VARCHAR)) < 'cccc' THEN 'train'
        |       WHEN md5('ls1:' || CAST(root_id AS VARCHAR)) < 'e666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM rooted""".stripMargin,


    "q_lang_id" ->
      """WITH profiles(plang, pidx, stops) AS (VALUES
        |  ('en', 0, ['the','and','of','to','a','in','is','it','that']),
        |  ('de', 1, ['der','die','das','und','ist','nicht','ein','zu']),
        |  ('fr', 2, ['le','la','les','et','est','un','une','que']),
        |  ('es', 3, ['el','la','los','y','es','un','una','que']),
        |  ('zh', 4, ['的','是','了','在','和','有'])),
        |toks AS (
        |  SELECT doc_id, lang,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang, plang, pidx,
        |    CAST(len(list_filter(ts, t -> list_contains(stops, t))) AS DOUBLE)
        |      / greatest(len(ts), 1) AS score
        |  FROM toks CROSS JOIN profiles)
        |SELECT doc_id, lang, plang AS predicted_lang FROM (
        |  SELECT doc_id, lang, plang,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, pidx ASC) AS rn
        |  FROM scored) WHERE rn = 1""".stripMargin,


    "q_ann_topk" ->
      """SELECT q_id, n_id, rank FROM (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, n.embedding) DESC,
        |               n.vec_id ASC) AS rank
        |  FROM embeddings q, embeddings n
        |  WHERE q.vec_id < 3 AND n.vec_id >= 3)
        |WHERE rank <= 10""".stripMargin,


    "q_ann_ivf" -> ivfOracle(k = 5, probes = 1),

    "q_ann_ivf_probe" -> ivfOracle(k = 5, probes = 3),

    // identical semantics to q_ann_ivf_probe — the index is the same
    // assignment persisted as cell-partitioned parquet
    "q_ann_ivf_indexed" -> ivfOracle(k = 5, probes = 3),


    "q_rp_project" -> RpOracle.projectSql,

    "q_rp_topk" -> RpOracle.topkSql,


    "q_pq_encode" -> PqOracle.encodeSql,

    "q_pq_topk" -> PqOracle.topkSql,

    "q_pq_rerank" -> PqOracle.rerankSql,

    "q_pq_refresh" -> PqOracle.refreshSql,

    "q_pq_ivf" -> PqOracle.ivfSql,


    "q_ann_lsh" -> {
      // the 8 hyperplanes inlined (shortest-round-trip doubles); bucket
      // = packed sign bits, then pairs on equal buckets verified by
      // exact cosine — exactly Similarity.lshCosinePairs(threshold=0.3)
      val planes = graft.ops.Similarity.lshHyperplanes(8).zipWithIndex
        .map { case (h, p) => s"($p, [${h.mkString(",")}]::DOUBLE[])" }
        .mkString(",\n        ")
      s"""WITH hp(p, hvec) AS (VALUES $planes),
         |b AS (
         |  SELECT e.vec_id AS id, e.embedding AS vec,
         |    (SELECT sum(CASE WHEN
         |        list_dot_product(e.embedding::DOUBLE[], hvec) >= 0
         |        THEN 1 << p ELSE 0 END) FROM hp) AS bucket
         |  FROM embeddings e)
         |SELECT l.id AS a_id, r.id AS b_id
         |FROM b l JOIN b r ON l.bucket = r.bucket AND l.id < r.id
         |WHERE list_cosine_similarity(l.vec, r.vec) >= 0.3""".stripMargin
    },


    "q_ann_topk_agg" ->
      """SELECT q_id, n_id, rank FROM (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, n.embedding) DESC,
        |               n.vec_id ASC) AS rank
        |  FROM embeddings q, embeddings n
        |  WHERE q.vec_id < 3 AND n.vec_id >= 3)
        |WHERE rank <= 10""".stripMargin,


    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents""".stripMargin,


    // Spark splits with a lookahead ("(?=[\p{Punct}])|\s+") that RE2
    // can't run; the RE2-safe identity counts token STARTS instead:
    // every punct char opens a token, plus every non-punct non-space
    // char at string start or after whitespace (verified char-exact
    // against the Spark split on the full corpus).
    "q_subword_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) +
        |       len(regexp_extract_all(text,
        |         '(?:^|[\t\n\x0b\f\r ])[^\t\n\x0b\f\r !-/:-@\[-`{-~]'))
        |       AS BIGINT) AS n_subwords
        |FROM documents""".stripMargin,


    "q_text_quality" ->
      """SELECT doc_id,
        |  CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |    / length(string_split_regex(trim(text), '\s+')) AS avg_word_len,
        |  CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> lower(x) IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
        |    / length(string_split_regex(trim(text), '\s+')) AS stopword_ratio
        |FROM documents""".stripMargin,


    "q_string_edit" ->
      """SELECT c_custkey,
        |  CAST(levenshtein(c_name, 'Customer#000000001') AS BIGINT)
        |    AS edit_dist,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
        |  reverse(c_name) AS name_rev,
        |  CAST(strpos(c_name, '9') AS BIGINT) AS pos9,
        |  repeat(c_mktsegment, 2) AS seg2,
        |  concat_ws('|', c_mktsegment, c_name) AS joined
        |FROM customer""".stripMargin,


    "q_kmv_distinct" ->
      """WITH keys AS (
        |  SELECT DISTINCT l_returnflag AS flag, l_partkey
        |  FROM lineitem),
        |hashed AS (
        |  SELECT DISTINCT flag,
        |    ('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM keys),
        |ranked AS (
        |  SELECT flag, h,
        |    row_number() OVER (PARTITION BY flag ORDER BY h ASC) AS rn,
        |    count(*) OVER (PARTITION BY flag) AS total
        |  FROM hashed)
        |SELECT flag,
        |  CAST(CASE WHEN total < 256 THEN CAST(total AS DOUBLE)
        |       ELSE 255.0 / (CAST(h AS DOUBLE) / 1152921504606846976.0)
        |       END AS DOUBLE) AS est_distinct,
        |  CAST(total AS BIGINT) AS n_hashes
        |FROM ranked WHERE rn = least(256, total)""".stripMargin,


    "q_ngram_exact" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, length(text) - 1),
        |      i -> substr(text, CAST(i AS INT), 3))) AS sh
        |  FROM documents WHERE doc_id < 60 AND length(text) >= 3)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    CAST(len(a.sh) + len(b.sh)
        |         - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
        |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.1""".stripMargin,


    "q_quantize_embedding" ->
      """SELECT m.vec_id, CAST(t.i - 1 AS INTEGER) AS idx,
        |  CAST(floor(CAST(m.embedding[t.i] AS DOUBLE) * 127.0 / m.maxabs
        |    + 0.5) AS INTEGER) AS qv
        |FROM (SELECT vec_id, embedding,
        |        CAST(list_max(list_transform(embedding, x -> abs(x)))
        |          AS DOUBLE) AS maxabs
        |      FROM embeddings) m,
        |  UNNEST(generate_series(1, len(m.embedding))) AS t(i)""".stripMargin,


    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word),
        |dfreq AS (
        |  SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word),
        |scored AS (
        |  SELECT tf.doc_id, tf.word, tf.tf, dfreq.df,
        |    CAST(tf.tf AS DOUBLE) / CAST(dfreq.df AS DOUBLE) AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf AS DOUBLE) / CAST(dfreq.df AS DOUBLE) DESC,
        |               tf.word ASC) AS rn
        |  FROM tf JOIN dfreq USING (word))
        |SELECT doc_id, word AS top_word, tf, df, score
        |FROM scored WHERE rn = 1""".stripMargin,


    "q_doc_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
        |  FROM documents),
        |ucnt AS (
        |  SELECT doc_id, g, count(*) AS n
        |  FROM (SELECT doc_id, unnest(l) AS g FROM toks)
        |  GROUP BY doc_id, g),
        |uagg AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS total_w,
        |    CAST(max(n) AS BIGINT) AS top_w,
        |    CAST(count(*) AS BIGINT) AS distinct_w
        |  FROM ucnt GROUP BY doc_id),
        |bcnt AS (
        |  SELECT doc_id, g, count(*) AS n
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(range(1, len(l)),
        |                                i -> l[i] || ' ' || l[i + 1])) AS g
        |        FROM toks WHERE len(l) >= 2)
        |  GROUP BY doc_id, g),
        |bagg AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS total_b,
        |    CAST(max(n) AS BIGINT) AS top_b
        |  FROM bcnt GROUP BY doc_id)
        |SELECT u.doc_id, u.total_w AS n_words,
        |  CAST(u.distinct_w AS DOUBLE) / u.total_w AS distinct_word_ratio,
        |  CAST(u.top_w AS DOUBLE) / u.total_w AS top_word_share,
        |  CAST(COALESCE(b.top_b, 0) AS DOUBLE) /
        |    GREATEST(COALESCE(b.total_b, 0), 1) AS top_bigram_share
        |FROM uagg u LEFT JOIN bagg b ON u.doc_id = b.doc_id""".stripMargin,


    "q_lm_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, source,
        |         string_split_regex(trim(text), '\s+') AS l
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, source,
        |         unnest(list_transform(range(1, len(l)),
        |                i -> l[i] || ' ' || l[i + 1])) AS bg
        |  FROM toks),
        |c2 AS (
        |  SELECT bg, string_split(bg, ' ')[1] AS w1,
        |         CAST(count(*) AS BIGINT) AS c2
        |  FROM bg
        |  WHERE lang = 'en' AND source IN ('src0','src1','src2','src3')
        |  GROUP BY 1, 2),
        |c1 AS (
        |  SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |model AS (
        |  SELECT c2.bg,
        |    CASE WHEN (1048576 * c2.c2) // c1.c1 >= 1
        |         THEN 20 - (length(format('{:b}',
        |                (1048576 * c2.c2) // c1.c1)) - 1)
        |         ELSE 21 END AS bits
        |  FROM c2 JOIN c1 USING (w1)),
        |scored AS (
        |  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    (1000 * CAST(sum(coalesce(model.bits, 21)) AS BIGINT))
        |      // CAST(count(*) AS BIGINT) AS milli_bits
        |  FROM bg LEFT JOIN model USING (bg)
        |  GROUP BY bg.doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(s.milli_bits AS BIGINT) AS milli_bits,
        |  CASE WHEN s.milli_bits IS NULL THEN 'unscored'
        |       WHEN s.milli_bits < 6200 THEN 'head'
        |       WHEN s.milli_bits < 7200 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM documents d LEFT JOIN scored s USING (doc_id)""".stripMargin,


    "q_vocab_build" ->
      """WITH cnt AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |        FROM documents)
        |  GROUP BY word)
        |SELECT word, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rank
        |FROM cnt ORDER BY cnt DESC, word LIMIT 100""".stripMargin,


    "q_bm25" ->
      """WITH tf AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS dl,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                         x -> x = 'spark')) AS BIGINT) AS tf_spark,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                         x -> x = 'merge')) AS BIGINT) AS tf_merge,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                         x -> x = 'window')) AS BIGINT) AS tf_window
        |  FROM documents),
        |st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
        |    CAST(sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_spark,
        |    CAST(sum(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_merge,
        |    CAST(sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_window
        |  FROM tf),
        |sc AS (
        |  SELECT doc_id, dl, tf_spark, tf_merge, tf_window,
        |      ln(1 + (n - df_spark + 0.5) / (df_spark + 0.5)) * tf_spark
        |        * (1.2 + 1) / (tf_spark + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        |    + ln(1 + (n - df_merge + 0.5) / (df_merge + 0.5)) * tf_merge
        |        * (1.2 + 1) / (tf_merge + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        |    + ln(1 + (n - df_window + 0.5) / (df_window + 0.5)) * tf_window
        |        * (1.2 + 1) / (tf_window + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        |    AS score
        |  FROM tf, st)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
        |    AS rank,
        |  doc_id, dl, tf_spark, tf_merge, tf_window
        |FROM sc ORDER BY score DESC, doc_id LIMIT 25""".stripMargin,


    "q_hybrid_retrieval" ->
      """WITH tf AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS dl,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                         x -> x = 'spark')) AS BIGINT) AS tf_spark,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                         x -> x = 'merge')) AS BIGINT) AS tf_merge,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                         x -> x = 'window')) AS BIGINT) AS tf_window
        |  FROM documents),
        |st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
        |    CAST(sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_spark,
        |    CAST(sum(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_merge,
        |    CAST(sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_window
        |  FROM tf),
        |sc AS (
        |  SELECT doc_id,
        |      ln(1 + (n - df_spark + 0.5) / (df_spark + 0.5)) * tf_spark
        |        * (1.2 + 1) / (tf_spark + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        |    + ln(1 + (n - df_merge + 0.5) / (df_merge + 0.5)) * tf_merge
        |        * (1.2 + 1) / (tf_merge + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        |    + ln(1 + (n - df_window + 0.5) / (df_window + 0.5)) * tf_window
        |        * (1.2 + 1) / (tf_window + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        |    AS score
        |  FROM tf, st),
        |qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
        |cs AS (
        |  SELECT vec_id AS doc_id,
        |    list_cosine_similarity(embedding, q_vec) AS cos
        |  FROM embeddings, qv),
        |bm AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |      AS BIGINT) AS bm25_rank
        |  FROM sc ORDER BY score DESC, doc_id LIMIT 50),
        |an AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY cos DESC, doc_id)
        |      AS BIGINT) AS ann_rank
        |  FROM cs ORDER BY cos DESC, doc_id LIMIT 50),
        |fused AS (
        |  SELECT COALESCE(bm.doc_id, an.doc_id) AS doc_id,
        |    COALESCE(bm.bm25_rank, 51) AS bm25_rank,
        |    COALESCE(an.ann_rank, 51) AS ann_rank
        |  FROM bm FULL OUTER JOIN an ON bm.doc_id = an.doc_id)
        |SELECT CAST(row_number() OVER (
        |    ORDER BY bm25_rank + ann_rank ASC, doc_id ASC) AS BIGINT)
        |    AS rank,
        |  doc_id, bm25_rank, ann_rank
        |FROM fused
        |ORDER BY bm25_rank + ann_rank ASC, doc_id ASC LIMIT 10""".stripMargin,


    "q_unicode_norm" ->
      """SELECT doc_id,
        |  nfc_normalize(substr(text, 1, 16) || ' café niño plüs') AS norm,
        |  CAST(length(substr(text, 1, 16) || ' café niño plüs') AS BIGINT) AS len_raw,
        |  CAST(length(nfc_normalize(substr(text, 1, 16) || ' café niño plüs')) AS BIGINT) AS len_nfc
        |FROM documents""".stripMargin,


    "q_url_extract" ->
      """WITH p AS (
        |  SELECT
        |    regexp_extract(url, 'https://([^/]+)/', 1) AS host,
        |    regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        |    regexp_extract(url, '\?ref=([^&]*)', 1) AS ref
        |  FROM (SELECT 'https://' || source || '.example.com/d/' ||
        |          CAST(doc_id AS VARCHAR) || '?ref=' || lang AS url
        |        FROM documents))
        |SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT ref) AS BIGINT) AS n_refs,
        |  min(path) AS first_path
        |FROM p GROUP BY host""".stripMargin,


    "q_sample_per_group" ->
      """SELECT source, doc_id, sample_rank FROM (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 5""".stripMargin,


    "q_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, length(text) - 3),
        |    i -> substr(text, CAST(i AS INT), 5)))) AS sh
        |  FROM documents WHERE length(text) >= 5),
        |bench AS (
        |  SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
        |corpus AS (
        |  SELECT doc_id, sh FROM sh WHERE doc_id % 50 <> 0),
        |overlap AS (
        |  SELECT doc_id, count(*) AS n_overlap FROM corpus
        |  WHERE sh IN (SELECT sh FROM bench) GROUP BY doc_id),
        |totals AS (
        |  SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id)
        |SELECT t.doc_id, t.n_shingles,
        |  COALESCE(o.n_overlap, 0) AS n_overlap,
        |  CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) /
        |    CAST(t.n_shingles AS DOUBLE) AS contamination
        |FROM totals t LEFT JOIN overlap o ON t.doc_id = o.doc_id""".stripMargin,


    // identical semantics to q_decontaminate by construction: the
    // bloom filter admits a superset (never a false negative) and the
    // exact confirm strips the rest
    "q_decontaminate_bloom" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, length(text) - 3),
        |    i -> substr(text, CAST(i AS INT), 5)))) AS sh
        |  FROM documents WHERE length(text) >= 5),
        |bench AS (
        |  SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
        |corpus AS (
        |  SELECT doc_id, sh FROM sh WHERE doc_id % 50 <> 0),
        |overlap AS (
        |  SELECT doc_id, count(*) AS n_overlap FROM corpus
        |  WHERE sh IN (SELECT sh FROM bench) GROUP BY doc_id),
        |totals AS (
        |  SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id)
        |SELECT t.doc_id, t.n_shingles,
        |  COALESCE(o.n_overlap, 0) AS n_overlap,
        |  CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) /
        |    CAST(t.n_shingles AS DOUBLE) AS contamination
        |FROM totals t LEFT JOIN overlap o ON t.doc_id = o.doc_id""".stripMargin,


    // identify-then-DV-delete replayed as a NOT-IN filter: the final
    // snapshot must equal the corpus minus every doc whose 25-gram
    // overlap ratio reached 0.5 (integer/integer division — both
    // engines compute the identical double, so the threshold compare
    // agrees bit-for-bit)
    "q_decontaminate_retro" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, length(text) - 23),
        |    i -> substr(text, CAST(i AS INT), 25)))) AS sh
        |  FROM documents WHERE length(text) >= 25),
        |bench AS (
        |  SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0),
        |corpus AS (
        |  SELECT doc_id, sh FROM sh WHERE doc_id % 10 <> 0),
        |overlap AS (
        |  SELECT doc_id, count(*) AS n_overlap FROM corpus
        |  WHERE sh IN (SELECT sh FROM bench) GROUP BY doc_id),
        |totals AS (
        |  SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
        |doomed AS (
        |  SELECT t.doc_id FROM totals t
        |  LEFT JOIN overlap o ON t.doc_id = o.doc_id
        |  WHERE CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) /
        |    CAST(t.n_shingles AS DOUBLE) >= 0.5)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id % 10 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM doomed)""".stripMargin,


    // the purge's change feed: exactly the doomed docs, each as one
    // delete event carrying its pre-image
    "q_decontaminate_retro_cdf" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, length(text) - 23),
        |    i -> substr(text, CAST(i AS INT), 25)))) AS sh
        |  FROM documents WHERE length(text) >= 25),
        |bench AS (
        |  SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0),
        |corpus AS (
        |  SELECT doc_id, sh FROM sh WHERE doc_id % 10 <> 0),
        |overlap AS (
        |  SELECT doc_id, count(*) AS n_overlap FROM corpus
        |  WHERE sh IN (SELECT sh FROM bench) GROUP BY doc_id),
        |totals AS (
        |  SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
        |doomed AS (
        |  SELECT t.doc_id FROM totals t
        |  LEFT JOIN overlap o ON t.doc_id = o.doc_id
        |  WHERE CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) /
        |    CAST(t.n_shingles AS DOUBLE) >= 0.5)
        |SELECT d.doc_id, d.lang, 'delete' AS change_type
        |FROM documents d
        |WHERE d.doc_id % 10 <> 0
        |  AND d.doc_id IN (SELECT doc_id FROM doomed)""".stripMargin,


    "q_dedup_semdedup" -> {
      val values = graft.ops.Similarity.ivfCentroids(8, 64).zipWithIndex
        .map { case (c, i) => s"($i, [${c.mkString(",")}]::DOUBLE[])" }
        .mkString(",\n        ")
      s"""WITH cents(cell, cvec) AS (VALUES $values),
         |a AS (
         |  SELECT e.vec_id, e.label, e.embedding, c.cell
         |  FROM embeddings e, LATERAL (
         |    SELECT cell FROM cents
         |    ORDER BY list_dot_product(e.embedding::DOUBLE[], cvec) DESC,
         |             cell DESC
         |    LIMIT 1) c)
         |SELECT vec_id, label FROM a
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM a b
         |  WHERE b.cell = a.cell AND b.vec_id < a.vec_id
         |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
         |)""".stripMargin
    },


    // exact replays of the splitmix64 hash family (see SplitmixOracle
    // scaladoc): every hash, signature, band bucket, and pair is
    // recomputed bit-for-bit in DuckDB via HUGEINT mod-2^64 arithmetic
    "q_dedup_minhash" -> SplitmixOracle.minhashPairs,

    "q_ngram_jaccard" -> SplitmixOracle.ngramJaccardPairs,

    "q_dedup_simhash" -> SplitmixOracle.simhashPairs,

    "q_hash_embed" -> SplitmixOracle.hashEmbedStats,

    "q_hash_embed_sim" -> SplitmixOracle.hashEmbedSim,

    "q_dsir_select" -> SplitmixOracle.dsirSelect,

    "q_perceptron_filter" -> SplitmixOracle.perceptronFilter(20),

    "q_cms_heavy" -> SplitmixOracle.cmsHeavy(CmsProbeWords),


    // integer ceil-division quotas: (rank·10 + max−1) // max, docs
    // kept by ascending id within each source
    "q_host_quota" ->
      """WITH ranks AS (
        |  SELECT source, sum(n_chars) AS r FROM documents
        |  GROUP BY source),
        |mx AS (SELECT max(r) AS m FROM ranks),
        |q AS (
        |  SELECT source,
        |    (r * 10 + (SELECT m FROM mx) - 1) // (SELECT m FROM mx)
        |      AS quota
        |  FROM ranks),
        |rn AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS rn
        |  FROM documents)
        |SELECT doc_id, source FROM rn JOIN q USING (source)
        |WHERE rn <= quota""".stripMargin,


    // exact because the KMV sketches are COMPLETE at this corpus: the
    // per-language vocabulary is 31 distinct words (measured at sf0.01
    // AND sf0.1 — the generator draws from a fixed 31-word pool), so a
    // k=128 bottom-k sketch retains every hash and the estimate
    // degenerates to exact |A∩B| / |A∪B| of the word sets, which DuckDB
    // computes without replaying xxhash64. Margin: |A∪B| ≤ 62 ≪ 128.
    "q_sketch_jaccard" ->
      """WITH v AS (
        |  SELECT DISTINCT lang, word FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS word
        |    FROM documents)),
        |cnt AS (SELECT lang, count(*) AS n FROM v GROUP BY lang),
        |inter AS (
        |  SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS ni
        |  FROM v a JOIN v b ON a.word = b.word AND a.lang < b.lang
        |  GROUP BY a.lang, b.lang)
        |SELECT ca.lang AS lang_a, cb.lang AS lang_b,
        |  CAST(COALESCE(i.ni, 0) AS DOUBLE) /
        |  CAST(ca.n + cb.n - COALESCE(i.ni, 0) AS DOUBLE) AS est_jaccard
        |FROM cnt ca JOIN cnt cb ON ca.lang < cb.lang
        |LEFT JOIN inter i ON i.lang_a = ca.lang AND i.lang_b = cb.lang""".stripMargin,


    // cell-restricted replay of the IVF-prefiltered anti-join: the
    // inlined centroids make the assignment reproducible; cosine
    // boundary safety as before (nearest per-row max-similarity to
    // the 0.45 threshold ~1e-3 away at every SF, measured — vastly
    // above any double-rounding divergence between the two engines)
    "q_decontaminate_semantic" -> {
      val values = graft.ops.Similarity.ivfCentroids(8, 64).zipWithIndex
        .map { case (c, i) => s"($i, [${c.mkString(",")}]::DOUBLE[])" }
        .mkString(",\n        ")
      s"""WITH cents(cell, cvec) AS (VALUES $values),
         |corpus AS (
         |  SELECT e.vec_id, e.label, e.embedding, c.cell
         |  FROM embeddings e, LATERAL (
         |    SELECT cell FROM cents
         |    ORDER BY list_dot_product(e.embedding::DOUBLE[], cvec) DESC,
         |             cell DESC
         |    LIMIT 1) c
         |  WHERE e.vec_id >= 50),
         |bench AS (
         |  SELECT e.vec_id, e.embedding, c.cell
         |  FROM embeddings e, LATERAL (
         |    SELECT cell FROM cents
         |    ORDER BY list_dot_product(e.embedding::DOUBLE[], cvec) DESC,
         |             cell DESC
         |    LIMIT 2) c
         |  WHERE e.vec_id < 50)
         |SELECT c.vec_id, c.label FROM corpus c
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM bench b WHERE b.cell = c.cell
         |  AND list_cosine_similarity(c.embedding, b.embedding) >= 0.45
         |)""".stripMargin
    },


    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'fake/raw' AS format,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,


    // md5 of the payload BYTES == md5 of the UTF-8 text both engines
    "q_multimodal_dedup" ->
      """SELECT md5(text) AS payload_md5,
        |  min(doc_id) AS keep_id, count(*) AS dup_cnt
        |FROM documents GROUP BY md5(text)""".stripMargin,


    // the stub decode is md5-derived (Multimodal.md5Long), so every
    // fake dimension/feature recomputes exactly in DuckDB:
    // conv(substring(md5 x),1,15),16,10) ≡ ('0x'||substring(md5(x),1,15))
    // ::BIGINT. feat_sum adds the 8 features left-to-right in BOTH
    // engines (Spark aggregate() folds left), so the doubles are
    // bit-identical.
    "q_multimodal_features" ->
      ("""WITH f AS (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |    CAST(('0x' || substring(md5(text), 1, 15))::BIGINT % 1920
        |      AS INT) AS width,
        |    CAST(('0x' || substring(md5(text || '#h'), 1, 15))::BIGINT
        |      % 1080 AS INT) AS height,
        |    [""".stripMargin +
        (0 until 8).map(d =>
          s"(('0x' || substring(md5('f$d#' || substring(text, ${d * 16 + 1}, 64)), 1, 15))::BIGINT % 1000000) / 1000000.0")
          .mkString(",\n      ") +
        """] AS feats
        |  FROM documents)
        |SELECT media_id, n_bytes, width, height,
        |  CAST(8 AS BIGINT) AS n_features,
        |  feats[1] + feats[2] + feats[3] + feats[4] + feats[5] +
        |    feats[6] + feats[7] + feats[8] AS feat_sum,
        |  feats[1] AS feat0
        |FROM f""".stripMargin),


    "q_dedup_fuzzy" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, length(text) // 50 AS lb,
        |         substr(text, 1, 100) AS pref
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.pref, b.pref) AS BIGINT) AS dist
        |FROM docs a JOIN docs b
        |  ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.pref, b.pref) <= 25""".stripMargin,

  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, LongType}

/** Scale-evidence harness: materializes a 10x blow-up of the sf0.1
  * testdata and times the headline queries at both scales, printing
  * wall-time ratios. The point is MEASURED evidence (not just audited
  * plan shapes) that the expensive operators grow sub-quadratically
  * in data size — the scale claim VERDICT r7 asked round 8 to back
  * with a datapoint.
  *
  * The blow-up derives every row from the driver-generated sf0.1
  * parquet (never synthesized from scratch): each of the `copies`
  * replicas remaps all identity keys by `copy * 10_000_000` and
  * perturbs content deterministically so the 10x corpus has a 10x
  * WORKLOAD, not 10x literal duplicates:
  *
  *  - documents: `repeat('x', 53*(copy%100))` appended to the text
  *    (53 > the fuzzy-dedup length bucket width of 50) and, past the
  *    pad cycle, a per-century lang variant — so every copy lands in
  *    its own (lang, len/50) block at every decade: the blocking-key
  *    space grows with the corpus and the blocked O(sum block^2) join
  *    stays linear, exactly how a genuinely 10x-diverse corpus
  *    behaves. The 100-char comparison prefix is untouched, so
  *    within-copy near-dup structure is preserved verbatim.
  *  - embeddings: per-copy, per-component deterministic jitter
  *    (`sin(i*37 + copy*101)/100`), so the 10x IVF index holds 10x
  *    distinct vectors rather than 10 aligned duplicates of each.
  *  - orders / events / customer: pure key remap; timestamps are kept
  *    so streaming state and window shapes genuinely grow 10x.
  */
object ScaleBench {
  /** Replication factor: 10 (default) = sf1 from sf0.1; 100 = sf10 —
    * the second point on the scale curve. Env-overridable so one
    * harness serves both datapoints.
    */
  private val Copies =
    sys.env.get("SPARK_GRAFT_SCALE_COPIES").map(_.toInt).getOrElse(10)

  /** The six queries VERDICT r7 item 3 names, plus the delta-export
    * round trip (export is O(files touched); the read-back is the
    * external-reader path over the exported log).
    */
  private val Headline = Seq(
    "q_ingest_e2e", "q_dedup_fuzzy", "q_change_feed",
    "q_hybrid_retrieval", "q_ann_ivf_indexed", "q_stream_outer_join",
    "q_delta_export", "x_decontaminate_ivf", "x_fuzzy_split",
    "x_delete_rewrite", "x_delete_dv", "x_cdf_export",
    "x_url_dedup", "x_upsert_overlap", "x_insert_absent", "x_dv_purge",
    "q_substring_dedup", "q_lm_score", "q_bpe_train", "q_tokenize_ids",
    "q_rp_topk", "q_allpairs_sim", "x_shallow_clone", "q_pq_encode",
    "x_rename_column", "x_bloom_lookup", "x_bloom_lookup_off",
    "x_occ_rebase", "x_occ_rerun", "x_dfp_join", "x_dfp_join_off",
    "q_lm_perplexity", "q_perceptron_filter",
    "q_substring_remove", "q_curation_funnel", "q_stream_tws",
    "q_gopher_rules", "q_c4_filter", "x_funnel_incremental",
    "x_pq_refresh", "x_autocompact", "x_fanout", "x_fanout_upkeep",
    "q_kmeans", "q_dsir_select", "x_pagerank")

  /** Scale-only cases that are not SparkEntry gates: shapes whose
    * scale story needs DIFFERENT fixture sizing than the sf0.01 gate.
    * x_decontaminate_ivf: IVF-prefiltered semantic decontamination
    * with a 10× benchmark set (500 vectors — `vec_id < 500` stays
    * copy-0-only under the key remap, so the bench is fixed while the
    * corpus side scales with the data) — the VERDICT r11 item-5
    * datapoint.
    */
  /** One delete-fixture table per (variant, dir): a fresh copy of the
    * scaled events table. The build is memoized (min-of-two then
    * times the DELETE, not the load); each timed round deletes a
    * DIFFERENT ~0.1% key slice (event_id ≡ round mod 1009) so repeat
    * runs do comparable fresh work. Keys are uniform, so every file
    * overlaps the batch — the rewrite path's worst case and exactly
    * the sparse-erasure shape deletion vectors exist for.
    */
  private val deleteFixture =
    new java.util.concurrent.ConcurrentHashMap[String, graft.tables.ResourceTable]()
  private val deleteRound =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()

  private def deleteDemo(s: SparkSession, dir: String, variant: String)
      : graft.tables.ResourceTable =
    deleteFixture.computeIfAbsent(s"$variant:$dir", _ => {
      // events (100M rows / several GB at 100×): big enough that the
      // rewrite path's write amplification — clusterForWrite SHUFFLES
      // and rewrites every overlapping file's bytes — costs real time;
      // the DV path scans the same bytes but writes only bitmaps
      // (smaller fixtures vanish in job overhead at local[32])
      val base = s.read.parquet(s"$dir/events.parquet").repartition(32)
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_sdel_$variant").toString
      val tab = graft.tables.ResourceTable(s, s"$tmp/e.parquet")
        .createIfNotExists(base.schema)
      tab.upsert(base, "event_id")
      tab
    })

  private def nextSlice(key: String): Int =
    deleteRound.computeIfAbsent(key,
      _ => new java.util.concurrent.atomic.AtomicInteger(0))
      .getAndIncrement()

  /** Physical bytes under a local dir — measures each delete's WRITE
    * AMPLIFICATION (the fast local SSD hides it in wall-clock; on an
    * object store the written bytes ARE the cost).
    */
  private def dirBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(
      new java.net.URI(path).getPath match {
        case null => path.stripPrefix("file:")
        case p => p
      })
    if (!java.nio.file.Files.exists(root)) return 0L
    val s = java.nio.file.Files.walk(root)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  private def timedDelete(tab: graft.tables.ResourceTable,
                          variant: String)(op: => Long): Unit = {
    val before = dirBytes(tab.path)
    op
    val wrote = dirBytes(tab.path) - before
    System.err.println(
      f"[delete-bytes] $variant%-10s wrote ${wrote / 1024.0 / 1024.0}%10.2f MiB")
  }

  /** Conflicted upsert under optimistic concurrency: a disjoint rival
    * APPEND wins the election inside the main writer's publish window
    * (deterministically, via the publish hook). With rebase the loser
    * re-anchors its files on the rival's head — the measured cost is
    * ONE upsert plus a manifest diff; with the kill switch off it
    * re-runs the whole read-join-write job, paying the upsert twice.
    * The rebase/rerun ratio IS the feature's value at scale.
    */
  private def occCase(rebaseOn: Boolean)
      : (SparkSession, String) => DataFrame = (s, dir) => {
    val tab = deleteDemo(s, dir, "occ")
    val i = nextSlice(s"occ:${rebaseOn}:$dir")
    val batch = s.read.parquet(s"$dir/events.parquet")
      .filter(col("event_id") % 1009 === i)
    val rivalBatch = s.read.parquet(s"$dir/events.parquet")
      .filter(col("event_id") % 1009 === i + 700)
      .withColumn("event_id", col("event_id") + lit(4000000000L))
    val rival = graft.tables.ResourceTable(s, tab.path)
    tab.onBeforePublish = () => {
      tab.onBeforePublish = () => ()
      rival.append(rivalBatch) // disjoint keys: rebase-eligible
    }
    s.conf.set("graft.table.rebase", rebaseOn.toString)
    val t0 = System.nanoTime()
    try tab.upsert(batch, "event_id"): Unit
    finally {
      s.conf.set("graft.table.rebase", "true")
      tab.onBeforePublish = () => ()
    }
    System.err.println(f"[occ] rebase=$rebaseOn conflicted upsert " +
      f"${(System.nanoTime() - t0) / 1e9}%.2fs")
    s.range(1).toDF("done")
  }

  /** Standing funnel state per scaled dir: the flag table of the
    * corpus MINUS a fixed-size slice (the incoming micro-batch), plus
    * the benchmark index — both built once (min-of-two charges only
    * the refresh). The batch and the benchmark are copy-0-only, so
    * their size is CONSTANT across scales: the measured growth is the
    * flag-state scan alone (~60 B/doc), which is the O(state +
    * changed docs) claim in its measurable form.
    */
  private val funnelFixture = new java.util.concurrent.ConcurrentHashMap[
    String, (DataFrame, graft.ops.Curation.BenchmarkIndex)]()

  private val pqRefreshFixture =
    new java.util.concurrent.ConcurrentHashMap[
      String, (DataFrame, graft.ops.Pq.Codebook)]()

  private def funnelState(s: SparkSession, dir: String)
      : (DataFrame, graft.ops.Curation.BenchmarkIndex) =
    funnelFixture.computeIfAbsent(dir, _ => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val bench = docs.filter(col("doc_id") % 50 === 0 &&
        col("doc_id") < 10000000L)
      val bx = graft.ops.Curation.benchmarkIndex(bench)
      val corpus = docs.filter(col("doc_id") % 50 =!= 0)
      val standing = graft.ops.Curation.flags(
        corpus.filter(!(col("doc_id") < 10000000L &&
          col("doc_id") % 10 === 0)), bx, "doc_id", "text")
        .localCheckpoint(true)
      (standing, bx)
    })

  private val Extra: Map[String, (SparkSession, String) => DataFrame] = Map(
    // incremental re-curation over a CDF micro-batch: fixed-size
    // inserts (copy-0 ids ≡ 0 mod 10, held out of the standing state)
    // + fixed-size deletes (copy-0 ids ≡ 3 mod 10) against a standing
    // flag state that grows with the corpus — the refresh must stay
    // near-flat while q_curation_funnel (the full recompute, measured
    // alongside) grows with the data
    "x_funnel_incremental" -> ((s, dir) => {
      val (standing, bx) = funnelState(s, dir)
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 50 =!= 0)
      val inserts = docs.filter(col("doc_id") < 10000000L &&
          col("doc_id") % 10 === 0)
        .withColumn("_change_type", lit("insert"))
      val deletes = docs.filter(col("doc_id") < 10000000L &&
          col("doc_id") % 10 === 3)
        .withColumn("_change_type", lit("delete"))
      graft.ops.Curation.refreshFlags(standing,
        inserts.unionByName(deletes), bx, "doc_id", "text")
    }),
    // CDF-maintained PQ codes at scale: the standing code table grows
    // with the corpus, the micro-batch is copy-0-only (scale-constant)
    // — refresh must stay near-flat like x_funnel_incremental
    "x_pq_refresh" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val (codes0, cb) = pqRefreshFixture.computeIfAbsent(dir, _ => {
        val cb = graft.ops.Pq.trainOn(emb)
        val standing = graft.ops.Pq.encode(
            emb.filter(!(col("vec_id") < 10000000L &&
              col("vec_id") % 10 === 0)), cb)
          .select(col("vec_id"), col("codes"))
          .localCheckpoint(true)
        (standing, cb)
      })
      val inserts = emb.filter(col("vec_id") < 10000000L &&
          col("vec_id") % 10 === 0)
        .select(col("vec_id"), col("embedding"))
        .withColumn("_change_type", lit("insert"))
      val deletes = emb.filter(col("vec_id") < 10000000L &&
          col("vec_id") % 10 === 3)
        .select(col("vec_id"), col("embedding"))
        .withColumn("_change_type", lit("delete"))
      graft.ops.Pq.refreshCodes(codes0,
        inserts.unionByName(deletes), cb)
    }),
    "x_occ_rebase" -> occCase(rebaseOn = true),
    "x_occ_rerun" -> occCase(rebaseOn = false),
    // PAGERANK at scale (VERDICT r18 task 3): q_pagerank's own tables
    // (lineitem/orders) have no scale recipe, so the decade runs the
    // same Graph.pageRank over an edge set derived from the scaled
    // events table — built to contain GROWING HUBS, the shape where a
    // skewed key would surface: every event links its (copy-remapped,
    // cardinality-growing) user to one of 997 fixed hub nodes whose
    // in-degree grows linearly with the corpus, and every 10th event
    // adds the reverse edge, so hubs also accumulate out-degree
    // (their rank spreads over ~corpus/10 edges — the hot SRC key in
    // the per-iteration eDeg⋈ranks join; in-degree hubs stress the
    // groupBy(dst) side, which partial aggregation absorbs). 3
    // iterations, like the gate.
    "x_pagerank" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val fwd = ev.select(col("user_id").as("src"),
        (col("event_id") % 997).as("dst"))
      val rev = ev.filter(col("event_id") % 10 === 0)
        .select((col("event_id") % 997).as("src"),
          col("user_id").as("dst"))
      graft.ops.Graph.pageRank(fwd.unionByName(rev), "src", "dst",
          iterations = 3)
        .select(col("node"), col("rank"))
    }),
    // dim-driven join with vs without dynamic file pruning: the
    // scan-footprint contrast is the claim (see dfpLookup)
    "x_dfp_join" -> ((s, dir) => {
      dfpLookup(s, dir, dfp = true); s.range(1).toDF("done")
    }),
    "x_dfp_join_off" -> ((s, dir) => {
      dfpLookup(s, dir, dfp = false); s.range(1).toDF("done")
    }),
    // J2 scale contrast: the SAME sparse uniform delete through the
    // file-rewrite path vs the deletion-vector path — rewrite is
    // O(bytes of every overlapping file), DV is O(deleted rows)
    "x_delete_rewrite" -> ((s, dir) => {
      val tab = deleteDemo(s, dir, "rw")
      val i = nextSlice(s"rw:$dir")
      timedDelete(tab, "rewrite")(tab.deleteMatching(
        s.read.parquet(s"$dir/events.parquet")
          .filter(col("event_id") % 1009 === i).select("event_id"),
        "event_id"))
      s.range(1).toDF("done")
    }),
    "x_delete_dv" -> ((s, dir) => {
      val tab = deleteDemo(s, dir, "dv")
      val i = nextSlice(s"dv:$dir")
      timedDelete(tab, "dv")(tab.deleteMatchingDv(
        s.read.parquet(s"$dir/events.parquet")
          .filter(col("event_id") % 1009 === i).select("event_id"),
        "event_id"))
      s.range(1).toDF("done")
    }),
    // CDF export of ONE DV-delete commit on the scaled table: the
    // _change_data materialization must track the ~0.1% slice the
    // delete touched, not the table. First call anchors the export
    // (one-time, absorbed by min-of-two); the measured round is
    // delete + incremental export of that single cdc commit — the
    // change-feed analogue of x_delete_dv's O(deleted rows) claim.
    "x_cdf_export" -> ((s, dir) => {
      val tab = deleteDemo(s, dir, "dv").enableChangeDataFeed()
      val i = 500 + nextSlice(s"cdfx:$dir") // slices disjoint from x_delete_dv's
      tab.deleteMatchingDv(
        s.read.parquet(s"$dir/events.parquet")
          .filter(col("event_id") % 1009 === i).select("event_id"),
        "event_id")
      graft.tables.DeltaExport.export(tab)
      s.range(1).toDF("done")
    }),
    // q_dedup_fuzzy's shape with the triangle split engaged: per-task
    // work capped at 1000² gated comparisons regardless of how large
    // the hottest (lang, length-bucket) block grows — the VERDICT r11
    // item-6 mitigation, output bit-identical to the unsplit join
    "x_fuzzy_split" -> ((s, dir) =>
      graft.ops.Dedup.editDistancePairs(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        blockKey = struct(col("lang"),
          (length(col("text")) / lit(50)).cast("int")),
        maxBlockRows = 1000)),
    "x_decontaminate_ivf" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.ops.Similarity.semanticDecontaminateIvf(
        emb.filter(col("vec_id") >= 500),
        emb.filter(col("vec_id") < 500),
        threshold = 0.45, nCells = 8, dim = 64, probes = 2)
        .select(col("vec_id"), col("label"))
    }),
    // canonical-URL dedup over the whole scaled corpus: one row-local
    // regexp projection + one hash aggregate on the near-unique
    // canonical key — expected ~linear (ratio ≈ Copies at 10×)
    "x_url_dedup" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val page = expr("doc_id DIV 3").cast("string")
      val host = concat(lit("h"), expr("(doc_id DIV 3) % 50").cast("string"))
      val url = when(col("doc_id") % 3 === 0,
          concat(lit("https://www."), host, lit(".example.com/p/"), page,
            lit("?utm_source=feed&id="), page))
        .when(col("doc_id") % 3 === 1,
          concat(lit("HTTP://"), host, lit(".EXAMPLE.com/p/"), page,
            lit("?id="), page, lit("&utm_campaign=x")))
        .otherwise(concat(lit("https://"), host, lit(".example.com/p/"),
          page, lit("/?id="), page, lit("#sec-2")))
      graft.ops.Urls.dedupByUrl(
        docs.withColumn("url", url), "url", "doc_id")
    }),
    // J1 scale contrast: the SAME half-known/half-new dedup-ingest
    // batch through classic MERGE (rewrites every overlapping file)
    // vs INSERT-ONLY merge (reads only the key column, writes only
    // the genuinely-new rows). Uniform keys mod 2003 overlap every
    // file — the re-crawl ingest worst case insertIfAbsent exists for.
    "x_upsert_overlap" -> ((s, dir) => {
      val tab = deleteDemo(s, dir, "ups")
      val i = nextSlice(s"ups:$dir")
      timedDelete(tab, "upsert")(
        tab.upsert(ingestBatch(s, dir, i), "event_id"))
      s.range(1).toDF("done")
    }),
    "x_insert_absent" -> ((s, dir) => {
      val tab = deleteDemo(s, dir, "ins")
      val i = nextSlice(s"ins:$dir")
      timedDelete(tab, "insert_only")(
        tab.insertIfAbsent(ingestBatch(s, dir, i), "event_id"))
      s.range(1).toDF("done")
    }),
    // INCREMENTAL COMPACTION at scale (the autoCompact steady state):
    // 24 tiny appends land as small trailing files on a corpus-sized
    // table, then ONE compactSmallFiles pass coalesces them
    // cluster-sorted. The batch is read via limit() (constant work at
    // any decade) and minBytes sits below the base fixture's file
    // sizes at every decade, so the timed region is O(appends + small
    // files) — the claim is a FLAT ratio while the table under it
    // grows 10×/100×.
    "x_autocompact" -> ((s, dir) => {
      val tab = deleteDemo(s, dir, "ac")
      val r = nextSlice(s"ac:$dir")
      val batch = s.read.parquet(s"$dir/events.parquet")
        .limit(24000)
        .withColumn("event_id",
          col("event_id") + lit(8000000000L) + lit(r.toLong) * 1000000L)
        .localCheckpoint(true)
      (0 until 24).foreach { i =>
        tab.append(batch.filter(col("event_id") % 24 === i))
      }
      val (smallN, largeN) = tab.compactSmallFiles(
        minBytes = 512L << 10, targetBytes = 1L << 30,
        numFiles = Some(4))
      System.err.println(
        s"[autocompact] compacted $smallN small, carried $largeN large")
      s.range(1).toDF("done")
    }),
    // N+1 CONCURRENT streaming fan-out under load (VERDICT r15
    // item 2): the reference's primary runtime is ONE source fanning
    // into per-type queries plus a default catch-all, each with its
    // own checkpoint (main.py:157–188; the starvation comment at
    // main.py:119–124 is the motivation). Bundles derived from the
    // scaled orders table round-robin over the five configured types
    // + Claim (caught by the default query); all SIX queries ingest
    // simultaneously from the same file source into separate ACID
    // tables under Trigger.AvailableNow. stderr reports aggregate
    // bundle rows/s and the per-query trigger-time spread — the
    // starvation figure: near-1 means no type starves another. Scale
    // claim: wall grows with the BUNDLE VOLUME (each decade is 10×
    // the bundles), never super-linearly, and the spread stays flat.
    "x_fanout" -> ((s, dir) => {
      import org.apache.spark.sql.types.{BinaryType, StringType}
      val types = Seq("Patient", "Observation", "Encounter",
        "Condition", "Procedure")
      val all = types :+ "Claim"
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_fanout_src").toString
      val base = java.nio.file.Files
        .createTempDirectory("graft_fanout").toString
      val typeCol = element_at(array(all.map(lit): _*),
        (col("o_orderkey") % 6).cast("int") + 1)
      val wire = s.read.parquet(s"$dir/orders.parquet").select(
        col("o_orderkey").cast(StringType).cast(BinaryType).as("key"),
        to_json(struct(array(struct(
          to_json(struct(
            typeCol.as("resourceType"),
            col("o_orderkey").cast(StringType).as("id"),
            (col("o_orderstatus") === "O").as("active"))).as("resource"),
          struct(lit("PUT").as("method"),
            concat_ws("/", typeCol, col("o_orderkey")).as("url"))
            .as("request"))).as("entry"))).cast(BinaryType).as("value"),
        lit("fhir.msg").as("topic"),
        lit(0).as("partition"),
        col("o_orderkey").as("offset"),
        lit(new java.sql.Timestamp(1700000000000L)).as("timestamp"))
      wire.repartition(24).write.mode("overwrite").parquet(srcDir)
      val src = s.readStream
        .schema(graft.pipeline.BundlePipeline.kafkaWireSchema)
        .option("maxFilesPerTrigger", "4") // 6 micro-batches per query
        .parquet(srcDir)
      val settings = graft.streaming.Settings(
        checkpointDir = s"$base/checkpoint",
        deltaDatabaseDir = s"$base/delta/default",
        resourceTypes = types,
        triggerAvailableNow = true,
        upkeepInterval = 0)
      val t0 = System.nanoTime()
      val queries = graft.streaming.Engine.start(src, settings)
      queries.foreach(_.awaitTermination())
      val wall = (System.nanoTime() - t0) / 1e9
      // per-query drain cost from the progress events each query kept:
      // triggerExecution sums to the query's busy time; the spread
      // (slowest/fastest) is the starvation figure
      val perQ = queries.map { q =>
        val ps = q.recentProgress
        val busyMs = ps.map(p =>
          Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(0L)).sum
        (Option(q.name).getOrElse("?"), busyMs,
          ps.map(_.numInputRows).sum)
      }
      val counts = all.map { rt =>
        rt -> graft.tables.ResourceTable(
          s, s"$base/delta/default/$rt.parquet").read().count()
      }
      val nBundles = counts.map(_._2).sum
      val busy = perQ.map(_._2)
      val spread =
        if (busy.isEmpty || busy.min == 0L) -1.0
        else busy.max.toDouble / busy.min
      System.err.println(
        f"[fanout] $nBundles%d bundles via ${perQ.size}%d queries in " +
          f"$wall%.2fs (${nBundles / wall}%.0f rows/s) " +
          f"starvation-spread ${spread}%.2fx " +
          s"busyMs=${perQ.map(p => s"${p._1}:${p._2}").mkString(",")} " +
          // per-query rows seen by the STREAM (progress events) — the
          // cheap cross-check that each query actually drained the
          // whole source, independent of the table re-reads below
          s"inRows=${perQ.map(p => s"${p._1}:${p._3}").mkString(",")} " +
          s"tables=${counts.map(c => s"${c._1}:${c._2}").mkString(",")}")
      s.createDataFrame(
        s.sparkContext.parallelize(
          counts.map(c => org.apache.spark.sql.Row(c._1, c._2)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("resource_type",
            StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType))))
    }),

    // x_fanout with LIVE UPKEEP (VERDICT r16 item 3): the reference's
    // literal default configuration — upkeep (OPTIMIZE + VACUUM) every
    // 50 batches INSIDE the same foreachBatch that ingests
    // (bundle_processor.py:237–238, settings.py:39) — while all six
    // queries drain concurrently. The source is cut into 60 one-file
    // micro-batches per query so batch 50 fires maintenance
    // MID-INGEST on every table, racing the other queries' merges.
    // Asserts: per-type counts exact, the commit history of every
    // table is LINEAR (every version 0..latest exists — no torn or
    // skipped commit under the race), and compaction demonstrably ran
    // (≥1 OPTIMIZE commit per table). stderr reports rows/s + the
    // starvation spread for BASELINE.md.
    "x_fanout_upkeep" -> ((s, dir) => {
      import org.apache.spark.sql.types.{BinaryType, StringType}
      val types = Seq("Patient", "Observation", "Encounter",
        "Condition", "Procedure")
      val all = types :+ "Claim"
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_fanoutup_src").toString
      val base = java.nio.file.Files
        .createTempDirectory("graft_fanoutup").toString
      val typeCol = element_at(array(all.map(lit): _*),
        (col("o_orderkey") % 6).cast("int") + 1)
      val wire = s.read.parquet(s"$dir/orders.parquet").select(
        col("o_orderkey").cast(StringType).cast(BinaryType).as("key"),
        to_json(struct(array(struct(
          to_json(struct(
            typeCol.as("resourceType"),
            col("o_orderkey").cast(StringType).as("id"),
            (col("o_orderstatus") === "O").as("active"))).as("resource"),
          struct(lit("PUT").as("method"),
            concat_ws("/", typeCol, col("o_orderkey")).as("url"))
            .as("request"))).as("entry"))).cast(BinaryType).as("value"),
        lit("fhir.msg").as("topic"),
        lit(0).as("partition"),
        col("o_orderkey").as("offset"),
        lit(new java.sql.Timestamp(1700000000000L)).as("timestamp"))
      wire.repartition(60).write.mode("overwrite").parquet(srcDir)
      val src = s.readStream
        .schema(graft.pipeline.BundlePipeline.kafkaWireSchema)
        .option("maxFilesPerTrigger", "1") // 60 batches: upkeep at 0+50
        .parquet(srcDir)
      val settings = graft.streaming.Settings(
        checkpointDir = s"$base/checkpoint",
        deltaDatabaseDir = s"$base/delta/default",
        resourceTypes = types,
        triggerAvailableNow = true,
        upkeepInterval = 50, // the reference DEFAULT (settings.py:39)
        vacuumRetentionHours = 0L) // make batch-50 VACUUM do real work
      val t0 = System.nanoTime()
      val queries = graft.streaming.Engine.start(src, settings)
      queries.foreach(_.awaitTermination())
      val wall = (System.nanoTime() - t0) / 1e9
      val perQ = queries.map { q =>
        val busyMs = q.recentProgress.map(p =>
          Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(0L)).sum
        (Option(q.name).getOrElse("?"), busyMs)
      }
      val report = all.map { rt =>
        val tab = graft.tables.ResourceTable(
          s, s"$base/delta/default/$rt.parquet")
        val latest = tab.latestVersion.getOrElse(
          sys.error(s"$rt: no table"))
        // LINEAR history: every version exists — maintenance racing
        // five concurrent ingests never tore or skipped a commit
        val missing = (0L to latest).filterNot(tab.versionExists)
        require(missing.isEmpty,
          s"$rt: non-linear history, missing versions $missing")
        val optimizes = tab.history()
          .filter(col("operation").contains("OPTIMIZE")).count()
        require(optimizes >= 1,
          s"$rt: upkeep never compacted (0 OPTIMIZE commits)")
        (rt, tab.read().count(), latest, optimizes)
      }
      val nBundles = report.map(_._2).sum
      val busy = perQ.map(_._2)
      val spread =
        if (busy.isEmpty || busy.min == 0L) -1.0
        else busy.max.toDouble / busy.min
      System.err.println(
        f"[fanout-upkeep] $nBundles%d bundles via ${perQ.size}%d " +
          f"queries in $wall%.2fs (${nBundles / wall}%.0f rows/s) " +
          f"starvation-spread ${spread}%.2fx " +
          s"tables=${report.map(r =>
            s"${r._1}:${r._2}v${r._3}opt${r._4}").mkString(",")}")
      s.createDataFrame(
        s.sparkContext.parallelize(
          report.map(r => org.apache.spark.sql.Row(r._1, r._2)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("resource_type",
            StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType))))
    }),

    // SHALLOW CLONE at scale: fork the (already-built, memoized)
    // scaled events table and answer a metadata-only count over the
    // fork. The claim is O(manifest): wall time tracks the FILE COUNT
    // (constant 32-file fixture across decades → ratio ≈ 1), never
    // the data bytes — cloning the 100× table costs the same as 1×.
    "x_shallow_clone" -> ((s, dir) => {
      val tab = deleteDemo(s, dir, "dv")
      val tgt = java.nio.file.Files
        .createTempDirectory("graft_sclone").toString
      val c = tab.shallowCloneTo(s"$tgt/c.parquet")
      System.err.println(s"[clone] rows=${c.statsCount()} " +
        s"refs=${c.fileManifest(0L).size}")
      s.range(1).toDF("done")
    }),
    // RENAME COLUMN at scale: one metadata-only commit on the scaled
    // table — like x_shallow_clone, wall time must track the manifest
    // (constant 32 files), never the data. Each timed round renames
    // value→value_r<i> (mapping enabled once by the first call); the
    // table's CONTENT never changes, so fixture sharing stays sound.
    "x_rename_column" -> ((s, dir) => {
      val tab = deleteDemo(s, dir, "dv")
      tab.enableColumnMapping()
      val i = nextSlice(s"ren:$dir")
      val from = if (i == 0) "value" else s"value_r${i - 1}"
      tab.renameColumn(from, s"value_r$i")
      s.range(1).toDF("done")
    }),
    // BLOOM INDEX at scale: point-IN lookup of 3 ids on a
    // ts-clustered table (event_id interleaves across every file, so
    // min/max stats prune NOTHING). Indexed: one sidecar probe scan +
    // the handful of might-contain files — wall time tracks matching
    // files, not table bytes. The _off twin (probe kill-switch) is
    // the control: stats-only pruning degenerates to a full scan that
    // grows with the decade. The PAIR is the datapoint.
    "x_bloom_lookup" -> ((s, dir) => {
      bloomLookup(s, dir, probe = true); s.range(1).toDF("done")
    }),
    "x_bloom_lookup_off" -> ((s, dir) => {
      bloomLookup(s, dir, probe = false); s.range(1).toDF("done")
    }),
    // REORG PURGE at scale: DV-kill 80% of a CONSTANT 12.5k-id
    // contiguous stripe of the event_id-clustered table, then purge
    // at 5% dead. Only the stripe's files cross the threshold, so
    // purge bytes/files track the STRIPE — constant as the table
    // grows (ratio ≈ 1 across decades is the whole point:
    // O(files past threshold), never O(table)). Each timed round
    // takes a fresh stripe; base ids 0..99999 exist at every scale.
    "x_dv_purge" -> ((s, dir) => {
      val tab = purgeDemo(s, dir)
      val i = nextSlice(s"purge:$dir")
      val lo = i.toLong * 12500L
      tab.deleteMatchingDv(
        s.range(lo, lo + 12500L).toDF("event_id")
          .filter(col("event_id") % 5 =!= 0),
        "event_id")
      timedDelete(tab, "dv_purge") {
        val (p, c) = tab.purgeDeletionVectors(minDeadFraction = 0.05)
        System.err.println(s"[purge] files rewritten=$p carried=$c")
        p.toLong
      }
      s.range(1).toDF("done")
    }))

  /** x_dv_purge fixture: the scaled events table RANGE-CLUSTERED on
    * event_id (optimize(32) after load), so a contiguous id stripe
    * lands in few files and the purge threshold separates them from
    * the untouched rest.
    */
  private def purgeDemo(s: SparkSession, dir: String)
      : graft.tables.ResourceTable =
    deleteFixture.computeIfAbsent(s"purge:$dir", _ => {
      val base = s.read.parquet(s"$dir/events.parquet").repartition(32)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_spurge").toString
      val tab = graft.tables.ResourceTable(s, s"$tmp/e.parquet")
        .createIfNotExists(base.schema, clusterCols = Seq("event_id"))
      tab.upsert(base, "event_id")
      tab.optimize(numFiles = 32)
      tab.enableDeletionVectors()
      tab
    })

  /** x_bloom_lookup fixture: the scaled events table clustered on
    * `ts` — event_id spans the full key range in EVERY file, the
    * worst case for min/max skipping and exactly what the bloom
    * sidecar index exists for. Index enabled before the load so the
    * upsert's commit builds the sidecars (one extra distributed pass,
    * absorbed by the memoized build, like a real ingest pays it).
    */
  private def bloomDemo(s: SparkSession, dir: String)
      : graft.tables.ResourceTable =
    deleteFixture.computeIfAbsent(s"bloom:$dir", _ => {
      val base = s.read.parquet(s"$dir/events.parquet").repartition(32)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_sbloom").toString
      val tab = graft.tables.ResourceTable(s, s"$tmp/e.parquet")
        .createIfNotExists(base.schema, clusterCols = Seq("ts"))
      tab.enableBloomIndex(Seq("event_id"))
      tab.upsert(base, "event_id")
      tab
    })

  /** One timed point-IN lookup; stderr reports the SCAN FOOTPRINT
    * (files/bytes the pruned plan reads) — on local NVMe with a hot
    * page cache the wall clock hides pruning (a 100M-row scan is
    * ~0.2 s and the probe's extra jobs cost more), but on an object
    * store the scanned bytes ARE the cost, exactly like timedDelete's
    * write-amplification line.
    */
  private def bloomLookup(s: SparkSession, dir: String,
                          probe: Boolean): Unit = {
    val tab = bloomDemo(s, dir)
    val tag = if (probe) "bloom" else "bloomoff"
    val i = nextSlice(s"$tag:$dir")
    val ids = Seq(0L, 1L, 2L)
      .map(k => (i.toLong * 7919L + k * 31337L) % 100000L)
    s.conf.set("graft.table.bloomIndex.probe", probe.toString)
    try {
      val q = tab.read().filter(col("event_id").isin(ids: _*))
        .selectExpr("count(*) AS n")
      val n = q.collect()(0).getLong(0)
      val fp = scanFootprint(q)
      System.err.println(s"[bloom] probe=$probe ids=$ids rows=$n " +
        s"scanned(files,bytes)=$fp")
    } finally s.conf.set("graft.table.bloomIndex.probe", "true")
  }

  /** (numFiles, bytes) per FileSourceScanExec of an EXECUTED query —
    * the scan-footprint evidence the pruning cases report.
    */
  private def scanFootprint(q: DataFrame): Seq[(Long, Long)] = {
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        // AQE stage nodes have NO children; the subtree is .plan
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(qs.plan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case o => o.children.flatMap(scans) ++
          o.subqueries.flatMap(scans)
      }
    scans(q.queryExecution.executedPlan).map { f =>
      (f.metrics.get("numFiles").map(_.value).getOrElse(-1L),
        f.metrics.get("filesSize").map(_.value).getOrElse(-1L))
    }
  }

  /** Fact table for the dynamic-file-pruning case: the scaled events
    * clustered by the JOIN key (user_id), so files carry disjoint key
    * ranges and a selective dim key set maps to few files.
    */
  private def dfpDemo(s: SparkSession, dir: String)
      : graft.tables.ResourceTable =
    deleteFixture.computeIfAbsent(s"dfp:$dir", _ => {
      val base = s.read.parquet(s"$dir/events.parquet").repartition(32)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_sdfp").toString
      val tab = graft.tables.ResourceTable(s, s"$tmp/e.parquet")
        .createIfNotExists(base.schema, clusterCols = Seq("user_id"))
      tab.upsert(base, "event_id")
      tab
    })

  /** One dim-driven join over the scaled fact, DFP on vs off; stderr
    * reports the fact scan footprint. The DFP side's evidence is the
    * SAME story as the bloom lookup: wall clock on hot local NVMe
    * hides pruning — scanned files/bytes are the object-store cost.
    * The dim is 16 keys spread across copies, so the plain join scans
    * every file while DFP opens only the key-range-matching ones.
    */
  private def dfpLookup(s: SparkSession, dir: String,
                        dfp: Boolean): Unit = {
    val tab = dfpDemo(s, dir)
    val tag = if (dfp) "dfp" else "dfpoff"
    val i = nextSlice(s"$tag:$dir")
    // keys from the copy-0 user range [0,1500): present at EVERY
    // scale (the remap keeps copy 0 intact), so the matched row set —
    // and with DFP the scanned file set — is fixed while the table
    // grows; the plain join's footprint grows with the table
    val uids = (0 until 16).map(k =>
      ((i.toLong * 31L + k * 97L) % 1500L))
    import s.implicits._
    val dim = uids.map(u => (u, s"seg${u % 5}")).toDF("uk", "segment")
    val q =
      if (dfp) tab.joinPruned(dim, "user_id", "uk")
        .selectExpr("count(*) AS n")
      else tab.read().join(dim, col("user_id") === col("uk"))
        .selectExpr("count(*) AS n")
    val n = q.collect()(0).getLong(0)
    System.err.println(s"[dfp] dfp=$dfp keys=16 rows=$n " +
      s"scanned(files,bytes)=${scanFootprint(q)}")
  }

  /** ~0.1% ingest batch, half re-delivered known keys + half new keys
    * (shifted past every scaled id) — each round a different slice.
    */
  private def ingestBatch(s: SparkSession, dir: String, round: Int)
      : DataFrame = {
    val slice = s.read.parquet(s"$dir/events.parquet")
      .filter(col("event_id") % 2003 === round)
    slice.unionByName(slice.withColumn("event_id",
      col("event_id") + lit(2000000000L)))
  }

  private def offset(c: org.apache.spark.sql.Column) =
    col("copy") * lit(10000000L) + c

  /** One scaled table: `copies` replicas of the base rows with remapped
    * keys + the per-table content perturbation. Broadcast cross join —
    * no shuffle; the write re-buckets into 32 files.
    */
  private def scaled(spark: SparkSession, base: String, name: String)
      : DataFrame = {
    val src = spark.read.parquet(s"$base/$name.parquet")
    val copies = broadcast(
      spark.range(Copies).select(col("id").cast(LongType).as("copy")))
    val x = src.crossJoin(copies)
    name match {
      case "orders" =>
        x.select(offset(col("o_orderkey")).as("o_orderkey"),
          offset(col("o_custkey")).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
      case "customer" =>
        x.select(offset(col("c_custkey")).as("c_custkey"), col("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      case "events" =>
        x.select(offset(col("event_id")).as("event_id"), col("ts"),
          offset(col("user_id")).as("user_id"), col("event_type"),
          col("value"), col("props"))
      case "documents" =>
        // pad cycles at 100 copies — keeps per-doc text bounded at the
        // third decade (1000 × 53 chars/doc would blow past this
        // host's disk) and stays bit-identical to the measured
        // 10×/100× corpora. The blocking KEY still grows with the
        // corpus at 1000×: copies ≥ 100 land in a per-century lang
        // variant (lang-1 … lang-9), so (lang, len/50) gives every
        // copy its OWN block — the r14 artifact (copy%100 colliding 10
        // copies per length bucket into 19.6k-row blocks) is gone and
        // the 1000× fuzzy datapoint measures the operator, not the
        // fixture
        val text = concat(col("text"),
          repeat(lit("x"), ((col("copy") % 100) * 53).cast("int")))
        val lang = when(col("copy") >= 100,
          concat(col("lang"), lit("-"),
            (col("copy") / 100).cast("int").cast("string")))
          .otherwise(col("lang"))
        x.select(offset(col("doc_id")).as("doc_id"), text.as("text"),
          lang.as("lang"), col("source"), length(text).as("n_chars"))
      case "embeddings" =>
        x.select(offset(col("vec_id")).as("vec_id"),
          transform(col("embedding"), (v, i) =>
            (v + sin((i * 37 + col("copy") * 101).cast("double")) / 100.0)
              .cast(FloatType)).as("embedding"),
          col("label"))
      case other =>
        throw new IllegalArgumentException(s"no scale recipe for $other")
    }
  }

  private def generate(spark: SparkSession, base: String, out: String)
      : Unit = {
    val legacy = new java.io.File(s"$out/_SCALED_OK")
    // SPARK_GRAFT_SCALE_TABLES restricts generation (third-decade runs
    // on this host skip `documents` — 50M docs ≈ 130 GB at rest, past
    // local disk — and time only the queries whose tables exist)
    val wanted = sys.env.get("SPARK_GRAFT_SCALE_TABLES")
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("orders", "customer", "events", "documents",
        "embeddings"))
    Seq("orders", "customer", "events", "documents", "embeddings")
      .filter(wanted)
      .foreach { t =>
        val done = new java.io.File(s"$out/_SCALED_OK_$t")
        if (!done.exists() && !legacy.exists()) {
          scaled(spark, base, t).repartition(32)
            .write.mode("overwrite").parquet(s"$out/$t.parquet")
          done.getParentFile.mkdirs()
          done.createNewFile()
          ()
        }
      }
  }

  private def time(spark: SparkSession, name: String, dir: String)
      : Double = {
    val t0 = System.nanoTime()
    Extra.getOrElse(name, SparkEntry.queries(name))(spark, dir)
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"/root/repo/target/scaledata/sf${Copies / 10}")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // NOTE: spark.driver.memory cannot be set here — in local mode
      // the driver IS this already-running JVM, so the heap comes from
      // the launcher (sbt -mem / SBT_OPTS -Xmx). Setting it via
      // .config() would be a silent no-op that only LOOKS like 16g.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, base, out)

    // same untimed codegen warmups as Bench — first-run class
    // generation must not be attributed to the sf0.1 side of a ratio
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    try time(spark, "q_change_feed", "/root/testdata/sf0.001")
    catch { case _: Throwable => () }

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = Headline.filter(n => only.forall(_.contains(n)))
      .map { name =>
        // min of two at BOTH scales: fixture-building queries
        // (versionedDemo) memoize per dir, so the second run times the
        // operator itself — taking min-of-one on the big side would
        // charge one-time fixture construction to the 10x column
        val small = math.min(time(spark, name, base), time(spark, name, base))
        spark.catalog.clearCache()
        val big = math.min(time(spark, name, out), time(spark, name, out))
        spark.catalog.clearCache()
        val r = big / small
        System.err.println(
          f"[scale] $name%-22s sf0.1 $small%7.2fs   ${Copies}%dx $big%7.2fs   ratio ${r}%5.1fx")
        name -> (small, big, r)
      }
    // fuzzy-dedup blocking-key audit (VERDICT r11 item 6): the blocked
    // join is O(Σ block²), so the scale claim rests on the largest
    // block staying bounded as the corpus grows. Measure the block-size
    // distribution at both scales — the scaled corpus must show the
    // same max block (copies land in fresh length buckets; block COUNT
    // grows with the data, block SIZE does not).
    def blockHist(dir: String): (Long, Long, Long, Double) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val blocks = docs.groupBy(col("lang"),
          (length(col("text")) / lit(50)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("bs"))
      val r = blocks.agg(count(lit(1)).as("n_blocks"),
          max(col("bs")).as("max_block"),
          sum(col("bs") * col("bs")).as("sum_sq"),
          avg(col("bs")).as("mean_block")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    // block audit only when both dirs carry documents (a table-subset
    // third-decade run skips the corpus table entirely)
    val blocks =
      if (!new java.io.File(s"$out/documents.parquet").exists()) ""
      else {
        val (nb1, mb1, sq1, av1) = blockHist(base)
        val (nbN, mbN, sqN, avN) = blockHist(out)
        System.err.println(
          f"[blocks] base: $nb1%d blocks, max $mb1%d, mean $av1%.1f, sum_sq $sq1%d")
        System.err.println(
          f"[blocks] ${Copies}x:  $nbN%d blocks, max $mbN%d, mean $avN%.1f, sum_sq $sqN%d")
        f""""blocks":{"base":{"n":$nb1%d,"max":$mb1%d,"sum_sq":$sq1%d},"scaled":{"n":$nbN%d,"max":$mbN%d,"sum_sq":$sqN%d}},"""
      }
    spark.stop()
    val js = results.map { case (n, (s, b, r)) =>
      f""""$n":{"sf01_sec":$s%.2f,"sf1_sec":$b%.2f,"ratio":$r%.2f}"""
    }.mkString(",")
    println(s"""{"metric":"scale_ratio_${Copies}x","copies":$Copies,$blocks"queries":{$js}}""")
  }
}

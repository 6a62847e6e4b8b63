package graft.ops

import graft.functions.VectorExpressions.minhash_signature
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Deduplication operators for training-data pipelines, each designed
  * around shuffles that scale: exact dedup is one hash aggregation;
  * MinHash/SimHash near-dup detection avoids the O(n²) cross join by
  * LSH banding — candidate pairs are generated *inside* band buckets
  * (`groupBy(band_hash)` + in-bucket combinations), the standard
  * shingle→minhash→band→bucket plan (see PAPERS.md), with
  * deterministic xxhash64/splitmix hash families instead of random
  * seeds.
  *
  * Plan shape (100 TB framing): signature computation is ONE
  * projection pass over the corpus (tokens → shingle hashes → k-min
  * signature, all materialized as columns so nothing is re-evaluated);
  * banding explodes ×bands; the only shuffle is the bucket groupBy.
  * Degenerate buckets (e.g. thousands of empty documents sharing a
  * signature) are dropped at `maxBucket` — a deliberate, documented
  * cut: such buckets are all-pairs-duplicate clusters better handled
  * by exact dedup, and without the cap one hot key would hold an
  * O(bucket²) pair explosion on a single executor.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup by content hash: one hash-aggregate shuffle on
    * md5(text). Returns (text_hash, keep_id = min id, dup_cnt).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** SemDeDup-style embedding dedup at corpus scale: coarse-quantize
    * every vector into a deterministic IVF cell
    * ([[graft.ops.Similarity.ivfAssign]]), then within each cell drop
    * every vector that has an EARLIER same-cell neighbor above the
    * cosine threshold. Keep-first semantics (no transitive closure)
    * make the survivor set order-deterministic and exactly
    * oracle-checkable; the cell plays the role LSH bands play for
    * minhash — candidate work is O(Σ cell²), never corpus², and the
    * cell is the one shuffle key. Near-dup pairs straddling a cell
    * boundary are missed by design, the standard SemDeDup recall
    * trade (Abbas et al. 2023); raise nCells for speed, lower for
    * recall.
    */
  def semDedup(df: DataFrame, threshold: Double, nCells: Int = 8,
               dim: Int = 64, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val cells = Similarity.ivfAssign(df, nCells, dim, vecCol)
    val twins = cells.select(col("cell").as("_tc"),
      col(idCol).as("_tid"), col(vecCol).as("_tvec"))
    cells.join(twins,
        col("cell") === col("_tc") && col("_tid") < col(idCol) &&
          Similarity.cosine(col(vecCol), col("_tvec")) >= threshold,
        "left_anti")
      .drop("cell")
  }

  // -------------------------------------------------------------- minhash

  /** (doc, sh, sig) per document in a single materialized pass:
    * `sh` = distinct sorted hashes of the w-token shingles (native
    * one-pass expression — no per-shingle string materialization),
    * `sig` = k-permutation MinHash signature (native, one pass over
    * `sh`). Each stage references the previous stage's *attribute*,
    * never re-evaluates its expression tree.
    */
  def signatures(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 16, w: Int = 3): DataFrame =
    // NO input spread here (tried and REVERTED, round 20): the
    // signature projection is cheap relative to the band shuffle it
    // feeds — a full-board A/B measured the spread NEGATIVE
    // (q_dedup_minhash +85%, q_index_refresh +80% ambient-corrected):
    // the extra exchange + cluster-width tiny tasks cost more than
    // the serial hash work they parallelize. Contrast Pq.encode /
    // cosinePairs, where the per-row kernel dominates and the same
    // spread won 2–3×.
    df.select(col(idCol).as("doc"),
        graft.functions.TextExpressions.shingle_hashes(col(textCol), w)
          .as("sh"))
      // a doc with fewer than w tokens has NO shingle set; minhash of
      // an empty set is the all-sentinel signature, so every pair of
      // unrelated short docs would otherwise share identical
      // signatures, co-bucket in every band, and score est_jaccard
      // 1.0 — collapsing ALL titles/one-liners into one "duplicate"
      // cluster (silent data loss through keep-best). No shingles ⇒
      // no near-dup evidence: exact dedup still covers short docs.
      .filter(size(col("sh")) > 0)
      .select(col("doc"), col("sh"),
        minhash_signature(col("sh"), k).as("sig"))

  /** Candidate pairs from LSH banding over precomputed signatures.
    * Bucket members are sorted by doc id, so generated combinations
    * are canonical (doc_a < doc_b); pairs colliding in several bands
    * are deduplicated. `carrySh` additionally threads the shingle
    * sets through for exact verification.
    */
  private def candidatePairs(sigs: DataFrame, k: Int, bands: Int,
                             carrySh: Boolean,
                             maxBucket: Int = 1024): DataFrame = {
    val r = k / bands
    require(r * bands == k, "bands must divide k")
    val member =
      if (carrySh) struct(col("doc"), col("sig"), col("sh"))
      else struct(col("doc"), col("sig"))
    val bandStructs = (0 until bands).map(b =>
      struct(lit(b).as("band_idx"),
        xxhash64(slice(col("sig"), b * r + 1, r)).as("band_hash")))
    val buckets = sigs
      .select(member.as("m"), explode(array(bandStructs: _*)).as("band"))
      .groupBy(col("band.band_idx"), col("band.band_hash"))
      .agg(collect_list(col("m")).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxBucket)
      .select(array_sort(col("ms")).as("ms"))
    val pairs = flatten(transform(col("ms"), (a, i) =>
      transform(slice(col("ms"), i + 2, size(col("ms"))),
        b => struct(a.as("a"), b.as("b")))))
    val base = buckets.select(explode(pairs).as("p"))
    val cols = Seq(
      col("p.a.doc").as("doc_a"), col("p.b.doc").as("doc_b"),
      col("p.a.sig").as("sig_a"), col("p.b.sig").as("sig_b")) ++
      (if (carrySh) Seq(col("p.a.sh").as("sh_a"), col("p.b.sh").as("sh_b"))
       else Seq.empty)
    base.select(cols: _*).dropDuplicates("doc_a", "doc_b")
  }

  /** Estimated Jaccard from two minhash signatures: fraction of equal
    * components.
    */
  def estimatedJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / size(sigA).cast("double")

  /** MinHash near-dup pipeline: signatures → banded candidates →
    * estimated jaccard ≥ `minJaccard`.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double = 0.5, k: Int = 16, bands: Int = 4,
                   w: Int = 3): DataFrame =
    candidatePairs(signatures(df, idCol, textCol, k, w), k, bands,
        carrySh = false)
      .withColumn("est_jaccard",
        estimatedJaccard(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "est_jaccard")

  /** Exact n-gram Jaccard, but only over LSH candidates — the shingle
    * sets ride along inside the bucket rows, so no join back to the
    * corpus and no second tokenization pass.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        minJaccard: Double = 0.2, k: Int = 16,
                        bands: Int = 4, w: Int = 3): DataFrame =
    candidatePairs(signatures(df, idCol, textCol, k, w), k, bands,
        carrySh = true)
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")

  /** Blocked fuzzy near-duplicate pairs by edit distance: candidates
    * are generated only within a blocking key (the join shuffles on
    * the block, never documents²), then verified with Spark's banded
    * `levenshtein(l, r, threshold)` over a bounded text prefix —
    * O(prefix·maxDist) per pair instead of O(prefix²), and pairs past
    * the band abort early. At corpus scale the block key bounds the
    * candidate volume the same way LSH bands do for minhash
    * (reference: src/bundle_processor.py:114–128 uses exact keys only;
    * this is the fuzzy member of the dedup family).
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        blockKey: Column, prefixLen: Int = 100,
                        maxDist: Int = 25,
                        maxBlockRows: Int = 0): DataFrame = {
    // spread the narrow (id, prefix, block) projection: the banded
    // levenshtein runs on the PROBE side of a broadcast join, so a
    // one-task input (unsplittable file) would verify every candidate
    // pair on one core (measured 11x on the bench board). No-op when
    // the input is already parallel; only ~prefixLen bytes/row move.
    val docs = graft.Par.spread(df.select(col(idCol).as("_id"),
      substring(col(textCol), 1, prefixLen).as("_pref"),
      blockKey.as("_blk")))
    // maxBlockRows > 0 enables the TRIANGLE SPLIT for oversized blocks
    // (Okcan & Riedewald's θ-join distribution, specialized to the
    // self-join): a block of n rows is hash-split into s = ⌈n /
    // maxBlockRows⌉ sub-blocks and the join runs one task per
    // sub-block PAIR (i ≤ j) — a row in sub-block k enters the left
    // side of tasks (k, j≥k) and the right side of tasks (i≤k, k), so
    // every candidate pair is generated in EXACTLY one task and the
    // output is bit-identical to the unsplit join. Total comparisons
    // are unchanged (the split bounds nothing semantically); what it
    // bounds is per-TASK work and memory — O(maxBlockRows²) instead of
    // O(largest block²) — which is what keeps one hot block (measured:
    // the 100× blow-up grows the max block 8.3×) from turning into a
    // straggler/OOM task at corpus scale. Cost: rows replicate ~(s+1)
    // times into the shuffle for blocks that split; blocks under the
    // cap pay one extra tiny aggregate and keep s = 1.
    if (maxBlockRows > 0) {
      val sizes = docs.groupBy(col("_blk")).agg(
        ceil(count(lit(1)).cast("double") / maxBlockRows)
          .cast("int").as("_s"))
      val d2 = docs.join(sizes, "_blk")
        .withColumn("_sub",
          pmod(xxhash64(col("_id")), col("_s").cast("long")).cast("int"))
      val a = d2.select(col("_blk").as("_blk_a"),
        col("_sub").as("_i_a"),
        explode(sequence(col("_sub"), col("_s") - 1)).as("_j_a"),
        col("_id").as("id_a"), col("_pref").as("pref_a"),
        length(col("_pref")).as("len_a"))
      val b = d2.select(col("_blk").as("_blk_b"),
        explode(sequence(lit(0), col("_sub"))).as("_i_b"),
        col("_sub").as("_j_b"),
        col("_id").as("id_b"), col("_pref").as("pref_b"),
        length(col("_pref")).as("len_b"))
      val lev = levenshtein(col("pref_a"), col("pref_b"), maxDist)
      // an OFF-diagonal task (i < j) sees each cross-sub pair exactly
      // once already (left is sub i, right is sub j) — and the pair's
      // id order can DISAGREE with its sub order, so requiring
      // id_a < id_b there would drop it. Only the diagonal task
      // (i = j), where both rows sit on both sides, needs the id
      // tie-break; orientation is normalized in the projection
      // (levenshtein and the length gate are symmetric).
      return a.join(b, col("_blk_a") === col("_blk_b") &&
          col("_i_a") === col("_i_b") && col("_j_a") === col("_j_b") &&
          (col("_i_a") < col("_j_a") || col("id_a") < col("id_b")) &&
          abs(col("len_a") - col("len_b")) <= maxDist &&
          lev >= 0)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"),
          lev.cast("long").as("dist"))
    }
    val a = docs.select(col("_blk"), col("_id").as("id_a"),
      col("_pref").as("pref_a"), length(col("_pref")).as("len_a"))
    val b = docs.select(col("_blk"), col("_id").as("id_b"),
      col("_pref").as("pref_b"), length(col("_pref")).as("len_b"))
    // The ENTIRE predicate is authored into the join condition in
    // cheap-first order — if the distance test were left as a filter
    // on the join output, Catalyst would push it into the join and
    // prepend it, running the O(maxDist·len) levenshtein before the
    // id ordering and the length gate (levenshtein(a,b) >= |len(a)-
    // len(b)|, so the gate is exact, never lossy). The residual now
    // evaluates per hash match as: id order → length gate → banded
    // levenshtein (which returns -1 past the threshold); survivors —
    // a tiny fraction — recompute the distance once in the projection.
    // the banded levenshtein yields values in {-1} ∪ [0, maxDist]
    // only, so `>= 0` alone is the full threshold test — ONE
    // evaluation per gated pair in the join condition
    val lev = levenshtein(col("pref_a"), col("pref_b"), maxDist)
    a.join(b, a("_blk") === b("_blk") &&
        col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist &&
        lev >= 0)
      .select(col("id_a"), col("id_b"), lev.cast("long").as("dist"))
  }

  /** Resolve duplicate pairs into clusters: every document mapped to a
    * canonical id (the minimum doc id reachable through the pair
    * graph). Each round combines min-label propagation (one hop through
    * the edges) with pointer jumping (label := label-of-label, which
    * halves the remaining chain depth), so convergence is
    * O(log(longest chain)) rounds, not O(diameter); `maxIter` bounds
    * pathological graphs and non-convergence is logged rather than
    * silently returned. This is the "keep one per duplicate cluster"
    * step after any pair producer (exact, minhash, simhash, embedding).
    *
    * Hybrid execution (the AQE-style runtime smallness decision): dedup
    * pair graphs are tiny relative to their corpora — after LSH, edges
    * ≈ true duplicates, not documents². When the materialized edge list
    * is under `driverEdgeLimit`, a driver-side union-find answers in
    * one job instead of paying several join+checkpoint rounds; larger
    * graphs take the distributed label-propagation loop.
    */
  def resolveClusters(pairs: DataFrame, maxIter: Int = 10,
                      driverEdgeLimit: Long = 100000): DataFrame = {
    // materialize the edge list once — every iteration re-reads it, and
    // without this the (possibly expensive) pair-producing pipeline
    // upstream would re-execute per round
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .localCheckpoint(true)
    if (edges.count() <= driverEdgeLimit * 2)
      return resolveOnDriver(edges)
    var labels = edges.select(col("a").as("doc"))
      .union(edges.select(col("b").as("doc")))
      .distinct()
      .withColumn("label", col("doc"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // hop: each doc adopts the min label among itself and its neighbors
      val neighborLabels = edges
        .join(labels.withColumnRenamed("doc", "b")
          .withColumnRenamed("label", "nlabel"), Seq("b"))
        .groupBy(col("a").as("doc"))
        .agg(min(col("nlabel")).as("minNeighbor"))
      val hopped = labels.join(neighborLabels, Seq("doc"), "left")
        .select(col("doc"),
          least(col("label"), coalesce(col("minNeighbor"), col("label")))
            .as("label"))
      // jump: label := label's own label. Labels only ever decrease, so
      // the parent's label is ≤ ours; following it halves chain depth
      // each round (pointer jumping — true O(log n) convergence).
      val next = hopped.alias("l")
        .join(hopped.select(col("doc").as("label"),
          col("label").as("plabel")).alias("p"), Seq("label"), "left")
        .select(col("doc"), coalesce(col("plabel"), col("label")).as("label"))
      val changed = next.alias("n")
        .join(labels.alias("o"), Seq("doc"))
        .filter(col("n.label") =!= col("o.label"))
        .limit(1).count() > 0
      labels = next.localCheckpoint(true) // cut the growing lineage
      converged = !changed
      i += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"resolveClusters did not converge in $maxIter rounds; " +
          "returned labels may be non-canonical (raise maxIter)")
    labels.select(col("doc").as("doc_id"), col("label").as("canonical_id"))
  }

  /** Survivor selection — the step a training-data pipeline runs AFTER
    * clustering: per duplicate cluster keep exactly one document, the
    * highest-`scoreCol` member (quality score, length, recency —
    * caller's choice), ties broken by the smaller id so the pick is
    * deterministic. `labels` is [[resolveClusters]]' output
    * (doc_id, canonical_id); `scores` carries (idCol, scoreCol).
    * Returns (canonical_id, keep_id, keep_score, cluster_size).
    *
    * ONE shuffle on canonical_id with full map-side partial
    * aggregation (`min_by` over a (-score, id) struct — no window over
    * the corpus, no per-cluster sort), after a broadcast-eligible join
    * of labels to scores. At 100 TB the aggregate state is one
    * (id, score) pair per cluster per partition — bounded regardless
    * of cluster size, unlike a row_number window which would sort
    * every cluster's rows. The SCORE side carries the negation (it is
    * numeric by contract); negating the id would crash under ANSI for
    * the string doc ids the rest of this module supports.
    */
  def keepBest(labels: DataFrame, scores: DataFrame,
               idCol: String = "doc_id",
               scoreCol: String = "score"): DataFrame =
    labels.join(scores.select(col(idCol), col(scoreCol)), Seq(idCol))
      .groupBy(col("canonical_id"))
      .agg(
        min_by(col(idCol),
          struct((-col(scoreCol)).as("_ns"), col(idCol).as("_tb")))
          .as("keep_id"),
        max(col(scoreCol)).as("keep_score"),
        count(lit(1)).as("cluster_size"))

  /** Small-graph fast path: classic union-find with path compression
    * on the driver, components relabeled by their minimum member —
    * identical semantics to the distributed loop, one Spark job total.
    * Ids compare via natural ordering (numeric or string keys alike).
    */
  private def resolveOnDriver(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val idType = edges.schema("a").dataType
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) {
        val next = parent(c); parent(c) = r; c = next
      }
      r
    }
    edges.collect().foreach { row =>
      val (ra, rb) = (find(row.get(0)), find(row.get(1)))
      if (ra != rb) parent(rb) = ra
      parent.getOrElseUpdate(ra, ra)
    }
    val docs = parent.keysIterator.toArray
    @inline def lt(x: Any, y: Any): Boolean =
      x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
    val minOf = scala.collection.mutable.HashMap.empty[Any, Any]
    docs.foreach { d =>
      val r = find(d)
      val cur = minOf.get(r)
      if (cur.isEmpty || lt(d, cur.get)) minOf(r) = d
    }
    val rows = docs.map(d =>
      org.apache.spark.sql.Row(d, minOf(find(d)))).toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("doc_id", idType),
        StructField("canonical_id", idType))))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash per document — a row-local native expression
    * (tokenize → per-bit signed counts → sign bits in one pass), so
    * simhash computation is a pure projection with NO shuffle; the
    * only shuffle in simhash dedup is the band-bucket groupBy.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // no input spread — same measured-negative result as [[signatures]]
    df.select(col(idCol).as("doc"),
      graft.functions.TextExpressions.simhash64(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, via
    * 4×16-bit band LSH (pigeonhole: distance ≤ 3 ⇒ ≥1 band equal for
    * 4 bands) and exact `bit_count(xor)` verification. Same
    * bucket-grouped pair generation as MinHash — the simhash
    * aggregation runs once, not once per join side.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 1024): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val sims = simhash(df, idCol, textCol)
    // pigeonhole recall guarantee: ≤ maxHamming differing bits cannot
    // touch all maxHamming+1 bands, so every qualifying pair shares at
    // least one full band. A FIXED band count (the old 4×16) silently
    // missed pairs once maxHamming exceeded bands-1 — e.g. hamming 4
    // spread one bit per band shares nothing. Narrower bands cost more
    // candidates (the exact hamming filter below still decides), never
    // recall.
    val bands = maxHamming + 1
    val widths = Array.fill(bands)(64 / bands)
    (0 until 64 % bands).foreach(i => widths(i) += 1)
    val offsets = widths.scanLeft(0)(_ + _)
    val bandStructs = (0 until bands).map { b =>
      val mask = if (widths(b) >= 64) -1L else (1L << widths(b)) - 1L
      struct(
        lit(b).as("band_idx"),
        shiftright(col("simhash"), offsets(b)).bitwiseAND(mask)
          .as("band_val"))
    }
    val buckets = sims
      .select(struct(col("doc"), col("simhash")).as("m"),
        explode(array(bandStructs: _*)).as("band"))
      .groupBy(col("band.band_idx"), col("band.band_val"))
      .agg(collect_list(col("m")).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxBucket)
      .select(array_sort(col("ms")).as("ms"))
    val pairs = flatten(transform(col("ms"), (a, i) =>
      transform(slice(col("ms"), i + 2, size(col("ms"))),
        b => struct(a.as("a"), b.as("b")))))
    buckets.select(explode(pairs).as("p"))
      .select(col("p.a.doc").as("doc_a"), col("p.b.doc").as("doc_b"),
        bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash")))
          .as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------- sub-document dedup

  /** Corpus-level SEGMENT dedup (the C4/RefinedWeb trick, one level
    * below document dedup): drop every occurrence of a segment (line,
    * sentence, fixed word-window) whose corpus-wide frequency reaches
    * `minDupCount` — boilerplate headers, footers, and templated
    * spans repeat across documents while each document as a whole
    * stays unique, so document-level dedup never sees them.
    *
    * `segsCol` is an array<string> column (callers choose the
    * segmentation); returns the SURVIVING segments as rows
    * (doc, seg_idx, segment) — reassembly is a groupBy away and
    * keeping rows keeps the result exactly oracle-able.
    *
    * Shape at scale: one hash-aggregate shuffle keyed on the segment
    * string to count corpus frequency, one anti-join of segments
    * against the frequent set. For very long segments, pre-hashing
    * the join key (md5/xxhash64 with a collision re-check) shrinks
    * shuffle bytes; the exact string key here keeps semantics
    * bit-exact.
    */
  def dedupSegments(df: DataFrame, idCol: String, segsCol: String,
                    minDupCount: Long = 2): DataFrame = {
    require(minDupCount >= 2, s"minDupCount must be >= 2, got $minDupCount")
    val segs = df.select(col(idCol).as("doc"),
      posexplode(col(segsCol)).as(Seq("seg_idx", "segment")))
    val frequent = segs.groupBy(col("segment"))
      .agg(count(lit(1)).as("_f"))
      .filter(col("_f") >= minDupCount)
      .select("segment")
    segs.join(frequent, Seq("segment"), "left_anti")
      .select(col("doc"), col("seg_idx"), col("segment"))
  }

  // ------------------------------------------ stream-vs-corpus near-dup

  /** The persistable LSH index of a corpus: one row per (band, bucket)
    * membership — (band_idx, band_hash, doc, sig). Write it out
    * partitioned/bucketed by (band_idx, band_hash) and incoming data
    * can be near-dup-checked against the corpus WITHOUT re-reading the
    * corpus text: the index is O(docs × bands) small rows.
    */
  def bandedIndex(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 16, bands: Int = 4, w: Int = 3): DataFrame = {
    val r = k / bands
    require(r * bands == k, "bands must divide k")
    val bandStructs = (0 until bands).map(b =>
      struct(lit(b).as("band_idx"),
        xxhash64(slice(col("sig"), b * r + 1, r)).as("band_hash")))
    signatures(df, idCol, textCol, k, w)
      .select(col("doc"), col("sig"),
        explode(array(bandStructs: _*)).as("band"))
      .select(col("band.band_idx"), col("band.band_hash"),
        col("doc"), col("sig"))
  }

  /** Near-dup candidates of `incoming` against a prebuilt
    * [[bandedIndex]] — the STREAMING dedup-against-the-corpus shape:
    * every transformation on the incoming side is row-local
    * (shingle → signature → band explode), so this runs unchanged on
    * a streaming DataFrame as a stateless stream-static equi-join on
    * (band_idx, band_hash); with a batch input it is the ordinary
    * incremental-ingest dedup check. Emits
    * (doc, corpus_doc, est_jaccard) with est_jaccard ≥ `minJaccard`.
    * A pair colliding in several bands is emitted once per band
    * (deduplicating across bands would need unbounded stream state);
    * batch callers and foreachBatch sinks dropDuplicates if needed.
    * `k/bands/w` MUST match the index's build parameters.
    */
  def nearDupAgainstIndex(incoming: DataFrame, index: DataFrame,
                          idCol: String, textCol: String,
                          minJaccard: Double = 0.5, k: Int = 16,
                          bands: Int = 4, w: Int = 3): DataFrame = {
    val probes = bandedIndex(incoming, idCol, textCol, k, bands, w)
      .withColumnsRenamed(Map("doc" -> "_in_doc", "sig" -> "_in_sig"))
    probes.join(index, Seq("band_idx", "band_hash"))
      .filter(col("_in_doc") =!= col("doc"))
      .withColumn("est_jaccard",
        estimatedJaccard(col("_in_sig"), col("sig")))
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("_in_doc").as("doc"), col("doc").as("corpus_doc"),
        col("est_jaccard"))
  }

  /** Incrementally maintain a [[bandedIndex]] from a table's change
    * feed (ResourceTable.changes CDF rows carrying `_change_type`):
    * deleted and update-PREIMAGE docs leave the index, inserted and
    * update-POSTIMAGE docs are re-signed and added. The result is
    * row-identical to rebuilding `bandedIndex` from the post-change
    * corpus (IndexRefreshSpec proves set equality), but costs
    * O(index scan + changed docs) instead of O(corpus re-hash):
    * the changed-doc id set is a bounded micro-batch, so it
    * BROADCASTS into the anti-join and the index itself never
    * shuffles — at 100 TB the corpus is never re-read at all, only
    * the CDF slice is. `k/bands/w` MUST match the index's build
    * parameters (as with [[nearDupAgainstIndex]]).
    */
  def refreshBandedIndex(index: DataFrame, changes: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 16, bands: Int = 4, w: Int = 3)
      : DataFrame = {
    val removed = changes
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .select(col(idCol).as("doc")).distinct()
    val added = changes
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(col(idCol), col(textCol))
    index.join(broadcast(removed), Seq("doc"), "left_anti")
      .unionByName(bandedIndex(added, idCol, textCol, k, bands, w))
      // the equi-join reorders `doc` first; restore bandedIndex's
      // column order so refresh output is drop-in (positional set ops
      // and writers see the same shape as a fresh build)
      .select(col("band_idx"), col("band_hash"), col("doc"), col("sig"))
  }

  // --------------------------------------- exact-substring (window) dedup

  /** EXACT-SUBSTRING dedup at window granularity (the "Deduplicating
    * Training Data Makes Language Models Better" shape, reference
    * inventory's sub-document tier below [[dedupSegments]]): any
    * w-token window whose exact content occurs ≥ `minDupCount` times
    * ANYWHERE in the corpus marks its token span as duplicated; a
    * document's duplicated region is the UNION of its marked spans.
    * Returns one row per document —
    * (doc, total_tokens, dup_windows, removed_tokens, kept_tokens) —
    * the span bookkeeping a trainer needs to cut repeated passages
    * while keeping the surrounding prose.
    *
    * Plan shape at 100 TB: window hashes are ONE row-local projection
    * (native [[graft.functions.TextExpressions.PositionalShingleHashes]],
    * no per-window string materialization — the suffix-array step of
    * the paper replaced by fixed-width hashed windows, which is the
    * standard distributed approximation); duplicated hashes come from
    * one count-aggregate shuffle keyed on the 8-byte hash; the
    * mark-back join re-shuffles windows on that same hash key (AQE
    * broadcasts the duplicated set when it is small, the common case);
    * span-union runs per document over DUPLICATED windows only — a
    * running-max window function (gaps-and-islands), never an
    * explode of covered positions, so a document with d duplicated
    * windows costs O(d), not O(d·w). Everything downstream of the
    * projection touches only hashes and integers — shuffle bytes are
    * independent of document length.
    *
    * 64-bit hash collisions conflate two distinct windows (~n²/2⁶⁵);
    * like [[minhashPairs]]' banding this is the documented trade —
    * an exact confirm pass would re-join the (rare) duplicated
    * windows back to text.
    */
  def duplicatedWindowSpans(df: DataFrame, idCol: String,
                            textCol: String, w: Int = 8,
                            minDupCount: Long = 2): DataFrame = {
    require(minDupCount >= 2, s"minDupCount must be >= 2, got $minDupCount")
    import graft.functions.TextExpressions.positional_shingle_hashes
    val wins = df.select(col(idCol).as("doc"),
      posexplode(positional_shingle_hashes(col(textCol), w))
        .as(Seq("pos", "wh")))
    val dup = wins.groupBy(col("wh"))
      .agg(count(lit(1)).as("_f"))
      .filter(col("_f") >= minDupCount)
      .select("wh")
    // union of [pos, pos+w) intervals per doc: sorted by pos, each
    // window contributes the part past the running max end
    val byDoc = Window.partitionBy("doc").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = wins.join(dup, Seq("wh"))
      .withColumn("_prev_end", max(col("pos") + w).over(byDoc))
      .withColumn("_covered",
        greatest(col("pos") + w -
          greatest(col("pos"), coalesce(col("_prev_end"), col("pos"))),
          lit(0)))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("dup_windows"),
        sum(col("_covered")).cast("long").as("removed_tokens"))
    df.select(col(idCol).as("doc"),
        graft.ops.TextStats.tokenCount(col(textCol)).as("total_tokens"))
      .join(spans, Seq("doc"), "left")
      .select(col("doc"), col("total_tokens"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
        (col("total_tokens") - coalesce(col("removed_tokens"), lit(0L)))
          .as("kept_tokens"))
  }

  /** The TRANSFORM half of exact-substring dedup
    * ([[duplicatedWindowSpans]] is the bookkeeping half): rewrite each
    * document with every duplicated w-token span CUT, surviving tokens
    * re-joined in order — the corpus a trainer actually feeds after
    * the Lee et al. pass. Returns (doc, clean_text, kept_tokens); a
    * fully-duplicated document comes back as the empty string, not a
    * dropped row, so the caller decides the drop threshold.
    *
    * Plan shape at 100 TB: only HASHES shuffle. Window hashes pay one
    * count-aggregate shuffle; duplicated windows fan out their w
    * covered indexes (O(dup·w)) into per-doc DEAD-INDEX SETS — the
    * only per-doc state that moves. The rewrite itself is ROW-LOCAL:
    * docs left-join their (usually absent) dead set, untouched docs
    * pass their text through unchanged, and affected docs rebuild by
    * a positional filter over the split array. A first cut that
    * posexploded every token and re-assembled with collect_list
    * measured 79x at 100x data — the token shuffle carried the whole
    * corpus; this shape carries O(dup windows). Worst-case per-row
    * CPU is O(tokens · dead) for a heavily-duplicated doc
    * (array_contains per position) — bounded in practice by document
    * chunking, and it is compute inside one codegen'd projection, not
    * shuffle. Same 64-bit window-hash collision trade as the
    * bookkeeping pass.
    */
  def removeDuplicatedSpans(df: DataFrame, idCol: String,
                            textCol: String, w: Int = 8,
                            minDupCount: Long = 2): DataFrame = {
    require(minDupCount >= 2, s"minDupCount must be >= 2, got $minDupCount")
    import graft.functions.TextExpressions.positional_shingle_hashes
    val wins = df.select(col(idCol).as("doc"),
      posexplode(positional_shingle_hashes(col(textCol), w))
        .as(Seq("pos", "wh")))
    val dup = wins.groupBy(col("wh"))
      .agg(count(lit(1)).as("_f"))
      .filter(col("_f") >= minDupCount)
      .select("wh")
    // covered token indexes of duplicated windows only — the one
    // place a ·w fanout exists, bounded by the dup count
    val deadSets = wins.join(dup, Seq("wh"))
      .select(col("doc"),
        explode(sequence(col("pos"), col("pos") + (w - 1))).as("idx"))
      .groupBy(col("doc"))
      .agg(collect_set(col("idx")).as("dead_idx"))
    val toks = graft.ops.TextStats.tokens(col(textCol))
    val pairs = zip_with(toks,
      sequence(lit(0), greatest(size(toks), lit(1)) - 1),
      (t, i) => struct(t.as("t"), i.as("i")))
    df.select(col(idCol).as("doc"), col(textCol))
      .join(deadSets, Seq("doc"), "left")
      .select(col("doc"),
        when(col("dead_idx").isNull,
            array_join(toks, " "))
          .otherwise(array_join(transform(
            filter(pairs, p =>
              !array_contains(col("dead_idx"), p.getField("i")) &&
                p.getField("t").isNotNull),
            p => p.getField("t")), " "))
          .as("clean_text"),
        when(col("dead_idx").isNull, size(toks).cast("long"))
          .otherwise(size(toks).cast("long") -
            size(col("dead_idx")).cast("long"))
          .as("kept_tokens"))
  }
}

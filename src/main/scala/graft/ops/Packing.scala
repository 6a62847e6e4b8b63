package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence assembly for LLM pre-training corpora: packing documents
  * into fixed token-budget training sequences, and chunking long
  * documents into fixed-size (optionally overlapping) windows.
  *
  * Scale design: packing needs a total order over the token stream,
  * which is inherently sequential — so the order is scoped to a SHARD
  * (a source, or a hash bucket of the corpus). Each shard's stream
  * packs independently under one window partition: N shards = N
  * parallel streams, one shuffle by shard key, no global sort. At
  * 100 TB you pick the shard count to match write parallelism (e.g.
  * 10k buckets), exactly like a real tokenize-and-pack job.
  * Chunking is row-local (generator over each row) — scan-parallel.
  */
object Packing {

  /** GPT-style pack-with-splitting: documents are laid head-to-tail in
    * `orderCol` order within each shard, and the resulting token
    * stream is cut every `budget` tokens. Emits, per document, its
    * placement: the sequence id its first token lands in, the offset
    * inside that sequence, and how many sequences the document spans
    * (a doc longer than the remaining room straddles a boundary and is
    * split — the standard concat-then-chunk pretraining layout).
    *
    * Pure window arithmetic over a per-shard running sum: one shuffle
    * on the shard key, codegen'd projections, no driver state.
    */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
                    nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col(nTokensCol).cast("long")
    val endOff = sum(n).over(w) // stream offset just past this doc
    val startOff = endOff - n
    df.withColumn("start_offset", startOff)
      .withColumn("seq_id", floor(col("start_offset") / budget))
      .withColumn("seq_pos", col("start_offset") % budget)
      .withColumn("n_seqs",
        when(n === 0, lit(1L)).otherwise(
          floor((col("start_offset") + n - 1) / budget) - col("seq_id") + 1))
      .drop("start_offset")
  }

  /** Fixed-size sliding character windows over each document: chunk k
    * starts at 1 + k*stride (1-based), length `size`; the tail chunk
    * may be shorter. `stride < size` gives overlapping chunks (RAG /
    * context-window preprocessing), `stride == size` a partition.
    * Row-local generator — no shuffle.
    */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    val len = length(col(textCol))
    val starts = sequence(lit(1), greatest(len, lit(1)), lit(stride))
    df.select(col(idCol), posexplode(
        transform(starts, s => substring(col(textCol), s, lit(size)))))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk_text")
      .withColumn("chunk_start", (col("chunk_id") * stride + 1).cast("long"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
      .withColumn("chunk_id", col("chunk_id").cast("long"))
  }
}

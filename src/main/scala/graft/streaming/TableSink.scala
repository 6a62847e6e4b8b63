package graft.streaming

import graft.tables.ResourceTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Generic streaming sinks into [[ResourceTable]]s — the write half of
  * the table's streaming story (the read half is [[ChangeFeed]]).
  * `foreachBatch` delivery is at-least-once; each sink makes the table
  * state exactly-once its own way:
  *
  *  - `append`: every batch commits with a `(appId, batchId)`
  *    transaction watermark and replayed batches are skipped —
  *    Delta's txnAppId/txnVersion idempotent-write pattern, required
  *    because a plain append applied twice doubles the rows;
  *  - `upsert`: keyed MERGE is naturally idempotent, replays converge
  *    to the same table state with no watermark needed.
  */
object TableSink {

  /** Exactly-once streaming append. `appId` must be stable across
    * restarts of the same logical writer — it defaults to the
    * checkpoint path, which already IS that identity.
    */
  def append(source: DataFrame, tablePath: String, checkpointDir: String,
             trigger: Trigger = Trigger.AvailableNow(),
             mergeSchema: Boolean = false,
             appId: String = ""): StreamingQuery = {
    val app = if (appId.nonEmpty) appId else checkpointDir
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ResourceTable(batch.sparkSession, tablePath)
          .createIfNotExists(batch.schema)
          .append(batch, mergeSchema, txn = Some((app, batchId))): Unit
      }
      .start()
  }

  /** Streaming keyed upsert (latest state per key wins; the MERGE is
    * idempotent so no transaction watermark is needed).
    */
  def upsert(source: DataFrame, tablePath: String, key: String,
             checkpointDir: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ResourceTable(batch.sparkSession, tablePath)
          .createIfNotExists(batch.schema)
          .upsert(batch, key): Unit
      }
      .start()
}

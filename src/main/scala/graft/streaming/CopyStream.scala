package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.io.{CopyTransportFactory, PgCopyLoad}

/** Continuous bulk load — the streaming extension of K1 mode B (the
  * reference migrates once and stops; the natural next ask is keeping
  * the target fed). Each micro-batch COPYs into the target through the
  * same transport as the batch path. foreachBatch alone is
  * at-least-once across restarts; the BatchLedger check upgrades it to
  * exactly-once at micro-batch granularity (the idempotent-sink pattern
  * from the Structured Streaming guide): a batch id found in the ledger
  * is skipped wholesale on replay.
  */
object CopyStream {

  /** Target-side record of committed micro-batches. Production
    * implementations back this with a one-column ledger table beside the
    * target, written in the same transaction as the final COPY chunk so
    * ledger and data commit atomically. */
  trait BatchLedger extends Serializable {
    def committed(batchId: Long): Boolean
    def record(batchId: Long): Unit
  }

  /** Driver-local ledger: restart-safe only together with the streaming
    * checkpoint (Spark replays at most the last unacknowledged batch).
    * Used by tests and single-driver runs. */
  final class InMemoryLedger extends BatchLedger {
    private val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
    override def committed(batchId: Long): Boolean = ids.contains(batchId)
    override def record(batchId: Long): Unit = ids.add(batchId)
  }

  /** Start the continuous COPY. `stream` is any streaming DataFrame whose
    * schema matches the target table's columns. */
  def start(stream: DataFrame, table: String, factory: CopyTransportFactory,
            ledger: BatchLedger, checkpointDir: String,
            flushBytes: Int = 64 * 1024): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!ledger.committed(batchId)) {
          PgCopyLoad.copyInto(batch, table, factory, flushBytes)
          ledger.record(batchId)
        }
      }
      .start()
}

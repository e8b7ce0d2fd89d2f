package graft.io

import java.sql.DriverManager

/** Target-side record of committed (micro-batch, partition) units for the
  * streaming COPY sink — the idempotent-sink half of exactly-once.
  *
  * The ledger is keyed by (batchId, partitionId), not batchId alone: the
  * batch COPY path commits one transaction PER PARTITION, so a
  * multi-partition micro-batch can fail after some partitions commit. A
  * batch-granular ledger would replay ALL partitions on retry and
  * duplicate the committed ones; per-partition keys make the retry load
  * exactly the partitions that are missing.
  *
  * Recording is not a method call but a SQL statement (`recordSql`) that
  * the transport executes INSIDE the partition's COPY transaction
  * (CopyTransport.commit(sideSqls)) — data and ledger entry commit
  * atomically, so there is no crash window between "data committed" and
  * "ledger recorded".
  */
trait BatchLedger extends Serializable {
  /** Is (batchId, partitionId) already committed? Runs executor-side,
    * once per non-empty partition per batch. */
  def committed(batchId: Long, partitionId: Int): Boolean
  /** Statement recording (batchId, partitionId), executed inside the
    * partition's data transaction. */
  def recordSql(batchId: Long, partitionId: Int): String
}

/** JDBC-backed ledger: a two-column table beside the target. `committed`
  * probes over a short-lived executor-side connection (same cadence as
  * the COPY connection itself — one per partition per batch); the
  * PRIMARY KEY makes an accidental double-insert fail the transaction,
  * a second line of defense behind the committed() check. */
final class JdbcBatchLedger(url: String, user: String, password: String,
                            table: String = "graft_copy_ledger")
    extends BatchLedger {

  /** Create the ledger table when absent (driver-side, once per stream).
    * Plain CREATE + swallow-if-exists: IF NOT EXISTS spelling differs
    * across targets (Derby has none). */
  def ensure(): Unit = {
    val c = DriverManager.getConnection(url, user, password)
    try {
      try c.createStatement().execute(
        s"CREATE TABLE $table (batch_id BIGINT NOT NULL, " +
          "partition_id INT NOT NULL, PRIMARY KEY (batch_id, partition_id))")
      catch { case _: java.sql.SQLException => () } // already exists
    } finally c.close()
  }

  override def committed(batchId: Long, partitionId: Int): Boolean = {
    val c = DriverManager.getConnection(url, user, password)
    try {
      val ps = c.prepareStatement(
        s"SELECT 1 FROM $table WHERE batch_id = ? AND partition_id = ?")
      try {
        ps.setLong(1, batchId)
        ps.setInt(2, partitionId)
        ps.executeQuery().next()
      } finally ps.close()
    } finally c.close()
  }

  override def recordSql(batchId: Long, partitionId: Int): String =
    s"INSERT INTO $table (batch_id, partition_id) VALUES ($batchId, $partitionId)"
}

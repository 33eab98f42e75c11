package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** Partition-parallel external bulk-write sink — the engine's direct
  * counterpart of the reference's batched MongoDB round trips (reference:
  * src/func/mongo.py:103-163; batch size knob mongo_update.py:26-33;
  * per-batch error containment mongo.py:148-159; unordered writes
  * mongo.py:107).
  *
  * Shape: one client per PARTITION (opened once, closed in finally), the
  * partition's rows streamed in `grouped(batchSize)` round trips — the
  * `slice/re-batch` semantics of reference parquet.py:82-114 expressed as
  * iterator grouping instead of a hand-rolled slice loop. Concurrency is
  * partition parallelism (#partitions × cores), replacing the reference's
  * asyncio task fan-out; writes are unordered across partitions exactly
  * like `ordered=False`.
  *
  * Error containment: with `tolerant = true` a failed batch is counted
  * and DROPPED and the partition continues — the reference's
  * log-and-continue policy; fail-fast otherwise.
  *
  * Scale: rows never collect to the driver; counts travel back as
  * accumulators. `batchSize` bounds client-side memory per round trip
  * exactly as in the reference (`batch_size × concurrent_tasks` rows in
  * flight — here batchSize × active tasks).
  */
object BulkForeachSink {

  /** External-system client boundary (the injectable `update_fn` /
    * collection of the reference, mongo.py:35,83). */
  trait BulkClient extends Serializable {
    def open(): Unit
    /** Writes one batch; returns the number of rows applied. */
    def writeBatch(rows: Seq[Row]): Int
    def close(): Unit
  }

  final case class WriteStats(nRows: Long, nBatches: Long, nFailedBatches: Long)

  def write(df: DataFrame, batchSize: Int, mkClient: () => BulkClient,
            tolerant: Boolean = false): WriteStats = {
    require(batchSize > 0, s"batchSize=$batchSize must be positive")
    val sc = df.sparkSession.sparkContext
    val rowsAcc = sc.longAccumulator("bulk_rows")
    val batchAcc = sc.longAccumulator("bulk_batches")
    val failAcc = sc.longAccumulator("bulk_failed_batches")
    df.foreachPartition { (it: Iterator[Row]) =>
      val client = mkClient()
      client.open()
      try {
        it.grouped(batchSize).foreach { batch =>
          try {
            val n = client.writeBatch(batch)
            rowsAcc.add(n.toLong)
            batchAcc.add(1L)
          } catch {
            case e: Exception if tolerant =>
              failAcc.add(1L)
              System.err.println(
                s"""{"stage":"bulk_write","status":"failed","batch_rows":${batch.size},"error":"${e.getClass.getSimpleName}"}""")
          }
        }
      } finally client.close()
    }
    WriteStats(rowsAcc.value, batchAcc.value, failAcc.value)
  }
}

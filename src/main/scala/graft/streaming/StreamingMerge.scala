package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, Dataset}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sinks.MergeSink

/** The reference pipeline as a STREAM: continuously merge arriving update
  * batches into the keyed parquet snapshot. Each micro-batch runs the
  * same single-pass [[MergeSink.mergeInto]] the batch CLI uses —
  * `foreachBatch` is Structured Streaming's bridge to batch-only sinks.
  *
  * Delivery semantics: at-least-once per micro-batch (a replayed batch
  * re-merges), which is SAFE here because the merge is idempotent on
  * data — re-applying an update set leaves the snapshot unchanged
  * (MergeSinkSpec "merge idempotence"); only the observed counts and
  * `updatedAt` stamps reflect the replay. That mirrors the reference's
  * unordered retry-free writes (mongo.py:107,139) where re-running a
  * batch re-upserts the same documents. */
object StreamingMerge {

  def start(updates: DataFrame, targetPath: String, checkpointDir: String,
            key: String, fields: Seq[String]): StreamingQuery = {
    val spark = updates.sparkSession
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val stats = MergeSink.mergeInto(spark, targetPath, batch, key, fields)
        println(s"""{"stage":"stream_merge","batch":$batchId,"n_matched":${stats.nMatched},"n_modified":${stats.nModified},"n_upserted":${stats.nUpserted}}""")
      }
      .start()
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.sinks.ManifestMergeSink

/** CONTINUOUS keyed upsert into the manifest-pointer snapshot — the
  * streaming face of the reference's bulk-update pipeline
  * (howto-mongo-bulk-update-from-parquet src/cli/job.py:20-94 runs it
  * as a batch job; here the same merge semantics run per landed file).
  *
  * Delivery semantics — EXACTLY ONCE end to end, the property the
  * additive folds get from [[graft.sinks.LedgeredState]]'s batch
  * ledger, restated for the keyed-merge family: foreachBatch is
  * at-least-once across restarts, so every micro-batch merge carries a
  * `(pipelineId, batchId)` txn token and the commit file records the
  * pipeline's batch high-water mark atomically with the bucket
  * mapping. A replayed batch (same id, by Structured Streaming's
  * monotone-batchId contract) finds its mark at the head and no-ops
  * without writing a byte; a replayed instance RACING the original
  * loses the commit CAS, finds its own token at the new head, and
  * no-ops the same way.
  *
  * Scale: zero Spark streaming state (the snapshot IS the state);
  * per batch one touched-bucket-bounded merge + one commit-file
  * create — [[ManifestMergeSink.mergeIntoManifested]]'s cost model,
  * unchanged. */
object StreamingMergeManifested {

  def start(spark: SparkSession, srcDir: String, target: String,
            checkpointDir: String, schema: StructType, key: String,
            fields: Seq[String], nBuckets: Int, pipelineId: String,
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val st = ManifestMergeSink.mergeIntoManifested(spark, target,
          batch, key, fields, nBuckets, txn = Some((pipelineId, batchId)))
        println(s"""{"stage":"stream_merge","batch":$batchId,""" +
          s""""matched":${st.nMatched},"upserted":${st.nUpserted}}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

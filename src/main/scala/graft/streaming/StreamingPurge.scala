package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.sinks.MergeSink

/** The deletion queue as a CONTINUOUS consumer: purge requests land as
  * marker files (each a parquet of key values — the shape a
  * right-to-be-forgotten queue delivers) and each micro-batch runs
  * [[MergeSink.purgePartitioned]] with the batch's keys.
  *
  * Delivery semantics: at-least-once and unordered, with NO ledger —
  * unlike the additive-state sinks, purge is naturally idempotent
  * (purging absent keys rewrites identical content), so a replayed
  * request is merely wasted IO, never wrong data. Order is immaterial:
  * purge sets compose by union.
  *
  * Scale: zero streaming state; per batch, cost ∝ the buckets the
  * request's keys hash to — the corpus-sized snapshot never enters
  * stream memory. */
object StreamingPurge {

  def start(spark: SparkSession, queueDir: String, snapshotPath: String,
            checkpointDir: String, key: String, nBuckets: Int,
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream
      .schema(StructType(Seq(StructField(key, LongType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(queueDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val st = MergeSink.purgePartitioned(spark, snapshotPath,
          batch.toDF(), key, nBuckets)
        println(s"""{"stage":"stream_purge","batch":$batchId,""" +
          s""""purged":${st.nPurged},"buckets":${st.nBucketsTouched}}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

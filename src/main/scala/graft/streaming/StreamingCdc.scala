package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}
import graft.operators.Cdc

/** The CDC snapshot fold as a CONTINUOUS ingest: stream changelog files
  * out of a landing directory and fold each micro-batch into the
  * persistent keyed snapshot ([[Cdc.cdcIngest]]) — the streaming face of
  * the q121 day-batch pipeline, wired like [[StreamingReport]]
  * (foreachBatch bridges to the batch-only state fold).
  *
  * Delivery semantics: last-writer-wins state carries its own replay
  * guard — the snapshot's high-water mark drops any change at or below
  * it, so BOTH foreachBatch batch replays AND upstream re-delivered rows
  * are absorbed (stronger than the additive-state ingests, which need a
  * batchId ledger and still can't absorb upstream duplicates). The
  * soundness condition is day-ordered delivery: an older-than-watermark
  * change for an unseen key would be wrongly dropped, so the landing
  * directory must receive files in change-time order — which a CDC tap
  * (binlog reader, debezium-style) naturally produces.
  *
  * Scale: zero streaming state in the engine — per batch, one batch-local
  * aggregate plus one key-partitioned join against the snapshot; the
  * changelog history is never re-read. */
object StreamingCdc {

  val changeSchema: StructType = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("event_id", LongType), StructField("op", StringType),
    StructField("status", StringType), StructField("amount", DoubleType)))

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String, maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(changeSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Cdc.cdcIngest(spark, statePath, batch)
        println(s"""{"stage":"stream_cdc","batch":$batchId}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

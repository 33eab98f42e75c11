package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.operators.TrainingData

/** The E-S weighted-sample fold as a CONTINUOUS ingest: stream document
  * files out of a landing directory and fold each micro-batch into the
  * persistent top-k sample state ([[TrainingData.sampleIngest]]) — the
  * streaming face of the q132 day-batch pipeline, wired like
  * [[StreamingEntity]] (foreachBatch bridges to the batch-only fold).
  *
  * Delivery semantics — the strongest contract of the streamed ingests,
  * shared with [[StreamingEntity]]: the E-S key is a pure function of
  * (id, weight) and top-k is a monotone mergeable summary, so batch
  * replays AND upstream re-deliveries fold to no-ops with NO batchId
  * ledger, under ANY delivery order — the landing directory carries no
  * ordering obligation at all (contrast [[StreamingCdc]]/
  * [[StreamingGraph]], whose keyed/additive states need day order).
  *
  * Scale: zero streaming state in the engine — per batch, one narrow
  * hash+ln map over the batch plus a 2k-row merge; the document history
  * is never re-read and the state is k rows forever. */
object StreamingSample {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("n_chars", LongType)))

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String, k: Int, seed: String,
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        TrainingData.sampleIngest(spark, statePath, batch,
          "doc_id", "n_chars", Seq("lang"), k, seed)
        println(s"""{"stage":"stream_sample","batch":$batchId}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

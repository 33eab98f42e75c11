package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import graft.operators.TrainingData

/** The Pareto-frontier fold as a CONTINUOUS ingest: stream scored
  * document files out of a landing directory and fold each micro-batch
  * into the persistent frontier state ([[TrainingData.skylineIngest]]) —
  * the streaming face of the q141 day-batch pipeline, wired like
  * [[StreamingSample]] (foreachBatch bridges to the batch-only fold).
  *
  * Delivery semantics — the monotone-mergeable contract, shared with
  * [[StreamingSample]]/[[StreamingEntity]]: dominance is transitive, so
  * batch replays AND upstream re-deliveries fold to no-ops with NO
  * batchId ledger, under ANY delivery order. The landing directory
  * carries no ordering obligation.
  *
  * Scale: zero streaming state in the engine — per batch, the batch's
  * own skyline merged with the frontier rows; history never re-read. */
object StreamingSkyline {

  val scoredSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("quality", DoubleType), StructField("n_tokens", LongType)))

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String, maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(scoredSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        TrainingData.skylineIngest(spark, statePath, batch,
          "doc_id", "quality", "n_tokens", Seq("lang"))
        println(s"""{"stage":"stream_skyline","batch":$batchId}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

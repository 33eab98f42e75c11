package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.TextQueries

/** The vocabulary snapshot as a CONTINUOUS ingest: stream document
  * files out of a landing directory and fold each micro-batch's type
  * counts into the additive vocabulary state
  * ([[TextQueries.vocabIngest]]) — the streaming face of the q110
  * pipeline, wired like [[StreamingReport]] (foreachBatch bridges to
  * the batch-only state fold; the batchId ledger absorbs sink-side
  * replays).
  *
  * Delivery contract is [[StreamingReport]]'s verbatim: additive state
  * absorbs whole-batch replays but not upstream row duplicates —
  * dedup upstream if the source can double-land a document.
  *
  * Scale: zero streaming state — per batch, one type-count aggregation
  * of the batch (the only batch-sized step) plus a merge proportional
  * to the type vocabulary; the corpus is never re-scanned. */
object StreamingVocab {

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String,
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(StreamingReport.docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val applied = TextQueries.vocabIngest(spark, statePath, batch,
          s"batch_$batchId", "lang", "text")
        println(s"""{"stage":"stream_vocab","batch":$batchId,"applied":$applied}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.operators.CorpusReport

/** The corpus-report ledger as a CONTINUOUS ingest: stream document
  * files out of a landing directory and fold each micro-batch into the
  * mergeable report state ([[CorpusReport.reportIngest]]) — the
  * streaming face of the q85 aggregate-state pipeline, wired like
  * [[StreamingNeardup]] (foreachBatch bridges to the batch-only state
  * fold).
  *
  * Delivery semantics — the honest contrast with the index ingests:
  * additive state absorbs whole-batch REPLAYS (foreachBatch re-delivers
  * the same batchId after a failure; the ledger no-ops it) but NOT
  * upstream row duplicates across files — a document landed twice in
  * two different files counts twice, because additive folds have no
  * identity to anti-join on. A source that can duplicate rows must
  * dedup upstream (q57's stream dedup, or the q65 index) before this
  * sink; that contract is what q85's scaladoc commits to and the gate
  * harness respects.
  *
  * Scale: zero streaming state — per batch, one aggregation of the
  * batch plus a merge over |strata| snapshot rows; the corpus is never
  * re-scanned (the point of keeping report state). */
object StreamingReport {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("text", StringType)))

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String, strata: Seq[String],
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val applied = CorpusReport.reportIngest(spark, statePath, batch,
          s"batch_$batchId", "text", strata)
        println(s"""{"stage":"stream_report","batch":$batchId,"applied":$applied}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

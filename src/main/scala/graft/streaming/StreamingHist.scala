package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.operators.Audit

/** The quantile-distribution ledger as a CONTINUOUS ingest: stream
  * scored-document files out of a landing directory and fold each
  * micro-batch's value counts into the persistent (stratum, x, n)
  * distribution state ([[Audit.histIngest]]) — the streaming face of
  * the q162 day-batch pipeline, wired like [[StreamingReport]]
  * (additive state + batchId ledger behind foreachBatch).
  *
  * Delivery semantics — [[StreamingReport]]'s contract verbatim:
  * whole-batch replays are ledger no-ops (the ledger commits
  * ATOMICALLY with the counts — [[graft.sinks.LedgeredState]]); row
  * duplicates across files are the upstream's to prevent, because
  * additive counts have no row identity to anti-join on.
  *
  * Scale: zero streaming state — per batch, one value-count
  * aggregation of the batch plus a merge over the ≤ |strata|·10001-row
  * snapshot; p50/p90/p99 derive from the snapshot on demand
  * ([[Audit.histQuantiles]]) without re-reading history. */
object StreamingHist {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("qe4", LongType)))

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String,
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val applied = Audit.histIngest(spark, statePath, batch,
          "lang", col("qe4"), s"batch_$batchId")
        println(s"""{"stage":"stream_hist","batch":$batchId,"applied":$applied}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.operators.Audit

/** The release-contract report as a CONTINUOUS audit: stream document
  * files out of a landing directory and fold each micro-batch's
  * contract evidence into the persistent report state
  * ([[Audit.contractIngest]]) — the streaming face of the q189
  * day-batch pipeline, wired like [[StreamingHist]] (additive state +
  * batchId ledger behind foreachBatch). The monitor a publisher runs
  * WHILE a release lands instead of after.
  *
  * Delivery semantics — [[StreamingReport]]'s contract verbatim:
  * whole-batch replays are ledger no-ops (ledger and both state parts
  * commit atomically — [[graft.sinks.LedgeredState]]); row duplicates
  * across files are the upstream's to prevent for the additive Check
  * counts — though the Unique rule's per-key counts would CATCH such a
  * duplicate, which is exactly its job.
  *
  * Scale: zero streaming state — per batch, one aggregate row per
  * Check/RefIntegrity rule plus a key-grouped count for Unique rules,
  * merged into a state that is |rules| + |distinct keys| rows; the
  * report derives from the snapshot on demand
  * ([[Audit.contractReportFromState]]). */
object StreamingContracts {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String, rules: Seq[Audit.ContractRule],
            keyCol: String = "doc_id",
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val applied = Audit.contractIngest(spark, statePath, batch,
          s"batch_$batchId", keyCol, rules)
        println(s"""{"stage":"stream_contracts","batch":$batchId,"applied":$applied}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

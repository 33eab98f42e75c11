package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Skew

/** The skew monitor as a CONTINUOUS ingest: stream event files out of
  * a landing directory and fold each micro-batch's per-key counts into
  * the persistent (k, cnt) state ([[Skew.skewIngest]]) — the streaming
  * face of the q201 pipeline, wired like [[StreamingHist]] (additive
  * state + batchId ledger behind foreachBatch). Tomorrow's salt
  * decision reads the snapshot instead of re-counting the corpus.
  *
  * Delivery semantics — [[StreamingReport]]'s contract verbatim:
  * whole-batch replays are ledger no-ops; row duplicates across files
  * are the upstream's to prevent (an additive count has no row
  * identity to anti-join on).
  *
  * Scale: zero streaming state — per batch one key-grouped count with
  * map-side partials merged into a distinct-keys-sized snapshot; the
  * hot-key report derives on demand ([[Skew.skewReportFromCounts]]). */
object StreamingSkew {

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String, keyCol: String,
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(StreamingAnomaly.eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val applied = Skew.skewIngest(spark, statePath, batch, keyCol,
          s"batch_$batchId")
        println(s"""{"stage":"stream_skew","batch":$batchId,"applied":$applied}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

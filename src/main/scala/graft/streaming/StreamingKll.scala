package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.QuantileQueries

/** The continuous-quantile monitor as a CONTINUOUS ingest: stream
  * event files out of a landing directory and merge each micro-batch's
  * KLL sketch into the persistent one-row state
  * ([[QuantileQueries.kllIngest]]) — the streaming face of the q206
  * pipeline, wired like [[StreamingSkew]] (additive state + batchId
  * ledger behind foreachBatch). Tail-latency/loss dashboards read the
  * snapshot sketch instead of re-scanning the corpus.
  *
  * Delivery semantics — [[StreamingReport]]'s contract verbatim:
  * whole-batch replays are ledger no-ops; row duplicates across files
  * are the upstream's to prevent (a sketch has no row identity to
  * anti-join on).
  *
  * Scale: zero Spark streaming state — per batch one sketch
  * aggregation with map-side partials merged into a kilobyte snapshot. */
object StreamingKll {

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String, valueCol: String,
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(StreamingAnomaly.eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val applied = QuantileQueries.kllIngest(spark, statePath, batch,
          valueCol, s"batch_$batchId")
        println(s"""{"stage":"stream_kll","batch":$batchId,"applied":$applied}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

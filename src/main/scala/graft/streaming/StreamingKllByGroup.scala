package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.QuantileQueries

/** The PER-STRATUM continuous-quantile monitor as a CONTINUOUS ingest:
  * stream event files out of a landing directory and fold each
  * micro-batch's per-group KLL sketches into the persistent
  * (group, sketch) state ([[QuantileQueries.kllIngestByGroup]]) — the
  * streaming face of the q211 pipeline, wired like [[StreamingKll]]
  * (additive state + batchId ledger behind foreachBatch). Per-stratum
  * tail dashboards (per-event-type latency, per-language loss) read
  * the snapshot sketches instead of re-scanning the corpus.
  *
  * Delivery semantics — [[StreamingReport]]'s contract verbatim:
  * whole-batch replays are ledger no-ops; row duplicates across files
  * are the upstream's to prevent (a sketch has no row identity to
  * anti-join on).
  *
  * Scale: zero Spark streaming state — per batch one grouped sketch
  * aggregation (map-side partials per stratum) merged into a
  * ≤ |strata|-row kilobyte snapshot. */
object StreamingKllByGroup {

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String, groupCol: String, valueCol: String,
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(StreamingAnomaly.eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val applied = QuantileQueries.kllIngestByGroup(spark, statePath,
          batch, groupCol, valueCol, s"batch_$batchId")
        println(s"""{"stage":"stream_kll_by_group","batch":$batchId,"applied":$applied}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

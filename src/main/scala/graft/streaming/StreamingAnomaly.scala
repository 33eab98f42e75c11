package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}
import graft.operators.Audit

/** The day-anomaly monitor as a CONTINUOUS ingest: stream event files
  * out of a landing directory and fold each micro-batch into the
  * persistent (day, user, count) state ([[Audit.anomalyIngest]]) —
  * the streaming face of the q197 pipeline, wired like
  * [[StreamingHist]] (additive state + batchId ledger behind
  * foreachBatch). The delivery monitor that flags a source going dark
  * or a duplicating upstream WHILE the day lands.
  *
  * Delivery semantics — [[StreamingReport]]'s contract verbatim:
  * whole-batch replays are ledger no-ops; row duplicates across files
  * are the upstream's to prevent (and are precisely what the HIGH
  * detector exists to flag when they happen at day scale).
  *
  * Scale: zero streaming state — per batch one (day, user) count of
  * the batch merged into a days × active-users state; the report
  * derives from the snapshot on demand ([[Audit.anomaliesFromState]]),
  * with per-day distinct users EXACT under mid-day batch boundaries
  * because the state grain is (day, user), never a per-batch distinct
  * count. */
object StreamingAnomaly {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String,
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val applied = Audit.anomalyIngest(spark, statePath, batch,
          col("ts"), col("user_id"), s"batch_$batchId")
        println(s"""{"stage":"stream_anomaly","batch":$batchId,"applied":$applied}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

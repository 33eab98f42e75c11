package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}
import graft.operators.Graph

/** The graph-ingest fold as a CONTINUOUS ingest: stream raw event files
  * out of a landing directory and fold each micro-batch into the
  * persistent edge-weight + per-user-frontier state
  * ([[Graph.graphIngest]]) — the streaming face of the q137 day-batch
  * pipeline, wired like [[StreamingCdc]] (foreachBatch bridges to the
  * batch-only state fold).
  *
  * Delivery semantics — [[StreamingCdc]]'s contract with the ledger kept:
  * foreachBatch replays of a whole batch are absorbed by the batchId
  * ledger (the additive edge weights would otherwise double-fold), and
  * upstream re-delivered ROWS inside a later file are dropped by the
  * per-user watermark against the stored frontier. The soundness
  * condition is day-ordered delivery per user — an event older than the
  * user's frontier is indistinguishable from a re-delivery and is
  * dropped — which a log tailer naturally produces.
  *
  * Scale: zero streaming state in the engine — per batch, the q137
  * fold's cost (batch window sort + frontier join + additive edge
  * merge); the event history is never re-read. */
object StreamingGraph {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String, maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Graph.graphIngest(spark, statePath, batch, s"stream_$batchId")
        println(s"""{"stage":"stream_graph","batch":$batchId}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

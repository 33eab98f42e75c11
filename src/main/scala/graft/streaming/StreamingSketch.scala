package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.operators.Overlap

/** The k-min overlap-fingerprint fold as a CONTINUOUS ingest: stream
  * document files out of a landing directory and fold each micro-batch
  * into the persistent sketch state ([[Overlap.sketchIngest]]) — the
  * streaming face of the q159 day-batch pipeline.
  *
  * Delivery semantics — [[StreamingSample]]'s contract exactly: the
  * k-min hash set is a monotone mergeable summary over VALUES (union +
  * truncate, idempotent on duplicates), so batch replays AND upstream
  * re-deliveries fold to no-ops with NO batchId ledger, under ANY
  * delivery order.
  *
  * Scale: zero streaming state in the engine — per batch, one one-pass
  * fold over the batch plus a k-long merge; state is k longs forever,
  * and the snapshot's overlap fingerprint is current after every
  * micro-batch. */
object StreamingSketch {

  val docSchema: StructType = StructType(Seq(
    StructField("key", StringType), StructField("doc_id", LongType)))

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String, keyCol: String, k: Int,
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Overlap.sketchIngest(spark, statePath, batch, keyCol, k)
        println(s"""{"stage":"stream_sketch","batch":$batchId}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

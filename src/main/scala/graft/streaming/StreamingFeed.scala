package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.operators.MergeQueries

/** The catalog change feed as a CONTINUOUS consumer: stream commit
  * NOTIFICATIONS out of a landing directory (the object-store
  * event-notification shape — a marker file per committed version) and
  * advance a cursor-tracked derived snapshot through
  * [[MergeQueries.feedConsumerIngest]] on each micro-batch — the
  * streamed face of the q171 change-feed loop, completing the family's
  * batch (q166) / incremental (q171) / streamed taxonomy.
  *
  * Delivery semantics: markers are at-least-once and unordered. The
  * consumer keys on the CATALOG's latest version, not the marker's
  * payload — a stale or replayed marker finds latest ≤ cursor (or its
  * batch already in the state ledger) and no-ops; a marker that arrives
  * ahead of a lost sibling still advances the cursor through every
  * pending version, because the feed reads ALL steps past the cursor.
  *
  * Scale: zero streaming state in the engine — per batch, drift-sized
  * feed joins plus one atomic state swap; the corpus-sized snapshot
  * lives in the ledgered state dir, never in stream memory. */
object StreamingFeed {

  val markerSchema: StructType = StructType(Seq(
    StructField("version", LongType)))

  def start(spark: SparkSession, notifyDir: String, catalogPath: String,
            statePath: String, checkpointDir: String,
            key: String, valCols: Seq[String],
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(markerSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(notifyDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // the marker's content is only a wake-up; the catalog is the
        // authority for what is pending
        batch.count()
        val advanced = MergeQueries.feedConsumerIngest(
          spark, catalogPath, statePath, key, valCols)
        println(s"""{"stage":"stream_feed","batch":$batchId,"advanced":$advanced}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

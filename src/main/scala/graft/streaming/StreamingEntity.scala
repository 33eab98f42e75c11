package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.operators.MergeQueries

/** The entity-resolution registry fold as a CONTINUOUS ingest: stream
  * (id, name) record files out of a landing directory and fold each
  * micro-batch into the persistent fuzzy-key registry
  * ([[MergeQueries.entityIngest]]) — the streaming face of the q127
  * day-batch pipeline, wired like [[StreamingCdc]] (foreachBatch bridges
  * to the batch-only state fold).
  *
  * Delivery semantics — stronger than BOTH sibling ingests: the
  * registry's key anti-join drops any already-seen id, so batch replays
  * AND upstream re-deliveries fold to no-ops with NO batchId ledger
  * (like [[StreamingCdc]]) and NO ordering soundness condition (unlike
  * it: entity state is a monotone merge — the component-min invariant
  * holds under ANY arrival order, so the landing directory needs no
  * time-ordering guarantee at all; FuzzyJoinSpec proves order
  * invisibility directly).
  *
  * Scale: zero streaming state in the engine — per batch, the q127
  * fold's cost (batch pairs + variant probe + touched-subgraph CC +
  * bounded merge); the record history is never re-read. */
object StreamingEntity {

  val recordSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  def start(spark: SparkSession, srcDir: String, registryPath: String,
            checkpointDir: String, maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(recordSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        MergeQueries.entityIngest(spark, registryPath, batch, "id", "name")
        println(s"""{"stage":"stream_entity","batch":$batchId}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

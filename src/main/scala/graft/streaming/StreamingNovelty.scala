package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.operators.TextQueries

/** The novelty index as a CONTINUOUS ingest: stream document files out
  * of a landing directory and fold each micro-batch's gram statistics
  * into the persistent (gram_df, doc_grams) state
  * ([[TextQueries.noveltyIngest]]) — the streaming face of the q188
  * day-batch pipeline, wired like [[StreamingHist]] (additive state +
  * batchId ledger behind foreachBatch).
  *
  * Delivery semantics — [[StreamingReport]]'s contract verbatim:
  * whole-batch replays are ledger no-ops (ledger and both state parts
  * commit atomically); row duplicates across files are the upstream's
  * to prevent, because a re-said gram would legitimately strip its
  * owner's novelty (the additive state cannot tell a duplicate row
  * from a genuine second occurrence — by design).
  *
  * Scale: zero streaming state — per batch, one explode + two grouped
  * counts of the BATCH, merged into the gram-keyed state (inverted-
  * index volume, never pair joins); per-doc novelty derives from the
  * snapshot on demand ([[TextQueries.noveltyFromState]]). */
object StreamingNovelty {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  def start(spark: SparkSession, srcDir: String, statePath: String,
            checkpointDir: String,
            maxFilesPerTrigger: Int = 1,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val applied = TextQueries.noveltyIngest(spark, statePath, batch,
          s"batch_$batchId")
        println(s"""{"stage":"stream_novelty","batch":$batchId,"applied":$applied}""")
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}

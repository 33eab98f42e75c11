package graft.jobs

import org.apache.spark.sql.SparkSession
import graft.GraftSession
import graft.sinks.MergeSink
import graft.sources.SyntheticSource

/** CLI: the bulk-update pipeline (reference: src/cli/mongo_update.py +
  * src/func/job.py). Reads an updates directory with the explicitly
  * declared reference schema (schema-on-read validation, parquet.py:39),
  * and merges it into a keyed parquet snapshot with upsert semantics.
  *
  * The reference's batch_size/concurrent_tasks knobs (mongo_update.py:26-42)
  * bounded rows-in-memory and write fan-out; in Spark both collapse into
  * partitioning — `numPartitions` controls parallelism and per-task memory,
  * and the whole pipeline is one lazy plan (scan → fold → merge → write)
  * instead of the reference's sequential slice loop (job.py:72-87).
  *
  * Usage: BulkUpdateJob <updatesPath> <targetPath> [numPartitions]
  */
object BulkUpdateJob {

  def run(spark: SparkSession, updatesPath: String, targetPath: String,
          numPartitions: Option[Int] = None): MergeSink.MergeStats = {
    val raw = spark.read.schema(SyntheticSource.schema).parquet(updatesPath)
    val updates = numPartitions.fold(raw)(n => raw.repartition(n, raw(SyntheticSource.idColumn)))
    MergeSink.mergeInto(spark, targetPath, updates,
      SyntheticSource.idColumn, SyntheticSource.payloadFields)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BulkUpdateJob <updatesPath> <targetPath> [numPartitions]")
    val spark = GraftSession.getOrCreate()
    val stats = run(spark, args(0), args(1), args.lift(2).map(_.toInt))
    println(s"""{"stage":"update","status":"success","n_matched":${stats.nMatched},"n_modified":${stats.nModified},"n_upserted":${stats.nUpserted}}""")
    spark.stop()
  }
}

package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftConfig, GraftSession}
import graft.obs.StageMetrics
import graft.sinks.MergeSink
import graft.sources.SyntheticSource
import graft.update.Statements

/** CLI: the bulk-update pipeline (reference: src/cli/mongo_update.py +
  * src/func/job.py). Reads an updates directory with the explicitly
  * declared reference schema (schema-on-read validation, parquet.py:39),
  * builds upsert statements through the statement boundary (null-key /
  * empty-set guard ladder, mongo.py:28-100), and merges them into a keyed
  * parquet snapshot with upsert semantics.
  *
  * The reference's batch_size/concurrent_tasks knobs (mongo_update.py:26-42)
  * bounded rows-in-memory and write fan-out; in Spark both collapse into
  * partitioning — `numPartitions` controls parallelism and per-task memory,
  * and the whole pipeline is one lazy plan (scan → statements → merge →
  * write) instead of the reference's sequential slice loop (job.py:72-87).
  *
  * Error containment: `tolerant = true` mirrors the reference's
  * drop-batch-and-continue policy (mongo.py:148-159) — a failed merge logs
  * a structured error and returns zero counts instead of failing the job.
  * Default is fail-fast (the right default for a set-oriented engine,
  * where a failed merge means the snapshot swap never happened).
  *
  * Usage: BulkUpdateJob <updatesPath> <targetPath> [numPartitions]
  */
object BulkUpdateJob {

  def run(spark: SparkSession, updatesPath: String, targetPath: String,
          numPartitions: Option[Int] = None,
          tolerant: Boolean = false,
          orderCol: Option[String] = None): MergeSink.MergeStats = {
    try {
      val raw = spark.read.schema(SyntheticSource.schema).parquet(updatesPath)
      val updates = numPartitions.fold(raw)(n => raw.repartition(n, raw(SyntheticSource.idColumn)))
      // Statement boundary (reference mongo.py:28-100): null keys and
      // all-null payload rows drop HERE, before the sink — then the (key,
      // set_fields) statements widen back to sink columns. element_at on a
      // missing map key yields null, which the merge's coalesce null-skips.
      // an orderCol that IS a payload field is already in the statement
      // output; only genuinely extra columns ride the passthrough
      val extra = orderCol.filterNot(c =>
        SyntheticSource.payloadFields.contains(c) || c == SyntheticSource.idColumn).toSeq
      val stmts = Statements.build(updates, SyntheticSource.idColumn,
        SyntheticSource.payloadFields, passthrough = extra)
      val wide = stmts.select(
        col("key").as(SyntheticSource.idColumn) +:
        SyntheticSource.payloadFields.map(f => element_at(col("set_fields"), f).as(f)) ++:
        extra.map(col): _*)
      MergeSink.mergeInto(spark, targetPath, wide,
        SyntheticSource.idColumn, SyntheticSource.payloadFields,
        orderCol = orderCol)
    } catch {
      case e: Exception if tolerant =>
        System.err.println(
          s"""{"stage":"update","status":"failed","error":"${e.getClass.getSimpleName}"}""")
        MergeSink.MergeStats(0, 0, 0)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BulkUpdateJob <updatesPath> <targetPath> [numPartitions]")
    val cfg = GraftConfig.fromEnv()
    val spark = GraftSession.getOrCreate()
    val (stats, stages) = StageMetrics.withStageMetrics(spark) {
      run(spark, args(0), args(1), args.lift(2).map(_.toInt),
        tolerant = cfg.tolerant, orderCol = cfg.mergeOrderCol)
    }
    // per-stage structured events (reference log.py dict logs + per-slice
    // timings mongo.py:243-267), then the job summary line
    stages.foreach(e => println(e.toJson))
    println(s"""{"stage":"update","status":"success","n_matched":${stats.nMatched},"n_modified":${stats.nModified},"n_upserted":${stats.nUpserted}}""")
    spark.stop()
  }
}

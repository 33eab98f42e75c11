package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement-only harness (optimization guide §1): runs named queries
  * under a SparkListener and reports where the time goes — job count,
  * task count, summed task time vs wall-clock (parallelism efficiency),
  * shuffle bytes, GC — plus optionally dumps `.explain("formatted")` of
  * the returned frame to plans/<tag>/<query>_<suffix>.txt.
  *
  * Usage: runMain graft.Profile q68_incr_neardup[,q72_...] [explainDir]
  * Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench. Never part of
  * the driver contract; it changes no query result.
  */
object Profile {
  private final class Agg extends SparkListener {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0)
    val gcMs = new AtomicLong(0)
    val shufReadB = new AtomicLong(0)
    val shufWriteB = new AtomicLong(0)
    val inputB = new AtomicLong(0)
    val fetchWaitMs = new AtomicLong(0)
    val deserMs = new AtomicLong(0)
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        deserMs.addAndGet(m.executorDeserializeTime)
        if (m.shuffleReadMetrics != null) {
          shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          fetchWaitMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
        }
        if (m.shuffleWriteMetrics != null)
          shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        if (m.inputMetrics != null) inputB.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def json(name: String, wallSec: Double): String =
      s"""{"query":"$name","wall_sec":${f"$wallSec%.3f"},"jobs":${jobs.get},""" +
        s""""stages":${stages.get},"tasks":${tasks.get},""" +
        s""""task_time_sec":${f"${taskTimeMs.get / 1e3}%.3f"},""" +
        s""""gc_sec":${f"${gcMs.get / 1e3}%.3f"},""" +
        s""""deser_sec":${f"${deserMs.get / 1e3}%.3f"},""" +
        s""""fetch_wait_sec":${f"${fetchWaitMs.get / 1e3}%.3f"},""" +
        s""""shuffle_read_mb":${f"${shufReadB.get / 1e6}%.2f"},""" +
        s""""shuffle_write_mb":${f"${shufWriteB.get / 1e6}%.2f"},""" +
        s""""input_mb":${f"${inputB.get / 1e6}%.2f"}}"""
  }

  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromEnv()
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q68_incr_neardup"))
    val explainDir = args.lift(1)
    val spark = GraftSession
      .builder(master = s"local[${cfg.cpus}]", shufflePartitions = cfg.cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the table cache like Bench does so footer reads don't skew q1
    Tables.names.foreach { t =>
      try Tables.load(spark, cfg.sfDir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query $name")
        case Some(fn) =>
          // one discarded warmup rep: JIT/codegen out of the measurement
          try fn(spark, cfg.sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[profile] $name warmup failed: ${e.getMessage}") }
          spark.catalog.clearCache()
          System.gc()
          val agg = new Agg
          spark.sparkContext.addSparkListener(agg)
          spark.sparkContext.setJobDescription(s"profile:$name")
          val t0 = System.nanoTime()
          val df =
            try { val d = fn(spark, cfg.sfDir)
              d.write.format("noop").mode("overwrite").save(); Some(d) }
            catch { case e: Throwable =>
              System.err.println(s"[profile] $name failed: ${e.getMessage}"); None }
          val wall = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.setJobDescription(null)
          // listener bus is async; drain before reading counters
          org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
          spark.sparkContext.removeSparkListener(agg)
          println(agg.json(name, wall))
          for (dir <- explainDir; d <- df) {
            Files.createDirectories(Paths.get(dir))
            Files.writeString(Paths.get(dir, s"$name.txt"),
              d.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode))
          }
          spark.catalog.clearCache()
          System.gc()
      }
    }
    spark.stop()
  }
}

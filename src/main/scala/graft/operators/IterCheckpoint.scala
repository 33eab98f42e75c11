package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Shared per-round LINEAGE-TRUNCATION policy for the engine's
  * iterative DataFrame loops — connected components, PageRank, BPE,
  * label propagation, greedy k-center. One policy object instead of
  * five inline copies of the same branching.
  *
  * Default (`checkpointDir = None`): `localCheckpoint` per round —
  * cheapest on a single box, but its blocks live on EXECUTORS, so on a
  * real cluster one lost executor invalidates the checkpoint and fails
  * the whole loop mid-iteration.
  *
  * Cluster-safe mode (`checkpointDir = Some(hdfs/object-store path)`):
  * every `interval`-th round writes a RELIABLE checkpoint there and the
  * rounds between persist to MEMORY_AND_DISK — an executor loss then
  * recomputes at most `interval` rounds from the last reliable snapshot
  * instead of failing the job. The contract every loop inherits from
  * [[Dedup.connectedComponents]], where the policy originated.
  *
  * `setCheckpointDir` is SparkContext-GLOBAL: construction remembers
  * the previous dir and [[restore]] puts it back (call it in a
  * `finally`), but when none was set before, the dir necessarily stays
  * set afterwards — SparkContext has no unset API.
  *
  * Unpersist discipline: [[roll]] releases the previous round's
  * persisted frame and must only run once the NEW frame is
  * materialized — releasing a still-needed parent forces the next
  * action to recompute up to `interval` rounds from the last reliable
  * snapshot. Loops with a natural per-round action (CC's convergence
  * agg, BPE's top-pair collect, k-center's argmax) call [[roll]] right
  * after that action; loops with none (label propagation, PageRank)
  * use [[truncateRoll]], which forces the materialization itself. */
private[graft] final class IterCheckpoint(spark: SparkSession,
                                          checkpointDir: Option[String],
                                          interval: Int = 5) {
  require(interval >= 1, s"checkpointInterval=$interval must be >= 1")

  private val prevDir: Option[String] =
    if (checkpointDir.isDefined) spark.sparkContext.getCheckpointDir else None
  checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
  private var lastPersisted: Option[DataFrame] = None

  /** Truncate round `round`'s lineage under the policy. Round 0 is an
    * interval round by construction — static loop inputs truncated with
    * round = 0 always land reliable in cluster-safe mode (a lost
    * executor must not lose the frame every round re-reads). */
  def truncate(df: DataFrame, round: Int): DataFrame = checkpointDir match {
    case Some(_) if round % interval == 0 => df.checkpoint(true)
    case Some(_) => df.persist(StorageLevel.MEMORY_AND_DISK)
    case None => df.localCheckpoint(true)
  }

  /** [[truncate]] + [[roll]] for loops with NO natural per-round
    * action: materializes the truncated frame first (one count job on
    * the cluster-safe persist rounds — `checkpoint(true)` interval
    * rounds and local-mode `localCheckpoint(true)` are already eager)
    * so releasing the predecessor never forces a recompute cascade. */
  def truncateRoll(df: DataFrame, round: Int): DataFrame = {
    val out = truncate(df, round)
    if (checkpointDir.isDefined && round % interval != 0) out.count()
    roll(out)
    out
  }

  /** Release the PREVIOUS round's persisted frame and remember `cur`
    * as the new one (no-op in local mode — localCheckpoint frees its
    * predecessor's blocks through GC, not unpersist). */
  def roll(cur: DataFrame): Unit = {
    lastPersisted.foreach(_.unpersist())
    lastPersisted = if (checkpointDir.isDefined) Some(cur) else None
  }

  /** Finalize the loop's RESULT on reliable storage, so the returned
    * frame does not pin a MEMORY_AND_DISK cache entry for the rest of
    * the session. Identity in local mode. */
  def finish(df: DataFrame): DataFrame = checkpointDir match {
    case None => df
    case Some(_) =>
      val out = df.checkpoint(true)
      lastPersisted.foreach(_.unpersist())
      lastPersisted = None
      out
  }

  /** Restore the SparkContext checkpoint dir this instance displaced
    * (see the class doc's none-was-set-before caveat). */
  def restore(): Unit =
    if (checkpointDir.isDefined)
      prevDir.foreach(spark.sparkContext.setCheckpointDir)
}

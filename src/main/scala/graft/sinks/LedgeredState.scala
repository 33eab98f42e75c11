package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Atomic commit for LEDGER-GUARDED additive ingest state.
  *
  * The five additive folds (vocabulary, corpus report, DSIR counts,
  * moments, graph edges+frontier) restore idempotence under
  * at-least-once delivery with a batchId ledger. Originally each ingest
  * swapped its state dir(s) and THEN appended the ledger row as a
  * separate write — leaving a crash window where the fold is applied
  * but unrecorded: on replay the ledger says "new batch" and the
  * additive state double-counts (exactly the failure the ledger
  * exists to prevent). Multi-part states (graph: edges, then frontier,
  * then ledger) had two such windows.
  *
  * Here the ledger IS part of the swapped state: all parts land in one
  * temp dir — `<part>/` parquet per part plus `_batches/` carrying the
  * old ledger + the new batchId — and ONE [[MergeSink.atomicSwap]]
  * publishes everything. Either the whole batch (every part and its
  * ledger row) is visible, or none of it is; a crash at any point
  * leaves the previous committed state authoritative (the un-swapped
  * temp dir is deleted on the next attempt).
  *
  * Layout: `$path/state/<part>/` per part, `$path/state/_batches/` for
  * the ledger. The ledger is REWRITTEN per commit (it must travel in
  * the swap); it holds one tiny row per absorbed batch, so the rewrite
  * is O(batches) metadata, never corpus-shaped.
  *
  * Scale: the commit adds zero data-plane cost over the original
  * two-step — the part writes are the same fold outputs, the swap is
  * the same metadata rename, and the ledger rewrite is negligible. The
  * fold plans read the PREVIOUS state lazily; every read completes
  * while that state is still in place (writes target the temp dir), so
  * no checkpoint is needed between parts.
  */
object LedgeredState {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The committed location of a state part (for readers). */
  def partPath(path: String, part: String): String = s"$path/state/$part"

  /** [[MergeSink.atomicSwap]] is two renames (state → bak, tmp →
    * state); a crash BETWEEN them leaves no `state` dir while `bak`
    * holds the last committed one. Without recovery the next ingest
    * would silently restart from EMPTY state — exactly the data loss
    * the atomic contract promises away — so every entry point probes
    * for that window first and restores `bak`. The rule is
    * unambiguous: restore ONLY when `state` is absent (a crash after
    * the second rename but before the bak cleanup leaves BOTH — then
    * the new state is committed and `bak` is just garbage, removed by
    * the next commit's delete). */
  private def recover(fs: FileSystem, path: String): Unit = {
    legacyLayoutCheck(fs, path)
    MergeSink.recoverSwap(fs, new Path(s"$path/state"),
      new Path(path + ".__state_bak"))
  }

  /** Fail LOUDLY on the pre-round-12 on-disk layout ($path/state holding
    * parquet files directly, ledger at $path/_batches) instead of
    * silently treating it as fresh: under the current layout
    * ([[absorbed]] probing $path/state/_batches, [[readPart]] probing
    * $path/state/<part>) legacy state looks absent, and the first
    * post-upgrade commit would atomically swap the accumulated state
    * away — the exact silent-restart-from-empty loss this file's
    * contract exists to prevent. Migration is a rename (state files →
    * state/<part>/, _batches → state/_batches), but it must be the
    * OPERATOR's deliberate act, not an implicit one mid-ingest. */
  private def legacyLayoutCheck(fs: FileSystem, path: String): Unit = {
    val legacyLedger = new Path(s"$path/_batches")
    val state = new Path(s"$path/state")
    val legacyFlat = fs.exists(state) &&
      fs.listStatus(state).exists(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (fs.exists(legacyLedger) || legacyFlat)
      throw new IllegalStateException(
        s"legacy LedgeredState layout detected at $path (" +
          (if (fs.exists(legacyLedger)) s"ledger at $legacyLedger; " else "") +
          (if (legacyFlat) s"parquet files directly under $state; " else "") +
          "expected $path/state/<part>/ + $path/state/_batches/). " +
          "Refusing to proceed: a commit would silently discard the " +
          "accumulated state. Migrate by moving the state files into a " +
          "named part dir and _batches under state/.")
  }

  /** true iff `batchId` is recorded in the COMMITTED ledger — i.e. the
    * batch's fold is fully applied (commit is all-or-nothing). */
  def absorbed(spark: SparkSession, path: String, batchId: String): Boolean = {
    val ledger = new Path(s"$path/state/_batches")
    val fs = fsOf(spark, ledger)
    recover(fs, path)
    fs.exists(ledger) &&
      spark.read.parquet(ledger.toString)
        .filter(col("batch_id") === batchId).limit(1).count() > 0
  }

  /** The committed state part as a frame, or None before first commit. */
  def readPart(spark: SparkSession, path: String, part: String): Option[DataFrame] = {
    val p = new Path(partPath(path, part))
    val fs = fsOf(spark, p)
    recover(fs, path)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Publish `parts` plus the batchId-extended ledger in one atomic
    * directory swap. Part frames may read the previous committed state;
    * they are materialized into the temp dir before anything moves. */
  def commit(spark: SparkSession, path: String, batchId: String,
             parts: Seq[(String, DataFrame)]): Unit = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    recover(fs, path)
    val state = new Path(root, "state")
    val tmp = new Path(path + ".__state_tmp")
    fs.delete(tmp, true)
    parts.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(new Path(tmp, name).toString)
    }
    import spark.implicits._
    val newRow = Seq(batchId).toDF("batch_id")
    val oldLedger = new Path(state, "_batches")
    val ledger =
      if (fs.exists(oldLedger))
        spark.read.parquet(oldLedger.toString).unionByName(newRow)
      else newRow
    ledger.coalesce(1).write.mode("overwrite")
      .parquet(new Path(tmp, "_batches").toString)
    val bak = new Path(path + ".__state_bak")
    fs.delete(bak, true)
    fs.mkdirs(root)
    MergeSink.atomicSwap(fs, tmp, state, bak)
  }
}

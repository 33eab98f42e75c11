package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, lit}

/** Snapshot VERSION CATALOG — named versions, time travel, and retention
  * over the engine's atomic-swap machinery.
  *
  * [[MergeSink]] swaps snapshots in place and keeps exactly one `_bak`
  * that the next commit deletes, so "what did the corpus look like two
  * releases ago" is unanswerable from the snapshot alone, and the q82
  * snapshot diff only works if the caller manually kept both
  * directories. Real corpus-release management wants the lakehouse
  * trio: commit a named version, read version N later (time travel),
  * and vacuum old versions under an explicit retention window. The
  * reference keeps no history either — its Mongo collection is always
  * the latest state (src/func/mongo.py:103-163); this catalog is the
  * release-management layer a 100 TB corpus build runs ON TOP of the
  * merge sink's nightly snapshots.
  *
  * Layout: `$path/v=<n>/` one immutable parquet dir per committed
  * version; `$path/_manifest/` a tiny parquet of committed version
  * numbers. THE MANIFEST IS AUTHORITATIVE: a `v=` dir absent from the
  * manifest is an uncommitted orphan (a crashed commit's residue or a
  * vacuum's half-deleted victim) — readers never see it and
  * [[vacuum]] sweeps it.
  *
  * Crash-safety (the [[LedgeredState]] discipline):
  *  - [[commit]] writes the data dir FIRST, then publishes it by
  *    swapping the manifest ([[MergeSink.atomicSwap]] — all-or-nothing).
  *    A crash before the manifest swap leaves an invisible orphan dir
  *    that the next commit of the same version number overwrites.
  *  - every entry point calls [[MergeSink.recoverSwap]] on the manifest
  *    before its exists-check: a crash BETWEEN the swap's two renames
  *    leaves no manifest while `bak` holds the committed one, and
  *    without recovery the catalog would silently report "no versions"
  *    (the silent-restart-from-empty loss the swap contract prevents).
  *  - [[vacuum]] retracts versions from the manifest FIRST (one atomic
  *    swap), then deletes their dirs: a crash between the two leaves
  *    unreadable orphan dirs (safe — merely unreclaimed space), never a
  *    manifest row pointing at deleted data.
  *
  * Scale: the manifest is O(versions) tiny rows; commit adds one dir
  * write (the snapshot the caller was materializing anyway) plus a
  * metadata swap; time travel is an ordinary pruned parquet read of one
  * version dir; vacuum is directory deletes. Nothing here scales with
  * corpus size.
  */
object VersionCatalog {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(path: String) = new Path(s"$path/_manifest")

  private def recover(fs: FileSystem, path: String): Unit =
    MergeSink.recoverSwap(fs, manifestPath(path),
      new Path(path + ".__manifest_bak"))

  /** Committed version numbers, ascending (empty before first commit). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val m = manifestPath(path)
    val fs = fsOf(spark, m)
    recover(fs, path)
    if (!fs.exists(m)) Seq.empty
    else spark.read.parquet(m.toString)
      .select(col("version")).collect().map(_.getLong(0)).toSeq.sorted
  }

  /** The newest committed version, if any. */
  def latest(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  /** Commit `df` as the next version; returns its number (1-based).
    * The data dir is written before the manifest publishes it, so a
    * crash anywhere leaves the catalog on the previous version. */
  def commit(spark: SparkSession, path: String, df: DataFrame): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    recover(fs, path)
    val next = latest(spark, path).getOrElse(0L) + 1L
    val dataDir = new Path(root, s"v=$next")
    fs.delete(dataDir, true) // a crashed prior commit's orphan
    df.write.mode("overwrite").parquet(dataDir.toString)
    publishManifest(spark, fs, path, versions(spark, path) :+ next)
    next
  }

  /** Time travel: the committed snapshot of version `n`, exactly as it
    * was written. Throws on a version the manifest does not carry
    * (never committed, or vacuumed). */
  def readVersion(spark: SparkSession, path: String, n: Long): DataFrame = {
    val vs = versions(spark, path)
    require(vs.contains(n),
      s"version $n is not in the catalog at $path (committed: ${vs.mkString(",")})")
    val dataDir = new Path(new Path(path), s"v=$n")
    // a crashed purge's swap window: dir absent, purge-bak holds the
    // pre-purge data — restore rather than failing the read
    MergeSink.recoverSwap(fsOf(spark, dataDir), dataDir,
      purgeBak(new Path(path), n))
    spark.read.parquet(dataDir.toString)
  }

  private def purgeBak(root: Path, n: Long) = new Path(root, s".purge_bak_v$n")

  /** PURGE ACROSS RETAINED VERSIONS — time travel must forget too: a
    * key purged only from the head snapshot is still readable at every
    * retained version, so a governed catalog rewrites ALL of them (the
    * reason Delta documents that DELETE alone does not satisfy GDPR
    * until VACUUM passes the retention window — this operator is the
    * eager form that keeps the history READABLE minus the keys).
    *
    * Each version rewrites atomically (write-aside + two-rename swap;
    * [[readVersion]] probes the crash window, and the temp/bak names
    * dodge the `v=` prefix so vacuum's orphan sweep never parses them).
    * Idempotent — a replayed purge rewrites identical content. Cost:
    * one pruned read + rewrite per RETAINED version — bounded by the
    * retention window, never by history length. Returns
    * (version, nPurged) per retained version. */
  def purge(spark: SparkSession, path: String, keys: DataFrame,
            key: String): Seq[(Long, Long)] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    recover(fs, path)
    // localCheckpoint: probed once per retained version
    val uniq = keys.select(col(key)).filter(col(key).isNotNull)
      .distinct().localCheckpoint(true)
    versions(spark, path).map { n =>
      val dataDir = new Path(root, s"v=$n")
      MergeSink.recoverSwap(fs, dataDir, purgeBak(root, n))
      val obsBefore = Observation()
      val obsAfter = Observation()
      val kept = spark.read.parquet(dataDir.toString)
        .observe(obsBefore, count(lit(1)).as("n"))
        .join(broadcast(uniq), Seq(key), "left_anti")
        .observe(obsAfter, count(lit(1)).as("n"))
      val tmp = new Path(root, s".purge_tmp_v$n")
      fs.delete(tmp, true)
      kept.write.mode("overwrite").parquet(tmp.toString)
      MergeSink.atomicSwap(fs, tmp, dataDir, purgeBak(root, n))
      n -> (obsBefore.get("n").asInstanceOf[Long] -
        obsAfter.get("n").asInstanceOf[Long])
    }
  }

  /** Drop every version except the newest `retainLast`, plus any orphan
    * `v=` dir the manifest does not carry (crashed commits, half-vacuumed
    * victims). Manifest retracts FIRST (atomic), dirs delete after — a
    * crash between the two only leaves unreclaimed space. Returns the
    * vacuumed version numbers. */
  def vacuum(spark: SparkSession, path: String, retainLast: Int): Seq[Long] = {
    require(retainLast >= 1, s"retainLast=$retainLast must keep at least one")
    val root = new Path(path)
    val fs = fsOf(spark, root)
    recover(fs, path)
    val vs = versions(spark, path)
    val dropped = vs.dropRight(retainLast)
    val kept = vs.takeRight(retainLast)
    if (dropped.nonEmpty) publishManifest(spark, fs, path, kept)
    dropped.foreach(n => fs.delete(new Path(root, s"v=$n"), true))
    // orphan sweep: dirs no manifest row points at
    if (fs.exists(root)) fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filterNot(kept.contains)
      .foreach(n => fs.delete(new Path(root, s"v=$n"), true))
    dropped
  }

  /** Rewrite the manifest to exactly `vs` and publish it in one atomic
    * swap (O(versions) tiny rows — metadata, never corpus-shaped). */
  private def publishManifest(spark: SparkSession, fs: FileSystem,
                              path: String, vs: Seq[Long]): Unit = {
    import spark.implicits._
    val tmp = new Path(path + ".__manifest_tmp")
    val bak = new Path(path + ".__manifest_bak")
    fs.delete(tmp, true); fs.delete(bak, true)
    vs.toDF("version").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(new Path(path))
    MergeSink.atomicSwap(fs, tmp, manifestPath(path), bak)
  }
}

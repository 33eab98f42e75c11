package graft.jobs

import org.apache.spark.sql.SparkSession
import graft.GraftSession
import graft.sinks.{ManifestMergeSink, TableGroup}

/** Nightly housekeeping for a MANIFESTED MERGE snapshot
  * ([[ManifestMergeSink]]) — the merge-table counterpart of
  * [[MaintainJob]]'s z-layout night:
  *
  *  0. BUCKET HEALTH → AUTO-REBUCKET (opt-in, `--rebucket-key`): when
  *     the snapshot's rows have outgrown its bucket count (every day
  *     then touches every bucket — per-day IO grows with corpus size,
  *     the regime SCALE.md's day-cost table pins), rebucket to
  *     [[ManifestMergeSink.bucketCountFor]]'s power-of-two target in
  *     one commit ([[ManifestMergeSink.rebucketManifested]]). Health
  *     is read from the head (one footer-scale count; the per-bucket
  *     frame is [[ManifestMergeSink.bucketHealth]]); gate: q231.
  *  1. COMPACT: collapse buckets whose file count exceeds the
  *     threshold into single-file dirs — one commit, flagged buckets
  *     only ([[ManifestMergeSink.compactManifested]]); a healthy
  *     snapshot costs ≤ nBuckets directory listings and publishes
  *     nothing.
  *  2. VACUUM: sweep generation dirs and commit files past the
  *     retention margin ([[ManifestMergeSink.vacuumManifested]]) —
  *     the margin is the time-travel / long-running-reader / CDC-lag
  *     window, so `--retain` is a policy knob, not a cleanup detail:
  *     a change-feed consumer must never lag more commits than it.
  *
  * Both steps are safe to run beside live writers: compaction loses
  * its CAS to a concurrent merge and re-derives; vacuum requires only
  * quiesced WRITERS (in-flight generation dirs look orphaned), the
  * same contract as every sweep in the engine.
  *
  * Usage: SnapshotMaintainJob <target> [--max-files N] [--retain N]
  *        [--rebucket-key COL] [--target-rows N]
  *
  * Cost model at 100 TB: the no-op night is pure metadata; a
  * degraded night rewrites exactly the fragmented buckets' bytes and
  * one commit file. */
object SnapshotMaintainJob {

  final case class SnapshotSummary(bucketsCompacted: Int,
                                   filesBefore: Long, filesAfter: Long,
                                   generationsSwept: Long,
                                   headSeq: Long,
                                   rebucketedTo: Option[Int] = None)

  final case class SnapshotConfig(maxFilesPerBucket: Int = 8,
                                  retain: Int = 2,
                                  rebucketKey: Option[String] = None,
                                  targetRowsPerBucket: Long = 4L << 20)

  object SnapshotConfig {
    def fromFlags(flags: Seq[String]): SnapshotConfig = {
      def parse(c: SnapshotConfig, fs: List[String]): SnapshotConfig =
        fs match {
          case Nil => c
          case "--max-files" :: v :: rest =>
            parse(c.copy(maxFilesPerBucket = v.toInt), rest)
          case "--retain" :: v :: rest =>
            parse(c.copy(retain = v.toInt), rest)
          case "--rebucket-key" :: v :: rest =>
            parse(c.copy(rebucketKey = Some(v)), rest)
          case "--target-rows" :: v :: rest =>
            parse(c.copy(targetRowsPerBucket = v.toLong), rest)
          case f :: _ => throw new IllegalArgumentException(
            s"unknown flag '$f' (known: --max-files, --retain, " +
              "--rebucket-key, --target-rows)")
        }
      parse(SnapshotConfig(), flags.toList)
    }
  }

  def run(spark: SparkSession, target: String,
          cfg: SnapshotConfig = SnapshotConfig()): SnapshotSummary = {
    // 0. BUCKET HEALTH → AUTO-REBUCKET (opt-in via --rebucket-key): a
    //    snapshot whose key count has outgrown its bucket count pays
    //    the day-cost regime the scaling curve pins (every day touches
    //    every bucket, so per-day IO grows with CORPUS size instead of
    //    day size — SCALE.md). The night detects it from the head (one
    //    footer-scale count) and fires rebucketManifested BEFORE
    //    compaction, so the rewrite lands once: the rebucket leaves
    //    near-single-file buckets and the compact pass below sees a
    //    healthy layout. Sizing: [[ManifestMergeSink.bucketCountFor]]
    //    (power-of-two, grow-only); a healthy snapshot publishes
    //    nothing here.
    val rebucketedTo: Option[Int] = cfg.rebucketKey.flatMap { key =>
      val (_, st) = ManifestMergeSink.headState(spark, target).getOrElse(
        throw new IllegalArgumentException(
          s"no committed manifest snapshot at $target"))
      val rows = ManifestMergeSink.readManifested(spark, target).count()
      val want = ManifestMergeSink.bucketCountFor(rows,
        cfg.targetRowsPerBucket)
      if (want > st.nBuckets) {
        ManifestMergeSink.rebucketManifested(spark, target, key, want)
        Some(want)
      } else None
    }
    val c = ManifestMergeSink.compactManifested(spark, target,
      maxFilesPerBucket = cfg.maxFilesPerBucket)
    val (head, _) = ManifestMergeSink.headState(spark, target).get
    // a TABLE-GROUP member's retention floor overrides --retain: a
    // published group view pins child seqs, and sweeping one turns
    // every readPinned of this table into a read-time failure — the
    // group's pins are a RETENTION LEASE, not advice. Vacuum the
    // group ROOT first (same --retain margin): without it the floor
    // spans every publish in history and member retention degrades to
    // retain-everything.
    TableGroup.groupRootOf(spark, target)
      .foreach(root => TableGroup.vacuumGroup(spark, root, cfg.retain))
    val retain = TableGroup.pinnedFloor(spark, target) match {
      case Some(floor) => math.max(cfg.retain.toLong, head - floor + 1L)
        .min(Int.MaxValue.toLong).toInt
      case None => cfg.retain
    }
    val swept = ManifestMergeSink.vacuumManifested(spark, target,
      retainCommits = retain)
    SnapshotSummary(c.nCompacted, c.filesBefore, c.filesAfter,
      swept.size.toLong, head, rebucketedTo)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println(
        "usage: SnapshotMaintainJob <target> [--max-files N] [--retain N]" +
          " [--rebucket-key COL] [--target-rows N]")
      sys.exit(2)
    }
    val cfg = SnapshotConfig.fromFlags(args.drop(1).toSeq)
    val spark = GraftSession.builder().getOrCreate()
    try {
      val s = run(spark, args(0), cfg)
      // one JSON status line — the structured-logging discipline
      // (reference: src/func/log.py:15-41's local analog)
      println(s"""{"job":"snapshot_maintain","buckets_compacted":${s.bucketsCompacted},""" +
        s""""files_before":${s.filesBefore},"files_after":${s.filesAfter},""" +
        s""""generations_swept":${s.generationsSwept},"head_seq":${s.headSeq},""" +
        s""""rebucketed_to":${s.rebucketedTo.getOrElse(0)}}""")
    } finally spark.stop()
  }
}

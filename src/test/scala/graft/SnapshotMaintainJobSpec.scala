package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.jobs.SnapshotMaintainJob
import graft.sinks.{CommitLog, ManifestMergeSink}

/** The manifested-merge night: a degraded snapshot heals (flagged
  * buckets compacted, superseded generations swept), a healthy night
  * is free (no commit), and the retention knob governs both vacuum
  * and the surviving time-travel window. */
class SnapshotMaintainJobSpec extends SparkSpec {
  import spark.implicits._

  test("degraded night heals; healthy night is a free no-op; retention holds") {
    val base = java.nio.file.Files.createTempDirectory("graft_smj_")
    val fs = new Path(base.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val m = s"$base/snap"
      val rows = (1L to 300L).map(i => (i, s"v$i")).toDF("id", "payload")
      // distributeByBucket=false: legacy fan-out so the night has
      // multi-file buckets to heal (the merge now writes one file per
      // bucket by default)
      Sparks.withConf(spark,
        "spark.sql.adaptive.coalescePartitions.enabled", "false") {
        ManifestMergeSink.mergeIntoManifested(spark, m, rows, "id",
          Seq("payload"), nBuckets = 4, distributeByBucket = false)
        ManifestMergeSink.mergeIntoManifested(spark, m,
          rows.filter(col("id") % 3 === 0L), "id", Seq("payload"),
          nBuckets = 4, distributeByBucket = false)
      }
      val night1 = SnapshotMaintainJob.run(spark, m,
        SnapshotMaintainJob.SnapshotConfig(maxFilesPerBucket = 1))
      assert(night1.bucketsCompacted > 0 &&
        night1.filesAfter < night1.filesBefore, s"$night1")
      assert(night1.generationsSwept > 0,
        "superseded generations past the margin must sweep")
      assert(ManifestMergeSink.readManifested(spark, m).count() == 300L)
      // the retention margin survives the night: last 2 commits readable
      val seqs = ManifestMergeSink.commitSeqs(spark, m)
      assert(seqs.size == 2, s"retain=2 must keep 2 commits, got $seqs")
      seqs.foreach(s => assert(
        ManifestMergeSink.readManifestedAt(spark, m, s).count() == 300L))
      // a healthy night: zero work, zero commits
      val commits = CommitLog.seqs(fs, new Path(m)).size
      val night2 = SnapshotMaintainJob.run(spark, m,
        SnapshotMaintainJob.SnapshotConfig(maxFilesPerBucket = 1))
      assert(night2.bucketsCompacted == 0 && night2.generationsSwept == 0,
        s"$night2")
      assert(CommitLog.seqs(fs, new Path(m)).size == commits,
        "a healthy night must not publish")
      // flag parsing round-trips
      val cfg = SnapshotMaintainJob.SnapshotConfig.fromFlags(
        Seq("--max-files", "3", "--retain", "5"))
      assert(cfg.maxFilesPerBucket == 3 && cfg.retain == 5)
      intercept[IllegalArgumentException] {
        SnapshotMaintainJob.SnapshotConfig.fromFlags(Seq("--nope"))
      }
    } finally fs.delete(new Path(base.toString), true)
  }

  test("bucket health: an under-bucketed snapshot rebuckets once, then rests") {
    val base = java.nio.file.Files.createTempDirectory("graft_smj_rb_")
    val fs = new Path(base.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val m = s"$base/snap"
      val rows = (1L to 300L).map(i => (i, s"v$i")).toDF("id", "payload")
      ManifestMergeSink.mergeIntoManifested(spark, m, rows, "id",
        Seq("payload"), nBuckets = 2) // deliberately under-bucketed
      // without --rebucket-key the night never touches bucket count
      val off = SnapshotMaintainJob.run(spark, m)
      assert(off.rebucketedTo.isEmpty &&
        ManifestMergeSink.headState(spark, m).get._2.nBuckets == 2)
      // night 1 with the monitor on: detected and rebucketed to the
      // power-of-two target (300 rows / 40 target -> 8 buckets)
      val cfg = SnapshotMaintainJob.SnapshotConfig(
        rebucketKey = Some("id"), targetRowsPerBucket = 40L)
      val night1 = SnapshotMaintainJob.run(spark, m, cfg)
      assert(night1.rebucketedTo.contains(8), s"$night1")
      assert(ManifestMergeSink.headState(spark, m).get._2.nBuckets == 8)
      assert(ManifestMergeSink.readManifested(spark, m).count() == 300L,
        "rebucketing must be content-neutral")
      // the health frame agrees with the new layout
      val health = ManifestMergeSink.bucketHealth(spark, m)
      assert(health.agg(sum(col("rows"))).head().getLong(0) == 300L)
      assert(health.count() <= 8 && health.count() > 0)
      // night 2: healthy — no rebucket, no publish
      val commits = CommitLog.seqs(fs, new Path(m)).size
      val night2 = SnapshotMaintainJob.run(spark, m, cfg)
      assert(night2.rebucketedTo.isEmpty && night2.bucketsCompacted == 0)
      assert(CommitLog.seqs(fs, new Path(m)).size == commits,
        "a healthy night must not publish")
      // grow-only: a tiny target never SHRINKS an over-bucketed snapshot
      val shrinkCfg = SnapshotMaintainJob.SnapshotConfig(
        rebucketKey = Some("id"), targetRowsPerBucket = 1000L)
      assert(SnapshotMaintainJob.run(spark, m, shrinkCfg).rebucketedTo.isEmpty)
      assert(ManifestMergeSink.headState(spark, m).get._2.nBuckets == 8)
      // a post-rebucket merge with the STALE constant resolves the
      // head's count and keeps working — the auto-rebucket night must be
      // transparent to constant-configured day pipelines (nBuckets is
      // first-commit sizing only)
      ManifestMergeSink.mergeIntoManifested(spark, m, rows.limit(1),
        "id", Seq("payload"), nBuckets = 2)
      assert(ManifestMergeSink.headState(spark, m).get._2.nBuckets == 8,
        "a stale-config merge must not change the bucket count")
      // sizing policy corners
      assert(ManifestMergeSink.bucketCountFor(0L, 100L) == 1)
      assert(ManifestMergeSink.bucketCountFor(100L, 100L) == 1)
      assert(ManifestMergeSink.bucketCountFor(101L, 100L) == 2)
      assert(ManifestMergeSink.bucketCountFor(500L, 32L) == 16)
      // flag parsing
      val f = SnapshotMaintainJob.SnapshotConfig.fromFlags(
        Seq("--rebucket-key", "doc_id", "--target-rows", "123"))
      assert(f.rebucketKey.contains("doc_id") && f.targetRowsPerBucket == 123L)
    } finally fs.delete(new Path(base.toString), true)
  }

  test("a table-group member's night honors the published pins (retention lease)") {
    import graft.sinks.TableGroup
    val base = java.nio.file.Files.createTempDirectory("graft_smj_tg_")
    val fs = new Path(base.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val root = s"$base/group"
      val t = TableGroup.tablePath(root, "a")
      ManifestMergeSink.mergeIntoManifested(spark, t,
        (1L to 30L).map(i => (i, "v1")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4)
      val pinned = ManifestMergeSink.headState(spark, t).get._1
      TableGroup.publishPins(spark, root, Map("a" -> pinned))
      // the table advances twice without a new group publish...
      (2 to 3).foreach(i => ManifestMergeSink.mergeIntoManifested(spark, t,
        (1L to 30L).map(j => (j, s"v$i")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4))
      // ...and an aggressive nightly retain=1 must STILL keep the
      // pinned child seq readable — the root pins are a lease
      SnapshotMaintainJob.run(spark, t,
        SnapshotMaintainJob.SnapshotConfig(retain = 1))
      val viaGroup = TableGroup.readPinned(spark, root, "a")
      assert(viaGroup.select("payload").distinct()
        .as[String].collect().toSeq == Seq("v1"),
        "the published group view must survive the member's vacuum")
      assert(ManifestMergeSink.commitSeqs(spark, t).contains(pinned))
    } finally fs.delete(new Path(base.toString), true)
  }
}

package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.jobs.MaintainJob
import graft.operators.Sharding
import graft.sinks.VersionCatalog

/** The nightly maintenance composition: compact → measure → targeted
  * optimize → version+vacuum, each stage individually gated elsewhere
  * (q80/q164/q165/q166) — this pins the COMPOSITION: a degraded layout
  * heals, a healthy layout costs a metadata read, retention holds, and
  * a re-run is idempotent. */
class MaintainJobSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(base: java.nio.file.Path) =
    new Path(base.toString).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** q165's degraded fixture: 8 clustered z-files over a 256×256 bucket
    * grid + one appended unclustered low-z file, written fragmented
    * (several files per dir) so compaction has work too. */
  private def writeDegraded(path: String): Unit = {
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a * 4, b * 4))
      .toDF("qb", "lb")
      .withColumn("zkey", Sharding.zOrderKey(col("qb"), col("lb"), 8))
      .withColumn("file_id", expr(s"zkey * 8 div ${1L << 16}"))
    grid.repartition(6) // fragment: several small files per partition dir
      .write.mode("overwrite").partitionBy("file_id").parquet(path)
    val appended = (for (a <- 0L until 16L; b <- 0L until 16L) yield (a * 4 + 1, b * 4 + 1))
      .toDF("qb", "lb")
      .withColumn("zkey", Sharding.zOrderKey(col("qb"), col("lb"), 8))
      .filter(col("zkey") < (1L << 14))
      .withColumn("file_id", lit(8L))
    appended.repartition(col("file_id"))
      .write.mode("append").partitionBy("file_id").parquet(path)
  }

  test("a degraded layout heals: compaction + targeted optimize + versioning") {
    val base = java.nio.file.Files.createTempDirectory("graft_maintain_")
    try {
      val layout = s"$base/layout"
      val catalog = s"$base/catalog"
      writeDegraded(layout)
      val rows = spark.read.parquet(layout).count()
      val s = MaintainJob.run(spark, layout, catalog,
        MaintainJob.MaintainConfig(targetBytes = 1L << 20, retain = 3))
      assert(s.dirsCompacted > 0, "fragmented dirs must compact")
      assert(s.filesAfter < s.filesBefore)
      assert(s.overlapBefore > 0 && s.overlapAfter == 0,
        s"optimize must restore disjoint ranges: $s")
      assert(s.filesRewritten > 0 && s.filesRewritten < 9,
        s"optimize must rewrite a strict subset: $s")
      assert(s.version == 1L && s.vacuumed.isEmpty)
      // no rows lost through the whole pass, and the version snapshot
      // equals the maintained layout
      assert(spark.read.parquet(layout).count() == rows)
      val v1 = VersionCatalog.readVersion(spark, catalog, 1L)
      assert(v1.count() == rows)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("a commit-log layout is AUTO-DETECTED: the manifested night runs with no flag") {
    val base = java.nio.file.Files.createTempDirectory("graft_maint_mani_")
    try {
      val layout = s"$base/layout"
      val catalog = s"$base/catalog"
      // the degraded fixture through the manifest write path
      val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a * 4, b * 4))
        .toDF("qb", "lb")
        .withColumn("zkey", Sharding.zOrderKey(col("qb"), col("lb"), 8))
        .withColumn("file_id", expr(s"zkey * 8 div ${1L << 16}"))
      Sharding.zWriteManifested(spark, layout, grid, append = false)
      val appended = (for (a <- 0L until 16L; b <- 0L until 16L)
          yield (a * 4 + 1, b * 4 + 1))
        .toDF("qb", "lb")
        .withColumn("zkey", Sharding.zOrderKey(col("qb"), col("lb"), 8))
        .filter(col("zkey") < (1L << 14))
        .withColumn("file_id", lit(8L))
      Sharding.zWriteManifested(spark, layout, appended, append = true)
      val rows = Sharding.zReadManifested(spark, layout).count()
      val s = MaintainJob.run(spark, layout, catalog,
        MaintainJob.MaintainConfig(statsCols = Seq("zkey"), retain = 3))
      assert(s.dirsCompacted == 0L, "manifested mode has no standalone compaction")
      assert(s.overlapBefore > 0 && s.overlapAfter == 0,
        s"manifested optimize must restore disjoint ranges: $s")
      assert(s.filesRewritten > 0 && s.filesRewritten < 9)
      assert(s.statsRefreshed, "zone-map manifest must refresh after a rewrite")
      // reader-retention margin: the previous head's generations survive
      // the first post-optimize sweep (a reader mid-scan must finish)
      assert(s.generationsSwept == 0L, s"margin must hold on night 1: $s")
      assert(s.version == 1L && s.vacuumed.isEmpty)
      assert(Sharding.zReadManifested(spark, layout).count() == rows)
      assert(VersionCatalog.readVersion(spark, catalog, 1L).count() == rows)
      // the manifested skipping scan consumes the refreshed zone maps:
      // a low-z window must open a strict subset of cells, rows exact
      val scan = Sharding.skippingScanManifested(spark, layout, "zkey",
        lit(0L), lit((1L << 13) - 1))
      assert(scan.filesRead > 0 && scan.filesRead < scan.filesTotal,
        s"zone maps must prune cells: $scan")
      val want = Sharding.zReadManifested(spark, layout)
        .filter(col("zkey") < (1L << 13)).count()
      assert(scan.rows.count() == want)
      // a second night is a no-op on a healthy layout — but it DOES
      // reclaim a crashed writer's orphan generation (unreferenced by
      // any commit, so the retention margin never applies to it)
      grid.limit(1).write.parquet(s"$layout/g-crashed0/file_id=0")
      val s2 = MaintainJob.run(spark, layout, catalog,
        MaintainJob.MaintainConfig(manifested = Some(true),
          statsCols = Seq("zkey"), retain = 3))
      assert(s2.overlapBefore == 0 && s2.filesRewritten == 0 &&
        !s2.statsRefreshed)
      assert(s2.generationsSwept == 1L,
        s"the orphan generation must be reclaimed: $s2")
      assert(Sharding.zReadManifested(spark, layout).count() == rows)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("a healthy layout is a no-op night; retention vacuums old versions") {
    val base = java.nio.file.Files.createTempDirectory("graft_maintain2_")
    try {
      val layout = s"$base/layout"
      val catalog = s"$base/catalog"
      writeDegraded(layout)
      val cfg = MaintainJob.MaintainConfig(targetBytes = 1L << 20, retain = 2)
      MaintainJob.run(spark, layout, catalog, cfg)
      // night 2: already healthy — nothing compacts, nothing rewrites
      val s2 = MaintainJob.run(spark, layout, catalog, cfg)
      assert(s2.dirsCompacted == 0 && s2.filesRewritten == 0 &&
        s2.overlapBefore == 0 && s2.overlapAfter == 0,
        s"healthy night must be a metadata read: $s2")
      assert(s2.version == 2L && s2.vacuumed.isEmpty)
      // night 3: retention window (2) pushes v1 out
      val s3 = MaintainJob.run(spark, layout, catalog, cfg)
      assert(s3.version == 3L && s3.vacuumed == Seq(1L), s"retention: $s3")
      assert(VersionCatalog.versions(spark, catalog) == Seq(2L, 3L))
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("flag parsing is strict and complete") {
    val c = MaintainJob.MaintainConfig.fromFlags(Seq(
      "--target-bytes", "1024", "--max-overlap", "2", "--retain", "5",
      "--n-files", "16", "--z-space", "1048576", "--stats-cols", "qb,lb"))
    assert(c == MaintainJob.MaintainConfig(1024L, 2L, 5, 16, 1048576L,
      Seq("qb", "lb")))
    intercept[IllegalArgumentException] {
      MaintainJob.MaintainConfig.fromFlags(Seq("--bogus"))
    }
  }

  test("the zone-map manifest follows rewrites and rests on healthy nights") {
    val base = java.nio.file.Files.createTempDirectory("graft_maintain3_")
    try {
      val layout = s"$base/layout"
      val catalog = s"$base/catalog"
      writeDegraded(layout)
      val cfg = MaintainJob.MaintainConfig(targetBytes = 1L << 20, retain = 3,
        statsCols = Seq("zkey"))
      // night 1: the pass rewrites files AND (first contact) writes _stats
      val s1 = MaintainJob.run(spark, layout, catalog, cfg)
      assert(s1.statsRefreshed, s"first night must build the manifest: $s1")
      // the refreshed manifest prunes correctly on the POST-optimize layout:
      // a skipping scan over it loses no row vs the brute-force filter
      val scan = Sharding.skippingScan(spark, layout, "zkey",
        lit(0L), lit((1L << 13) - 1))
      assert(scan.filesRead < scan.filesTotal, s"zone maps must prune: $scan")
      val brute = spark.read.parquet(layout)
        .filter(col("zkey") < (1L << 13)).select(col("zkey"))
      val got = scan.rows.select(col("zkey"))
      assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
      // night 2: healthy — manifest untouched (metadata-only night)
      val fs = fsOf(base)
      val statsFile = fs.globStatus(new Path(s"$layout/_stats/part-*.parquet"))(0)
      val s2 = MaintainJob.run(spark, layout, catalog, cfg)
      assert(!s2.statsRefreshed, s"healthy night must not rewrite stats: $s2")
      val statsFile2 = fs.globStatus(new Path(s"$layout/_stats/part-*.parquet"))(0)
      assert(statsFile.getPath == statsFile2.getPath &&
        statsFile.getModificationTime == statsFile2.getModificationTime,
        "manifest file must be byte-level untouched on a healthy night")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("--legacy-renames on a commit-log layout is refused loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft_maint_guard_")
    try {
      val layout = s"$base/layout"
      val grid = (for (a <- 0L until 8L; b <- 0L until 8L) yield (a, b))
        .toDF("qb", "lb")
        .withColumn("zkey", Sharding.zOrderKey(col("qb"), col("lb"), 8))
        .withColumn("file_id", expr(s"zkey * 4 div ${1L << 16}"))
      Sharding.zWriteManifested(spark, layout, grid, append = false)
      // a legacy night over a manifested layout would read every
      // generation dir raw and rewrite files the manifest pins —
      // the guard refuses before any work (CurateJob's --legacy-dirs
      // guard, mirrored)
      val e = intercept[IllegalArgumentException] {
        MaintainJob.run(spark, layout, s"$base/catalog",
          MaintainJob.MaintainConfig(manifested = Some(false)))
      }
      assert(e.getMessage.contains("commit log"), e.getMessage)
      assert(Sharding.zReadManifested(spark, layout).count() == 64L,
        "the refused night must not have touched the layout")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }
}

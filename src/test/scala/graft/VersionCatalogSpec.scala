package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sinks.VersionCatalog

/** Version-catalog lifecycle + crash windows (the LedgeredStateSpec
  * discipline applied to the manifest): commit/read round-trips, the
  * swap's between-renames window, orphan sweep, vacuumed-read refusal. */
class VersionCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(base: java.nio.file.Path) =
    new Path(base.toString).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def frame(n: Int) =
    (1 to n).map(i => (i.toLong, s"row$i")).toDF("id", "payload")

  test("commit assigns 1-based versions and time travel returns exact rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_vcat_")
    try {
      val cat = s"$base/c"
      assert(VersionCatalog.versions(spark, cat).isEmpty)
      assert(VersionCatalog.commit(spark, cat, frame(3)) == 1L)
      assert(VersionCatalog.commit(spark, cat, frame(5)) == 2L)
      assert(VersionCatalog.commit(spark, cat, frame(2)) == 3L)
      assert(VersionCatalog.versions(spark, cat) == Seq(1L, 2L, 3L))
      assert(VersionCatalog.latest(spark, cat).contains(3L))
      // v2 row-equal to what was committed, long after v3 replaced it
      val got = VersionCatalog.readVersion(spark, cat, 2L)
      assert(got.exceptAll(frame(5)).isEmpty && frame(5).exceptAll(got).isEmpty)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("manifest swap crash window recovers: bak restores on next entry") {
    val base = java.nio.file.Files.createTempDirectory("graft_vcat_crash_")
    try {
      val cat = s"$base/c"
      VersionCatalog.commit(spark, cat, frame(3))
      VersionCatalog.commit(spark, cat, frame(4))
      // simulate a crash BETWEEN atomicSwap's two renames: manifest moved
      // aside to bak, replacement never moved in
      val fs = fsOf(base)
      assert(fs.rename(new Path(s"$cat/_manifest"), new Path(cat + ".__manifest_bak")))
      // without recovery this would report "no versions" — the silent
      // restart-from-empty loss the swap contract prevents
      assert(VersionCatalog.versions(spark, cat) == Seq(1L, 2L))
      val got = VersionCatalog.readVersion(spark, cat, 2L)
      assert(got.exceptAll(frame(4)).isEmpty && frame(4).exceptAll(got).isEmpty)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("vacuum retracts the manifest, deletes dirs, and refuses vacuumed reads") {
    val base = java.nio.file.Files.createTempDirectory("graft_vcat_vac_")
    try {
      val cat = s"$base/c"
      (1 to 4).foreach(i => VersionCatalog.commit(spark, cat, frame(i)))
      assert(VersionCatalog.vacuum(spark, cat, retainLast = 2) == Seq(1L, 2L))
      assert(VersionCatalog.versions(spark, cat) == Seq(3L, 4L))
      val fs = fsOf(base)
      assert(!fs.exists(new Path(s"$cat/v=1")) && !fs.exists(new Path(s"$cat/v=2")),
        "vacuumed dirs must be deleted")
      assert(fs.exists(new Path(s"$cat/v=3")) && fs.exists(new Path(s"$cat/v=4")))
      intercept[IllegalArgumentException] {
        VersionCatalog.readVersion(spark, cat, 1L)
      }
      // idempotent: nothing left to drop
      assert(VersionCatalog.vacuum(spark, cat, retainLast = 2).isEmpty)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("orphan data dirs (crashed commit residue) are invisible and swept") {
    val base = java.nio.file.Files.createTempDirectory("graft_vcat_orph_")
    try {
      val cat = s"$base/c"
      VersionCatalog.commit(spark, cat, frame(3))
      // a crashed commit: data dir written, manifest never published
      frame(9).write.parquet(s"$cat/v=2")
      assert(VersionCatalog.versions(spark, cat) == Seq(1L),
        "manifest is authoritative — orphan must be invisible")
      intercept[IllegalArgumentException] {
        VersionCatalog.readVersion(spark, cat, 2L)
      }
      // the next commit of version 2 overwrites the orphan cleanly
      assert(VersionCatalog.commit(spark, cat, frame(4)) == 2L)
      val got = VersionCatalog.readVersion(spark, cat, 2L)
      assert(got.exceptAll(frame(4)).isEmpty && frame(4).exceptAll(got).isEmpty)
      // and vacuum sweeps any orphan a crash left behind
      frame(7).write.parquet(s"$cat/v=99")
      VersionCatalog.vacuum(spark, cat, retainLast = 2)
      assert(!fsOf(base).exists(new Path(s"$cat/v=99")), "orphan swept")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("catalog purge forgets in every retained version; replay no-ops; crash window recovers") {
    val base = java.nio.file.Files.createTempDirectory("graft_vcat_purge_")
    try {
      val cat = s"$base/c"
      def f(ids: Long*) = ids.map(i => (i, s"p$i")).toDF("id", "payload")
      VersionCatalog.commit(spark, cat, f(1L, 2L, 3L))
      VersionCatalog.commit(spark, cat, f(1L, 2L, 3L, 4L))
      val purged = VersionCatalog.purge(spark, cat, Seq(2L).toDF("id"), "id")
      assert(purged == Seq(1L -> 1L, 2L -> 1L), s"per-version counts: $purged")
      def ids(v: Long) = VersionCatalog.readVersion(spark, cat, v)
        .select($"id").as[Long].collect().toSet
      assert(ids(1L) == Set(1L, 3L) && ids(2L) == Set(1L, 3L, 4L))
      // a replayed purge is idempotent: zero rows purged, content stable
      val again = VersionCatalog.purge(spark, cat, Seq(2L).toDF("id"), "id")
      assert(again == Seq(1L -> 0L, 2L -> 0L), s"replay counts: $again")
      // crash window: dir swapped aside, bak holds the data — the next
      // read must restore instead of failing
      val fs = fsOf(base)
      assert(fs.rename(new Path(s"$cat/v=2"), new Path(s"$cat/.purge_bak_v2")))
      assert(ids(2L) == Set(1L, 3L, 4L), "read must recover the swap window")
      assert(fs.exists(new Path(s"$cat/v=2")))
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("change feed: last step wins, remove-then-re-add survives, vacuumed base refuses") {
    import graft.operators.MergeQueries
    val base = java.nio.file.Files.createTempDirectory("graft_vcat_feed_")
    try {
      val cat = s"$base/c"
      def f(rows: (Long, String)*) = rows.toDF("id", "payload")
      // v1: {1,2,3}; v2: 1 edited, 2 removed; v3: 2 RE-ADDED with a new
      // value, 3 edited then this edit survives as the last step
      VersionCatalog.commit(spark, cat, f(1L -> "a", 2L -> "b", 3L -> "c"))
      VersionCatalog.commit(spark, cat, f(1L -> "a2", 3L -> "c"))
      VersionCatalog.commit(spark, cat,
        f(1L -> "a2", 2L -> "b3", 3L -> "c3"))
      val feed = MergeQueries.catalogChanges(spark, cat, 1L, "id", Seq("payload"))
      val got = feed.select("version", "id", "status", "payload")
        .as[(Long, Long, String, String)].collect().toSet
      assert(got == Set((2L, 1L, "changed", "a2"), (2L, 2L, "removed", "b"),
        (3L, 2L, "added", "b3"), (3L, 3L, "changed", "c3")), s"feed: $got")
      // replay from the v1 cursor reconstructs v3 exactly — key 2's
      // remove-then-re-add resolves to the LAST step's value
      val replayed = MergeQueries.applyChangeFeed(
        VersionCatalog.readVersion(spark, cat, 1L), feed, "id", Seq("payload"))
      val v3 = VersionCatalog.readVersion(spark, cat, 3L)
      assert(replayed.exceptAll(v3).isEmpty && v3.exceptAll(replayed).isEmpty)
      // a consumer whose cursor predates retention fails LOUDLY: step
      // v1→v2 needs v1, and vacuum dropped it
      VersionCatalog.vacuum(spark, cat, retainLast = 2)
      intercept[IllegalArgumentException] {
        MergeQueries.catalogChanges(spark, cat, 1L, "id", Seq("payload"))
      }
      // ... while a cursor inside retention still reads its steps
      val tail = MergeQueries.catalogChanges(spark, cat, 2L, "id", Seq("payload"))
      assert(tail.select(col("version")).distinct().as[Long].collect().toSeq == Seq(3L))
    } finally fsOf(base).delete(new Path(base.toString), true)
  }
}

package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sinks.{CommitLog, VersionCatalog}

/** Version-catalog lifecycle + crash windows + WRITER CONTENTION (the
  * LedgeredStateSpec discipline applied to the commit log):
  * commit/read round-trips, truncated-commit residue recovery, orphan
  * sweep, vacuumed-read refusal, and the optimistic-concurrency
  * contract — interleaved writers produce exactly one loser, a loud
  * retryable conflict, and no lost updates. */
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

  test("interleaved writers: stale CAS fails loudly, no lost update, loser retries") {
    val base = java.nio.file.Files.createTempDirectory("graft_vcat_cas_")
    try {
      val cat = s"$base/c"
      VersionCatalog.commit(spark, cat, frame(2))
      // writer A reads the head...
      val (headA, _) = VersionCatalog.headState(spark, cat)
      // ...writer B commits v2 in between...
      assert(VersionCatalog.commitCas(spark, cat, frame(5), headA) == 2L)
      // ...A's CAS on the stale head MUST lose, loudly and retryably
      intercept[CommitLog.CommitConflictException] {
        VersionCatalog.commitCas(spark, cat, frame(7), headA)
      }
      // B's commit was NOT overwritten (no lost update)
      val v2 = VersionCatalog.readVersion(spark, cat, 2L)
      assert(v2.exceptAll(frame(5)).isEmpty && frame(5).exceptAll(v2).isEmpty)
      // the losing writer's data dir was tidied — only committed dirs live
      val dirs = fsOf(base).listStatus(new Path(cat))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("d-"))
      assert(dirs.length == 2, s"expected 2 live dirs, saw ${dirs.length}")
      // A retries against the NEW head and lands as v3; B's v2 intact
      val (headA2, _) = VersionCatalog.headState(spark, cat)
      assert(VersionCatalog.commitCas(spark, cat, frame(7), headA2) == 3L)
      assert(VersionCatalog.versions(spark, cat) == Seq(1L, 2L, 3L))
      val v3 = VersionCatalog.readVersion(spark, cat, 3L)
      assert(v3.exceptAll(frame(7)).isEmpty && frame(7).exceptAll(v3).isEmpty)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("truncated head commit file (crash mid-write) is skipped and reclaimed") {
    val base = java.nio.file.Files.createTempDirectory("graft_vcat_crash_")
    try {
      val cat = s"$base/c"
      VersionCatalog.commit(spark, cat, frame(3))
      VersionCatalog.commit(spark, cat, frame(4))
      // simulate a writer that crashed mid-write of commit 3: the file
      // exists but the END sentinel never landed
      val fs = fsOf(base)
      val residue = new Path(s"$cat/_commits/${"%020d".format(3)}")
      val out = fs.create(residue, false)
      out.write("graft-catalog-v1\n1\td-trunc".getBytes("UTF-8"))
      out.close()
      // age it past the reclaim grace (fresh invalid residue reads as an
      // in-flight writer and conflicts instead — CommitLogSpec pins that)
      fs.setTimes(residue, System.currentTimeMillis() - 120000L, -1L)
      // readers fall back past the residue — state is still commit 2
      assert(VersionCatalog.versions(spark, cat) == Seq(1L, 2L))
      val got = VersionCatalog.readVersion(spark, cat, 2L)
      assert(got.exceptAll(frame(4)).isEmpty && frame(4).exceptAll(got).isEmpty)
      // the next writer reclaims the slot (crashed writers never
      // returned success, so nothing references the residue)
      assert(VersionCatalog.commit(spark, cat, frame(6)) == 3L)
      assert(VersionCatalog.versions(spark, cat) == Seq(1L, 2L, 3L))
      val v3 = VersionCatalog.readVersion(spark, cat, 3L)
      assert(v3.exceptAll(frame(6)).isEmpty && frame(6).exceptAll(v3).isEmpty)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("vacuum retracts versions in one commit, deletes dirs, refuses vacuumed reads") {
    val base = java.nio.file.Files.createTempDirectory("graft_vcat_vac_")
    try {
      val cat = s"$base/c"
      (1 to 4).foreach(i => VersionCatalog.commit(spark, cat, frame(i)))
      assert(VersionCatalog.vacuum(spark, cat, retainLast = 2) == Seq(1L, 2L))
      assert(VersionCatalog.versions(spark, cat) == Seq(3L, 4L))
      val fs = fsOf(base)
      val dirs = fs.listStatus(new Path(cat))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("d-"))
      assert(dirs.length == 2, "vacuumed data dirs must be deleted")
      intercept[IllegalArgumentException] {
        VersionCatalog.readVersion(spark, cat, 1L)
      }
      // idempotent: nothing left to drop
      assert(VersionCatalog.vacuum(spark, cat, retainLast = 2).isEmpty)
      // retained versions still read exactly
      val got = VersionCatalog.readVersion(spark, cat, 4L)
      assert(got.exceptAll(frame(4)).isEmpty && frame(4).exceptAll(got).isEmpty)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("orphan data dirs (crashed commit residue) are invisible and swept") {
    val base = java.nio.file.Files.createTempDirectory("graft_vcat_orph_")
    try {
      val cat = s"$base/c"
      VersionCatalog.commit(spark, cat, frame(3))
      // a crashed commit: data dir written, commit file never published
      frame(9).write.parquet(s"$cat/d-orphaned1")
      assert(VersionCatalog.versions(spark, cat) == Seq(1L),
        "head commit is authoritative — orphan must be invisible")
      intercept[IllegalArgumentException] {
        VersionCatalog.readVersion(spark, cat, 2L)
      }
      // subsequent commits are unaffected by the orphan
      assert(VersionCatalog.commit(spark, cat, frame(4)) == 2L)
      val got = VersionCatalog.readVersion(spark, cat, 2L)
      assert(got.exceptAll(frame(4)).isEmpty && frame(4).exceptAll(got).isEmpty)
      // and vacuum sweeps orphans even when no version is dropped
      VersionCatalog.vacuum(spark, cat, retainLast = 5)
      assert(!fsOf(base).exists(new Path(s"$cat/d-orphaned1")), "orphan swept")
      assert(VersionCatalog.versions(spark, cat) == Seq(1L, 2L))
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("catalog purge forgets in every retained version; replay no-ops; history stays consistent") {
    val base = java.nio.file.Files.createTempDirectory("graft_vcat_purge_")
    try {
      val cat = s"$base/c"
      def f(ids: Long*) = ids.map(i => (i, s"p$i")).toDF("id", "payload")
      // purging an EMPTY catalog is a no-op, not a first (empty) commit
      assert(VersionCatalog.purge(spark, cat, Seq(2L).toDF("id"), "id").isEmpty)
      assert(VersionCatalog.versions(spark, cat).isEmpty,
        "an empty-catalog purge must not publish any commit")
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
      // copy-on-write left no stale dirs behind: one live dir per version
      val dirs = fsOf(base).listStatus(new Path(cat))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("d-"))
      assert(dirs.length == 2, s"expected 2 live dirs, saw ${dirs.length}")
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

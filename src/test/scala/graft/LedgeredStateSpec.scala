package graft

import org.apache.spark.sql.functions._
import graft.sinks.LedgeredState

/** The atomic-commit contract the five ledgered ingests (vocab, report,
  * DSIR, moments, graph) lean on: a batch's state parts and its ledger
  * row become visible together or not at all — there is no window where
  * the fold is applied but unrecorded (the replay-double-count hazard
  * the per-part swap + separate ledger append used to have). */
class LedgeredStateSpec extends SparkSpec {
  import spark.implicits._

  test("commit publishes all parts + the ledger row in one swap") {
    val base = java.nio.file.Files.createTempDirectory("graft_ls_spec_")
    try {
      val path = s"$base/st"
      assert(!LedgeredState.absorbed(spark, path, "b1"))
      LedgeredState.commit(spark, path, "b1", Seq(
        "edges" -> Seq((1L, 2L)).toDF("src", "dst"),
        "frontier" -> Seq((10L, 99L)).toDF("user_id", "page")))
      assert(LedgeredState.absorbed(spark, path, "b1"))
      assert(!LedgeredState.absorbed(spark, path, "b2"))
      assert(LedgeredState.readPart(spark, path, "edges").get.count() == 1)
      assert(LedgeredState.readPart(spark, path, "frontier").get.count() == 1)
      assert(LedgeredState.readPart(spark, path, "absent").isEmpty)
      // second commit: parts may read the previous committed state
      val grown = LedgeredState.readPart(spark, path, "edges").get
        .unionByName(Seq((3L, 4L)).toDF("src", "dst"))
      LedgeredState.commit(spark, path, "b2", Seq(
        "edges" -> grown,
        "frontier" -> Seq((10L, 100L)).toDF("user_id", "page")))
      assert(LedgeredState.absorbed(spark, path, "b1"), "ledger carries history")
      assert(LedgeredState.absorbed(spark, path, "b2"))
      assert(LedgeredState.readPart(spark, path, "edges").get.count() == 2)
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("crash residue: truncated head commit skipped+reclaimed, orphan gens swept") {
    val base = java.nio.file.Files.createTempDirectory("graft_ls_crash2_")
    try {
      val path = s"$base/st"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      LedgeredState.commit(spark, path, "day1",
        Seq("counts" -> Seq(("a", 1L)).toDF("k", "n")))
      // a writer that crashed mid-publish: parts landed as a generation
      // dir, plus a TRUNCATED commit file (no END sentinel)
      Seq(("ghost", 9L)).toDF("k", "n")
        .write.parquet(s"$path/g-crashed0/counts")
      val residue = new org.apache.hadoop.fs.Path(
        s"$path/_commits/${"%020d".format(2)}")
      val out = fs.create(residue, false)
      out.write("graft-ledgered-v1\nB\tday2".getBytes("UTF-8")); out.close()
      // age the residue past the reclaim grace — a FRESH invalid slot is
      // indistinguishable from a slow in-flight writer and must NOT be
      // reclaimed (CommitLogSpec pins that side)
      fs.setTimes(residue, System.currentTimeMillis() - 120000L, -1L)
      // readers fall back past the residue: day-1 state authoritative
      assert(LedgeredState.absorbed(spark, path, "day1"))
      assert(!LedgeredState.absorbed(spark, path, "day2"),
        "a crashed commit must not read as absorbed")
      assert(LedgeredState.readPart(spark, path, "counts").get
        .collect().head.getLong(1) == 1L, "orphan gen must be invisible")
      // the next fold reclaims the slot and sweeps every dead dir
      val grown = LedgeredState.readPart(spark, path, "counts").get
        .unionByName(Seq(("b", 2L)).toDF("k", "n"))
      LedgeredState.commit(spark, path, "day2", Seq("counts" -> grown))
      assert(LedgeredState.absorbed(spark, path, "day2"))
      assert(LedgeredState.readPart(spark, path, "counts").get.count() == 2)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/g-crashed0")),
        "crash-residue generation must be swept")
      // reader-retention margin (retainCommits=2): day-1's generation is
      // KEPT after day-2's commit (a reader holding the old head must
      // finish), and falls out only after the next commit
      def gens() = fs.listStatus(p)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("g-"))
        .map(_.getPath.getName).toSet
      assert(gens().size == 2,
        s"retention must keep the previous generation, saw ${gens()}")
      LedgeredState.commit(spark, path, "day3",
        Seq("counts" -> LedgeredState.readPart(spark, path, "counts").get))
      assert(gens().size == 2,
        s"generations past the margin must be deleted, saw ${gens()}")
    } finally {
      val pp = new org.apache.hadoop.fs.Path(base.toString)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }

  test("commitFold: a racing commit forces re-derivation — no fold dropped or doubled") {
    val base = java.nio.file.Files.createTempDirectory("graft_ls_fold_")
    try {
      val path = s"$base/st"
      def total(snap: LedgeredState.SnapshotReader): Long =
        snap.part("counts").map(_.collect().head.getLong(0)).getOrElse(0L)
      def ingest(batchId: String, add: Long,
                 hook: () => Unit = () => ()): Boolean =
        LedgeredState.commitFold(spark, path, batchId,
          beforePublish = hook) { snap =>
          Seq("counts" -> Seq(total(snap) + add).toDF("n"))
        }
      assert(ingest("day0", 100L))
      // writer A derives against day0's head; writer B lands in between;
      // A must re-derive from B's head — a stale publish would drop B's 20
      assert(ingest("dayA", 3L, hook = () => { assert(ingest("dayB", 20L)) }))
      val got = LedgeredState.readPart(spark, path, "counts").get
        .collect().head.getLong(0)
      assert(got == 123L, s"every fold exactly once: got $got")
      // an absorbed batch is a no-op
      assert(!ingest("dayA", 3L))
      // a racing duplicate of the SAME batch: the seam-side writer wins
      // the slot, the outer writer's retry sees the batch absorbed and
      // no-ops — the fold lands exactly once
      val outerApplied = ingest("dayC", 1L,
        hook = () => { assert(ingest("dayC", 1L), "seam writer must land") })
      assert(!outerApplied, "the losing duplicate must resolve to a no-op")
      val fin = LedgeredState.readPart(spark, path, "counts").get
        .collect().head.getLong(0)
      assert(fin == 124L, s"duplicate batch must fold once: $fin")
    } finally {
      val pp = new org.apache.hadoop.fs.Path(base.toString)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }

  test("reader-retention margin: a reader holding the previous head finishes its scan") {
    val base = java.nio.file.Files.createTempDirectory("graft_ls_reader_")
    try {
      val path = s"$base/st"
      LedgeredState.commit(spark, path, "day1",
        Seq("counts" -> Seq(("a", 1L)).toDF("k", "n")))
      // a long-running reader resolves the day-1 head (dir path bound now,
      // files read lazily at the action)...
      val reader = LedgeredState.readPart(spark, path, "counts").get
      // ...a concurrent commit + sweep lands in between...
      LedgeredState.commit(spark, path, "day2",
        Seq("counts" -> Seq(("a", 2L)).toDF("k", "n")))
      // ...and the reader's scan still completes against day-1 bytes:
      // the retention margin kept its generation dir alive
      val got = reader.collect()
      assert(got.length == 1 && got.head.getLong(1) == 1L,
        "the pre-commit reader must finish against its resolved generation")
    } finally {
      val pp = new org.apache.hadoop.fs.Path(base.toString)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }

  test("a legacy swapped layout fails loudly instead of silently restarting") {
    val base = java.nio.file.Files.createTempDirectory("graft_ls_legacy_")
    try {
      val path = s"$base/st"
      Seq(("a", 1L)).toDF("k", "n").write.parquet(s"$path/state/counts")
      intercept[IllegalStateException] {
        LedgeredState.absorbed(spark, path, "day1")
      }
    } finally {
      val pp = new org.apache.hadoop.fs.Path(base.toString)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }

  test("a commit that fails mid-write leaves the previous state authoritative") {
    val base = java.nio.file.Files.createTempDirectory("graft_ls_crash_")
    try {
      val path = s"$base/st"
      LedgeredState.commit(spark, path, "day1",
        Seq("counts" -> Seq(("a", 1L)).toDF("k", "n")))
      // the second part's plan throws during materialization — AFTER the
      // first part already landed in the temp dir: the classic partial-
      // apply crash. Nothing may move: state, parts, and ledger must all
      // still be day-1's, and day-2 must not read as absorbed.
      val boom = udf((n: Long) => {
        if (n >= 0) throw new RuntimeException("injected crash"); n
      })
      val bad = Seq(("b", 2L)).toDF("k", "n").withColumn("n", boom(col("n")))
      intercept[Exception] {
        LedgeredState.commit(spark, path, "day2", Seq(
          "counts" -> Seq(("a", 2L)).toDF("k", "n"),
          "extra" -> bad))
      }
      assert(LedgeredState.absorbed(spark, path, "day1"))
      assert(!LedgeredState.absorbed(spark, path, "day2"),
        "a failed commit must not record its batch")
      val st = LedgeredState.readPart(spark, path, "counts").get.collect()
      assert(st.length == 1 && st.head.getLong(1) == 1L,
        "the previous committed counts must be untouched")
      assert(LedgeredState.readPart(spark, path, "extra").isEmpty,
        "no partial part may become visible")
      // the replayed batch (same id) now folds exactly once
      LedgeredState.commit(spark, path, "day2",
        Seq("counts" -> Seq(("a", 2L)).toDF("k", "n")))
      assert(LedgeredState.absorbed(spark, path, "day2"))
      assert(LedgeredState.readPart(spark, path, "counts").get
        .collect().head.getLong(1) == 2L)
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}

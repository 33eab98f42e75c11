package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sinks.{CommitLog, ManifestMergeSink, MergeSink}

/** The manifest-pointer merge layout: semantics parity with the swap
  * layouts, one-file publish, untouched buckets byte-identical,
  * disjoint/overlap writer contention, crash-residue vacuum, purge. */
class ManifestMergeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(base: java.nio.file.Path) =
    new Path(base.toString).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataDirChecksums(fs: org.apache.hadoop.fs.FileSystem,
                               target: String): Map[String, Seq[(String, Long)]] = {
    val root = new Path(target)
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("g-"))
      .map { g =>
        val files = new scala.collection.mutable.ArrayBuffer[(String, Long)]
        val it = fs.listFiles(g.getPath, true)
        while (it.hasNext) {
          val f = it.next()
          files += ((f.getPath.toString.stripPrefix(root.toString),
            f.getLen))
        }
        g.getPath.getName -> files.sortBy(_._1).toSeq
      }.toMap
  }

  test("merge parity with mergeInto: null-skip, upsert, counts, duplicate fold") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_par_")
    try {
      val m = s"$base/manifested"
      val s = s"$base/swapped"
      val day1 = Seq((1L, Some("a"), Some(10L)), (2L, Some("b"), Some(20L)),
        (3L, Some("c"), None)).toDF("id", "name", "score")
      // day 2: null-skip on 2's name, update 3's score, upsert 4,
      // duplicate key 5 folded (last non-null in order wins)
      val day2 = Seq((2L, None, Some(25L)), (3L, None, Some(30L)),
        (4L, Some("d"), Some(40L)), (5L, Some("e1"), None),
        (5L, None, Some(50L))).toDF("id", "name", "score")
        .withColumn("arrival", col("score")) // any deterministic order col
      for (day <- Seq(day1.withColumn("arrival", lit(0L)), day2)) {
        val st1 = ManifestMergeSink.mergeIntoManifested(spark, m, day, "id",
          Seq("name", "score"), nBuckets = 4, orderCol = Some("arrival"))
        val st2 = MergeSink.mergeInto(spark, s, day, "id",
          Seq("name", "score"), orderCol = Some("arrival"))
        assert(st1 == st2, s"stats must match the swap layout: $st1 vs $st2")
      }
      val got = ManifestMergeSink.readManifested(spark, m)
        .select("id", "name", "score")
      val want = spark.read.parquet(s).select("id", "name", "score")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "snapshot must equal the swap layout's row-for-row")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("publish is ONE commit-file create; untouched buckets stay byte-identical") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_one_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      val day1 = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "payload")
      ManifestMergeSink.mergeIntoManifested(spark, m, day1, "id",
        Seq("payload"), nBuckets = 8)
      val before = dataDirChecksums(fs, m)
      val commitsBefore = CommitLog.seqs(fs, new Path(m))
      // day 2 touches a single key → a single bucket
      val day2 = Seq((7L, "v7b")).toDF("id", "payload")
      ManifestMergeSink.mergeIntoManifested(spark, m, day2, "id",
        Seq("payload"), nBuckets = 8)
      val after = dataDirChecksums(fs, m)
      val commitsAfter = CommitLog.seqs(fs, new Path(m))
      assert(commitsAfter.size == commitsBefore.size + 1,
        "publish must be exactly one new commit file")
      // day 1's generation dir: every file byte-for-byte in place
      before.foreach { case (gen, files) =>
        assert(after(gen) == files,
          s"generation $gen must be untouched (immutable dirs)")
      }
      // and the snapshot content is correct
      val got = ManifestMergeSink.readManifested(spark, m)
        .filter(col("id") === 7L).select("payload").as[String].collect()
      assert(got.toSeq == Seq("v7b"))
      val n = ManifestMergeSink.readManifested(spark, m).count()
      assert(n == 200L)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("contention, disjoint buckets: loser repoints metadata-only, both merges land") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_dis_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      val day1 = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload")
      ManifestMergeSink.mergeIntoManifested(spark, m, day1, "id",
        Seq("payload"), nBuckets = 8)
      // find two keys in DIFFERENT buckets
      val Seq(kA, kB) = Seq(1L to 100L: _*)
        .groupBy(k => Math.floorMod(
          org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(k, 42), 2))
        .values.take(2).map(_.head).toSeq match {
          case two if two.size == 2 => two
          case _ => Seq(1L, 2L)
        }
      // actually derive buckets the sink's own way, to be exact:
      def bucketOf(k: Long): Long = Seq(k).toDF("id")
        .select(pmod(xxhash64(col("id")), lit(8L))).head().getLong(0)
      val keyA = (1L to 100L).find(k => bucketOf(k) == 0L).get
      val keyB = (1L to 100L).find(k => bucketOf(k) == 1L).get
      val gensBefore = dataDirChecksums(fs, m).keySet
      // writer A merges keyA; before A publishes, writer B lands keyB
      val statsA = ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((keyA, "A")).toDF("id", "payload"), "id", Seq("payload"),
        nBuckets = 8,
        beforePublish = () => {
          ManifestMergeSink.mergeIntoManifested(spark, m,
            Seq((keyB, "B")).toDF("id", "payload"), "id", Seq("payload"),
            nBuckets = 8)
          ()
        })
      assert(statsA.nMatched == 1L && statsA.nModified == 1L)
      // NO lost update: both writers' values present
      val got = ManifestMergeSink.readManifested(spark, m)
        .filter(col("id").isin(keyA, keyB))
        .select("id", "payload").as[(Long, String)].collect().toMap
      assert(got == Map(keyA -> "A", keyB -> "B"), s"got $got")
      // metadata-only retry: A's generation dir survived (2 new gens,
      // not 3 — A did not re-merge)
      val gensAfter = dataDirChecksums(fs, m).keySet
      assert((gensAfter -- gensBefore).size == 2,
        s"disjoint loser must not rewrite data: ${gensAfter -- gensBefore}")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("contention, overlapping bucket: loser re-merges from the winner's state") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_ovl_")
    try {
      val m = s"$base/snap"
      val day1 = Seq((1L, Some("a"), Some(1L))).toDF("id", "name", "score")
      ManifestMergeSink.mergeIntoManifested(spark, m, day1, "id",
        Seq("name", "score"), nBuckets = 4)
      // A updates key 1's score; B (winning first) updates key 1's name.
      // A must re-merge on top of B: final row carries BOTH fields.
      val statsA = ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((1L, Option.empty[String], Some(100L)))
          .toDF("id", "name", "score"),
        "id", Seq("name", "score"), nBuckets = 4,
        beforePublish = () => {
          ManifestMergeSink.mergeIntoManifested(spark, m,
            Seq((1L, Some("bWins"), Option.empty[Long]))
              .toDF("id", "name", "score"),
            "id", Seq("name", "score"), nBuckets = 4)
          ()
        })
      assert(statsA.nMatched == 1L)
      val got = ManifestMergeSink.readManifested(spark, m)
        .select("id", "name", "score").as[(Long, String, Long)].collect()
      assert(got.toSeq == Seq((1L, "bWins", 100L)),
        s"sequential B-then-A semantics required, got ${got.toSeq}")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("contention, derived updates: the loser re-derives against the winner's head") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_drv_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 20L).map(i => (i, s"v$i")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4)
      // first-arrival ingest of key 1000, raced by two writers: the
      // update set is DERIVED (anti-join against the snapshot), so the
      // loser must re-derive against the winner's head — key 1000 drops
      // out of its fresh set and the winner's row survives. A stale
      // derivation would upsert the loser's payload over it.
      def ingestOnce(payload: String,
                     beforePublish: () => Unit = () => ()): Unit = {
        val delivery = Seq((1000L, payload)).toDF("id", "payload")
        ManifestMergeSink.mergeIntoManifested(spark, m, delivery,
          "id", Seq("payload"), nBuckets = 4,
          beforePublish = beforePublish,
          recomputeUpdates = {
            case None => delivery
            case Some(st) =>
              val touched = delivery
                .select(pmod(xxhash64(col("id")), lit(st.nBuckets.toLong)))
                .distinct().collect().map(_.getLong(0)).toSeq
              delivery.join(
                ManifestMergeSink.readStateBuckets(spark, m, st, touched)
                  .select(col("id")),
                Seq("id"), "left_anti")
          })
        ()
      }
      // writer B lands BETWEEN writer A's derivation and A's publish
      ingestOnce("A", beforePublish = () => ingestOnce("B"))
      val got = ManifestMergeSink.readManifested(spark, m)
        .filter(col("id") === 1000L).select("payload").as[String].collect()
      assert(got.toSeq == Seq("B"),
        s"first arrival must follow COMMIT order — got ${got.toSeq}")
      // one commit per writer, no double-publish: seed + B + A(no-op)
      assert(CommitLog.seqs(fs, new Path(m)).size == 3)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("vacuum retention: a reader holding the previous head finishes across merge+vacuum") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_ret_")
    try {
      val m = s"$base/snap"
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 30L).map(i => (i, "day1")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4)
      // a long-running reader resolves the day-1 head...
      val reader = ManifestMergeSink.readManifested(spark, m)
      // ...a full-overwrite merge supersedes every bucket, then vacuum
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 30L).map(i => (i, "day2")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4)
      ManifestMergeSink.vacuumManifested(spark, m) // retainCommits = 2
      val got = reader.select("payload").distinct().as[String].collect()
      assert(got.toSeq == Seq("day1"),
        "the pre-merge reader must finish against its resolved dirs")
      // a third merge pushes day-1 past the margin; vacuum then sweeps it
      ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((1L, "day3")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4)
      val swept = ManifestMergeSink.vacuumManifested(spark, m)
      assert(swept.nonEmpty, "day-1 generations past the margin must sweep")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("crash residue: orphan generation invisible; vacuum sweeps it") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_cr_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 50L).map(i => (i, s"v$i")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4)
      // a crashed writer: generation written, commit never published
      (1L to 5L).map(i => (i, "CRASH")).toDF("id", "payload")
        .withColumn("pb", pmod(xxhash64(col("id")), lit(4L)))
        .write.partitionBy("pb").parquet(s"$m/g-crashed0")
      val visible = ManifestMergeSink.readManifested(spark, m)
        .filter(col("payload") === "CRASH").count()
      assert(visible == 0L, "orphan generation must be invisible")
      val swept = ManifestMergeSink.vacuumManifested(spark, m)
      assert(swept == Seq("g-crashed0"), s"swept: $swept")
      assert(!fs.exists(new Path(s"$m/g-crashed0")))
      assert(ManifestMergeSink.readManifested(spark, m).count() == 50L)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("schema evolution: day-2 column, day-1 rows read null via committed schema") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_ev_")
    try {
      val m = s"$base/snap"
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 40L).map(i => (i, s"v$i")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 8)
      ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((3L, "v3b", "extra3")).toDF("id", "payload", "flag"),
        "id", Seq("payload", "flag"), nBuckets = 8)
      val snap = ManifestMergeSink.readManifested(spark, m)
      assert(snap.columns.contains("flag"))
      val flags = snap.select("id", "flag").as[(Long, Option[String])]
        .collect().toMap
      assert(flags(3L).contains("extra3"))
      assert(flags.filterNot(_._1 == 3L).values.forall(_.isEmpty),
        "pre-evolution rows must read null for the evolved column")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("purge: copy-on-write repoint, emptied bucket drops out, replay no-ops") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_pg_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      val rows = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "payload")
      ManifestMergeSink.mergeIntoManifested(spark, m, rows, "id",
        Seq("payload"), nBuckets = 4)
      def bucketOf(k: Long): Long = Seq(k).toDF("id")
        .select(pmod(xxhash64(col("id")), lit(4L))).head().getLong(0)
      // purge one bucket ENTIRELY plus one key from another bucket
      val b0keys = (1L to 60L).filter(bucketOf(_) == 0L)
      val otherKey = (1L to 60L).find(bucketOf(_) == 1L).get
      val before = dataDirChecksums(fs, m)
      val stats = ManifestMergeSink.purgeManifested(spark, m,
        (b0keys :+ otherKey).toDF("id"), "id")
      assert(stats.nPurged == b0keys.size + 1L, s"stats: $stats")
      val snap = ManifestMergeSink.readManifested(spark, m)
      assert(snap.count() == 60L - b0keys.size - 1L)
      assert(snap.filter(col("id").isin(b0keys :+ otherKey: _*)).count() == 0L)
      // emptied bucket left the mapping
      val (_, st) = ManifestMergeSink.headState(spark, m).get
      assert(!st.mapping.contains(0L), s"mapping: ${st.mapping}")
      // untouched buckets byte-identical
      val after = dataDirChecksums(fs, m)
      before.foreach { case (gen, files) =>
        after.get(gen).foreach { fNow =>
          val untouched = files.filterNot(f =>
            f._1.contains("pb=0/") || f._1.contains(s"pb=${bucketOf(otherKey)}/"))
          assert(untouched.forall(fNow.contains),
            s"untouched bucket files must survive in $gen")
        }
      }
      // replay no-ops on content
      val again = ManifestMergeSink.purgeManifested(spark, m,
        (b0keys :+ otherKey).toDF("id"), "id")
      assert(again.nPurged == 0L)
      assert(ManifestMergeSink.readManifested(spark, m).count() == snap.count())
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("time travel: every retained version reads back exactly; swept versions fail loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_tt_")
    try {
      val m = s"$base/snap"
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 40L).map(i => (i, s"v$i")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4)
      ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((7L, "v7b"), (41L, "v41")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4)
      ManifestMergeSink.purgeManifested(spark, m, Seq(1L, 2L).toDF("id"), "id")
      val seqs = ManifestMergeSink.commitSeqs(spark, m)
      assert(seqs.size == 3, s"three committed versions, got $seqs")
      val Seq(s1, s2, s3) = seqs
      // v1: pre-update, pre-insert, pre-purge
      val v1 = ManifestMergeSink.readManifestedAt(spark, m, s1)
      assert(v1.count() == 40L)
      assert(v1.filter(col("id") === 7L).select("payload")
        .as[String].head() == "v7", "v1 must be unaffected by the later update")
      assert(v1.filter(col("id") === 41L).isEmpty)
      // v2: updated + inserted, purged keys still present
      val v2 = ManifestMergeSink.readManifestedAt(spark, m, s2)
      assert(v2.count() == 41L)
      assert(v2.filter(col("id") === 7L).select("payload")
        .as[String].head() == "v7b")
      assert(v2.filter(col("id").isin(1L, 2L)).count() == 2L,
        "v2 must still hold the later-purged keys")
      // v3 == live head
      assert(ManifestMergeSink.readManifestedAt(spark, m, s3).count() == 39L)
      // sweep past v1 (retain 2) — the as-of read must fail LOUDLY
      ManifestMergeSink.vacuumManifested(spark, m, retainCommits = 2)
      assert(ManifestMergeSink.commitSeqs(spark, m) == Seq(s2, s3))
      val e = intercept[IllegalArgumentException] {
        ManifestMergeSink.readManifestedAt(spark, m, s1)
      }
      assert(e.getMessage.contains("retained"), e.getMessage)
      // retained versions still read exactly after the sweep
      assert(ManifestMergeSink.readManifestedAt(spark, m, s2).count() == 41L)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("change feed: insert/update/delete classified; rewrite-identical rows excluded") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_cdf_")
    try {
      val m = s"$base/snap"
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 40L).map(i => (i, s"v$i")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 2)
      // v2 touches ONE bucket's keys: an update, an insert — every other
      // key in that bucket is rewritten byte-for-byte identical and must
      // NOT surface in the feed
      def bucketOf(k: Long): Long = Seq(k).toDF("id")
        .select(pmod(xxhash64(col("id")), lit(2L))).head().getLong(0)
      val updKey = (1L to 40L).find(bucketOf(_) == 0L).get
      val insKey = (1000L to 2000L).find(bucketOf(_) == 0L).get
      ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((updKey, "UPDATED"), (insKey, "NEW")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 2)
      ManifestMergeSink.purgeManifested(spark, m,
        Seq(updKey).toDF("id"), "id")
      val Seq(s1, s2, s3) = ManifestMergeSink.commitSeqs(spark, m)
      val d12Frame = ManifestMergeSink.changesBetween(spark, m, s1, s2,
        "id", Seq("payload"))
      val d12 = d12Frame
        .select("id", "payload", "_change").as[(Long, String, String)]
        .collect().toSet
      assert(d12 == Set((updKey, "UPDATED", "update"), (insKey, "NEW", "insert")),
        s"got $d12")
      // pruning pin: only the REPOINTED bucket's dirs are read — the
      // untouched bucket (pb=1) never appears in the scan's inputs
      val scanned = d12Frame.inputFiles.toSeq
      assert(scanned.nonEmpty && scanned.forall(_.contains("/pb=0/")),
        s"diff must read only repointed buckets, scanned: $scanned")
      val d23 = ManifestMergeSink.changesBetween(spark, m, s2, s3,
        "id", Seq("payload"))
        .select("id", "payload", "_change").as[(Long, String, String)]
        .collect().toSet
      assert(d23 == Set((updKey, "UPDATED", "delete")),
        s"deletes must carry pre-delete values, got $d23")
      // the whole span in one diff: the updated-then-deleted key nets
      // out to a delete carrying its FROM-side value
      val d13 = ManifestMergeSink.changesBetween(spark, m, s1, s3,
        "id", Seq("payload"))
        .select("id", "payload", "_change").as[(Long, String, String)]
        .collect().toSet
      assert(d13 == Set((updKey, s"v$updKey", "delete"), (insKey, "NEW", "insert")),
        s"got $d13")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("change feed: evolved column compares null-safe on pre-evolution rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_cde_")
    try {
      val m = s"$base/snap"
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 30L).map(i => (i, s"v$i")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 2)
      ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((3L, "v3", "flagged")).toDF("id", "payload", "flag"),
        "id", Seq("payload", "flag"), nBuckets = 2)
      val Seq(s1, s2) = ManifestMergeSink.commitSeqs(spark, m)
      val d = ManifestMergeSink.changesBetween(spark, m, s1, s2,
        "id", Seq("payload", "flag"))
        .select("id", "flag", "_change").as[(Long, Option[String], String)]
        .collect().toSet
      // only key 3 changed (gained the flag); its bucket-mates read
      // null flag on BOTH sides (old: missing column; new: unmatched
      // rows) and must not surface
      assert(d == Set((3L, Some("flagged"), "update")), s"got $d")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("txn idempotence: replays no-op without a commit; the ledger survives purge") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_txn_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      val batch0 = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "payload")
      val st0 = ManifestMergeSink.mergeIntoManifested(spark, m, batch0,
        "id", Seq("payload"), nBuckets = 4, txn = Some(("p1", 0L)))
      assert(st0.nUpserted == 20L)
      val commits = CommitLog.seqs(fs, new Path(m)).size
      // a straight replay (restart) must not write a byte or a commit
      val gensBefore = dataDirChecksums(fs, m).keySet
      val replay = ManifestMergeSink.mergeIntoManifested(spark, m, batch0,
        "id", Seq("payload"), nBuckets = 4, txn = Some(("p1", 0L)))
      assert(replay == MergeSink.MergeStats(0L, 0L, 0L), s"got $replay")
      assert(CommitLog.seqs(fs, new Path(m)).size == commits)
      assert(dataDirChecksums(fs, m).keySet == gensBefore,
        "a replay no-op must not write a generation dir")
      // an OLDER batch id replayed after a newer one: still absorbed
      ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((21L, "v21")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4, txn = Some(("p1", 1L)))
      val stale = ManifestMergeSink.mergeIntoManifested(spark, m, batch0,
        "id", Seq("payload"), nBuckets = 4, txn = Some(("p1", 0L)))
      assert(stale == MergeSink.MergeStats(0L, 0L, 0L))
      // a DIFFERENT pipeline's ledger is independent
      val other = ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((22L, "v22")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4, txn = Some(("p2", 0L)))
      assert(other.nUpserted == 1L)
      // purge publishes a commit too — the ledger must ride through it
      ManifestMergeSink.purgeManifested(spark, m, Seq(22L).toDF("id"), "id")
      val afterPurge = ManifestMergeSink.mergeIntoManifested(spark, m,
        batch0, "id", Seq("payload"), nBuckets = 4, txn = Some(("p1", 1L)))
      assert(afterPurge == MergeSink.MergeStats(0L, 0L, 0L),
        "the txn ledger must survive a purge commit")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("txn race: a duplicate instance losing the CAS finds its token and no-ops") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_txr_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 20L).map(i => (i, "seed")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4)
      // two restarted instances of the same pipeline race batch 1: the
      // original lands through the seam while the duplicate holds its
      // publish — the duplicate must lose the CAS, see its own token at
      // the new head, and no-op (one data commit total for the batch)
      val batch = Seq((1L, "B1")).toDF("id", "payload")
      val dup = ManifestMergeSink.mergeIntoManifested(spark, m, batch,
        "id", Seq("payload"), nBuckets = 4, txn = Some(("p1", 1L)),
        beforePublish = () => {
          ManifestMergeSink.mergeIntoManifested(spark, m, batch,
            "id", Seq("payload"), nBuckets = 4, txn = Some(("p1", 1L)))
          ()
        })
      assert(dup == MergeSink.MergeStats(0L, 0L, 0L),
        s"the racing duplicate must no-op, got $dup")
      assert(CommitLog.seqs(fs, new Path(m)).size == 2,
        "exactly one data commit for the batch (seed + original)")
      assert(ManifestMergeSink.readManifested(spark, m)
        .filter(col("id") === 1L).select("payload").as[String].head() == "B1")
      // the duplicate cleaned up after itself: seed + original = 2 gens
      assert(dataDirChecksums(fs, m).keySet.size == 2,
        "the no-op duplicate must delete its discarded generation dir")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("compaction: flagged buckets single-file, contents exact, ledger survives, no-op free") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_cp_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      // two corpus-wide merges under a txn token; AQE partition
      // coalescing OFF so the write fans out like a real cluster's
      // (multi-task buckets → multi-file dirs — the condition the
      // maintenance pass exists for)
      val rows = (1L to 400L).map(i => (i, s"v$i")).toDF("id", "payload")
      // distributeByBucket=false: the merge now hash-distributes by
      // bucket (one file per bucket), so the fragmentation this pass
      // repairs must be produced the legacy way
      Sparks.withConf(spark,
        "spark.sql.adaptive.coalescePartitions.enabled", "false") {
        ManifestMergeSink.mergeIntoManifested(spark, m, rows, "id",
          Seq("payload"), nBuckets = 4, txn = Some(("p1", 0L)),
          distributeByBucket = false)
        ManifestMergeSink.mergeIntoManifested(spark, m,
          rows.filter(col("id") % 2 === 0L)
            .withColumn("payload", concat(col("payload"), lit("u"))),
          "id", Seq("payload"), nBuckets = 4, txn = Some(("p1", 1L)),
          distributeByBucket = false)
      }
      def fileCount(d: String): Int =
        fs.listStatus(new Path(s"$m/$d"))
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      val map0 = ManifestMergeSink.headState(spark, m).get._2.mapping
      assert(map0.values.exists(fileCount(_) > 1),
        "harness must produce multi-file buckets")
      val st1 = ManifestMergeSink.compactManifested(spark, m,
        maxFilesPerBucket = 1)
      assert(st1.nCompacted > 0 && st1.filesAfter < st1.filesBefore, s"$st1")
      val head1 = ManifestMergeSink.headState(spark, m).get._2
      assert(head1.mapping.values.forall(fileCount(_) == 1),
        "every bucket single-file after compaction")
      // contents exact, schema preserved, txn ledger rode through
      val got = ManifestMergeSink.readManifested(spark, m)
        .select("id", "payload").as[(Long, String)].collect().toMap
      assert(got.size == 400 && got(2L) == "v2u" && got(1L) == "v1")
      assert(head1.txns == Map("p1" -> 1L),
        s"compaction must carry the txn ledger: ${head1.txns}")
      // no-op pass: zero stats, zero commits
      val commits = CommitLog.seqs(fs, new Path(m)).size
      val st2 = ManifestMergeSink.compactManifested(spark, m)
      assert(st2.nCompacted == 0)
      assert(CommitLog.seqs(fs, new Path(m)).size == commits,
        "a fully-compacted snapshot must not commit")
      // old generations are vacuumable; the compacted snapshot survives
      ManifestMergeSink.vacuumManifested(spark, m, retainCommits = 1)
      assert(ManifestMergeSink.readManifested(spark, m).count() == 400L)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("rebucket: atomic count flip, content-neutral, ledger carried, old-config transparent") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_rb_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 2, txn = Some(("p", 3L)))
      val commitsBefore = CommitLog.seqs(fs, new Path(m)).size
      ManifestMergeSink.rebucketManifested(spark, m, "id", 8)
      assert(CommitLog.seqs(fs, new Path(m)).size == commitsBefore + 1,
        "the rebucket is ONE commit")
      val head = ManifestMergeSink.headState(spark, m).get._2
      assert(head.nBuckets == 8)
      assert(head.mapping.keySet.subsetOf((0L until 8L).toSet) &&
        head.mapping.size > 2, s"${head.mapping.keySet}")
      assert(head.txns == Map("p" -> 3L), "the txn ledger rides through")
      assert(ManifestMergeSink.readManifested(spark, m).count() == 100L)
      // merges against the NEW count land; a stale-config writer (the
      // pre-rebucket constant) resolves the head's count and keeps
      // working — nBuckets sizes the first commit only, so a nightly
      // auto-rebucket is transparent to the day pipelines
      val st = ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((101L, "new")).toDF("id", "payload"), "id", Seq("payload"),
        nBuckets = 8)
      assert(st.nUpserted == 1L)
      val stStale = ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((102L, "x")).toDF("id", "payload"), "id", Seq("payload"),
        nBuckets = 2)
      assert(stStale.nUpserted == 1L)
      val headAfter = ManifestMergeSink.headState(spark, m).get._2
      assert(headAfter.nBuckets == 8, "stale config must not change the count")
      assert(ManifestMergeSink.readManifested(spark, m)
        .filter(col("id") === 102L).count() == 1L,
        "the stale-config write must be readable under the head's count")
      // time travel still reads the pre-rebucket version under count 2
      val seqs = ManifestMergeSink.commitSeqs(spark, m)
      assert(ManifestMergeSink.readManifestedAt(spark, m, seqs.head)
        .count() == 100L)
      // a cross-count change-feed span classifies by VALUE: only the
      // post-rebucket inserts surface (101 from the new-count merge,
      // 102 from the stale-config merge)
      val d = ManifestMergeSink.changesBetween(spark, m, seqs.head,
        seqs.last, "id", Seq("payload"))
        .select("id", "_change").as[(Long, String)].collect().toSet
      assert(d == Set((101L, "insert"), (102L, "insert")), s"got $d")
      // a no-op rebucket publishes nothing
      val commits2 = CommitLog.seqs(fs, new Path(m)).size
      ManifestMergeSink.rebucketManifested(spark, m, "id", 8)
      assert(CommitLog.seqs(fs, new Path(m)).size == commits2)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("a rebucket-crossing change span reads ONLY touched-pair buckets") {
    // the 100 TB pin: a rebucket used to make every downstream CDC
    // consumer pay a table-sized diff once — now the span decomposes at
    // the flip and reads candidate-touched buckets only. Proven by
    // POISONING: delete an UNTOUCHED from-side bucket's data dir from
    // disk; the bounded path never lists it (the diff still succeeds,
    // values exact), while a full-snapshot fallback fails loudly on the
    // missing dir — which the vacuumed-intermediate case then shows.
    val base = java.nio.file.Files.createTempDirectory("graft_mms_rbb_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      // v1: keys 1..400 under 32 buckets; v2: update %10==0 keys;
      // v3: REBUCKET to 16; v4: update {1,101,201,301}, delete %97==0
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 400L).map(i => (i, s"v$i")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 32)
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 400L).filter(_ % 10 == 0).map(i => (i, s"u$i"))
          .toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 32)
      ManifestMergeSink.rebucketManifested(spark, m, "id", 16)
      val ups = Seq(1L, 101L, 201L, 301L)
      val dels = (1L to 400L).filter(_ % 97 == 0) // 97,194,291,388
      ManifestMergeSink.applyChangesManifested(spark, m,
        (ups.map(i => (i, s"w$i", "update")) ++
         dels.map(i => (i, s"v$i", "delete")))
          .toDF("id", "payload", "_change"),
        "id", Seq("payload"), nBuckets = 16)
      val seqs = ManifestMergeSink.commitSeqs(spark, m)
      assert(seqs.size == 4)
      // the span v2 -> v4 crosses the flip; its candidates are ONLY the
      // 8 keys the v3->v4 pair touched (the v2->v3 rebucket is
      // neutral), so at most 8 of the 32 from-side buckets are read.
      // Poison every v2-side bucket holding NO candidate.
      val cand = ups ++ dels
      val candBuckets32 = cand.toDS()
        .select(pmod(xxhash64(col("value")), lit(32L)).as("pb"))
        .distinct().as[Long].collect().toSet
      val v2 = ManifestMergeSink.stateAt(spark, m, seqs(1)).get
      val untouched32 = v2.mapping.keySet.filterNot(candBuckets32)
      assert(untouched32.nonEmpty, "fixture must leave untouched buckets")
      untouched32.foreach(b =>
        fs.delete(new Path(m, v2.mapping(b)), true))
      val d = ManifestMergeSink.changesBetween(spark, m, seqs(1), seqs.last,
        "id", Seq("payload")).select("id", "_change", "payload")
        .as[(Long, String, String)].collect().toSet
      val want =
        ups.map(i => (i, "update", s"w$i")).toSet ++
        dels.map { i =>
          (i, "delete", if (i % 10 == 0) s"u$i" else s"v$i")
        }.toSet
      assert(d == want,
        s"bounded diff must equal the value-level truth; diff=${
          (d diff want).take(3)} / ${(want diff d).take(3)}")
      // a VACUUMED intermediate (the rebucket commit file gone, span
      // endpoints retained) forces the full-snapshot fallback — which
      // trips over the poisoned dirs, proving the bounded path above
      // genuinely never listed them
      fs.delete(new Path(m, f"${CommitLog.Dir}/${seqs(2)}%020d"), false)
      intercept[Exception] {
        ManifestMergeSink.changesBetween(spark, m, seqs(1), seqs.last,
          "id", Seq("payload")).count()
      }
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("applyChanges: insert+update+delete in ONE commit, purge rules, absorbed replay") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_ac_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      val rows = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "payload")
      ManifestMergeSink.mergeIntoManifested(spark, m, rows, "id",
        Seq("payload"), nBuckets = 4)
      def bucketOf(k: Long): Long = Seq(k).toDF("id")
        .select(pmod(xxhash64(col("id")), lit(4L))).head().getLong(0)
      // delete bucket 0 ENTIRELY plus one key elsewhere; update and
      // insert keys that do NOT live in bucket 0
      val b0keys = (1L to 60L).filter(bucketOf(_) == 0L)
      val delOther = (1L to 60L).find(bucketOf(_) == 1L).get
      val updKey = (1L to 60L).find(k => bucketOf(k) == 2L).get
      val insKey = (1000L to 2000L).find(k => bucketOf(k) != 0L).get
      val changes = (
        b0keys.map(k => (k, Option.empty[String], "delete")) :+
        ((delOther, Option.empty[String], "delete")) :+
        ((updKey, Some("UPD"), "update")) :+
        ((insKey, Some("NEW"), "insert"))
      ).toDF("id", "payload", "_change")
      val commitsBefore = CommitLog.seqs(fs, new Path(m)).size
      val st = ManifestMergeSink.applyChangesManifested(spark, m, changes,
        "id", Seq("payload"), nBuckets = 4, txn = Some(("cdc", 5L)))
      assert(st.merge.nUpserted == 1L && st.merge.nMatched == 1L &&
        st.nDeleted == b0keys.size + 1L, s"$st")
      assert(CommitLog.seqs(fs, new Path(m)).size == commitsBefore + 1,
        "deletes + upserts + watermark must be ONE commit")
      val snap = ManifestMergeSink.readManifested(spark, m)
      assert(snap.count() == 60L - b0keys.size - 1L + 1L)
      assert(snap.filter(col("id").isin(b0keys :+ delOther: _*)).isEmpty)
      assert(snap.filter(col("id") === updKey).select("payload")
        .as[String].head() == "UPD")
      assert(snap.filter(col("id") === insKey).select("payload")
        .as[String].head() == "NEW")
      // the emptied bucket left the mapping (the purge rule)
      val head = ManifestMergeSink.headState(spark, m).get._2
      assert(!head.mapping.contains(0L), s"${head.mapping}")
      assert(head.txns == Map("cdc" -> 5L))
      // an absorbed replay no-ops before writing a byte or a commit
      val gens = dataDirChecksums(fs, m).keySet
      val replay = ManifestMergeSink.applyChangesManifested(spark, m,
        changes, "id", Seq("payload"), nBuckets = 4,
        txn = Some(("cdc", 5L)))
      assert(replay == ManifestMergeSink.ApplyStats(
        MergeSink.MergeStats(0L, 0L, 0L), 0L))
      assert(dataDirChecksums(fs, m).keySet == gens)
      assert(CommitLog.seqs(fs, new Path(m)).size == commitsBefore + 1)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("ledger ids carrying tabs or newlines fail loudly before any write") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_lid_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((1L, "a")).toDF("id", "payload"), "id", Seq("payload"),
        nBuckets = 2)
      val gens = dataDirChecksums(fs, m).keySet
      val e = intercept[IllegalArgumentException] {
        ManifestMergeSink.mergeIntoManifested(spark, m,
          Seq((2L, "b")).toDF("id", "payload"), "id", Seq("payload"),
          nBuckets = 2, txn = Some(("etl\t2024", 1L)))
      }
      assert(e.getMessage.contains("tabs or line breaks"), e.getMessage)
      intercept[IllegalArgumentException] {
        ManifestMergeSink.applyChangesManifested(spark, m,
          Seq((2L, "b", "insert")).toDF("id", "payload", "_change"),
          "id", Seq("payload"), nBuckets = 2, txn = Some(("a\nb", 1L)))
      }
      assert(dataDirChecksums(fs, m).keySet == gens,
        "a rejected id must not have written a generation dir")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("migration: a legacy swap-layout snapshot bootstraps the manifested layout unchanged") {
    // the documented move off the rename-based layouts: read the legacy
    // snapshot, merge it into an empty manifested target — one call,
    // payload parity row-for-row (updatedAt is re-stamped: the merge
    // owns bookkeeping, the migration owns payload)
    val base = java.nio.file.Files.createTempDirectory("graft_mms_mig_")
    try {
      val legacy = s"$base/legacy"
      val m = s"$base/manifested"
      // two waves on the legacy plain-dir layout: update + evolution
      MergeSink.mergeInto(spark, legacy,
        (1L to 80L).map(i => (i, s"v$i")).toDF("id", "payload"),
        "id", Seq("payload"))
      MergeSink.mergeInto(spark, legacy,
        Seq((3L, "v3b", "f3")).toDF("id", "payload", "flag"),
        "id", Seq("payload", "flag"))
      val snap = spark.read.parquet(legacy)
      val payload = snap.columns.filterNot(Set("id", "updatedAt")).toSeq
      ManifestMergeSink.mergeIntoManifested(spark, m,
        snap.select("id", payload: _*), "id", payload, nBuckets = 4)
      val got = ManifestMergeSink.readManifested(spark, m)
        .select("id", "payload", "flag")
      val want = snap.select("id", "payload", "flag")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "migrated snapshot must equal the legacy layout row-for-row")
      // and the new layout is immediately first-class: txn merges land
      val st = ManifestMergeSink.mergeIntoManifested(spark, m,
        Seq((81L, "new", Option.empty[String])).toDF("id", "payload", "flag"),
        "id", payload, nBuckets = 4, txn = Some(("mig", 0L)))
      assert(st.nUpserted == 1L)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("threaded writers: racing merges converge to sequential semantics, one commit each") {
    // the deterministic seams pin the PROTOCOL; this pins the
    // IMPLEMENTATION under real thread interleaving — four writers
    // race unsynchronized merges and the snapshot must come out
    // key-unique with every writer's rows present and exactly one
    // commit per merge call (losers retry, never double-publish)
    val base = java.nio.file.Files.createTempDirectory("graft_mms_thr_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      ManifestMergeSink.mergeIntoManifested(spark, m,
        (1L to 50L).map(i => (i, "seed")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 4)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val runs = (1 to 4).map { tid =>
        Future {
          // each writer: 50 disjoint inserts + an update to shared key 1
          val mine = ((1L to 50L).map(i => (tid * 1000L + i, s"w$tid")) :+
            (1L, s"upd$tid")).toDF("id", "payload")
          ManifestMergeSink.mergeIntoManifested(spark, m, mine, "id",
            Seq("payload"), nBuckets = 4)
        }
      }
      val stats = Await.result(Future.sequence(runs), 5.minutes)
      assert(stats.forall(s => s.nUpserted == 50L && s.nMatched == 1L),
        s"every writer's merge must land exactly: $stats")
      val snap = ManifestMergeSink.readManifested(spark, m)
      assert(snap.count() == 250L, "50 seed + 4x50 disjoint inserts")
      assert(snap.groupBy(col("id")).count().filter(col("count") > 1)
        .isEmpty, "keys must stay unique under contention")
      val shared = snap.filter(col("id") === 1L).select("payload")
        .as[String].head()
      assert(shared.startsWith("upd"),
        s"the shared key holds SOME writer's update, got $shared")
      (1 to 4).foreach { tid =>
        assert(snap.filter(col("payload") === s"w$tid").count() == 50L,
          s"writer $tid's rows must all survive")
      }
      assert(CommitLog.seqs(fs, new Path(m)).size == 5,
        "exactly one commit per merge call — losers never double-publish")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("compaction contention: a merge landing mid-pass forces a re-derive; its rows survive") {
    val base = java.nio.file.Files.createTempDirectory("graft_mms_cc_")
    try {
      val m = s"$base/snap"
      val fs = fsOf(base)
      val rows = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "payload")
      // distributeByBucket=false: legacy fan-out so compaction has
      // multi-file buckets to repair (the merge now writes one file per
      // bucket by default)
      Sparks.withConf(spark,
        "spark.sql.adaptive.coalescePartitions.enabled", "false") {
        ManifestMergeSink.mergeIntoManifested(spark, m, rows, "id",
          Seq("payload"), nBuckets = 4, distributeByBucket = false)
        ManifestMergeSink.mergeIntoManifested(spark, m,
          rows.filter(col("id") % 2 === 0L), "id", Seq("payload"),
          nBuckets = 4, distributeByBucket = false)
      }
      // a merge repoints key 1's bucket with NEW content between the
      // compaction's derivation and its publish: the compaction's CAS
      // loses, it re-derives from the winner's head, and the winner's
      // row must survive (a stale publish would repoint the bucket back
      // to the pre-merge bytes — a lost update)
      val st = ManifestMergeSink.compactManifested(spark, m,
        maxFilesPerBucket = 1,
        beforePublish = () => {
          ManifestMergeSink.mergeIntoManifested(spark, m,
            Seq((1L, "FRESH")).toDF("id", "payload"), "id",
            Seq("payload"), nBuckets = 4)
          ()
        })
      assert(st.nCompacted > 0)
      val got = ManifestMergeSink.readManifested(spark, m)
        .select("id", "payload").as[(Long, String)].collect().toMap
      assert(got.size == 200 && got(1L) == "FRESH",
        s"the mid-pass merge's row must survive compaction: ${got(1L)}")
      val head = ManifestMergeSink.headState(spark, m).get._2
      def fileCount(d: String): Int =
        fs.listStatus(new Path(s"$m/$d"))
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      assert(head.mapping.values.forall(fileCount(_) <= 1),
        "the retried pass still compacts every flagged bucket")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("an EMPTY pipeline id fails loudly before any write") {
    // an empty id renders a 'T\t\t<bid>' line isValid rejects — without
    // the up-front guard the merge failed only at tryAppend's own
    // validator, AFTER the generation dir was written, with a
    // confusing 'refusing to append' message instead of a caller error
    val base = java.nio.file.Files.createTempDirectory("graft_mms_eid_")
    try {
      val m = s"$base/snap"
      val e = intercept[IllegalArgumentException] {
        ManifestMergeSink.mergeIntoManifested(spark, m,
          Seq((1L, "a")).toDF("id", "payload"), "id", Seq("payload"),
          nBuckets = 2, txn = Some(("", 1L)))
      }
      assert(e.getMessage.contains("non-empty"), e.getMessage)
      assert(!fsOf(base).exists(new Path(m)),
        "a rejected empty id must not have written anything")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("span fence: a duplicate instance's WIDER span is rejected, not applied") {
    // the changed-then-reverted interleaving the absorbed check alone
    // misses: instance 1 applies span a→h1 (k: v0→v1); instance 2 —
    // which read watermark a BEFORE that — computed its a→h2 span
    // against the source where k reverted to v0 in (h1, h2], so k is
    // ABSENT from its diff. Unfenced, instance 2's commit records
    // watermark h2 while the replica keeps the h1 intermediate v1 —
    // permanent divergence. The fence (recorded != fromSeq) rejects it.
    val base = java.nio.file.Files.createTempDirectory("graft_mms_fen_")
    try {
      val src = s"$base/src"
      val rep = s"$base/replica"
      val pid = "cdc"
      def mergeSrc(rows: Seq[(Long, String)]): Long = {
        ManifestMergeSink.mergeIntoManifested(spark, src,
          rows.toDF("id", "payload"), "id", Seq("payload"), nBuckets = 4)
        ManifestMergeSink.headState(spark, src).get._1
      }
      val a = mergeSrc(Seq((1L, "v0"), (2L, "x")))
      // replica bootstrapped at a (watermark = a)
      ManifestMergeSink.mergeIntoManifested(spark, rep,
        ManifestMergeSink.readManifestedAt(spark, src, a)
          .select("id", "payload"),
        "id", Seq("payload"), nBuckets = 4, txn = Some((pid, a)))
      val h1 = mergeSrc(Seq((1L, "v1")))          // k changes…
      val h2 = mergeSrc(Seq((1L, "v0")))          // …and reverts
      // instance 2 computes its span a→h2 FIRST (k absent from it)
      val wideSpan = ManifestMergeSink.changesBetween(spark, src, a, h2,
        "id", Seq("payload")).localCheckpoint(true)
      assert(wideSpan.filter(col("id") === 1L).isEmpty,
        "the reverted key must be absent from the wide span (the trap)")
      // instance 1 lands its a→h1 apply (replica now holds v1, mark h1)
      ManifestMergeSink.applyChangesManifested(spark, rep,
        ManifestMergeSink.changesBetween(spark, src, a, h1, "id",
          Seq("payload")),
        "id", Seq("payload"), nBuckets = 4, txn = Some((pid, h1)),
        txnFence = Some(a))
      // instance 2's stale-origin apply must be REJECTED…
      val e = intercept[ManifestMergeSink.StaleSpanException] {
        ManifestMergeSink.applyChangesManifested(spark, rep, wideSpan,
          "id", Seq("payload"), nBuckets = 4, txn = Some((pid, h2)),
          txnFence = Some(a))
      }
      assert(e.getMessage.contains("computed from watermark"), e.getMessage)
      // …and the recompute loop converges the replica to the source head
      val wm = graft.streaming.StreamingCdcApply.applyOnce(spark, src, rep,
        "id", Seq("payload"), nBuckets = 4, pipelineId = pid)
      assert(wm == h2)
      val got = ManifestMergeSink.readManifested(spark, rep)
        .select("id", "payload").as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "v0", 2L -> "x"),
        "the replica must converge to the source, not pin the intermediate")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }
}

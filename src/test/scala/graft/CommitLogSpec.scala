package graft

import org.apache.hadoop.fs.Path
import graft.sinks.CommitLog

/** The commit log's CAS fine print under adversarial schedules — the
  * windows the sink-level specs (LedgeredState / VersionCatalog /
  * ManifestMergeSink) drive only the happy side of. The operative
  * contract: exactly one writer wins a slot, a loser is LOUD, and an
  * in-flight writer's half-written slot is never mistaken for a crashed
  * one (the slow-writer/crashed-writer ambiguity is resolved by AGE —
  * see [[CommitLog.DefaultReclaimGraceMs]]). */
class CommitLogSpec extends SparkSpec {

  private val valid = (s: String) => s.endsWith("\nEND")
  private def content(tag: String) = s"payload-$tag\nEND"

  private def withRoot(f: (org.apache.hadoop.fs.FileSystem, Path) => Unit): Unit = {
    val base = java.nio.file.Files.createTempDirectory("graft_clog_")
    val root = new Path(s"$base/log")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try f(fs, root)
    finally fs.delete(new Path(base.toString), true)
  }

  private def slot(root: Path, seq: Long) =
    new Path(s"$root/_commits/${"%020d".format(seq)}")

  test("a slow concurrent writer's in-flight slot conflicts — it is never reclaimed young") {
    withRoot { (fs, root) =>
      CommitLog.tryAppend(fs, root, 0L, content("base"), valid)
      // writer W1: create() returned, content not yet streamed — the
      // byte state a crashed writer would also leave
      fs.mkdirs(new Path(root, "_commits"))
      val w1 = fs.create(slot(root, 2L), false)
      // writer W2 at the same head: the young invalid slot must read as
      // an in-flight writer, not reclaimable residue — deleting it here
      // would let BOTH writers return success (the silent lost update)
      val e = intercept[CommitLog.CommitConflictException] {
        CommitLog.tryAppend(fs, root, 1L, content("w2"), valid)
      }
      assert(e.getMessage.contains("reclaim grace"))
      assert(fs.exists(slot(root, 2L)), "W1's in-flight slot must survive")
      // W1 finishes streaming its content and closes — its commit wins
      w1.write(content("w1").getBytes("UTF-8")); w1.close()
      assert(CommitLog.head(fs, root, valid).contains(2L -> content("w1")),
        "the slow writer's commit must land intact")
      // W2 retries against the NEW head and lands in the next slot
      assert(CommitLog.tryAppend(fs, root, 2L, content("w2"), valid) == 3L)
      assert(CommitLog.head(fs, root, valid).contains(3L -> content("w2")))
    }
  }

  test("aged invalid residue (a genuinely crashed writer) is reclaimed") {
    withRoot { (fs, root) =>
      CommitLog.tryAppend(fs, root, 0L, content("base"), valid)
      val out = fs.create(slot(root, 2L), false)
      out.write("truncated-no-sentinel".getBytes("UTF-8")); out.close()
      fs.setTimes(slot(root, 2L), System.currentTimeMillis() - 120000L, -1L)
      // readers skip the residue; the next writer reclaims the slot
      assert(CommitLog.head(fs, root, valid).contains(1L -> content("base")))
      assert(CommitLog.tryAppend(fs, root, 1L, content("w2"), valid) == 2L)
      assert(CommitLog.head(fs, root, valid).contains(2L -> content("w2")))
    }
  }

  test("reclaim refuses an unvouched store scheme; the capability flag unlocks it") {
    // the class doc's lost-update window (reclaimer publishes, then the
    // stalled owner's unconditional PUT overwrites it) requires a
    // RECLAIM on a store with neither inode nor conditional-PUT
    // semantics — so the reclaim path must fail loudly there unless the
    // operator asserts the capability (graft.commitlog.conditional-put)
    withRoot { (localFs, root) =>
      val conf = new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration)
      // FilterFileSystem delegates getConf to the WRAPPED fs — pin our
      // private conf so the flag flip below stays test-local
      val fs = new org.apache.hadoop.fs.FilterFileSystem(localFs) {
        override def getScheme: String = "mockobj" // unvouched scheme
        override def getConf: org.apache.hadoop.conf.Configuration = conf
      }
      CommitLog.tryAppend(fs, root, 0L, content("base"), valid)
      val out = fs.create(slot(root, 2L), false)
      out.write("truncated-no-sentinel".getBytes("UTF-8")); out.close()
      fs.setTimes(slot(root, 2L), System.currentTimeMillis() - 120000L, -1L)
      val e = intercept[CommitLog.ReclaimUnsupportedException] {
        CommitLog.tryAppend(fs, root, 1L, content("w2"), valid)
      }
      assert(e.getMessage.contains(CommitLog.ConditionalPutProp), e.getMessage)
      assert(fs.exists(slot(root, 2L)), "the residue must survive the refusal")
      // same store, capability asserted → the reclaim proceeds
      conf.setBoolean(CommitLog.ConditionalPutProp, true)
      assert(CommitLog.tryAppend(fs, root, 1L, content("w2"), valid) == 2L)
      assert(CommitLog.head(fs, root, valid).contains(2L -> content("w2")))
    }
  }

  test("a VALID slot is never deleted or rewritten, whatever its age") {
    withRoot { (fs, root) =>
      CommitLog.tryAppend(fs, root, 0L, content("base"), valid)
      fs.setTimes(slot(root, 1L), 1000L, -1L) // ancient
      intercept[CommitLog.CommitConflictException] {
        CommitLog.tryAppend(fs, root, 0L, content("late"), valid)
      }
      assert(CommitLog.head(fs, root, valid).contains(1L -> content("base")))
    }
  }

  test("the CAS holds when a competitor lands BETWEEN the precheck and the create") {
    // the seam a store without conditional PUT exposes: the exists
    // precheck passes, and the winner's file lands in the instant
    // before OUR create — the create itself must be the arbiter. An
    // injected FilterFileSystem makes that interleave deterministic.
    // getScheme is overridden so tryAppend takes the REMOTE branch
    // (plain create(overwrite=false)) — on file:// the O_EXCL slot
    // reservation makes this window impossible by construction.
    withRoot { (fs, root) =>
      CommitLog.tryAppend(fs, root, 0L, content("base"), valid)
      var raced = false
      val racy = new org.apache.hadoop.fs.FilterFileSystem(fs) {
        override def getScheme: String = "mockstore"
        override def create(f: Path,
                            permission: org.apache.hadoop.fs.permission.FsPermission,
                            overwrite: Boolean, bufferSize: Int,
                            replication: Short, blockSize: Long,
                            progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
          if (!overwrite && f.toString.contains("_commits") && !raced) {
            raced = true
            // the competitor publishes the SAME slot right now
            CommitLog.tryAppend(fs, root, 1L, content("winner"), valid)
          }
          super.create(f, permission, overwrite, bufferSize, replication,
            blockSize, progress)
        }
      }
      val e = intercept[CommitLog.CommitConflictException] {
        CommitLog.tryAppend(racy, root, 1L, content("loser"), valid)
      }
      assert(raced, "the injected race must have fired")
      assert(e.getMessage.contains("re-read and retry"), e.getMessage)
      // the winner's commit is intact — never clobbered by the loser
      assert(CommitLog.head(fs, root, valid).contains(2L -> content("winner")))
      // and the loser's retry against the fresh head lands cleanly
      assert(CommitLog.tryAppend(fs, root, 2L, content("loser"), valid) == 3L)
      assert(CommitLog.head(fs, root, valid).contains(3L -> content("loser")))
    }
  }

  test("real threads: exactly one winner per slot under simultaneous appends") {
    // the local-FS CAS is O_EXCL-atomic, not check-then-act: eight
    // threads releasing on a barrier race ONE slot, and exactly one
    // may return success — a shared slot (the pre-fix local behavior:
    // both pass the exists check, the second truncates the first)
    // fails this immediately
    withRoot { (fs, root) =>
      CommitLog.tryAppend(fs, root, 0L, content("base"), valid)
      import java.util.concurrent._
      val n = 8
      val pool = Executors.newFixedThreadPool(n)
      try {
        val barrier = new CyclicBarrier(n)
        val results = (1 to n).map { i =>
          pool.submit(new Callable[Option[String]] {
            def call(): Option[String] = {
              barrier.await()
              try { CommitLog.tryAppend(fs, root, 1L, content(s"w$i"), valid)
                    Some(s"w$i") }
              catch { case _: CommitLog.CommitConflictException => None }
            }
          })
        }
        val winners = results.flatMap(_.get(60, TimeUnit.SECONDS))
        assert(winners.size == 1, s"one slot, one winner — got $winners")
        val (s, c) = CommitLog.head(fs, root, valid).get
        assert(s == 2L && c == content(winners.head),
          "the winner's bytes must land intact, never truncated by a loser")
      } finally pool.shutdown()
    }
  }

  test("sweep honors the margin and never touches the head") {
    withRoot { (fs, root) =>
      (0L until 5L).foreach(s =>
        CommitLog.tryAppend(fs, root, s, content(s"c${s + 1}"), valid))
      assert(CommitLog.sweep(fs, root, 4L) == Seq(1L, 2L, 3L))
      assert(CommitLog.seqs(fs, root) == Seq(4L, 5L),
        "the margin commit and the head must survive")
      assert(CommitLog.sweep(fs, root, 99L) == Seq(4L),
        "sweep past head must still keep the head")
      assert(CommitLog.seqs(fs, root) == Seq(5L))
    }
  }

  test("remote branch: a stalled owner's late PUT never silently replaces a reclaimer's commit") {
    // the else-branch analog of the file:// stalled-owner test: on a
    // store where create and the content landing are separate (HDFS;
    // S3A without conditional PUT, where close() is an unconditional
    // object PUT), the owner's resumed write CAN land over the
    // reclaimer's published commit — the post-write read-back must
    // turn that into a loud conflict, never success
    withRoot { (fs, root) =>
      // the operator vouched the store (else the reclaim refuses — see
      // the capability-gate test); the read-back below is the
      // defense-in-depth layer behind a wrong vouch
      val vouched = new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration)
      vouched.setBoolean(CommitLog.ConditionalPutProp, true)
      val remote = new org.apache.hadoop.fs.FilterFileSystem(fs) {
        override def getScheme: String = "mockstore"
        override def getConf: org.apache.hadoop.conf.Configuration = vouched
      }
      CommitLog.tryAppend(remote, root, 0L, content("base"), valid)
      val e = intercept[CommitLog.CommitConflictException] {
        CommitLog.tryAppend(remote, root, 1L, content("stalled-owner"), valid,
          beforeStream = () => {
            fs.setTimes(slot(root, 2L),
              System.currentTimeMillis() - 120000L, -1L)
            CommitLog.tryAppend(remote, root, 1L, content("reclaimer"), valid)
          })
      }
      assert(e.getMessage.contains("reclaimed"), e.getMessage)
      assert(CommitLog.head(fs, root, valid).contains(2L -> content("reclaimer")),
        "the reclaimer's commit must survive the stalled owner's late PUT")
    }
  }

  test("an owner stalled past the grace NEVER truncates a reclaimer's commit") {
    // the write handle is obtained atomically WITH the O_EXCL
    // reservation (CREATE_NEW), so it is pinned to the reservation's
    // inode: when a reclaimer unlinks the aged empty reservation and
    // publishes its own commit in the slot, the resumed owner's bytes
    // go to the ORPHANED inode — and the owner must report a loud
    // conflict (read-back mismatch), never success, never truncation.
    // Pre-fix, the owner reopened the PATH with overwrite=true and
    // silently clobbered the reclaimer's valid commit; both returned
    // success — the exact lost update the CAS exists to prevent.
    withRoot { (fs, root) =>
      CommitLog.tryAppend(fs, root, 0L, content("base"), valid)
      val e = intercept[CommitLog.CommitConflictException] {
        CommitLog.tryAppend(fs, root, 1L, content("stalled-owner"), valid,
          beforeStream = () => {
            // the owner stalls here (GC pause / NFS hang) long enough
            // that its empty reservation ages past the reclaim grace…
            fs.setTimes(slot(root, 2L),
              System.currentTimeMillis() - 120000L, -1L)
            // …and a second writer reclaims the slot and publishes
            CommitLog.tryAppend(fs, root, 1L, content("reclaimer"), valid)
          })
      }
      assert(e.getMessage.contains("reclaimed"), e.getMessage)
      assert(CommitLog.head(fs, root, valid).contains(2L -> content("reclaimer")),
        "the reclaimer's commit must survive the stalled owner's resume")
      // the owner's retry against the fresh head lands in the next slot
      assert(CommitLog.tryAppend(fs, root, 2L,
        content("stalled-owner"), valid) == 3L)
    }
  }
}

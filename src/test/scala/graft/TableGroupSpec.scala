package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sinks.{CommitLog, ManifestMergeSink, TableGroup}

/** The multi-table atomic publish: child commits invisible until the
  * root pin flip, snapshot-consistent reads under one root resolution,
  * monotone pin merges under contention, loud staleness. */
class TableGroupSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(base: java.nio.file.Path) =
    new Path(base.toString).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def seed(root: String, table: String, rows: Seq[(Long, String)],
                   nBuckets: Int = 4): Long = {
    ManifestMergeSink.mergeIntoManifested(spark,
      TableGroup.tablePath(root, table),
      rows.toDF("id", "payload"), "id", Seq("payload"), nBuckets)
    ManifestMergeSink.headState(spark,
      TableGroup.tablePath(root, table)).get._1
  }

  test("child commits are invisible to group readers until the root pin flips") {
    val base = java.nio.file.Files.createTempDirectory("graft_tg_vis_")
    try {
      val root = s"$base/group"
      val a1 = seed(root, "a", Seq((1L, "a1")))
      val b1 = seed(root, "b", Seq((1L, "b1")))
      TableGroup.publishPins(spark, root, Map("a" -> a1, "b" -> b1))
      // a second transaction's children land durably...
      val a2 = seed(root, "a", Seq((2L, "a2")))
      val b2 = seed(root, "b", Seq((2L, "b2")))
      // ...but group readers still see transaction 1 for BOTH tables
      val pins = TableGroup.headPins(spark, root).get._2
      assert(TableGroup.readPinned(spark, root, "a", pins).count() == 1L)
      assert(TableGroup.readPinned(spark, root, "b", pins).count() == 1L)
      // the flip publishes both at once
      TableGroup.publishPins(spark, root, Map("a" -> a2, "b" -> b2))
      val pins2 = TableGroup.headPins(spark, root).get._2
      assert(TableGroup.readPinned(spark, root, "a", pins2).count() == 2L)
      assert(TableGroup.readPinned(spark, root, "b", pins2).count() == 2L)
      // an old resolution keeps reading its consistent pair (retention)
      assert(TableGroup.readPinned(spark, root, "a", pins).count() == 1L)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("contention: disjoint transactions both land; overlapping pins merge monotone") {
    val base = java.nio.file.Files.createTempDirectory("graft_tg_con_")
    try {
      val root = s"$base/group"
      val a1 = seed(root, "a", Seq((1L, "a1")))
      val b1 = seed(root, "b", Seq((1L, "b1")))
      // writer A publishes table a; writer B (landing first through the
      // seam) publishes table b — the loser's metadata retry must keep
      // BOTH pins
      TableGroup.publishPins(spark, root, Map("a" -> a1),
        beforePublish = () => {
          TableGroup.publishPins(spark, root, Map("b" -> b1)); ()
        })
      val pins = TableGroup.headPins(spark, root).get._2.pins
      assert(pins == Map("a" -> a1, "b" -> b1), s"pins: $pins")
      // overlapping: B advances a to a newer child version first; A's
      // older-pin publish merges to the max (per-table monotonicity)
      val a2 = seed(root, "a", Seq((2L, "a2")))
      val a3 = seed(root, "a", Seq((3L, "a3")))
      assert(a3 > a2)
      TableGroup.publishPins(spark, root, Map("a" -> a2),
        beforePublish = () => {
          TableGroup.publishPins(spark, root, Map("a" -> a3)); ()
        })
      val after = TableGroup.headPins(spark, root).get._2.pins
      assert(after("a") == a3, s"pins must never regress: $after")
      // A's a2 publish was fully absorbed by B's a3 — NO fourth commit
      assert(CommitLog.seqs(fsOf(base),
        new Path(root)).size == 3,
        "an absorbed publish must not commit")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("stale pins absorb without committing; unknown tables fail loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft_tg_st_")
    try {
      val root = s"$base/group"
      val a1 = seed(root, "a", Seq((1L, "a1")))
      val a2 = seed(root, "a", Seq((2L, "a2")))
      TableGroup.publishPins(spark, root, Map("a" -> a2))
      val commits = CommitLog.seqs(fsOf(base), new Path(root)).size
      // a1's history is subsumed by a2's (the child log serialized
      // them): publishing the older pin is an absorbed no-op
      TableGroup.publishPins(spark, root, Map("a" -> a1))
      assert(TableGroup.headPins(spark, root).get._2.pins("a") == a2)
      assert(CommitLog.seqs(fsOf(base), new Path(root)).size == commits)
      val e2 = intercept[IllegalArgumentException] {
        TableGroup.readPinned(spark, root, "nope")
      }
      assert(e2.getMessage.contains("not pinned"), e2.getMessage)
      val e3 = intercept[IllegalArgumentException] {
        TableGroup.readPinned(spark, s"$base/empty", "a")
      }
      assert(e3.getMessage.contains("no committed table group"), e3.getMessage)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("group change feed: unpinned member all-inserts, untouched member empty, missing root loud") {
    val base = java.nio.file.Files.createTempDirectory("graft_tg_cf_")
    try {
      val root = s"$base/group"
      val a1 = seed(root, "a", Seq((1L, "a1"), (2L, "a2")))
      val r1 = TableGroup.publishPins(spark, root, Map("a" -> a1))
      // transaction 2 ADDS table b; a's pin does not move
      val b1 = seed(root, "b", Seq((7L, "b7")))
      val r2 = TableGroup.publishPins(spark, root,
        Map("a" -> a1, "b" -> b1))
      val fb = TableGroup.changesBetween(spark, root, "b", r1, r2,
        "id", Seq("payload"))
        .select("id", "payload", "_change").as[(Long, String, String)]
        .collect().toSet
      assert(fb == Set((7L, "b7", "insert")),
        "a member unpinned at the older root surfaces as all-inserts")
      assert(TableGroup.changesBetween(spark, root, "a", r1, r2,
        "id", Seq("payload")).isEmpty,
        "an untouched member's span is empty")
      val e = intercept[IllegalArgumentException] {
        TableGroup.changesBetween(spark, root, "b", 90L, 99L, "id",
          Seq("payload"))
      }
      assert(e.getMessage.contains("no retained root commit"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        TableGroup.changesBetween(spark, root, "nope", r1, r2, "id",
          Seq("payload"))
      }
      assert(e2.getMessage.contains("not pinned"), e2.getMessage)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("real threads: intents serialize same-pair transactions, readers never torn") {
    // q223 pins the torn window through a deterministic seam; this is
    // the REAL-THREAD evidence: several writers transact on the SAME
    // table pair (so every pair conflicts — intents must serialize
    // them, TableBusyException → retry), each transaction writing the
    // SAME value to both tables; a reader resolving the root pins
    // between publishes must ALWAYS see the pair agree. A torn flip
    // (one table's new value beside the other's old) fails the reader
    // immediately.
    val base = java.nio.file.Files.createTempDirectory("graft_tg_thr_")
    try {
      val root = s"$base/group"
      import java.util.concurrent._
      def txnOnce(v: Long): Unit =
        TableGroup.transact(spark, root, Seq("x", "y")) {
          val xs = seed(root, "x", Seq((1L, s"v$v")))
          val ys = seed(root, "y", Seq((1L, s"v$v")))
          Map("x" -> xs, "y" -> ys)
        }
      txnOnce(0L) // seed so readers always have a resolvable root
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
      val pool = Executors.newFixedThreadPool(4)
      val reader = pool.submit(new Runnable {
        def run(): Unit = while (!stop.get()) {
          val pins = TableGroup.headPins(spark, root).get._2
          val vx = TableGroup.readPinned(spark, root, "x", pins)
            .select("payload").head().getString(0)
          val vy = TableGroup.readPinned(spark, root, "y", pins)
            .select("payload").head().getString(0)
          if (vx != vy) { torn.set(s"x=$vx y=$vy"); stop.set(true) }
        }
      })
      // a barrier releases all first attempts together: exactly one
      // acquires the (x, y) intents, the rest MUST see busy — the
      // contention the test exists to drive is deterministic
      val barrier = new CyclicBarrier(3)
      val writers = (1 to 3).map { w =>
        pool.submit(new Callable[Int] {
          def call(): Int = {
            barrier.await()
            var done = 0
            var busyRetries = 0
            while (done < 2 && !stop.get()) {
              try { txnOnce(w * 10L + done); done += 1 }
              catch {
                case _: TableGroup.TableBusyException =>
                  busyRetries += 1; Thread.sleep(50)
              }
            }
            busyRetries
          }
        })
      }
      val retries = writers.map(_.get(300, TimeUnit.SECONDS))
      stop.set(true); reader.get(60, TimeUnit.SECONDS)
      pool.shutdown()
      assert(torn.get() == null, s"torn pair observed: ${torn.get()}")
      assert(retries.sum > 0,
        "same-pair transactions must actually have contended")
      // final state: both tables agree on the last writer's value
      val pins = TableGroup.headPins(spark, root).get._2
      val vx = TableGroup.readPinned(spark, root, "x", pins)
        .select("payload").head().getString(0)
      val vy = TableGroup.readPinned(spark, root, "y", pins)
        .select("payload").head().getString(0)
      assert(vx == vy)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("vacuumGroup sweeps superseded roots and ADVANCES the pinned floor") {
    val base = java.nio.file.Files.createTempDirectory("graft_tg_vac_")
    try {
      val root = s"$base/group"
      // five publishes of table a — the floor must not stay at the first
      val seqs = (1 to 5).map(i => seed(root, "a", Seq((i.toLong, s"a$i"))))
      seqs.foreach(s => TableGroup.publishPins(spark, root, Map("a" -> s)))
      val aPath = TableGroup.tablePath(root, "a")
      assert(TableGroup.pinnedFloor(spark, aPath).contains(seqs.head),
        "pre-vacuum the floor spans every publish in history")
      val swept = TableGroup.vacuumGroup(spark, root, keepLast = 1)
      assert(swept.nonEmpty, "superseded roots must be swept")
      assert(TableGroup.pinnedFloor(spark, aPath).contains(seqs(3)),
        "post-vacuum the floor is the oldest RETAINED pin (head + 1 margin)")
      // the retained views still read their consistent states
      val pins = TableGroup.headPins(spark, root).get._2
      assert(TableGroup.readPinned(spark, root, "a", pins).count() == 5L)
      assert(TableGroup.vacuumGroup(spark, s"$base/nothing").isEmpty,
        "an empty root vacuums to nothing, loudlessly")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("in-flight intents: a shared table conflicts loudly, disjoint tables proceed") {
    val base = java.nio.file.Files.createTempDirectory("graft_tg_int_")
    try {
      val root = s"$base/group"
      val a1 = seed(root, "a", Seq((1L, "a1")))
      val b1 = seed(root, "b", Seq((1L, "b1")))
      val c1 = seed(root, "c", Seq((1L, "c1")))
      TableGroup.transact(spark, root, Seq("a", "b")) {
        // inside A's transaction: a DISJOINT transaction on c lands fine
        val seq = TableGroup.transact(spark, root, Seq("c"))(Map("c" -> c1))
        assert(seq >= 1L)
        // but a transaction SHARING table b is refused before any work
        val e = intercept[TableGroup.TableBusyException] {
          TableGroup.withTableIntents(spark, root, Seq("b", "c")) {
            fail("the body must never run under a shared-table conflict")
          }
        }
        assert(e.getMessage.contains("in-flight transaction"), e.getMessage)
        Map("a" -> a1, "b" -> b1)
      }
      // markers released on publish: the same tables acquire cleanly now
      TableGroup.withTableIntents(spark, root, Seq("a", "b", "c")) { () }
      val pins = TableGroup.headPins(spark, root).get._2.pins
      assert(pins == Map("a" -> a1, "b" -> b1, "c" -> c1))
      // a crashed holder's marker ages out and is reclaimed
      val fs = fsOf(base)
      val marker = new Path(s"$root/_intents/a")
      fs.create(marker, false).close()
      fs.setTimes(marker, System.currentTimeMillis() - 3600000L, -1L)
      TableGroup.withTableIntents(spark, root, Seq("a")) { () } // reclaims
      // undeclared pins are refused (the guard covers declared tables)
      val e2 = intercept[IllegalArgumentException] {
        TableGroup.transact(spark, root, Seq("a"))(Map("a" -> a1, "b" -> b1))
      }
      assert(e2.getMessage.contains("must be declared"), e2.getMessage)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("reclaim verifies marker identity: a fresh holder acquired mid-reclaim is never revoked") {
    val base = java.nio.file.Files.createTempDirectory("graft_tg_toctou_")
    try {
      val root = s"$base/group"
      val fs = fsOf(base)
      val marker = new Path(s"$root/_intents/a")
      fs.mkdirs(marker.getParent)
      // an aged (stalled) holder's marker, carrying its own token
      val stale = fs.create(marker, false)
      stale.write("stalled-holder-token".getBytes("UTF-8")); stale.close()
      fs.setTimes(marker, System.currentTimeMillis() - 3600000L, -1L)
      // pin the TOCTOU window: between the age check and the reclaim
      // rename, the stalled holder releases and a FRESH transaction
      // acquires — the reclaimer must notice the marker changed hands
      val e = intercept[TableGroup.TableBusyException] {
        TableGroup.withTableIntents(spark, root, Seq("a"),
          beforeReclaimRename = { p =>
            fs.delete(p, false)
            val out = fs.create(p, false)
            out.write("fresh-holder-token".getBytes("UTF-8")); out.close()
          }) { fail("must not acquire over a live holder") }
      }
      assert(e.getMessage.contains("in-flight transaction"), e.getMessage)
      // the live holder's marker was restored untouched
      val in = fs.open(marker)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      assert(content == "fresh-holder-token",
        "the live holder's marker must survive the failed reclaim")
      // once the fresh marker ITSELF ages out, reclaim proceeds cleanly
      fs.setTimes(marker, System.currentTimeMillis() - 3600000L, -1L)
      TableGroup.withTableIntents(spark, root, Seq("a")) { () }
      assert(!fs.exists(marker), "a clean acquire+release leaves no marker")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }
}

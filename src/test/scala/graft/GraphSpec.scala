package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Pure-Scala integer replay of the fixpoint — the independent
    * formulation the Spark loop is gated against. */
  private def prReplay(edges: Seq[(Long, Long, Long)], rounds: Int): Map[Long, Long] = {
    val tw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val cin = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => r(s) * 85 * w / (100 * tw(s)) }.sum
      }
      r = nodes.map(n => n -> (150000L + cin.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("pageRank matches the integer replay on a hand-built weighted graph") {
    // 1 -> 2 (x2), 1 -> 3, 2 -> 3, 3 -> 1, 4 -> 3 ; 5 dangling via 3 -> 5
    val edges = Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L),
      (3L, 1L, 3L), (4L, 3L, 1L), (3L, 5L, 1L))
    val df = edges.toDF("src", "dst", "wt")
    for (rounds <- Seq(1, 3, 5)) {
      val got = Graph.pageRank(df, rounds)
        .as[(Long, Long)].collect().toMap
      assert(got == prReplay(edges, rounds), s"rounds=$rounds")
    }
  }

  test("rank vector is partitioning-invariant and centrality orders sensibly") {
    val edges = (1L to 40L).flatMap { i =>
      // every node links to node 1; chain i -> i+1
      Seq((i, 1L, 1L), (i, i % 40 + 1, 1L))
    }.groupBy(e => (e._1, e._2)).map { case ((s, d), es) => (s, d, es.map(_._3).sum) }
      .toSeq
    val a = Graph.pageRank(edges.toDF("src", "dst", "wt").repartition(1), 4)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(edges.toDF("src", "dst", "wt").repartition(13), 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "integer fixpoint is independent of physical partitioning")
    val hub = a(1L)
    assert((2L to 40L).forall(n => a(n) < hub),
      "the node every other node links to out-ranks all others")
  }

  test("transition edges: per-user consecutive (ts, event_id) pages with multiplicity") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val ev = Seq(
      (1L, ts(0), 10L, """{"k": 7}"""),
      (2L, ts(1), 10L, """{"k": 9}"""),
      (3L, ts(2), 10L, """{"k": 7}"""),
      (4L, ts(3), 10L, """{"k": 9}"""),
      (5L, ts(0), 20L, """{"k": 9}"""), // other user: no cross-user edge
      (6L, ts(0), 30L, """{"k": 1}""")  // single event: no edge at all
    ).toDF("event_id", "ts", "user_id", "props")
    val got = Graph.transitionEdges(ev).as[(Long, Long, Long)].collect().toSet
    assert(got == Set((7L, 9L, 2L), (9L, 7L, 1L)))
  }

  test("graphIngest: boundary transitions survive the split, re-deliveries drop, ledger absorbs replays") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    def ev(id: Long, s: Int, u: Long, k: Int) =
      (id, ts(s), u, "click", 0.0, s"""{"k": $k}""")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    // user 10 crosses the batch boundary (page 1 -> 2 -> | -> 3);
    // user 20 lives in one batch; user 30 appears only in batch 2
    val all = Seq(
      ev(1, 0, 10, 1), ev(2, 10, 10, 2), ev(3, 30, 10, 3),
      ev(4, 5, 20, 7), ev(5, 15, 20, 8),
      ev(6, 40, 30, 9), ev(7, 50, 30, 9))
    val d1 = all.filter(_._2.getTime <= t0.getTime + 20000)
    val d2 = all.filter(_._2.getTime > t0.getTime + 20000) ++
      d1.take(2) // re-delivered slice: must be watermark-dropped
    val base = java.nio.file.Files.createTempDirectory("graft_gi_spec_")
    try {
      val p = s"$base/st"
      assert(Graph.graphIngest(spark, p, d1.toDF(cols: _*), "d1"))
      assert(Graph.graphIngest(spark, p, d2.toDF(cols: _*), "d2"))
      assert(!Graph.graphIngest(spark, p, d2.toDF(cols: _*), "d2"),
        "whole-batch replay must be a ledger no-op")
      val edges = graft.sinks.LedgeredState.readPart(spark, p, "edges").get
        .as[(Long, Long, Long)].collect().toSet
      val whole = Graph.transitionEdges(all.toDF(cols: _*))
        .as[(Long, Long, Long)].collect().toSet
      assert(edges == whole,
        "incremental edge state must equal the whole-log extraction " +
          "(2->3 crosses the boundary; re-delivered rows must not double-count 1->2)")
      assert(whole.contains((2L, 3L, 1L)), "the boundary edge is in the gate at all")
      val front = graft.sinks.LedgeredState.readPart(spark, p, "frontier").get
        .select(col("user_id"), col("page")).as[(Long, Long)].collect().toMap
      assert(front == Map(10L -> 3L, 20L -> 8L, 30L -> 9L))
    } finally {
      val pp = new org.apache.hadoop.fs.Path(base.toString)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }

  test("mass accounting: total rank stays within [N*base, N*initial] — floors and dangling only lose") {
    // steady-state total mass with no losses is exactly N*1e6 (base 0.15
    // + damping 0.85 of the previous total); integer floors and dangling
    // nodes can only DROP micro-units, never mint them
    val cycle = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "wt")
    val dangle = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "wt") // 3 dangles
    for ((df, n) <- Seq((cycle, 3L), (dangle, 3L)); rounds <- Seq(1, 4)) {
      val total = Graph.pageRank(df, rounds).agg(sum(col("pr_micro"))).head().getLong(0)
      assert(total <= n * 1000000L, s"mass minted: $total")
      assert(total >= n * 150000L, s"base mass lost: $total")
    }
  }

  test("triangles: counted once each, equal to the brute-force triple scan") {
    import spark.implicits._
    import graft.operators.Graph
    // K4 on {1..4} (4 triangles) + a pendant (5) + a hub (6) wired to
    // 1,2 without closing (adds the 1-2-6 triangle only), self-loop and
    // duplicate/reversed edges thrown in to exercise simplification
    val raw = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 1L), (2L, 6L), (2L, 1L), (3L, 3L), (1L, 2L))
    val edges = raw.toDF("src", "dst").withColumn("wt", lit(1L))
    val got = Graph.triangles(edges)
      .as[(Long, Long, Long)].collect()
      .map(t => Set(t._1, t._2, t._3)).toSeq
    // each triangle exactly once
    assert(got.size == got.toSet.size, s"duplicate triangles: $got")
    // brute force over all unordered triples of the simplified graph
    val und = raw.filter(e => e._1 != e._2)
      .map(e => Set(e._1, e._2)).toSet
    val nodes = und.flatten.toSeq.sorted
    val brute = (for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if und(Set(i, j)) && und(Set(j, k)) && und(Set(i, k))
    } yield Set(i, j, k)).toSet
    assert(got.toSet == brute && brute.size == 5,
      s"got ${got.toSet}, brute $brute")
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** As-of join edge semantics the oracle's random timestamps can't pin:
  * strictness at the exact same instant, nulls before any right row,
  * and per-key isolation. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("strictly-earlier semantics: a same-instant right row is not visible") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 11:00:00"), "e2"),
      (2L, ts("2024-01-01 10:30:00"), "e3")
    ).toDF("k", "lts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0), // same instant as e1
      (1L, ts("2024-01-01 10:30:00"), 200.0),
      (2L, ts("2024-01-01 09:00:00"), 300.0)
    ).toDF("k", "rts", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts",
        Map("rts" -> "p_ts", "v" -> "p_v"))
      .orderBy("name").collect()
    val byName = out.map(r => r.getAs[String]("name") ->
      Option(r.getAs[java.lang.Double]("p_v")).map(_.doubleValue)).toMap
    assert(byName("e1").isEmpty, "10:00 right row must NOT match the 10:00 left row")
    assert(byName("e2").contains(200.0), "latest prior wins")
    assert(byName("e3").contains(300.0), "keys are isolated")
  }

  test("payload travels as a unit: a NULL field in the latest prior row stays NULL") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "e1")).toDF("k", "lts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), java.lang.Double.valueOf(100.0), "old"),
      // latest prior row: v is NULL — it must NOT fall back to 100.0 from
      // the older row, and tag must come from THIS row
      (1L, ts("2024-01-01 11:00:00"), null.asInstanceOf[java.lang.Double], "new")
    ).toDF("k", "rts", "v", "tag")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts",
        Map("v" -> "p_v", "tag" -> "p_tag"))
      .collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("p_v")),
      "the latest prior row's NULL must win — per-column fallback mixes rows")
    assert(out.head.getAs[String]("p_tag") == "new",
      "all payload fields must come from the same (latest prior) right row")
  }

  test("null-key / null-ts right rows are never visible as prior matches") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "e1")).toDF("k", "lts", "name")
    val right = Seq(
      (null.asInstanceOf[java.lang.Long], ts("2024-01-01 09:00:00"), 1.0),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[Timestamp], 2.0)
    ).toDF("k", "rts", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts", Map("v" -> "p_v"))
      .collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("p_v")),
      "SQL semantics: null key/ts rows match nothing")
  }

  test("left rows with no prior right row keep all left columns and null payload") {
    val left = Seq((1L, ts("2024-01-01 08:00:00"), "early")).toDF("k", "lts", "name")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "rts", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts", Map("v" -> "p_v"))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("name") == "early")
    assert(out.head.isNullAt(out.head.fieldIndex("p_v")))
  }

  test("output cardinality equals the left side (never fans out)") {
    val n = operators.AsofJoin.q31Asof(spark, sf).count()
    assert(n == Tables.events(spark, sf).count())
  }

  test("bucketed range join equals the brute-force inequality join, no dupes") {
    val events = Tables.events(spark, sf)
    val fast = operators.AsofJoin.rangeSelfJoinPairs(
        events, "user_id", "ts", "event_id", windowSec = 3600L)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Long]("dt_sec")))
    assert(fast.length == fast.toSet.size, "each pair must surface exactly once")
    val e = events.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
    val brute = e.alias("a").join(e.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.t") - col("b.t")) <= 3600L * 1000000L)
      .select(col("a.event_id"), col("b.event_id"),
        (abs(col("a.t") - col("b.t")) / 1000000.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fast.toSet == brute.toSet, "bin + probe must find exactly the true pairs")
    assert(fast.nonEmpty)
  }
}

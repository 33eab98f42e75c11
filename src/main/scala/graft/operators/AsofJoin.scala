package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}
import graft.Tables

/** Point-in-time (AS-OF) join — an operator Spark lacks natively,
  * composed from existing primitives per the escalation ladder (compose
  * before custom plan nodes): for every left row, attach the payload of
  * the latest right row with the same key and a STRICTLY earlier
  * timestamp.
  *
  * The naive composition (equi-join on key + ts inequality, then top-1
  * per left row) fans out to |left_per_key| × |right_per_key| rows before
  * pruning — quadratic per key. This one is linear: union the two sides
  * tagged, sort per key by (ts, side), and carry the running last
  * non-null payload over the window — each left row reads the most
  * recent right payload in one pass, ONE shuffle on the key, zero
  * fanout. Ties on ts sort right-side-last, which is exactly the strict
  * `right.ts < left.ts` semantics (a same-instant right row is not yet
  * visible).
  *
  * At 100 TB both sides shuffle once on the key and the window is a
  * sort-merge per partition — the same cost profile as any windowed
  * aggregation, with AQE handling hot keys. */
object AsofJoin {

  /** `payload` = right-side columns to attach (null when no prior right
    * row exists). Left columns pass through unchanged. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // null-key / null-ts right rows can never satisfy `right.ts < left.ts`
    // for any left row under SQL semantics — drop them BEFORE the union,
    // or the window (which groups nulls together and sorts null ts first)
    // would surface them as spurious "prior" matches.
    val rightClean = right.filter(col(key).isNotNull && col(rightTs).isNotNull)
    // The payload travels as ONE nullable struct, not per-column: a single
    // last(struct, ignoreNulls) picks the latest prior right ROW as a unit
    // — its internal NULLs included. Per-column lasts would let a NULL
    // field fall back to an OLDER right row, mixing fields from different
    // rows (not ASOF semantics, and not what DuckDB's ASOF JOIN does).
    val pFields = payload.toSeq
    val pType = StructType(pFields.map { case (in, out) =>
      StructField(out, right.schema(in).dataType, nullable = true) })
    val tagged =
      left.withColumn("__side", lit(1)).withColumn("__ts", col(leftTs))
        .select(Seq(col("__side"), col("__ts")) ++ leftCols.map(col) :+
          lit(null).cast(pType).as("__p"): _*)
      .unionByName(
        rightClean.withColumn("__side", lit(0)).withColumn("__ts", col(rightTs))
          .select(Seq(col("__side"), col("__ts"), col(key)) ++
            leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
            struct(pFields.map { case (in, out) => col(in).as(out) }: _*).as("__p"): _*),
        allowMissingColumns = false)
    // Sort (ts asc, side desc): at the same instant the LEFT row (side 1)
    // comes first, so a right row at exactly left.ts is NOT yet in its
    // preceding frame — the strict `right.ts < left.ts` semantics.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.withColumn("__pl", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        pFields.map { case (_, out) => col("__pl").getField(out).as(out) }: _*)
  }

  /** Query entry: attribute every event to the same user's latest PRIOR
    * purchase (strictly earlier ts). Oracle: DuckDB's native ASOF LEFT
    * JOIN — the two engines reach the same point-in-time semantics by
    * entirely different plans, which is exactly what the hash gate should
    * certify. */
  def q31Asof(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    asofJoin(events, purchases, key = "user_id",
        leftTs = "ts", rightTs = "ts",
        payload = Map("ts" -> "last_purchase_ts", "value" -> "last_purchase_value"))
      .orderBy(col("event_id"))
  }

  val q31AsofSql: String =
    """SELECT e.event_id, e.user_id, e.ts, e.event_type,
      |  p.ts AS last_purchase_ts, p.value AS last_purchase_value
      |FROM events e
      |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
      |                WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id AND e.ts > p.ts
      |ORDER BY event_id""".stripMargin

  /** Range (interval) self-join via time bucketing — the scale form of a
    * pure inequality join (which Spark executes as a per-key cross
    * product): events bucket into `window`-wide bins, so a pair within
    * `window` lands in the same or adjacent bins. One side explodes into
    * (bin, bin+1) probes; the join is pure EQUI on (key, bin). Each pair
    * surfaces exactly once with no distinct: same-bin pairs by id order,
    * adjacent-bin pairs only as (later-bin row, earlier-bin probe). The
    * final |Δt| filter trims bin-edge false positives; output ids are
    * canonicalized (id1 < id2). */
  def rangeSelfJoinPairs(events: DataFrame, key: String, tsCol: String,
                         idCol: String, windowSec: Long): DataFrame = {
    val winUs = windowSec * 1000000L
    val binned = events.select(col(key).as("k"), col(idCol).as("id"),
      unix_micros(col(tsCol)).as("t"),
      floor(unix_micros(col(tsCol)) / winUs).as("bin"))
    val probe = binned.select(col("k"), col("id"), col("t"), col("bin"),
      explode(array(col("bin"), col("bin") + 1)).as("pbin"))
    binned.alias("a")
      .join(probe.alias("b"),
        col("a.k") === col("b.k") && col("a.bin") === col("b.pbin") &&
          ((col("a.bin") === col("b.bin") && col("a.id") < col("b.id")) ||
           col("a.bin") === col("b.bin") + 1))
      .filter(abs(col("a.t") - col("b.t")) <= winUs)
      .select(col("a.k").as(key),
        least(col("a.id"), col("b.id")).as("id1"),
        greatest(col("a.id"), col("b.id")).as("id2"),
        (abs(col("a.t") - col("b.t")) / 1000000.0).cast("long").as("dt_sec"))
  }

  /** Query entry: same-user event pairs within 120 seconds. */
  def q32RangeJoin(spark: SparkSession, dir: String): DataFrame =
    rangeSelfJoinPairs(Tables.events(spark, dir),
        key = "user_id", tsCol = "ts", idCol = "event_id", windowSec = 120L)
      .orderBy(col("id1"), col("id2"))

  val q32RangeJoinSql: String =
    """SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
      |  abs(epoch_us(a.ts) - epoch_us(b.ts)) // 1000000 AS dt_sec
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 120000000
      |ORDER BY id1, id2""".stripMargin
}

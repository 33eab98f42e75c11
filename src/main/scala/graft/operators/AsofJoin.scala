package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
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
    val tagged =
      left.withColumn("__side", lit(1)).withColumn("__ts", col(leftTs))
        .select(Seq(col("__side"), col("__ts")) ++ leftCols.map(col) ++
          payload.values.toSeq.map(out => lit(null).as(s"__p_$out")): _*)
      .unionByName(
        right.withColumn("__side", lit(0)).withColumn("__ts", col(rightTs))
          .select(Seq(col("__side"), col("__ts"), col(key)) ++
            leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
            payload.map { case (in, out) => col(in).as(s"__p_$out") }.toSeq: _*),
        allowMissingColumns = false)
    // Sort (ts asc, side desc): at the same instant the LEFT row (side 1)
    // comes first, so a right row at exactly left.ts is NOT yet in its
    // preceding frame — the strict `right.ts < left.ts` semantics.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPayload = payload.values.toSeq.foldLeft(tagged) { (df, out) =>
      df.withColumn(out, last(col(s"__p_$out"), ignoreNulls = true).over(w))
    }
    withPayload.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.values.toSeq.map(col): _*)
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
}

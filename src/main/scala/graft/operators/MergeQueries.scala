package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sinks.MergeSink

/** Oracle-checkable projection of the merge/upsert semantics over the
  * fixtures: `orders` is the target collection, an aggregate of `lineitem`
  * is the update set (plus synthetic unmatched keys to exercise inserts,
  * and a null status column to exercise null-skip). The timestamps are
  * pinned so the result is deterministic; the production path stamps
  * `current_timestamp()` (see [[graft.sinks.MergeSink.mergeInto]]).
  */
object MergeQueries {

  private val fields = Seq("o_totalprice", "o_orderstatus")

  def q14MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .withColumn("updatedAt", to_timestamp(lit("2025-01-01 00:00:00")))
    val updates = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      // round at 4 decimals: the addends carry exactly 4 decimal digits
      // (price 2dp x discount 2dp), so a 2dp round would tie on half-cents
      // and flip with summation order; 4dp can never tie.
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("o_totalprice"))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 7 === 0, lit(null).cast("string")).otherwise(lit("U")))
      .unionByName(
        Tables.orders(spark, dir)
          .filter(col("o_orderkey") % 100 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit(1.0).as("o_totalprice"), lit("N").as("o_orderstatus")))
    MergeSink.mergePlan(orders, updates, "o_orderkey", fields,
        now = to_timestamp(lit("2026-01-01 00:00:00")))
      .orderBy(col("o_orderkey"))
  }

  val q14MergeUpsertSql: String =
    """WITH upd AS (
      |  SELECT l_orderkey AS o_orderkey,
      |         round(sum(l_extendedprice * (1 - l_discount)), 4) AS o_totalprice,
      |         CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE 'U' END AS o_orderstatus
      |  FROM lineitem GROUP BY l_orderkey
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, 1.0, 'N' FROM orders WHERE o_orderkey % 100 = 0
      |)
      |SELECT coalesce(t.o_orderkey, u.o_orderkey) AS o_orderkey,
      |  coalesce(u.o_totalprice, t.o_totalprice) AS o_totalprice,
      |  coalesce(u.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
      |  CASE WHEN u.o_orderkey IS NOT NULL THEN TIMESTAMP '2026-01-01 00:00:00'
      |       ELSE TIMESTAMP '2025-01-01 00:00:00' END AS "updatedAt"
      |FROM orders t FULL OUTER JOIN upd u ON t.o_orderkey = u.o_orderkey
      |ORDER BY o_orderkey""".stripMargin
}

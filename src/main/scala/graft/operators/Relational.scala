package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational query surface over the TPC-H-ish fixtures (SURVEY.md §2B row 1-2).
  *
  * Every query here is a declarative DataFrame plan: Catalyst handles column
  * pruning, predicate pushdown into the parquet scan, join strategy selection
  * and whole-stage codegen. Explicit `broadcast()` hints mark the dimension
  * sides that are guaranteed small at any scale factor (region=5, nation=25
  * rows — constant-size dims even at 100 TB).
  *
  * Oracle-parity conventions (driver compares against DuckDB by
  * sorted-column-name value hash):
  *  - every computed column is aliased identically here and in the SQL,
  *  - every double aggregate is rounded in-query (both sides) so partial-agg
  *    summation order cannot flip low bits,
  *  - every query ends in a deterministic total ORDER BY.
  */
object Relational {

  /** TPC-H Q1 shape: scan → pushed filter → hash agg → sort.
    * (reference has no aggregations — SURVEY.md §2A "does NOT have"; this is
    * the §2B mandated relational core.) */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") < 45)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_quantity < 45
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}

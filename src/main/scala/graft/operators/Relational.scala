package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** TPC-H Q5 shape: 5-way join, dims broadcast. region (5 rows) and
    * nation (25 rows) are constant-size at any SF, so broadcasting them
    * eliminates two shuffles regardless of fact-table scale; the
    * lineitem⋈orders⋈customer spine shuffles on its keys (AQE re-plans
    * at runtime). */
  def q2JoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q2JoinRevenueSql: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Top-k via global sort+limit (plans as TakeOrderedAndProject — a
    * per-partition top-k then a k-row driver merge, no full sort even at
    * 100 TB). */
  def q3TopkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  val q3TopkOrdersSql: String =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      |FROM lineitem GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin

  /** Grouped top-k via window: top-3 parts per supplier by shipped
    * quantity. Window partitioning shuffles once on l_suppkey; the filter
    * on row_number prunes inside the same stage. */
  def q4WindowTopk(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(round(sum(col("l_quantity")), 4).as("qty"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("qty").desc, col("l_partkey").asc)
    perPart
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("l_suppkey"), col("l_partkey"), col("qty"), col("rk"))
      .orderBy(col("l_suppkey"), col("rk"))
  }

  val q4WindowTopkSql: String =
    """SELECT l_suppkey, l_partkey, qty, rk FROM (
      |  SELECT l_suppkey, l_partkey, qty,
      |    row_number() OVER (PARTITION BY l_suppkey ORDER BY qty DESC, l_partkey ASC) AS rk
      |  FROM (SELECT l_suppkey, l_partkey, round(sum(l_quantity), 4) AS qty
      |        FROM lineitem GROUP BY l_suppkey, l_partkey))
      |WHERE rk <= 3
      |ORDER BY l_suppkey, rk""".stripMargin

  /** Left-semi join (EXISTS): customers that placed at least one
    * high-value order. Semi joins ship only the key column of the probe
    * side and stop at first match — strictly cheaper than inner+distinct. */
  def q5SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 100000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q5SemiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join (NOT EXISTS): parts never shipped in bulk (qty >= 48).
    * The filter lands on the build side before the join, so the anti join
    * probes a much smaller set. */
  def q6AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val p  = Tables.part(spark, dir)
    val li = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 48)
    p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .orderBy(col("p_partkey"))
  }

  val q6AntiJoinSql: String =
    """SELECT p_partkey, p_name, p_brand FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey AND l_quantity >= 48)
      |ORDER BY p_partkey""".stripMargin

  /** Set operations: nations present on the customer side vs the supplier
    * side (UNION / INTERSECT / EXCEPT with a provenance tag). */
  def q7SetOps(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")).distinct()
    val both    = cn.intersect(sn).withColumn("side", lit("both"))
    val custOnly = cn.except(sn).withColumn("side", lit("customer_only"))
    val suppOnly = sn.except(cn).withColumn("side", lit("supplier_only"))
    both.unionByName(custOnly).unionByName(suppOnly)
      .orderBy(col("side"), col("nationkey"))
  }

  val q7SetOpsSql: String =
    """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
      |     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      |SELECT nationkey, 'both' AS side FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
      |UNION ALL
      |SELECT nationkey, 'customer_only' AS side FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
      |UNION ALL
      |SELECT nationkey, 'supplier_only' AS side FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
      |ORDER BY side, nationkey""".stripMargin

  /** ROLLUP over (returnflag, linestatus) with grouping_id — partial
    * aggregation happens map-side for every grouping set in one pass. */
  def q8Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val q8RollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag, l_linestatus)::bigint AS gid,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** CUBE over (returnflag, linestatus): all four grouping sets in one
    * pass, distinguished by grouping_id — with ROLLUP (q8) this covers
    * the full grouping-sets surface (CUBE ≡ GROUPING SETS of the power
    * set; Spark's `cube` and SQL GROUPING SETS lower to the same Expand
    * physical operator). */
  def q30Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q30CubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag, l_linestatus)::bigint AS gid,
      |  round(sum(l_extendedprice), 4) AS sum_price,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS (the asymmetric case rollup/cube can't
    * express: (a,b), (a), (b) — no grand total): Spark 4's typed
    * `groupingSets` API, lowering to the same Expand operator as q8/q30.
    * Sums l_quantity (integer-valued doubles — exact in both engines up
    * to 2⁵³, so the 4-dp round can never straddle a boundary). */
  def q39GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q39GroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag, l_linestatus)::bigint AS gid,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** The rest of the window-function surface next to q12's
    * sum/rank/lag: lead, ntile, percent_rank, cume_dist and framed
    * first/last — one shuffle on the partition key, every function
    * evaluated in the same window pass. percent_rank/cume_dist are exact
    * rationals ((rank-1)/(n-1), rank/n) — both engines compute the
    * identical double, so the display rounding is deterministic. */
  def q40WindowFns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(coalesce(lead(col("o_totalprice"), 1).over(w), lit(-1.0)), 4)
          .as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cdist"),
        round(first(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
          .as("first_price"),
        round(last(col("o_totalprice")).over(
          w.rowsBetween(Window.currentRow, Window.unboundedFollowing)), 4)
          .as("last_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q40WindowFnsSql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(coalesce(lead(o_totalprice, 1) OVER w, -1.0), 4) AS next_price,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 4) AS pct_rank,
      |  round(cume_dist() OVER w, 4) AS cdist,
      |  round(first_value(o_totalprice) OVER
      |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS first_price,
      |  round(last_value(o_totalprice) OVER
      |    (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 4) AS last_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** SQL front-end surface: the same Catalyst pipeline through
    * `spark.sql` — a correlated scalar subquery (orders beating their
    * customer's average), which the optimizer decorrelates into an
    * aggregate + join rather than a per-row subquery execution. The
    * oracle is the IDENTICAL SQL text run by DuckDB. */
  def q34SqlSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(q34SqlSubquerySql)
  }

  val q34SqlSubquerySql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > (SELECT 1.5 * avg(o_totalprice) FROM orders i
      |                      WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** PIVOT: one row per linestatus, one quantity-sum column per return
    * flag. Spark's pivot with explicit values plans as a single
    * partial+final aggregate (each pivot cell is a filtered agg — no
    * per-value scans); the oracle is the equivalent manual CASE
    * aggregation, which is also what Spark lowers pivot to. */
  def q33Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum(col("l_quantity")), 4))
      .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r"))
      .orderBy(col("l_linestatus"))

  val q33PivotSql: String =
    """SELECT l_linestatus,
      |  round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 4) AS qty_a,
      |  round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 4) AS qty_n,
      |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 4) AS qty_r
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Distinct aggregates: exact distinct counts per group. (The approx
    * HLL++ variant is a separate rows-only query — sketches can't
    * hash-match an exact oracle.) */
  def q9Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val q9DistinctSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Approx sketches next to q9's exact distinct (SURVEY.md §2B row 7):
    * approx_count_distinct (HLL++) and percentile_approx. Sketch values
    * can't hash-match an exact cross-engine oracle, so the entry emits
    * TOLERANCE BOOLEANS computed entirely in-engine — the approx value
    * checked against the exact value from the same data — and the oracle
    * emits the exact anchors plus literal TRUE: the hash gate then fails
    * exactly when a sketch leaves its error band (HLL++ default rsd 5%,
    * band 10%; approx p50 must land between the exact p25 and p75).
    *
    * Scale note on the exact quartile anchors: `percentile()` buffers a
    * group's values inside one aggregator — fine at any local scale (the
    * buffers are per-group doubles), a hazard only if group value counts
    * outgrow executor memory, at which point the anchors would move to a
    * per-value histogram + cumulative window (l_quantity's domain is
    * bounded and discrete). Both alternative shapes were measured HERE
    * and rejected: a separate histogram scan costs a second pass over
    * lineitem (5.0 s → 7.6 s) and a grouping-sets fusion doubles the
    * rows through the countDistinct expand (→ 7.2 s); the fused
    * single-agg form below is the right plan at bench scale and the
    * histogram swap is mechanical when group sizes demand it. */
  def q26Sketches(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("exact_supp"),
        approx_count_distinct(col("l_suppkey")).as("acd"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50"),
        // ONE exact-percentile buffer for both quantiles (guide §1.2
        // per-task work): percentile(col, array(..)) shares the single
        // per-group value-count map two scalar percentile() calls would
        // each build — values identical, so p50_ok is unchanged
        expr("percentile(l_quantity, array(0.25, 0.75))").as("p2575"),
        count(lit(1)).as("n_rows"))
      .withColumn("p25", col("p2575").getItem(0))
      .withColumn("p75", col("p2575").getItem(1))
      .select(col("l_returnflag"), col("exact_supp"), col("n_rows"),
        (abs(col("acd") - col("exact_supp")).cast("double") / col("exact_supp") <= 0.1)
          .as("acd_ok"),
        (col("p50") >= col("p25") && col("p50") <= col("p75")).as("p50_ok"))
      .orderBy(col("l_returnflag"))

  val q26SketchesSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_suppkey) AS exact_supp,
      |  count(*) AS n_rows,
      |  TRUE AS acd_ok,
      |  TRUE AS p50_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Scalar function surface: string / date / math expressions, all
    * codegen'd built-ins (SURVEY.md §2B row 2). */
  def q10Scalar(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 100 === 0)
      .select(
        col("o_orderkey"),
        upper(col("o_orderstatus")).as("status_upper"),
        concat_ws("-", col("o_orderpriority"), col("o_orderstatus")).as("prio_tag"),
        length(col("o_orderpriority")).cast("long").as("prio_len"),
        substring(col("o_orderpriority"), 1, 3).as("prio3"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        round(sqrt(abs(col("o_totalprice"))), 4).as("price_sqrt"),
        round(log(col("o_totalprice") + 1), 4).as("price_log"),
        floor(col("o_totalprice") / 1000).cast("long").as("price_bucket"))
      .orderBy(col("o_orderkey"))

  val q10ScalarSql: String =
    """SELECT o_orderkey,
      |  upper(o_orderstatus) AS status_upper,
      |  concat_ws('-', o_orderpriority, o_orderstatus) AS prio_tag,
      |  length(o_orderpriority)::bigint AS prio_len,
      |  substring(o_orderpriority, 1, 3) AS prio3,
      |  year(o_orderdate)::bigint AS o_year,
      |  month(o_orderdate)::bigint AS o_month,
      |  day(o_orderdate)::bigint AS o_day,
      |  round(sqrt(abs(o_totalprice)), 4) AS price_sqrt,
      |  round(ln(o_totalprice + 1), 4) AS price_log,
      |  floor(o_totalprice / 1000)::bigint AS price_bucket
      |FROM orders WHERE o_orderkey % 100 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** JSON extraction from the events.props string column: typed schema via
    * from_json (reference has no JSON surface; §2B mandates it). */
  def q11Json(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k") > 50)
      .orderBy(col("event_id"))

  val q11JsonSql: String =
    """SELECT event_id, event_type,
      |  json_extract(props, '$.k')::bigint AS k
      |FROM events
      |WHERE json_extract(props, '$.k')::bigint > 50
      |ORDER BY event_id""".stripMargin

  /** Typed JSON extraction (SURVEY.md §1.4, the round-1 gap): from_json
    * to an explicit StructType AND to MapType(String, Long) over
    * events.props — both typed paths must agree with each other and with
    * the oracle's json_extract casts. */
  def q27JsonTyped(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val propsSchema = StructType(Seq(StructField("k", LongType)))
    Tables.events(spark, dir)
      .select(
        col("event_id"), col("event_type"),
        from_json(col("props"), propsSchema).as("p"),
        from_json(col("props"), MapType(StringType, LongType)).as("pm"))
      .select(
        col("event_id"), col("event_type"),
        col("p.k").as("k_struct"),
        element_at(col("pm"), "k").as("k_map"),
        (col("p.k") % 10).as("k_bucket"))
      .orderBy(col("event_id"))
  }

  val q27JsonTypedSql: String =
    """SELECT event_id, event_type,
      |  json_extract(props, '$.k')::bigint AS k_struct,
      |  json_extract(props, '$.k')::bigint AS k_map,
      |  json_extract(props, '$.k')::bigint % 10 AS k_bucket
      |FROM events ORDER BY event_id""".stripMargin

  /** Window-function surface: running sum, rank and lag per customer over
    * order time. One shuffle on o_custkey serves all three functions. */
  def q12Window(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4).as("running_spend"),
        rank().over(w).cast("long").as("order_rank"),
        round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 4).as("prev_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q12WindowSql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER w_run, 4) AS running_spend,
      |  rank() OVER w AS order_rank,
      |  round(coalesce(lag(o_totalprice, 1) OVER w, 0.0), 4) AS prev_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
      |       w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Conditional aggregation (TPC-H Q14 shape): promo revenue share via
    * sum(CASE WHEN ...) — no extra scan, no join. */
  def q13CaseAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum(when(col("p_type").startsWith("PROMO"),
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)), 4).as("promo_rev"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("total_rev"),
        count(lit(1)).as("n"))
      .orderBy(col("p_brand"))
  }

  val q13CaseAggSql: String =
    """SELECT p_brand,
      |  round(sum(CASE WHEN p_type LIKE 'PROMO%'
      |            THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 4) AS promo_rev,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev,
      |  count(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin
}

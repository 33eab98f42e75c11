package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew mitigation primitives (SCALE.md "Skew"). AQE's runtime skew-join
  * splitting covers sort-merge joins; the explicit salted form below is
  * for the cases AQE can't rewrite — e.g. a shuffled hash join against a
  * dimension too big to broadcast but small enough to replicate, or a
  * deterministic plan needed ahead of time for a known-hot key.
  *
  * Shape: the BIG side gets a random salt in [0, salts); the SMALL side
  * is replicated once per salt value (explode over a literal range).
  * The join key becomes (key, salt), so one hot key's rows spread over
  * `salts` shuffle partitions instead of one. Cost: small side × salts.
  * Row-level semantics are identical to the unsalted equi-join — every
  * big row still meets every matching small row exactly once (exactly
  * one replica carries its salt).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways. Inner or
    * left_outer (semantics preserved for both; the salt never changes
    * match cardinality). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts=$salts must be positive")
    require(joinType == "inner" || joinType == "left_outer",
      s"salting preserves semantics for inner/left_outer, not $joinType")
    val saltedBig = big.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    val smallCols = small.columns.filterNot(_ == key)
    saltedBig.alias("b")
      .join(saltedSmall.alias("s"),
        col(s"b.$key") === col(s"s.$key") && col("b.__salt") === col("s.__salt"),
        joinType)
      .select(big.columns.map(c => col(s"b.$c")) ++
        smallCols.map(c => col(s"s.$c")): _*)
  }

  /** Salted two-phase aggregation for algebraic aggregates over a
    * hot-keyed groupBy when the per-key combine itself is the bottleneck:
    * phase 1 aggregates (key, salt) partials, phase 2 folds the partials
    * per key. For Spark's built-in algebraic aggs map-side combine
    * already does this implicitly; the explicit form exists for
    * aggregates whose partial state is expensive to merge row-at-a-time
    * (e.g. large collect-style buffers), and as the documented pattern. */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int,
                out: String = "total"): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt", (rand(42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(out))
  }

  // ---- gated query --------------------------------------------------------

  /** q47: the skew primitives under the driver's gate — revenue per
    * market segment through `orders ⋈ customer` executed as
    * [[saltedJoin]] (8 salts), with the revenue total folded through
    * [[saltedSum]]'s explicit two-phase (key, salt) partials. Because
    * both rewrites are semantics-preserving, the oracle is the PLAIN
    * join + group-by: the gate proves the salted forms change the
    * shuffle layout and nothing else. The random salt values never leak
    * into the result — only match cardinality matters, and each big row
    * still meets exactly one replica of its key. */
  def q47SkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .withColumnRenamed("o_custkey", "custkey")
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    // both aggregates read the joined frame: persist the join once
    val joined = saltedJoin(orders, cust, "custkey", salts = 8)
      .select(col("c_mktsegment"), col("o_totalprice")).persist()
    try {
      val counts = joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"))
      val revenue = saltedSum(joined, "c_mktsegment", "o_totalprice",
        salts = 8, out = "revenue_raw")
      counts.join(revenue, "c_mktsegment")
        .select(col("c_mktsegment"), col("n_orders"),
          round(col("revenue_raw"), 4).as("revenue"))
        .orderBy(col("c_mktsegment"))
        .localCheckpoint(true) // materialize before unpersist
    } finally { joined.unpersist(); () }
  }

  val q47SkewJoinSql: String =
    """SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
      |  round(sum(o_totalprice), 4) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin
}

package graft

import graft.operators.Relational

/** Semantic checks on the relational surface (the exact-value gate is the
  * DuckDB oracle at sf0.01; these pin the invariants). */
class RelationalSurfaceSpec extends SparkSpec {

  test("every declared query runs on sf0.001 and has a matching oracle") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("q1_agg: groups by returnflag/linestatus with positive sums, ordered") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9) // <= 3 flags x 3 statuses
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
      assert(r.getAs[Double]("avg_disc") >= 0 && r.getAs[Double]("avg_disc") <= 1)
    }
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted, "deterministic output order")
  }

  test("q3/q4 top-k bounds hold") {
    assert(Relational.q3TopkOrders(spark, sf).count() == 10)
    val rks = Relational.q4WindowTopk(spark, sf).select("rk").distinct().collect().map(_.getInt(0))
    assert(rks.forall(_ <= 3))
  }

  test("q5 semi + q6 anti partition their left sides") {
    val semi = Relational.q5SemiJoin(spark, sf).count()
    val cust = Tables.customer(spark, sf).count()
    assert(semi <= cust && semi > 0)
    val anti = Relational.q6AntiJoin(spark, sf).count()
    val part = Tables.part(spark, sf).count()
    assert(anti <= part)
  }

  test("q7 set ops produce disjoint sides covering the union") {
    val rows = Relational.q7SetOps(spark, sf).collect()
    val bySide = rows.groupBy(_.getAs[String]("side")).view
      .mapValues(_.map(_.getAs[Int]("nationkey")).toSet).toMap
    val both = bySide.getOrElse("both", Set.empty)
    val co = bySide.getOrElse("customer_only", Set.empty)
    val so = bySide.getOrElse("supplier_only", Set.empty)
    assert((both & co).isEmpty && (both & so).isEmpty && (co & so).isEmpty)
  }

  test("q8 rollup grand total equals table count") {
    val rows = Relational.q8Rollup(spark, sf).collect()
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.lineitem(spark, sf).count())
  }

  test("q12 window running sum is monotone per customer") {
    val rows = Relational.q12Window(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      val sums = rs.sortBy(_.getAs[Long]("order_rank"))
        .map(_.getAs[Double]("running_spend")).toSeq
      assert(sums == sums.sorted, "running spend must be non-decreasing in rank order")
    }
  }
}

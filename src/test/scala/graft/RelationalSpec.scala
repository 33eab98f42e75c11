package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  test("q1_agg: groups by returnflag/linestatus with positive sums") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9) // <= 3 flags x 3 statuses
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
      assert(r.getAs[Double]("avg_disc") >= 0 && r.getAs[Double]("avg_disc") <= 1)
    }
    // deterministic order
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }
}

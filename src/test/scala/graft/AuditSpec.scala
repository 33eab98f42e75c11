package graft

import org.apache.spark.sql.functions._
import graft.operators.Audit

class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("fk audit: hand-computed nulls and orphans") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk_val")
    val parent = Seq(1L, 2L, 3L).toDF("pk_val")
    val r = Audit.fkAudit(child, "fk_val", parent, "pk_val", "t").collect().head
    assert(r.getAs[String]("fk") == "t")
    assert(r.getAs[Long]("n_child") == 5L)
    assert(r.getAs[Long]("n_null_fk") == 1L)
    assert(r.getAs[Long]("n_orphans") == 1L) // only the 9
    assert(!r.getAs[Boolean]("intact"))
  }

  test("fk audit: duplicate parent keys don't multiply matches") {
    val child = Seq(1L, 1L, 2L).toDF("fk_val")
    val parent = Seq(1L, 1L, 1L).toDF("pk_val") // dupes in the parent
    val r = Audit.fkAudit(child, "fk_val", parent, "pk_val", "t").collect().head
    assert(r.getAs[Long]("n_child") == 3L && r.getAs[Long]("n_orphans") == 1L)
  }

  test("q101: the real schema is intact, the planted break is caught") {
    val rows = Audit.q101FkAudit(spark, sf).collect()
    assert(rows.length == 8)
    val planted = rows.find(_.getAs[String]("fk").startsWith("planted.")).get
    assert(planted.getAs[Long]("n_orphans") > 0L,
      "the planted parent subset must orphan some lineitems")
    assert(!planted.getAs[Boolean]("intact"))
    rows.filterNot(_.getAs[String]("fk").startsWith("planted.")).foreach { r =>
      assert(r.getAs[Boolean]("intact"), s"${r.getAs[String]("fk")} must be intact")
      assert(r.getAs[Long]("n_orphans") == 0L && r.getAs[Long]("n_null_fk") == 0L)
    }
  }

  test("column profile: hand-computed nulls and distincts") {
    val df = Seq(
      (Some("a"), Some(1)), (Some("a"), None), (Some("b"), Some(2)), (None, Some(2))
    ).toDF("s", "i")
    val out = Audit.columnProfile(df, Seq("s", "i")).collect()
    val byCol = out.map(r => r.getAs[String]("column_name") -> r).toMap
    assert(out.forall(_.getAs[Long]("n_rows") == 4L))
    assert(byCol("s").getAs[Long]("n_null") == 1L)
    assert(byCol("s").getAs[Long]("n_distinct") == 2L)
    assert(byCol("i").getAs[Long]("n_null") == 1L)
    assert(byCol("i").getAs[Long]("n_distinct") == 2L)
  }

  test("sketch profile: exact anchors intact, HLL lands in band at every cardinality") {
    val out = Audit.q104ProfileSketch(spark, sf).collect()
    assert(out.length == 11)
    val byCol = out.map(r => r.getAs[String]("column_name") -> r).toMap
    // spot anchors across the cardinality range
    assert(byCol("l_returnflag").getAs[Long]("n_distinct") == 3L)
    assert(byCol("l_linenumber").getAs[Long]("n_distinct") == 7L)
    assert(byCol("l_quantity").getAs[Long]("n_distinct") == 50L)
    out.foreach { r =>
      assert(r.getAs[Boolean]("approx_in_band"),
        s"HLL out of 5·rsd band for ${r.getAs[String]("column_name")}")
    }
  }

  test("q102 profile: key column is unique, no nulls anywhere in orders") {
    val rows = Audit.q102ColumnProfile(spark, sf).collect()
    assert(rows.length == 6)
    val key = rows.find(_.getAs[String]("column_name") == "o_orderkey").get
    assert(key.getAs[Long]("n_distinct") == key.getAs[Long]("n_rows"))
    rows.foreach(r => assert(r.getAs[Long]("n_null") == 0L))
  }
}

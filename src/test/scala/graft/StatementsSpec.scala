package graft

import graft.update.Statements

/** Statement construction value cases (mirror of tests/test_mongo.py:23-54,
  * :125-151 — null-skip shape, guard drops, map+filter composition). */
class StatementsSpec extends SparkSpec {
  import spark.implicits._

  test("statement holds only non-null payload fields (test_mongo.py:23-35)") {
    val df = Seq(("id1", java.lang.Double.valueOf(1.5), null.asInstanceOf[java.lang.Double]))
      .toDF("_id", "f1", "f2")
    val out = Statements.build(df, "_id", Seq("f1", "f2")).collect()
    assert(out.length == 1)
    val m = out.head.getAs[Map[String, Double]]("set_fields")
    assert(m == Map("f1" -> 1.5))
  }

  test("missing key and all-null payload rows are dropped (test_mongo.py:37-54, :125-151)") {
    val df = Seq(
      (null.asInstanceOf[String], java.lang.Double.valueOf(1.0)),
      ("id2", null.asInstanceOf[java.lang.Double]),
      ("id3", java.lang.Double.valueOf(2.0))
    ).toDF("_id", "f1")
    val out = Statements.build(df, "_id", Seq("f1")).collect()
    assert(out.map(_.getAs[String]("key")).toSet == Set("id3"))
  }

  test("empty field list is rejected (mongo.py:52-57)") {
    val df = Seq(("id1", 1.0)).toDF("_id", "f1")
    intercept[IllegalArgumentException] {
      Statements.build(df, "_id", Seq.empty)
    }
  }
}

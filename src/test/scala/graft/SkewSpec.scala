package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting must never change join/aggregation semantics — only the
  * shuffle distribution. Equivalence is checked against the unsalted
  * forms on a deliberately skewed dataset. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key: 90% of rows share key 1
  private lazy val big = ((1 to 900).map(i => (1L, i.toDouble)) ++
    (1 to 100).map(i => ((i % 7 + 2).toLong, i.toDouble))).toDF("k", "v")
  private lazy val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (99L, "unmatched"))
    .toDF("k", "name")

  test("salted inner join equals the plain join on a skewed key") {
    val plain = big.join(small, "k").select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(salted.sorted.toSeq == plain.sorted.toSeq)
    // matched rows = big rows whose key exists in small (keys 1, 2, 3)
    val expected = big.collect().count(r => Set(1L, 2L, 3L)(r.getLong(0)))
    assert(plain.length == expected && expected > 900)
  }

  test("salted left_outer join preserves unmatched big rows exactly once") {
    val withOrphan = big.unionByName(Seq((77L, 0.0)).toDF("k", "v"))
    val plain = withOrphan.join(small, Seq("k"), "left_outer")
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2))))
    val salted = Skew.saltedJoin(withOrphan, small, "k", salts = 4, "left_outer")
      .collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2))))
    assert(salted.sortBy(t => (t._1, t._2)).toSeq == plain.sortBy(t => (t._1, t._2)).toSeq)
    // every big row with a key absent from small (4..8 and the 77 orphan)
    // survives exactly once with null payload
    val expectedNulls = withOrphan.collect().count(r => !Set(1L, 2L, 3L)(r.getLong(0)))
    assert(salted.count(_._3.isEmpty) == expectedNulls && expectedNulls >= 1)
  }

  test("salted two-phase sum equals the direct aggregation") {
    val direct = big.groupBy("k").agg(sum("v").as("total"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(big, "k", "v", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, v) =>
      assert(math.abs(v - direct(k)) < 1e-9, s"key $k")
    }
  }

  test("q47 gate: salted join + salted sum reproduce the plain plan's answer") {
    val row = Skew.q47SkewJoin(spark, sf).collect()
    val expected = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 4).as("revenue"))
      .orderBy("c_mktsegment").collect()
    assert(row.length == expected.length && row.length == 5,
      "TPC-H has five market segments")
    row.zip(expected).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getLong(1) == b.getLong(1))
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-6)
    }
  }

  test("the salt actually spreads the hot key across partitions") {
    val salted = big.withColumn("__salt", (rand(42) * 8).cast("int"))
      .filter(col("k") === 1L)
      .select("__salt").distinct().count()
    assert(salted >= 4, "the hot key's rows must land in several salt buckets")
  }

  test("skew ingest: a hot key split across batches keeps its true maximum") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_skspec_")
    try {
      val path = s"$base/state"
      // key 1 has 4 rows total, but at most 2 in any one batch: a
      // per-batch maximum would say 2; the folded state must say 4
      val b1 = Seq(1L, 1L, 2L).toDF("k")
      val b2 = Seq(1L, 1L, 3L).toDF("k")
      assert(Skew.skewIngest(spark, path, b1, "k", "b1"))
      assert(Skew.skewIngest(spark, path, b2, "k", "b2"))
      assert(!Skew.skewIngest(spark, path, b2, "k", "b2"), "replay no-op")
      val rep = Skew.skewReportFromCounts(
          graft.sinks.LedgeredState.readPart(spark, path, "key_counts").get,
          topN = 1, targetRows = 2L).collect()
      val hot = rep.find(_.getString(0) == "key").get
      assert(hot.getLong(2) == 1L && hot.getLong(3) == 4L, "true cross-batch max")
      val s = rep.find(_.getString(0) == "summary").get
      assert(s.getAs[Long]("salt") == 2L, "ceil(4/2)")
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("skew report: hand-computed ranks, ratio, and salt recommendation") {
    import spark.implicits._
    val frame = Seq(1L, 1L, 1L, 1L, 2L, 2L, 3L).toDF("k")
    val rep = Skew.skewReport(frame, "k", topN = 2, targetRows = 2L).collect()
    val keys = rep.filter(_.getString(0) == "key")
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(keys.toSeq == Seq((1L, 1L, 4L), (2L, 2L, 2L)), s"hot keys: ${keys.toSeq}")
    val s = rep.filter(_.getString(0) == "summary").head
    assert(s.getAs[Long]("n_rows") == 7 && s.getAs[Long]("n_keys") == 3)
    assert(s.getAs[Long]("skew_x1000") == 4L * 3 * 1000 / 7, "max*keys*1000 div rows")
    assert(s.getAs[Long]("salt") == 2, "ceil(4 / 2) = 2")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusReport

class CorpusReportSpec extends SparkSpec {
  import spark.implicits._

  // no .cache(): suites share the session, and DedupSpec asserts the
  // cache manager is EMPTY after its operators run — a cached frame
  // here would leak into that audit (and into q77's plan audit, where
  // the cache manager substitutes the InMemoryRelation)
  private lazy val report = CorpusReport.corpusReport(
    Tables.documents(spark, sf), "text", Seq("lang", "source"))
    .localCheckpoint(true)

  test("grand-total row matches corpus size and the grouping sets are consistent") {
    val total = Tables.documents(spark, sf).count()
    val grand = report.filter(col("gid") === 3).collect()
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_docs") == total)
    // each rollup level re-partitions the same corpus
    for (g <- Seq(0, 1, 2)) {
      val s = report.filter(col("gid") === g)
        .agg(sum("n_docs"), sum("total_tokens")).collect().head
      assert(s.getLong(0) == total, s"gid=$g doc sum")
      assert(s.getLong(1) == grand.head.getAs[Long]("total_tokens"), s"gid=$g token sum")
    }
  }

  test("metrics are bounded and percentiles ordered") {
    report.collect().foreach { r =>
      val q = r.getAs[Double]("avg_quality")
      assert(q >= 0.0 && q <= 1.0)
      val sfrac = r.getAs[Double]("short_frac")
      assert(sfrac >= 0.0 && sfrac <= 1.0)
      assert(r.getAs[Long]("min_tokens") <= r.getAs[Long]("max_tokens"))
      assert(r.getAs[Double]("p50_tokens") <= r.getAs[Double]("p90_tokens"))
      assert(r.getAs[Double]("p90_tokens") <= r.getAs[Long]("max_tokens").toDouble)
    }
  }

  test("report ingest: batch order never changes the state; replays no-op") {
    val docs = Tables.documents(spark, sf)
    def ingest(dir: String, order: Seq[Int]): Array[org.apache.spark.sql.Row] = {
      order.foreach { b =>
        assert(CorpusReport.reportIngest(spark, dir,
          docs.filter(col("doc_id") % 3 === b), s"b$b", "text", Seq("lang", "source")))
      }
      // replay one batch: must be refused by the ledger
      assert(!CorpusReport.reportIngest(spark, dir,
        docs.filter(col("doc_id") % 3 === order.head), s"b${order.head}",
        "text", Seq("lang", "source")))
      graft.sinks.LedgeredState.readPart(spark, dir, "report").get.orderBy("lang", "source").collect()
    }
    val base = java.nio.file.Files.createTempDirectory("graft_report_ingest_")
    try {
      val a = ingest(s"$base/a", Seq(0, 1, 2))
      val b = ingest(s"$base/b", Seq(2, 0, 1))
      assert(a.sameElements(b), "aggregate state must be arrival-order independent")
      // and equal to the single-batch aggregation
      val whole = java.nio.file.Files.createTempDirectory("graft_report_whole_")
      try {
        assert(CorpusReport.reportIngest(spark, s"$whole/w", docs, "all",
          "text", Seq("lang", "source")))
        val w = graft.sinks.LedgeredState.readPart(spark, s"${whole}/w", "report").get.orderBy("lang", "source").collect()
        assert(a.sameElements(w), "incremental must equal batch aggregation")
      } finally {
        val fs = new org.apache.hadoop.fs.Path(whole.toString)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(whole.toString), true)
      }
    } finally {
      val fs = new org.apache.hadoop.fs.Path(base.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base.toString), true)
    }
  }

  test("hand-computed rollup on a tiny frame") {
    val docs = Seq(
      ("en", "web", "the cat sat on the mat"),         // 6 toks, dup 'the'
      ("en", "web", "a b"),                            // 2 toks, short
      ("de", "book", "der hund und der hund und der")  // 7 toks, heavy dup
    ).toDF("lang", "source", "text")
    val out = CorpusReport.corpusReport(docs, "text", Seq("lang", "source"), shortTokens = 5)
    val grand = out.filter(col("gid") === 3).collect().head
    assert(grand.getAs[Long]("n_docs") == 3L)
    assert(grand.getAs[Long]("total_tokens") == 15L)
    assert(grand.getAs[Long]("min_tokens") == 2L)
    assert(grand.getAs[Long]("max_tokens") == 7L)
    assert(grand.getAs[Double]("short_frac") == 0.3333)
    // dup_word fractions: (6-5)/6=0.1667, 0.0, (7-3)/7=0.5714 -> avg 0.246033
    assert(grand.getAs[Double]("avg_dup_word") == 0.246)
    val en = out.filter(col("gid") === 0 && col("lang") === "en").collect().head
    assert(en.getAs[Long]("n_docs") == 2L)
    assert(en.getAs[Double]("p50_tokens") == 4.0) // interp between 2 and 6
  }

  test("distribution drift: hand-computed TV on a tiny pair of snapshots") {
    // v1: a=2, b=1 (N=3); v2: a=1, b=1 (M=2)
    // per-cat numerators |n*M - m*N|: a=|4-3|=1, b=|2-3|=1; TV = 2/(2*3*2) = 1/6
    val v1 = Seq("a", "a", "b").toDF("cat")
    val v2 = Seq("a", "b").toDF("cat")
    val out = CorpusReport.distributionDrift(v1, v2, Seq("cat")).collect()
    assert(out.length == 3)
    val a = out(0); val b = out(1); val tot = out(2)
    assert(a.getAs[String]("cat") == "a" && a.getAs[Long]("drift_num") == 1L)
    assert(b.getAs[String]("cat") == "b" && b.getAs[Long]("drift_num") == 1L)
    assert(a.getAs[Double]("share_old") == 2.0 / 3 && a.getAs[Double]("share_new") == 0.5)
    assert(tot.getAs[Long]("is_total") == 1L && tot.isNullAt(tot.fieldIndex("cat")))
    assert(tot.getAs[Long]("n_old") == 3L && tot.getAs[Long]("n_new") == 2L)
    assert(tot.getAs[Long]("drift_num") == 2L)
    assert(tot.getAs[Double]("tv_contrib") == 2.0 / 12)
  }

  test("distribution drift: identical snapshots drift zero, disjoint drift one") {
    val v = Tables.documents(spark, sf).select(col("lang"))
    val same = CorpusReport.distributionDrift(v, v, Seq("lang"))
    assert(same.filter(col("drift_num") =!= 0L).count() == 0)
    val d1 = Seq("x", "x").toDF("cat")
    val d2 = Seq("y").toDF("cat")
    val disjoint = CorpusReport.distributionDrift(d1, d2, Seq("cat"))
      .filter(col("is_total") === 1L).collect().head
    assert(disjoint.getAs[Double]("tv_contrib") == 1.0)
  }

  test("distribution drift: categories missing from one side get zero counts") {
    val out = CorpusReport.q96DistributionDrift(spark, sf)
    val cats = out.filter(col("is_total") === 0L)
    // every fixture category survives into v2 on this fixture, so counts
    // stay positive; the invariant that matters: shares are in [0,1] and
    // the total numerator is the sum of the per-category numerators
    val sumNum = cats.agg(sum("drift_num")).collect().head.getLong(0)
    val tot = out.filter(col("is_total") === 1L).collect().head
    assert(tot.getAs[Long]("drift_num") == sumNum)
    assert(tot.getAs[Double]("tv_contrib") >= 0.0 && tot.getAs[Double]("tv_contrib") <= 1.0)
    cats.collect().foreach { r =>
      assert(r.getAs[Double]("share_old") >= 0.0 && r.getAs[Double]("share_old") <= 1.0)
      assert(r.getAs[Double]("share_new") >= 0.0 && r.getAs[Double]("share_new") <= 1.0)
    }
  }
}

package graft

import graft.jobs.ScaleCurveJob

/** The scaling-curve harness itself: replica construction keeps ids
  * disjoint and rows multiplicative, both pipelines produce a point
  * per factor, and the measured shuffle grows with the factor (the
  * signal SCALE.md's round-16 slopes are read from). */
class ScaleCurveJobSpec extends SparkSpec {

  test("curve points: disjoint replicas, per-family points, growing shuffle") {
    val docs0 = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val n = docs0.count()
    val maxId = docs0.agg(org.apache.spark.sql.functions.max("doc_id"))
      .head().getLong(0)
    val rep = ScaleCurveJob.replicate(docs0, 3, maxId)
    assert(rep.count() == 3 * n, "replicas must be row-multiplicative")
    assert(rep.select("doc_id").distinct().count() == 3 * n,
      "replica id ranges must be disjoint")
    val pts = ScaleCurveJob.run(spark, sf, Seq(1, 2))
    assert(pts.map(p => (p.family, p.factor)).toSet ==
      Set(("exact_dedup", 1), ("neardup", 1), ("neardup_scoped", 1),
          ("exact_dedup", 2), ("neardup", 2), ("neardup_scoped", 2)))
    pts.foreach(p => assert(p.rows == p.factor * n && p.wallS > 0))
    def shuffle(fam: String, f: Int): Long =
      pts.find(p => p.family == fam && p.factor == f).get.shuffleBytes
    assert(shuffle("exact_dedup", 2) > shuffle("exact_dedup", 1),
      "more corpus must shuffle more bytes")
    // the day-cost mode: one fresh day against a prebuilt index
    val day = ScaleCurveJob.runDayCost(spark, sf, Seq(1, 2))
    assert(day.map(_.family).toSet ==
      Set("exact_dedup_day", "neardup_day", "neardup_scoped_day",
          "neardup_revisit_day"))
    day.foreach(p => assert(p.rows == n,
      "the day batch is fixed-size whatever the index factor"))
    // the rebucket demo: maintain night fires between the two points
    val demo = ScaleCurveJob.runRebucketDemo(spark, sf, Seq(2))
    assert(demo.map(_.family) ==
      Seq("dedup_day_pre_rebucket", "dedup_day_post_rebucket"))
    demo.foreach(p => assert(p.rows == 150L && p.wallS > 0))
  }

  test("family day-cost mode: one point per remaining ingest family") {
    val pts = ScaleCurveJob.runFamilyDayCost(spark, sf, Seq(1))
    assert(pts.map(_.family) ==
      Seq("containment_day", "vocab_day", "vocab_merge_day", "entity_day", "ivf_day"))
    pts.foreach(p => assert(p.rows > 0 && p.wallS > 0, s"$p"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Overlap

class OverlapSpec extends SparkSpec {
  import spark.implicits._

  test("KMV overlap estimates land near truth on a known-overlap pair") {
    // A = [0, 1200), B = [600, 1800): true union 1800, intersection 600,
    // Jaccard 1/3 — all sketches saturated at k = 256
    val a = (0L until 1200L).toDF("id")
    val b = (600L until 1800L).toDF("id")
    val est = Overlap.kmvOverlap(a, b, "id", k = 256)
    assert(math.abs(est.estUnion - 1800L) <= 1800L / 5,
      s"union estimate off: $est")
    assert(math.abs(est.estIntersection - 600L) <= 600L * 3 / 10,
      s"intersection estimate off: $est")
    assert(math.abs(est.estJaccardE4 - 3333L) <= 1500L,
      s"jaccard estimate off: $est")
    assert(est.nA > 900 && est.nA < 1500 && est.nB > 900 && est.nB < 1500,
      s"per-side estimates off: $est")
  }

  test("the estimate is partitioning-invariant (mergeable partial aggregation)") {
    val a = (0L until 1200L).toDF("id")
    val b = (600L until 1800L).toDF("id")
    val one = Overlap.kmvOverlap(a.coalesce(1), b.coalesce(1), "id", 256)
    val many = Overlap.kmvOverlap(a.repartition(16), b.repartition(7), "id", 256)
    assert(one == many,
      s"the k-smallest sample is order- and partitioning-independent: $one vs $many")
  }

  test("disjoint and identical corpora sit at the Jaccard extremes") {
    val a = (0L until 1000L).toDF("id")
    val c = (5000L until 6000L).toDF("id")
    val disjoint = Overlap.kmvOverlap(a, c, "id", 256)
    assert(disjoint.estJaccardE4 <= 300L && disjoint.estIntersection <= 60L,
      s"disjoint sets must estimate near-zero overlap: $disjoint")
    val same = Overlap.kmvOverlap(a, a, "id", 256)
    assert(same.estJaccardE4 == 10000L &&
      same.estIntersection == same.estUnion,
      s"identical sets are EXACTLY Jaccard 1 (same sketch both sides): $same")
  }

  test("null keys are dropped by the sketch fold, not crashed on") {
    val withNulls = Seq(Some(1L), None, Some(2L), None, Some(3L))
      .toDF("id")
    val clean = Seq(1L, 2L, 3L).toDF("id")
    val sn = Overlap.sketchOf(withNulls, "id", 16)
    val sc = Overlap.sketchOf(clean, "id", 16)
    assert(sn.toSeq == sc.toSeq,
      "a null key has no distinct-value identity: same sketch as without it")
    // and the ingest path absorbs a null-carrying batch end to end
    val base = java.nio.file.Files.createTempDirectory("graft_ov_null_")
    try {
      val p = s"$base/st"
      Overlap.sketchIngest(spark, p, withNulls, "id", 16)
      assert(Overlap.readSketch(spark, p).toSeq == sc.toSeq)
    } finally {
      val pp = new org.apache.hadoop.fs.Path(base.toString)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }

  test("a crashed fold (generation written, commit never published) is invisible") {
    val base = java.nio.file.Files.createTempDirectory("graft_ov_crash_")
    try {
      val p = s"$base/st"
      Overlap.sketchIngest(spark, p, (0L until 100L).toDF("id"), "id", 64)
      val committed = Overlap.readSketch(spark, p).toSeq
      // a folder that died after its generation write, before its commit
      Seq(Tuple1(Array(1L, 2L, 3L))).toDF("sketch")
        .write.parquet(s"$p/g-crashed0")
      assert(Overlap.readSketch(spark, p).toSeq == committed,
        "an uncommitted generation must be invisible to readSketch")
      // and the next fold proceeds on top of the committed state
      Overlap.sketchIngest(spark, p, (100L until 200L).toDF("id"), "id", 64)
      val grown = Overlap.readSketch(spark, p)
      assert(grown.length == 64 && grown.toSeq != committed)
    } finally {
      val pp = new org.apache.hadoop.fs.Path(base.toString)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }

  test("the legacy swapped sketch layout fails loudly instead of reading as fresh") {
    val base = java.nio.file.Files.createTempDirectory("graft_ov_leg_")
    try {
      val p = s"$base/st"
      Seq(Tuple1(Array(1L, 2L))).toDF("sketch").write.parquet(s"$p/state")
      intercept[IllegalStateException] { Overlap.readSketch(spark, p) }
      intercept[IllegalStateException] {
        Overlap.sketchIngest(spark, p, (0L until 10L).toDF("id"), "id", 16)
      }
    } finally {
      val pp = new org.apache.hadoop.fs.Path(base.toString)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.Kll
import graft.operators.QuantileQueries

/** The KLL quantile sketch: small-n exactness, deterministic replay,
  * serde, merge algebra, error band on adversarial shapes, the udaf
  * bridge, and the ledgered incremental fold. */
class KllSpec extends SparkSpec {
  import spark.implicits._

  private def exactQuantile(sorted: Seq[Double], phi: Double): Double = {
    val target = math.max(1L, math.ceil(phi * sorted.length).toLong)
    sorted((target - 1).toInt)
  }

  test("no compaction: quantiles, n, min, max are exact") {
    val sk = Kll.empty(200)
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 10.0)
    vals.foreach(sk.update)
    assert(sk.n == 10L && sk.minV == 1.0 && sk.maxV == 10.0)
    val sorted = vals.sorted
    Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0).foreach { p =>
      assert(sk.quantile(p) == exactQuantile(sorted, p),
        s"phi=$p: ${sk.quantile(p)} vs ${exactQuantile(sorted, p)}")
    }
  }

  test("deterministic: identical fold order produces identical bytes") {
    def build(): Array[Byte] = {
      val sk = Kll.empty(64)
      (1 to 20000).foreach(i => sk.update((i * 37 % 1000).toDouble))
      sk.serialize()
    }
    assert(java.util.Arrays.equals(build(), build()))
  }

  test("serde round-trip preserves the sketch") {
    val sk = Kll.empty(128)
    (1 to 5000).foreach(i => sk.update(math.exp(i % 17) + i * 0.001))
    val back = Kll.deserialize(sk.serialize())
    assert(back.n == sk.n && back.minV == sk.minV && back.maxV == sk.maxV)
    Seq(0.01, 0.5, 0.99).foreach(p =>
      assert(back.quantile(p) == sk.quantile(p)))
  }

  test("merge: exact anchors survive; band holds vs the union") {
    // heavy-tailed + shifted uniform, split unevenly — the merge must
    // keep rank error bounded over the UNION
    val a = (1 to 30000).map(i => math.pow(1.0003, i))       // exponential
    val b = (1 to 5000).map(i => 500.0 + (i % 100))          // dense clump
    val skA = Kll.empty(200); a.foreach(skA.update)
    val skB = Kll.empty(200); b.foreach(skB.update)
    val merged = skA.merge(skB)
    val all = (a ++ b).sorted
    assert(merged.n == all.length.toLong)
    assert(merged.minV == all.head && merged.maxV == all.last)
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach { p =>
      val est = merged.quantile(p)
      val trueRank = all.count(_ <= est).toDouble / all.length
      assert(math.abs(trueRank - p) <= QuantileQueries.Band,
        s"phi=$p est=$est trueRank=$trueRank")
    }
  }

  test("udaf bridge: nulls skipped, distributed fold matches anchors") {
    val df = spark.range(0, 10000).select(
      when(col("id") % 100 === 0, lit(null).cast("double"))
        .otherwise(col("id").cast("double") * 0.5).as("v"))
    val sk = QuantileQueries.kllOf(df, "v")
    assert(sk.n == 9900L, s"nulls must be skipped: ${sk.n}")
    assert(sk.minV == 0.5 && sk.maxV == 4999.5)
    val est = sk.quantile(0.5)
    assert(math.abs(est / 0.5 / 9900.0 * 2.0 - 1.0) < 0.1 ||
      math.abs(est - 2500.0) < 2500.0 * QuantileQueries.Band * 4,
      s"median estimate off: $est")
  }

  test("kllIngest: ledgered fold, replay no-op, state equals merged fold") {
    val base = java.nio.file.Files.createTempDirectory("graft_kllspec_")
    try {
      val path = s"$base/state"
      val d1 = (1 to 4000).map(i => i.toDouble).toDF("m")
      val d2 = (4001 to 6000).map(i => i.toDouble).toDF("m")
      assert(QuantileQueries.kllIngest(spark, path, d1, "m", "b1"))
      assert(QuantileQueries.kllIngest(spark, path, d2, "m", "b2"))
      assert(!QuantileQueries.kllIngest(spark, path, d1, "m", "b1"),
        "replay must be a ledger no-op")
      val sk = QuantileQueries.kllFromState(spark, path)
      assert(sk.n == 6000L && sk.minV == 1.0 && sk.maxV == 6000.0)
      val report = QuantileQueries.kllBandReport(
        (1 to 6000).map(_.toDouble).toDF("m"), "m", sk)
      assert(report.filter(!col("ok")).count() == 0L,
        "every anchor and band row must pass")
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("grouped: one sketch per stratum, anchors exact per group, bands hold") {
    // two strata with DISJOINT ranges: any cross-group mixing breaks the
    // other group's min/max anchors immediately
    val df = ((1 to 3000).map(i => ("a", i.toDouble)) ++
      (1 to 2000).map(i => ("b", 100000.0 + i))).toDF("g", "m")
    val sks = QuantileQueries.kllByGroup(df, "g", "m")
    assert(sks.keySet == Set("a", "b"))
    assert(sks("a").n == 3000L && sks("a").minV == 1.0 && sks("a").maxV == 3000.0)
    assert(sks("b").n == 2000L && sks("b").minV == 100001.0)
    val report = QuantileQueries.kllBandReportByGroup(df, "g", "m", sks)
    assert(report.count() == 20L) // 2 strata × (3 anchors + 7 probes)
    assert(report.filter(!col("ok")).count() == 0L,
      "every per-group anchor and band row must pass")
  }

  test("kllIngestByGroup: ledgered per-stratum fold, replay no-op, state equals merged") {
    val base = java.nio.file.Files.createTempDirectory("graft_kllg_spec_")
    try {
      val path = s"$base/state"
      // batch 1 carries only stratum a; batch 2 grows a AND introduces b
      val d1 = (1 to 2000).map(i => ("a", i.toDouble)).toDF("g", "m")
      val d2 = ((2001 to 3000).map(i => ("a", i.toDouble)) ++
        (1 to 1000).map(i => ("b", 100000.0 + i))).toDF("g", "m")
      assert(QuantileQueries.kllIngestByGroup(spark, path, d1, "g", "m", "b1"))
      assert(QuantileQueries.kllIngestByGroup(spark, path, d2, "g", "m", "b2"))
      assert(!QuantileQueries.kllIngestByGroup(spark, path, d1, "g", "m", "b1"),
        "replay must be a ledger no-op")
      val sks = QuantileQueries.kllByGroupFromState(spark, path)
      assert(sks("a").n == 3000L && sks("a").maxV == 3000.0)
      assert(sks("b").n == 1000L && sks("b").minV == 100001.0)
      val whole = ((1 to 3000).map(i => ("a", i.toDouble)) ++
        (1 to 1000).map(i => ("b", 100000.0 + i))).toDF("g", "m")
      val report = QuantileQueries.kllBandReportByGroup(whole, "g", "m", sks)
      assert(report.filter(!col("ok")).count() == 0L)
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}

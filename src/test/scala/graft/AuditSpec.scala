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

  test("day anomalies: hand-computed flags on a crafted week") {
    import java.sql.Timestamp
    // 7 days: 10,10,10,2,10,10,50 events → D=7, T=102; mean ≈ 14.57
    // low (n < mean/2 ≈ 7.29): only the 2-day; high (n > 2·mean ≈ 29.1): only the 50-day
    val rows = (1 to 7).flatMap { d =>
      val n = d match { case 4 => 2; case 7 => 50; case _ => 10 }
      (1 to n).map(i => (Timestamp.valueOf(f"2024-03-0$d 10:00:$i%02d"), (i % 3).toLong))
    }
    val ev = rows.toDF("ts", "user_id")
    val out = Audit.dayAnomalies(ev, col("ts"), col("user_id")).collect()
    assert(out.length == 7)
    assert(out.count(_.getAs[Boolean]("low_anomaly")) == 1)
    assert(out.count(_.getAs[Boolean]("high_anomaly")) == 1)
    assert(out(3).getAs[Boolean]("low_anomaly") && out(3).getAs[Long]("n_events") == 2L)
    assert(out(6).getAs[Boolean]("high_anomaly") && out(6).getAs[Long]("n_events") == 50L)
    assert(out(0).getAs[Long]("n_users") == 3L) // users 0,1,2 across 10 events
  }

  test("q107: exactly the planted days fire — dark day low, tripled day high") {
    val out = Audit.q107DayAnomaly(spark, sf).collect()
    assert(out.length == 30)
    val low = out.filter(_.getAs[Boolean]("low_anomaly"))
    val high = out.filter(_.getAs[Boolean]("high_anomaly"))
    assert(low.map(_.getAs[java.sql.Date]("day").toString).toSeq == Seq("2024-01-03"))
    assert(high.map(_.getAs[java.sql.Date]("day").toString).toSeq == Seq("2024-01-27"))
    // the tripled day carries exactly 3× its clean volume; users don't triple
    // (count_distinct dedups the duplicated deliveries)
    val ev = Tables.events(spark, sf)
    val clean27 = ev.filter(dayofmonth(col("ts")) === 27)
    assert(high.head.getAs[Long]("n_events") == 3L * clean27.count())
    assert(high.head.getAs[Long]("n_users") ==
      clean27.select("user_id").distinct().count())
  }

  test("jackknife: exact integer replay, and the SE behaves like bucket noise") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def bucketOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"jack:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 32
    }
    val rnd = new scala.util.Random(3)
    val pool = (1L to 2000L).map(i => (i, math.rint(rnd.nextDouble() * 10000) / 10000))
    val out = operators.Audit.jackknifeQuality(
        pool.toDF("doc_id", "quality"), "doc_id", "quality").collect()
    assert(out.length == 32)
    // driver-side exact replay of the whole integer pipeline
    val qe4 = pool.map { case (id, q) => (bucketOf(id), math.round(q * 10000)) }
    val g = qe4.groupBy(_._1).map { case (b, rs) =>
      b -> (rs.size.toLong, rs.map(_._2).sum) }
    val n = g.values.map(_._1).sum; val s = g.values.map(_._2).sum
    val theta = (s * 1000000L) / n
    val loo = g.map { case (b, (nb, sb)) =>
      b -> ((s - sb) * 1000000L) / (n - nb) }
    val ss = loo.values.map(l => (l - theta) * (l - theta)).sum
    val se = math.round(math.sqrt(ss.toDouble * 31 / 32))
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("n_docs") == g(b)._1)
      assert(r.getAs[Long]("sum_qe4") == g(b)._2)
      assert(r.getAs[Long]("loo_mean_micro") == loo(b))
      assert(r.getAs[Long]("theta_micro") == theta)
      assert(r.getAs[Long]("jk_se_micro") == se)
    }
    // sanity: the SE is nonzero (real bucket noise) and the right size —
    // units are micro-qe4 (quality x 1e10), and a uniform[0,1] mean over
    // 2000 draws has SD ~ 0.29/sqrt(2000) ~ 0.0065 quality ~ 6.5e7 here
    assert(se > 1000000L && se < 200000000L, s"se=$se micro-qe4 units")
  }

  test("moments state: additive across any split, marginals serve both consumers") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(9)
    val pool = (1L to 500L).map(i =>
      (i, s"g${i % 3}", rnd.nextInt(10000).toLong)).toDF("id", "g", "x")
    def readState(path: String): Set[(String, Long, Long, Long, Long)] =
      graft.sinks.LedgeredState.readPart(spark, path, "moments").get
        .as[(String, Long, Long, Long, Long)].collect().toSet
    val base = java.nio.file.Files.createTempDirectory("graft_mom_spec_")
    try {
      // whole pool in one batch vs three uneven batches: identical state
      val p1 = s"$base/one"; val p2 = s"$base/three"
      assert(operators.Audit.momentsIngest(spark, p1, pool, "id", "g", col("x"), "b0"))
      Seq(pool.filter(col("id") <= 100), pool.filter(col("id") > 100 && col("id") <= 150),
          pool.filter(col("id") > 150)).zipWithIndex.foreach { case (b, i) =>
        assert(operators.Audit.momentsIngest(spark, p2, b, "id", "g", col("x"), s"b$i"))
      }
      assert(operators.Audit.momentsIngest(spark, p2,
        pool.filter(col("id") > 150), "id", "g", col("x"), "b2") == false,
        "replayed batchId must be a ledger no-op")
      val s1 = readState(p1); val s2 = readState(p2)
      assert(s1 == s2, "integer moment sums are split-invariant")
      // marginals: summing buckets out reproduces exact per-stratum moments
      val perG = s1.groupBy(_._1).map { case (g, rs) =>
        val sq = rs.toSeq // Set.map would collapse duplicate n values
        g -> (sq.map(_._3).sum, sq.map(_._4).sum, sq.map(_._5).sum) }
      val direct = pool.groupBy(col("g"))
        .agg(count(lit(1)), sum(col("x")), sum(col("x") * col("x")))
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(perG == direct)
    } finally {
      val pp = new org.apache.hadoop.fs.Path(base.toString)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }

  test("histQuantiles: exact k-th-smallest semantics on a crafted distribution") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // stratum a: values 1..10 once each -> p50 = 5th smallest = 5,
    // p90 = 9, p99 = ceil(9.9) = 10th = 10. stratum b: heavy tie block
    // (five 7s then one 100): p50 = 3rd = 7, p90 = ceil(5.4) = 6th = 100.
    // stratum c: single row -> every quantile is that value (k = 1).
    val rows = (1L to 10L).map(("a", _)) ++
      Seq.fill(5)(("b", 7L)) ++ Seq(("b", 100L)) ++ Seq(("c", 42L))
    val counts = rows.toDF("stratum", "x")
      .groupBy(col("stratum"), col("x")).agg(count(lit(1)).as("n"))
    val got = operators.Audit.histQuantiles(counts, Seq(5000L, 9000L, 9900L))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("a", 5000L)) == ((10L, 5L, 5L)))
    assert(got(("a", 9000L)) == ((10L, 9L, 9L)))
    assert(got(("a", 9900L)) == ((10L, 10L, 10L)))
    assert(got(("b", 5000L)) == ((6L, 3L, 7L)))
    assert(got(("b", 9000L)) == ((6L, 6L, 100L)))
    assert(got(("c", 5000L)) == ((1L, 1L, 42L)))
    assert(got(("c", 9900L)) == ((1L, 1L, 42L)))
  }

  test("hist ingest: distribution state is split-invariant; replays no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    val pool = (1L to 600L).map(i =>
      (i, s"g${i % 3}", rnd.nextInt(50).toLong)).toDF("id", "lang", "qe4")
    def readState(p: String): Map[(String, Long), Long] =
      graft.sinks.LedgeredState.readPart(spark, p, "counts").get
        .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val base = java.nio.file.Files.createTempDirectory("graft_hist_spec_")
    try {
      val p1 = s"$base/one"; val p2 = s"$base/three"
      assert(operators.Audit.histIngest(spark, p1, pool, "lang", col("qe4"), "b0"))
      Seq(pool.filter(col("id") <= 200), pool.filter(col("id") > 200 && col("id") <= 350),
          pool.filter(col("id") > 350)).zipWithIndex.foreach { case (b, i) =>
        assert(operators.Audit.histIngest(spark, p2, b, "lang", col("qe4"), s"b$i"))
      }
      assert(!operators.Audit.histIngest(spark, p2,
        pool.filter(col("id") > 350), "lang", col("qe4"), "b2"),
        "replayed batchId must be a ledger no-op")
      assert(readState(p1) == readState(p2),
        "integer value counts are split-invariant")
    } finally {
      val pp = new org.apache.hadoop.fs.Path(base.toString)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }

  test("contract validation: every rule kind counts violations and names the first offender") {
    val parent = Seq(10L, 11L).toDF("pk")
    val frame = Seq(
      (1L, Option("aa"), 10L),
      (2L, Option.empty[String], 11L), // null text → Check violation
      (3L, Option("bb"), 99L),         // orphan fk
      (3L, Option("cc"), 10L)          // duplicate key 3 (both members count)
    ).toDF("id", "txt", "fk")
    val rep = Audit.contractValidate(frame, "id", Seq(
        Audit.Check("txt_not_null", col("txt").isNotNull),
        Audit.Unique("id_unique", col("id")),
        Audit.RefIntegrity("fk_ok", col("fk"), parent, col("pk"))))
      .collect().map(r => r.getAs[String]("rule") -> r).toMap
    val nn = rep("txt_not_null")
    assert(nn.getAs[Long]("n_checked") == 4 && nn.getAs[Long]("n_violations") == 1)
    assert(nn.getAs[String]("first_bad_key") == "2" && !nn.getAs[Boolean]("pass"))
    val u = rep("id_unique")
    assert(u.getAs[Long]("n_checked") == 4 && u.getAs[Long]("n_violations") == 2)
    assert(u.getAs[String]("first_bad_key") == "3")
    val fk = rep("fk_ok")
    assert(fk.getAs[Long]("n_violations") == 1 && fk.getAs[String]("first_bad_key") == "3")
    assert(!fk.getAs[Boolean]("pass"))
  }

  test("contract validation: a clean table passes every rule with null offenders") {
    val frame = Seq((1L, "a"), (2L, "b")).toDF("id", "txt")
    val rep = Audit.contractValidate(frame, "id", Seq(
      Audit.Check("txt_not_null", col("txt").isNotNull),
      Audit.Unique("id_unique", col("id")))).collect()
    assert(rep.forall(_.getAs[Boolean]("pass")))
    assert(rep.forall(_.getAs[String]("first_bad_key") == null))
  }

  test("contract validation rejects duplicate rule names") {
    val frame = Seq((1L, "a")).toDF("id", "txt")
    intercept[IllegalArgumentException] {
      Audit.contractValidate(frame, "id", Seq(
        Audit.Check("r", col("txt").isNotNull), Audit.Check("r", col("id") > 0)))
    }
  }

  test("anomaly ingest: per-day distinct users stay exact across a mid-day batch split") {
    val base = java.nio.file.Files.createTempDirectory("graft_anspec_")
    try {
      val path = s"$base/state"
      val t = "2026-01-0"
      def ev(rows: Seq[(Long, String, Long)]) = rows.toDF("event_id", "tss", "user_id")
        .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"))
      // user 7 is active on day 1 in BOTH batches: a per-batch distinct
      // count would say 2 users; the (day, user) grain must say 1
      val b1 = ev(Seq((1L, s"${t}1 10:00:00", 7L), (2L, s"${t}2 10:00:00", 8L)))
      val b2 = ev(Seq((3L, s"${t}1 11:00:00", 7L), (4L, s"${t}2 11:00:00", 9L)))
      assert(Audit.anomalyIngest(spark, path, b1, col("ts"), col("user_id"), "b1"))
      assert(Audit.anomalyIngest(spark, path, b2, col("ts"), col("user_id"), "b2"))
      assert(!Audit.anomalyIngest(spark, path, b2, col("ts"), col("user_id"), "b2"))
      val rep = Audit.anomaliesFromState(
          graft.sinks.LedgeredState.readPart(spark, path, "day_user").get)
        .collect().map(r => r.getDate(0).toString ->
          ((r.getAs[Long]("n_events"), r.getAs[Long]("n_users")))).toMap
      assert(rep("2026-01-01") == ((2L, 1L)), s"same user twice on day 1: ${rep("2026-01-01")}")
      assert(rep("2026-01-02") == ((2L, 2L)), s"two users on day 2: ${rep("2026-01-02")}")
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("contract ingest: a key duplicated ACROSS batches is caught by the state") {
    // per-batch validation cannot see this violation — each batch is
    // individually unique; only the folded key_counts state can
    val base = java.nio.file.Files.createTempDirectory("graft_cspec_")
    try {
      val path = s"$base/state"
      val rules = Seq(
        Audit.Check("txt_not_null", col("txt").isNotNull),
        Audit.Unique("id_unique", col("id")))
      val day1 = Seq((1L, "a"), (2L, "b")).toDF("id", "txt")
      val day2 = Seq((2L, "b-again"), (3L, "c")).toDF("id", "txt")
      assert(Audit.contractIngest(spark, path, day1, "d1", "id", rules))
      assert(Audit.contractIngest(spark, path, day2, "d2", "id", rules))
      assert(!Audit.contractIngest(spark, path, day2, "d2", "id", rules), "replay no-op")
      val rep = Audit.contractReportFromState(
          graft.sinks.LedgeredState.readPart(spark, path, "agg_rules"),
          graft.sinks.LedgeredState.readPart(spark, path, "key_counts"))
        .collect().map(r => r.getAs[String]("rule") -> r).toMap
      val u = rep("id_unique")
      assert(u.getAs[Long]("n_checked") == 4 && u.getAs[Long]("n_violations") == 2,
        "both members of the cross-batch duplicate count")
      assert(u.getAs[String]("first_bad_key") == "2" && !u.getAs[Boolean]("pass"))
      val nn = rep("txt_not_null")
      assert(nn.getAs[Long]("n_checked") == 4 && nn.getAs[Boolean]("pass"))
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftUdfs

/** UDF/UDAF surface: registration, SQL + Dataset use, and the Aggregator
  * algebra (element-wise-min buffer merge must equal the direct
  * computation regardless of partitioning). */
class GraftUdfsSpec extends SparkSpec {
  import spark.implicits._

  test("MinHashAggregator: grouped signature equals the direct element-wise min") {
    GraftUdfs.register(spark, numHashes = 8)
    val rows = Seq(
      ("d1", "alpha"), ("d1", "beta"), ("d1", "gamma"),
      ("d2", "alpha"), ("d2", "delta"))
    val sig = rows.toDF("doc", "tok")
      .repartition(4) // force partial buffers + merge
      .groupBy("doc").agg(expr("minhash_sig(tok)").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    def direct(toks: Seq[String]): Seq[Long] =
      (0 until 8).map(seed =>
        toks.map(t => scala.util.hashing.MurmurHash3.stringHash(t, seed).toLong).min)
    assert(sig("d1") == direct(Seq("alpha", "beta", "gamma")))
    assert(sig("d2") == direct(Seq("alpha", "delta")))
  }

  test("MinHash signatures of overlapping sets share entries (the MinHash property)") {
    GraftUdfs.register(spark, numHashes = 16)
    val rows = (1 to 50).map(i => ("a", s"tok$i")) ++ (1 to 50).map(i => ("b", s"tok$i")) ++
      Seq(("b", "extra1"), ("b", "extra2"))
    val sig = rows.toDF("doc", "tok")
      .groupBy("doc").agg(expr("minhash_sig(tok)").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val agree = sig("a").zip(sig("b")).count { case (x, y) => x == y }
    assert(agree >= 12, s"~96% Jaccard sets should agree on most minhashes, got $agree/16")
  }

  test("the Aggregator drives a full LSH pipeline: explode → udaf sig → band join") {
    GraftUdfs.register(spark, numHashes = 16)
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, sf)
    // signatures via the typed Aggregator over exploded tokens (the
    // partial-merge path), instead of the column-fn minhashSignature
    val sigs = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id").agg(expr("minhash_sig(tok)").as("sig"))
    val banded = sigs
      .select(col("doc_id"), posexplode(bandKeys(col("sig"), 8, 2)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val cand = banded.alias("a").join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2")).distinct()
    val base = docs.select(col("doc_id").as("id"),
      array_distinct(tokens(col("text"))).as("g"))
    val verified = cand
      .join(base.select(col("id").as("id1"), col("g").as("g1")), "id1")
      .join(base.select(col("id").as("id2"), col("g").as("g2")), "id2")
      .select(col("id1"), col("id2"), jaccard(col("g1"), col("g2")).as("j"))
      .filter(col("j") >= 0.5)
      .collect()
    assert(verified.nonEmpty, "the UDAF-built signatures must surface real near-dups")
    assert(verified.forall(_.getAs[Double]("j") >= 0.5))
  }

  test("KMV sketch: exact below k, within error bounds above, merge-stable") {
    GraftUdfs.register(spark, kmvK = 256)
    // below k distinct values: exact
    val small = (1 to 100).map(i => ("g", s"v$i")).toDF("grp", "v")
      .repartition(8) // force partial buffers + merges
      .groupBy("grp").agg(expr("kmv_distinct(v)").as("d"))
      .collect()(0).getLong(1)
    assert(small == 100L, "fewer than k distinct values must count exactly")
    // well above k: estimate within ~5 standard errors (1/sqrt(k-2) ≈ 6.3%)
    val n = 20000
    val big = (1 to n).map(i => ("g", s"item-$i")).toDF("grp", "v")
      .repartition(16)
      .groupBy("grp").agg(expr("kmv_distinct(v)").as("d"))
      .collect()(0).getLong(1)
    val err = math.abs(big - n).toDouble / n
    assert(err < 0.32, f"estimate $big for $n distinct (err $err%.3f) out of bounds")
    // duplicates never inflate the count
    val dup = ((1 to n) ++ (1 to n)).map(i => ("g", s"item-$i")).toDF("grp", "v")
      .repartition(16)
      .groupBy("grp").agg(expr("kmv_distinct(v)").as("d"))
      .collect()(0).getLong(1)
    assert(dup == big, "re-observing the same values must not change the sketch")
  }

  test("CMS sketch: never undercounts, bounded overcount, merge-stable") {
    val depth = 4
    val width = 512
    val n = 5000
    // zipf-ish corpus: item-i appears ceil(50/i) times
    val rows = (1 to n).flatMap(i => Seq.fill(50 / i + 1)(s"item-$i"))
    val total = rows.size
    val df = rows.toDF("g").repartition(16) // force partial buffers + merges
    val sketch = df
      .select(GraftUdfs.cmsPositions(col("g"), depth, width).as("pos"))
      .as[Seq[Long]]
      .select(new GraftUdfs.CmsSketchAggregator(depth, width).toColumn.name("sk"))
      .toDF("sk")
    val est = df.groupBy("g").agg(count(lit(1)).as("cnt"))
      .crossJoin(sketch)
      .select(col("g"), col("cnt"),
        GraftUdfs.cmsEstimate(col("sk"), col("g"), depth, width).as("est"))
      .collect()
    val slack = math.ceil(total * math.E / width)
    est.foreach { r =>
      val (cnt, e) = (r.getAs[Long]("cnt"), r.getAs[Long]("est"))
      assert(e >= cnt, s"CMS must never undercount: ${r.getString(0)} $e < $cnt")
      assert(e <= cnt + slack,
        s"overcount beyond the e/width bound: ${r.getString(0)} $e > $cnt + $slack")
    }
    // plan audit: the sketch rides a partial+final typed-aggregate pair —
    // partitions pre-merge their own matrix map-side, the shuffle carries
    // one depth×width buffer per partition, not one row per element
    val plan = sketch.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2 ||
      "SortAggregate".r.findAllIn(plan).length >= 2,
      s"CMS must aggregate map-side before the shuffle:\n$plan")
  }

  test("Misra-Gries: undercount-only within n/(k+1), heavy hitters present, size <= k") {
    val k = 8
    // skewed synthetic stream: a few heavy elements over uniform noise
    val rnd = new scala.util.Random(11)
    val heavy = Seq.fill(300)("hh1") ++ Seq.fill(200)("hh2") ++ Seq.fill(120)("hh3")
    val noise = Seq.fill(400)(s"z${rnd.nextInt(150)}")
    val stream = rnd.shuffle(heavy ++ noise)
    val n = stream.size.toLong
    val slack = n / (k + 1)
    val exact = stream.groupBy(identity).map { case (e, xs) => e -> xs.size.toLong }
    for (parts <- Seq(1, 3, 16)) { // merge order varies with partitioning
      val mg = stream.toDF("e").repartition(parts).as[String]
        .select(new GraftUdfs.MisraGriesAggregator(k).toColumn.name("mg"))
        .head()
      assert(mg.size <= k, s"summary must hold <= $k entries, got ${mg.size}")
      exact.foreach { case (e, c) =>
        if (c > slack)
          assert(mg.contains(e), s"parts=$parts: $e (count $c > $slack) must be present")
        mg.get(e).foreach { est =>
          assert(est <= c && est >= c - slack,
            s"parts=$parts: $e est=$est outside [${c - slack}, $c]")
        }
      }
      // an element never seen must never be reported
      assert(!mg.contains("never-seen"))
    }
    // the registered SQL form drives the same aggregator
    GraftUdfs.register(spark, mgK = k)
    val viaSql = stream.toDF("e").repartition(5)
      .agg(expr("misra_gries(e)").as("mg"))
      .head().getMap[String, Long](0)
    assert(viaSql.contains("hh1") && viaSql.size <= k)
  }

  test("BottomK selection is exact and partitioning-invariant, ties broken by id") {
    val k = 10
    val rnd = new scala.util.Random(13)
    // duplicate bucket values force the id tiebreak to matter
    val pairs = Seq.tabulate(500)(i => (rnd.nextInt(40).toLong, i.toLong))
    val want = pairs.sorted.take(k)
    for (parts <- Seq(1, 3, 16)) {
      val got = pairs.toDF("b", "i").repartition(parts).as[(Long, Long)]
        .select(new GraftUdfs.BottomKAggregator(k).toColumn.name("sel"))
        .head()
      assert(got == want, s"parts=$parts: bottom-k must equal the sorted prefix")
    }
    // k larger than the input returns everything, sorted
    val all = pairs.take(3).toDF("b", "i").as[(Long, Long)]
      .select(new GraftUdfs.BottomKAggregator(k).toColumn.name("sel")).head()
    assert(all == pairs.take(3).sorted)
  }

  test("registered scalar UDF runs from SQL and matches the column expression") {
    GraftUdfs.register(spark)
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    df.createOrReplaceTempView("udf_probe")
    val viaUdf = spark.sql("SELECT jaccard_udf(x, y) AS j FROM udf_probe")
      .collect()(0).getDouble(0)
    val viaExpr = df.select(graft.functions.TextFunctions.jaccard(col("x"), col("y")).as("j"))
      .collect()(0).getDouble(0)
    assert(viaUdf == 0.5 && viaExpr == 0.5)
  }
}

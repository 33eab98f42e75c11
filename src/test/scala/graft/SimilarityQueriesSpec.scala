package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.SimilarityQueries

class SimilarityQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("q125: eval vectors are never flagged; every hit clears the threshold") {
    val out = SimilarityQueries.q125SemanticDecon(spark, sf)
      .select(col("vec_id"), col("n_hits"), col("best_eval_id"), col("best_cos"))
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length >= 5, s"vacuous gate: ${out.length} rows")
    assert(out.forall { case (v, n, e, c) =>
      v % 10 != 0 && e % 10 == 0 && n >= 1 && c >= 0.4 })
  }

  test("q125: max(struct) aggregate equals the rank-window formulation") {
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val tr = all.filter(col("id") % 10 =!= 0)
    val ev = all.filter(col("id") % 10 === 0)
      .select(col("id").as("e_id"), col("v").as("ev"))
    import graft.functions.VectorFunctions.cosine
    val hits = broadcast(ev).join(tr)
      .select(col("id").as("vec_id"), col("e_id"),
        round(cosine(col("v"), col("ev")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
    val windowed = hits
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cos_sim").desc, col("e_id"))))
      .withColumn("n_hits", count(lit(1)).over(Window.partitionBy(col("vec_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("n_hits"),
        col("e_id").as("best_eval_id"), col("cos_sim").as("best_cos"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val agg = SimilarityQueries.q125SemanticDecon(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(agg == windowed)
  }

  test("q146: cluster exclusion bites, and no negative shares its anchor's cluster") {
    // the anchors only join clusters at sf0.01 (the DRIVER's gate scale;
    // at sf0.001 their max pairwise cosine is 0.39 < the 0.4 threshold,
    // so exclusion would be vacuous and this test would prove nothing)
    val sf01 = "/root/testdata/sf0.01"
    val negs = SimilarityQueries.q146HardNegatives(spark, sf01)
      .select(col("q_id"), col("neg_id")).as[(Long, Long)].collect()
    assert(negs.nonEmpty && negs.forall { case (q, n) => q != n })
    val clusters = operators.Dedup.connectedComponents(
        SimilarityQueries.srpPairsShared(Tables.embeddings(spark, sf01)
          .select(col("vec_id").as("id"), col("embedding").as("v"))))
      .as[(Long, Long)].collect().toMap
    // contract: an emitted negative never shares a cluster with its anchor
    negs.foreach { case (q, n) =>
      assert(!(clusters.contains(q) && clusters.contains(n) &&
        clusters(q) == clusters(n)), s"($q, $n) share cluster ${clusters.get(q)}")
    }
    // non-vacuity: for some anchor, the plain q22 top-k CONTAINS a
    // cluster-mate — the exclusion must have actually removed something
    val knn = SimilarityQueries.q22KnnExact(spark, sf01)
      .select(col("q_id"), col("neighbor_id")).as[(Long, Long)].collect()
    val excluded = knn.filter { case (q, n) =>
      clusters.contains(q) && clusters.contains(n) && clusters(q) == clusters(n) }
    assert(excluded.nonEmpty,
      "no q22 neighbor was a cluster-mate — the q146 gate would be q22 with a rename")
  }

  test("k-center greedy: hand-replayed picks, id-ascending ties, duplicate coverage") {
    // orthogonal axes + a duplicate of the seed + a 45° point
    val r2 = math.sqrt(2) / 2
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0)),
      (2L, Seq(0.0, 0.0, 1.0)), (3L, Seq(1.0, 0.0, 0.0)), // dup of seed
      (4L, Seq(r2, r2, 0.0))
    ).toDF("id", "v")
      .withColumn("v", col("v").cast("array<float>"))
      .withColumn("nrm", graft.functions.VectorFunctions.norm(col("v")))
    val out = SimilarityQueries.kCenterGreedy(emb, k = 4, seedId = 0L).collect()
    val centers = out.filter(_.getString(0) == "center")
      .map(r => (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
    // r2: ids 1 and 2 tie at distance 1.0 → id ascending picks 1;
    // r4: the 45° point at 0.2929 beats the zero-distance duplicate
    assert(centers.toSeq == Seq(
      (1L, 0L, None), (2L, 1L, Some(1.0)), (3L, 2L, Some(1.0)),
      (4L, 4L, Some(0.2929))), s"picks: ${centers.toSeq}")
    val cov = out.filter(_.getString(0) == "coverage").head.getDouble(3)
    assert(cov == 0.0, s"only the seed-duplicate remains → coverage 0, got $cov")
  }

  test("int8 quantization: extremes map to ±127, zero vectors to zero codes") {
    val frame = Seq(
      (1L, Seq(2.0f, -2.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val got = frame.select($"id",
        SimilarityQueries.int8Quantize($"v").as("v8"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got(1L) == Seq(127, -127, 64, 0), s"codes: ${got(1L)}") // round(1*127/2)=64
    assert(got(2L) == Seq(0, 0, 0, 0), "zero scale must not divide")
  }

  test("quantized prefilter keeps high recall vs exact KNN on the fixture") {
    val exact = SimilarityQueries.q22KnnExact(spark, sf)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val quant = SimilarityQueries.q196QuantKnn(spark, sf)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"pool=50 int8 recall vs exact top-10: $recall")
  }

  test("k-center radius sequence is non-increasing (greedy far-point invariant)") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("nrm", graft.functions.VectorFunctions.norm(col("v")))
    val radii = SimilarityQueries.kCenterGreedy(emb, k = 5, seedId = 0L)
      .filter(col("sect") === "center" && col("radius").isNotNull)
      .orderBy(col("rank")).collect().map(_.getDouble(3))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radii must not increase: ${radii.toSeq}")
  }
}

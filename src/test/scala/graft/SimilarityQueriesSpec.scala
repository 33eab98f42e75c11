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
}

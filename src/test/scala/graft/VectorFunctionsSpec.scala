package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.SimilarityQueries

/** Vector-function + similarity-search invariants (the exact-value gate is
  * the DuckDB oracle at sf0.01; these pin the math and the LSH contract). */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def scalar(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getDouble(0)

  test("dot / norm / l2 / cosine compute the textbook values") {
    val a = typedlit(Seq(1.0f, 2.0f, 2.0f))
    val b = typedlit(Seq(2.0f, 0.0f, 1.0f))
    assert(scalar(dot(a, b)) === 4.0)
    assert(scalar(norm(a)) === 3.0)
    assert(math.abs(scalar(l2Sq(a, b)) - (1 + 4 + 1)) < 1e-12)
    assert(math.abs(scalar(cosine(a, b)) - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-12)
  }

  test("cosine is 1 for parallel and 0 for orthogonal vectors") {
    val a = typedlit(Seq(3.0f, 4.0f))
    assert(math.abs(scalar(cosine(a, typedlit(Seq(6.0f, 8.0f)))) - 1.0) < 1e-12)
    assert(math.abs(scalar(cosine(a, typedlit(Seq(-4.0f, 3.0f))))) < 1e-12)
  }

  test("srpPlanes is deterministic and ±1-valued") {
    val p1 = srpPlanes(8, 16)
    val p2 = srpPlanes(8, 16)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(v => v == 1.0 || v == -1.0))
  }

  test("srpBandKeys packs bits big-endian per band") {
    val bits = typedlit(Seq(1, 0, 1, 1, 0, 1, 0, 0))
    val keys = Seq(1).toDF("x")
      .select(srpBandKeys(bits, bands = 2, bitsPerBand = 4).as("k"))
      .collect()(0).getSeq[Int](0)
    assert(keys == Seq(11, 4)) // 1011b, 0100b
  }

  test("q22 returns exactly k ranked neighbors per query, self excluded") {
    val rows = SimilarityQueries.q22KnnExact(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 10, s"query $q")
      assert(rs.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to 10L))
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q), "self must be excluded")
      val sims = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims == sims.sorted.reverse, "rank order must follow similarity")
    }
  }

  test("q23 ANN pairs are a subset of exact threshold pairs (no false positives)") {
    val ann = SimilarityQueries.q23AnnSrp(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("cos_sim")))
    assert(ann.nonEmpty, "fixture should yield some pairs at the configured threshold")
    assert(ann.forall(_._3 >= 0.4), "verify step must enforce the threshold exactly")
    assert(ann.forall(p => p._1 < p._2), "pairs must be canonically ordered")
    // exact brute-force ground truth over the same fixture
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val exact = emb.alias("a").join(emb.alias("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        round(cosine(col("a.v"), col("b.v")), 4).as("c"))
      .filter(col("c") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.map(p => (p._1, p._2)).forall(exact.contains),
      "every ANN pair must be a true high-similarity pair")
  }
}

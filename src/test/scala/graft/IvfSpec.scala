package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, SimilarityQueries}

/** IVF ANN: structure (every vector in exactly one list), query contract
  * (k ranked neighbors, self excluded), and recall against the exact KNN
  * ground truth. Recall bounds are generous — k-means on floating point
  * is only loosely deterministic across partitionings. */
class IvfSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), col("embedding").as("v"))

  test("index assigns every vector to exactly one of nlist lists") {
    val index = Ivf.build(emb, "id", "v", nlist = 8)
    val n = emb.count()
    assert(index.assigned.count() == n)
    val lists = index.assigned.select("list_id").distinct().collect().map(_.getInt(0))
    assert(lists.forall(l => l >= 0 && l < 8))
    assert(index.assigned.groupBy("id").count().filter(col("count") > 1).count() == 0)
  }

  test("probing all lists reproduces exact KNN exactly") {
    val index = Ivf.build(emb, "id", "v", nlist = 8)
    val ivfAll = Ivf.topK(spark, index, emb.filter(col("id") < 10), k = 10, nprobe = 8)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk")) ->
        r.getAs[Long]("neighbor_id")).toMap
    val exact = SimilarityQueries.q22KnnExact(spark, sf)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk")) ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(ivfAll == exact, "nprobe = nlist must equal brute force")
  }

  test("q28 returns k ranked neighbors per query with decent recall at nprobe=4/16") {
    val rows = Ivf.q28IvfAnn(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 10, s"query $q")
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q))
    }
    val exact = SimilarityQueries.q22KnnExact(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val recalls = byQ.map { case (q, rs) =>
      val got = rs.map(_.getAs[Long]("neighbor_id")).toSet
      (got & exact(q)).size.toDouble / 10
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3,
      f"mean recall@10 probing 4/16 lists should beat random scanning; got $mean%.2f")
  }
}

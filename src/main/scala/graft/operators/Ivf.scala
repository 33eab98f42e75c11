package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbors — the coarse-
  * quantizer scale path next to the SRP-LSH variant in
  * [[SimilarityQueries]]: k-means centroids partition the corpus into
  * `nlist` lists; a query scores only the `nprobe` nearest lists, so the
  * scan cost drops to ~nprobe/nlist of brute force while the index build
  * is one (cheap, sampled) k-means fit plus a single assignment pass.
  *
  * At 100 TB this is the standard layout: the assignment pass writes the
  * corpus partitioned BY list_id (so a probe reads only its lists'
  * files), centroids are a broadcast-size table, and recall/latency trade
  * via nprobe. Here the assigned frame stays in memory; the plan shapes
  * (broadcast centroid scoring, list-bucket join, per-query top-k window)
  * are the same ones that hold at scale.
  *
  * No DuckDB oracle: k-means is iterative floating-point and not
  * SQL-mirrorable — the driver records a rows-only check and IvfSpec
  * asserts recall against the exact KNN (q22) ground truth.
  */
object Ivf {

  final case class Index(model: KMeansModel, assigned: DataFrame)

  /** Fit nlist centroids (seeded) and assign every vector to its list. */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            nlist: Int, seed: Long = 42L): Index = {
    val feat = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("list_id")
      .fit(feat)
    val assigned = model.transform(feat).drop("features")
      .withColumn("nrm", norm(col("v")))
    Index(model, assigned)
  }

  /** Top-k cosine neighbors per query, probing the `nprobe` nearest
    * lists. Output matches q22's shape (q_id, neighbor_id, cos_sim, rnk). */
  def topK(spark: SparkSession, index: Index, queries: DataFrame,
           k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val centroids = index.model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("list_id", "centroid")
    val q = queries.select(col("id").as("q_id"), col("v").as("qv"))
      .withColumn("qn", norm(col("qv")))
    // probe selection: small q × small centroid table — both broadcastable
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("cdist").asc)
    val probes = broadcast(q).crossJoin(broadcast(centroids))
      .withColumn("cdist", -dot(col("qv"), col("centroid"))) // max cosine ≈ min -dot (unit-ish data)
      .withColumn("prnk", row_number().over(probeW))
      .filter(col("prnk") <= nprobe)
      .select(col("q_id"), col("qv"), col("qn"), col("list_id"))
    // scan only the probed lists
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    probes.join(index.assigned, "list_id")
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("neighbor_id"),
        round(cosineWithNorms(col("qv"), col("qn"), col("v"), col("nrm")), 4)
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Query entry: IVF top-10 for the same query set as q22 (vec_id < 10),
    * nlist=16, nprobe=4 — scans ~¼ of the corpus per query. */
  def q28IvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val index = build(emb, "id", "v", nlist = 16)
    topK(spark, index, emb.filter(col("id") < 10), k = 10, nprobe = 4)
  }
}

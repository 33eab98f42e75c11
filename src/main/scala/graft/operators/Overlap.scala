package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftUdfs

/** CORPUS-OVERLAP ESTIMATION via KMV set algebra (Beyer et al., SIGMOD
  * 2007) — the cross-corpus question a training-data owner asks
  * constantly ("how much of crawl B is already in corpus A?", "what is
  * the eval suite's contamination rate against this snapshot?") answered
  * WITHOUT the corpus-sized distinct-join an exact answer costs:
  *
  *  1. each side folds to ONE k-smallest-hash sketch (k longs,
  *     mergeable partial aggregation — the corpus shuffles k values
  *     total, not its keys);
  *  2. the two sketches combine on the driver (2k longs — a bounded
  *     plan-building read, the centroid/stats precedent):
  *     `S = k smallest of (A ∪ B)` is a uniform sample of the UNION,
  *     so `ρ = |S ∩ A_sketch ∩ B_sketch| / |S|` estimates the Jaccard
  *     and `ρ · estUnion` the intersection size.
  *
  * Each side's sketch is the SAME sample [[GraftUdfs.KmvDistinctAggregator]]
  * draws (shared kernel), so the overlap path and the q26 distinct-count
  * path can never disagree about what was sketched. Deterministic by
  * construction: FNV-1a is seedless, the k-smallest set is
  * order-independent, so every estimate is a stable integer — the gate
  * still emits tolerance BOOLEANS (the q26/q50 pattern) because the
  * SKETCH's error, not the engine's arithmetic, is the property under
  * test: anchors are oracle-exact, the bands hold with the q28 margin
  * discipline.
  *
  * Scale: two one-pass map-side-partial folds + O(k) driver math. At
  * 100 TB this is the difference between answering the overlap question
  * from two 2 KB sketches (which can be PERSISTED per snapshot version
  * and compared across any pair, ever, for free) and running a
  * distinct-anti-join between two corpora. Standard error ≈ 1/√(k−2) on
  * the union, binomial √(ρ(1−ρ)/k) on the Jaccard fraction.
  */
object Overlap {

  final case class Estimate(nA: Long, nB: Long, estUnion: Long,
                            estIntersection: Long, estJaccardE4: Long)

  /** Estimate |A|, |B|, |A∪B|, |A∩B| and Jaccard over the distinct
    * values of `keyCol` using k-min-value sketches. */
  def kmvOverlap(a: DataFrame, b: DataFrame, keyCol: String, k: Int): Estimate = {
    val spark = a.sparkSession
    import spark.implicits._
    val agg = new GraftUdfs.KmvSketchAggregator(k).toColumn
    def sketch(df: DataFrame): Array[Long] =
      df.select(col(keyCol).cast("string")).as[String].select(agg).head()
    val sa = sketch(a)
    val sb = sketch(b)
    val union = sb.foldLeft(sa)(GraftUdfs.Kmv.insert(k))
    val inA = sa.toSet
    val inB = sb.toSet
    val kk = union.length // k, or the exact union size below saturation
    val both = union.count(h => inA(h) && inB(h))
    val estU = GraftUdfs.Kmv.estimate(k, union)
    val estJacE4 = if (kk == 0) 0L else math.round(both.toDouble * 10000.0 / kk)
    val estI = if (kk == 0) 0L else math.round(both.toDouble * estU / kk)
    Estimate(GraftUdfs.Kmv.estimate(k, sa), GraftUdfs.Kmv.estimate(k, sb),
      estU, estI, estJacE4)
  }

  // q158 parameters: sketch size and the certification bands. k = 256
  // gives ~6.3% SE on the union and ~3σ ≈ 9-point absolute error on the
  // Jaccard fraction; the bands below are ≥ 2× the measured fixture
  // error (q28 margin discipline).
  private val K = 256
  private val UnionBandE4 = 2000L    // ±20% relative on est_union
  private val JaccardBandE4 = 1500L  // ±15 points absolute on Jaccard
  private val InterBandE4 = 3000L    // ±30% relative on est_intersection

  /** q158: the overlap estimate certified against the EXACT answer —
    * A = documents with doc_id % 3 ≠ 0 (two thirds), B = doc_id % 2 = 0
    * (half), overlapping on the sixth-densities (true Jaccard = 2/5).
    * Anchors (n_a, n_b, true_union, true_intersection, jaccard
    * numerator/denominator) are oracle-exact; the est_* booleans
    * certify each estimate inside its band. Sketches saturate at the
    * gate SF (n_union ≈ 417 > k = 256), so the approximate path — not
    * the exact-below-k shortcut — is what's certified. */
  def q158KmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(
      concat(lit("d:"), col("doc_id")).as("key"), col("doc_id"))
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 2 === 0)
    val est = kmvOverlap(a, b, "key", K)
    val exact = a.select(col("key")).union(b.select(col("key")))
      .agg(countDistinct(col("key")).as("true_union"))
      .crossJoin(broadcast(
        a.select(col("key")).intersect(b.select(col("key")))
          .agg(count(lit(1)).as("true_intersection"))))
      .crossJoin(broadcast(a.agg(count(lit(1)).as("n_a"))))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("n_b"))))
    exact.select(
      col("n_a"), col("n_b"), col("true_union"), col("true_intersection"),
      (abs(lit(est.estUnion) - col("true_union")) * 10000 <=
        col("true_union") * UnionBandE4).as("union_ok"),
      (abs(lit(est.estIntersection) - col("true_intersection")) * 10000 <=
        col("true_intersection") * InterBandE4).as("intersection_ok"),
      (abs(lit(est.estJaccardE4) -
        col("true_intersection") * 10000 / col("true_union")) <=
        JaccardBandE4).as("jaccard_ok"))
  }

  val q158KmvOverlapSql: String =
    """WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 != 0),
      |b AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0)
      |SELECT (SELECT count(*) FROM a)::BIGINT AS n_a,
      |  (SELECT count(*) FROM b)::BIGINT AS n_b,
      |  (SELECT count(DISTINCT doc_id) FROM (SELECT * FROM a UNION ALL SELECT * FROM b))::BIGINT AS true_union,
      |  (SELECT count(*) FROM a WHERE doc_id IN (SELECT doc_id FROM b))::BIGINT AS true_intersection,
      |  TRUE AS union_ok, TRUE AS intersection_ok, TRUE AS jaccard_ok""".stripMargin
}

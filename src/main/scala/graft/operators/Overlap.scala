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

  /** One side's k-min sketch: one mergeable fold. Null keys are
    * dropped, not crashed on — externally-landed data (the streamed
    * ingest path) can carry them, and a null has no distinct-value
    * identity to sample. */
  def sketchOf(df: DataFrame, keyCol: String, k: Int): Array[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new GraftUdfs.KmvSketchAggregator(k).toColumn
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string")).as[String].select(agg).head()
  }

  /** Estimate |A|, |B|, |A∪B|, |A∩B| and Jaccard over the distinct
    * values of `keyCol` using k-min-value sketches — one pass per side,
    * then [[overlapFromSketches]] (ONE estimator body; the batch and
    * fingerprint paths must agree by construction). */
  def kmvOverlap(a: DataFrame, b: DataFrame, keyCol: String, k: Int): Estimate =
    overlapFromSketches(sketchOf(a, keyCol, k), sketchOf(b, keyCol, k), k)

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
  /** The gate-fixture pair: A = two thirds of documents, B = half. */
  private def gateSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, dir).select(
      concat(lit("d:"), col("doc_id")).as("key"), col("doc_id"))
    (docs.filter(col("doc_id") % 3 =!= 0), docs.filter(col("doc_id") % 2 === 0))
  }

  /** The shared gate tail: oracle-exact anchors + the band booleans
    * over `est`, with q159/q160's matches_batch spliced in when the
    * incremental path is under test — ONE block, so a band or fixture
    * tweak can never desynchronize the three gates. */
  private def gateRow(a: DataFrame, b: DataFrame, est: Estimate,
                      matchesBatch: Option[Boolean]): DataFrame = {
    val exact = a.select(col("key")).union(b.select(col("key")))
      .agg(countDistinct(col("key")).as("true_union"))
      .crossJoin(broadcast(
        a.select(col("key")).intersect(b.select(col("key")))
          .agg(count(lit(1)).as("true_intersection"))))
      .crossJoin(broadcast(a.agg(count(lit(1)).as("n_a"))))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("n_b"))))
    val base = Seq(
      col("n_a"), col("n_b"), col("true_union"), col("true_intersection")) ++
      matchesBatch.map(m => lit(m).as("matches_batch")).toSeq ++ Seq(
      (abs(lit(est.estUnion) - col("true_union")) * 10000 <=
        col("true_union") * UnionBandE4).as("union_ok"),
      (abs(lit(est.estIntersection) - col("true_intersection")) * 10000 <=
        col("true_intersection") * InterBandE4).as("intersection_ok"),
      (abs(lit(est.estJaccardE4) -
        col("true_intersection") * 10000 / col("true_union")) <=
        JaccardBandE4).as("jaccard_ok"))
    exact.select(base: _*)
  }

  def q158KmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = gateSides(spark, dir)
    gateRow(a, b, kmvOverlap(a, b, "key", K), matchesBatch = None)
  }

  val q158KmvOverlapSql: String =
    """WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 != 0),
      |b AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0)
      |SELECT (SELECT count(*) FROM a)::BIGINT AS n_a,
      |  (SELECT count(*) FROM b)::BIGINT AS n_b,
      |  (SELECT count(DISTINCT doc_id) FROM (SELECT * FROM a UNION ALL SELECT * FROM b))::BIGINT AS true_union,
      |  (SELECT count(*) FROM a WHERE doc_id IN (SELECT doc_id FROM b))::BIGINT AS true_intersection,
      |  TRUE AS union_ok, TRUE AS intersection_ok, TRUE AS jaccard_ok""".stripMargin

  /** INCREMENTAL SKETCH STATE — fold a day's keys into a persistent
    * k-min sketch, so every snapshot VERSION carries a 2 KB overlap
    * fingerprint that compares against any other version (or corpus)
    * ever, for free. The k-min set is MONOTONE-MERGEABLE (union +
    * truncate is idempotent, commutative, associative on hash SETS), so
    * like the top-k sample state (q132) — and unlike the additive
    * ledgered folds — re-delivery and arrival order are absorbed by
    * construction: no batch ledger, no watermark, just the fold.
    *
    * Scale: per-batch cost is the batch's own one-pass fold; state is k
    * longs FOREVER. Publish is the commit-log snapshot's one file
    * create ([[graft.sinks.SnapshotState]] — rename-free, loud under a
    * concurrent folder, no two-rename crash window to reset the
    * fingerprint). */
  def sketchIngest(spark: SparkSession, path: String, batch: DataFrame,
                   keyCol: String, k: Int): Unit = {
    import spark.implicits._
    val bs = sketchOf(batch, keyCol, k)
    graft.sinks.SnapshotState.fold(spark, path) { cur =>
      val merged = cur match {
        case Some(st) =>
          val old = st.select(col("sketch")).as[Array[Long]].head()
          bs.foldLeft(old)(GraftUdfs.Kmv.insert(k))
        case None => bs
      }
      Seq(Tuple1(merged)).toDF("sketch").coalesce(1)
    }
  }

  /** Read a persisted sketch state. */
  def readSketch(spark: SparkSession, path: String): Array[Long] = {
    import spark.implicits._
    graft.sinks.SnapshotState.read(spark, path).getOrElse(
        throw new IllegalStateException(s"no committed sketch state at $path"))
      .select(col("sketch")).as[Array[Long]].head()
  }

  /** Overlap estimate from two RAW sketches (the persisted-fingerprint
    * comparison path — no corpus access at all). */
  def overlapFromSketches(sa: Array[Long], sb: Array[Long], k: Int): Estimate = {
    val union = sb.foldLeft(sa)(GraftUdfs.Kmv.insert(k))
    val inA = sa.toSet
    val inB = sb.toSet
    val kk = union.length
    val both = union.count(h => inA(h) && inB(h))
    val estU = GraftUdfs.Kmv.estimate(k, union)
    val estJacE4 = if (kk == 0) 0L else math.round(both.toDouble * 10000.0 / kk)
    val estI = if (kk == 0) 0L else math.round(both.toDouble * estU / kk)
    Estimate(GraftUdfs.Kmv.estimate(k, sa), GraftUdfs.Kmv.estimate(k, sb),
      estU, estI, estJacE4)
  }

  /** The q159/q160 shared gate tail: the A-side sketch from `path`'s
    * ingested state vs the batch-computed sketches (each side scanned
    * ONCE — the batch comparison reuses the same B sketch) — the whole
    * point of the incremental path is that the snapshot-derived
    * estimate EQUALS the batch answer (`matches_batch`, deterministic
    * equality: the k-min hash set is grouping- and order-independent),
    * gated next to q158's oracle-exact anchors and bands. */
  private[operators] def ingestedGateRow(spark: SparkSession, dir: String,
                                         statePath: String): DataFrame = {
    val (a, b) = gateSides(spark, dir)
    val sa = sketchOf(a, "key", K)
    val sb = sketchOf(b, "key", K)
    val est = overlapFromSketches(readSketch(spark, statePath), sb, K)
    val batchEst = overlapFromSketches(sa, sb, K)
    gateRow(a, b, est, matchesBatch = Some(est == batchEst))
      .localCheckpoint(true) // materialize before the state dir dies
  }

  /** q159: [[sketchIngest]] under the REVERSED day-split + re-delivery
    * harness (day 2 folds FIRST, then day 1 carrying a re-delivered
    * slice — legal here and only among the monotone states, q132's
    * precedent): the A-side corpus arrives incrementally, and the
    * overlap derived from the persisted fingerprint must EQUAL the
    * whole-corpus batch estimate, inside q158's certified bands. */
  def q159SketchIngest(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q159_")
    try {
      val path = s"$base/sketch_state"
      val docs = Tables.documents(spark, dir).select(
        concat(lit("d:"), col("doc_id")).as("key"), col("doc_id"))
      val a = docs.filter(col("doc_id") % 3 =!= 0)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
      Seq(
        a.filter(col("doc_id") > cut), // day 2 delivered FIRST
        a.filter(col("doc_id") <= cut)
          .unionByName(a.filter(col("doc_id") % 5 === 0))) // re-delivery
        .foreach(day => sketchIngest(spark, path, day, "key", K))
      ingestedGateRow(spark, dir, path)
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** q158's oracle + the matches_batch literal. */
  val q159SketchIngestSql: String = q158KmvOverlapSql.replace(
    "TRUE AS union_ok", "TRUE AS matches_batch,\n  TRUE AS union_ok")

  /** q160: the q159 fold behind a REAL file stream
    * ([[graft.streaming.StreamingSketch]] — foreachBatch per landed day
    * file, Trigger.AvailableNow), files landed in reversed day order
    * with a re-delivered slice — both absorbed by the monotone merge
    * (the q142/q151 streamed-monotone-state pattern). Oracle IS
    * q159's. */
  def q160StreamSketch(spark: SparkSession, dir: String): DataFrame = 
    graft.streaming.StreamConf.withShuffle(spark) {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_q160_")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(base.toString).getFileSystem(conf)
    try {
      val srcDir = s"$base/arrivals"
      val statePath = s"$base/sketch_state"
      val docs = Tables.documents(spark, dir).select(
        concat(lit("d:"), col("doc_id")).as("key"), col("doc_id"))
      val a = docs.filter(col("doc_id") % 3 =!= 0)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
      fs.mkdirs(new Path(srcDir))
      Seq(
        a.filter(col("doc_id") > cut), // reversed day order
        a.filter(col("doc_id") <= cut)
          .unionByName(a.filter(col("doc_id") % 5 === 0)))
        .zipWithIndex.foreach { case (d, i) =>
          d.coalesce(1).write.parquet(s"$base/stage_$i")
          val part = fs.globStatus(new Path(s"$base/stage_$i/part-*.parquet"))(0).getPath
          fs.rename(part, new Path(s"$srcDir/day_$i.parquet"))
        }
      val q = graft.streaming.StreamingSketch.start(spark, srcDir, statePath,
        s"$base/ckpt", "key", K, trigger = Some(Trigger.AvailableNow()))
      try q.awaitTermination()
      finally { if (q.isActive) q.stop() }
      ingestedGateRow(spark, dir, statePath)
    } finally {
      fs.delete(new Path(base.toString), true)
    }
  }

  val q160StreamSketchSql: String = q159SketchIngestSql
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` fixture (SURVEY.md §2B row 5
  * — the round-1 gap): exact top-k nearest neighbors as the correctness
  * baseline, and a bucketed signed-random-projection (SRP) LSH join as
  * the scale path. Both have generated DuckDB oracles sharing the exact
  * hyperplane literals, so the driver hash-checks the full pipeline.
  *
  * Scale design:
  *  - q22 broadcasts the (small) query set and makes ONE pass over the
  *    corpus — a BroadcastNestedLoopJoin feeding per-query top-k; the
  *    corpus is never shuffled, so the plan is linear in corpus size and
  *    parallel over its partitions.
  *  - q23 never forms the pair matrix: vectors meet only inside (band,
  *    key) buckets, exactly like the MinHash band join in [[Dedup]].
  *    8 bands × 4 bits suit this fixture's weak similarity structure
  *    (max pairwise cosine ≈ 0.5); at 10⁸+ vectors raise bitsPerBand
  *    (≈ log2 n − 10) so expected bucket size stays flat.
  */
object SimilarityQueries {

  private val K = 10
  private val NQueries = 10
  // 8 bands × 6 bits: a random pair (cos≈0) collides on a band with
  // p=2⁻⁶, so candidates ≈ 1-(1-2⁻⁶)⁸ ≈ 12% of pairs (4 bits made that
  // ~50% — effectively brute force); pairs at the 0.4 threshold still
  // collide on some band ~40% of the time. More corpus → more bits.
  private val SrpBands = 8
  private val SrpBitsPerBand = 6
  private val SrpThreshold = 0.4
  private val Dim = 64
  private val Planes = srpPlanes(SrpBands * SrpBitsPerBand, Dim)

  /** Embeddings with the norm materialized once per vector. */
  private def embWithNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Exact top-k cosine neighbors for a fixed small query set (vec_id <
    * NQueries): broadcast queries × one corpus scan → per-query top-k by
    * (rounded cosine desc, neighbor id asc) — the deterministic tiebreak
    * both engines agree on. */
  def q22KnnExact(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embWithNorm(spark, dir)
    val queries = corpus.filter(col("id") < NQueries)
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = broadcast(queries)
      .join(corpus, col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("neighbor_id"),
        round(cosineWithNorms(col("qv"), col("qn"), col("v"), col("nrm")), 4)
          .as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .orderBy(col("q_id"), col("rnk"))
  }

  val q22KnnExactSql: String =
    s"""WITH n AS (SELECT vec_id AS id, embedding AS v,
       |             sqrt(list_sum(list_apply(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
       |           FROM embeddings),
       |q AS (SELECT id AS q_id, v AS qv, nrm AS qn FROM n WHERE id < $NQueries),
       |pairs AS (
       |  SELECT q.q_id, n.id AS neighbor_id,
       |    round(list_sum(list_apply(range(1, ${Dim + 1}),
       |            i -> qv[i]::DOUBLE * n.v[i]::DOUBLE)) / (qn * n.nrm), 4) AS cos_sim
       |  FROM q JOIN n ON n.id != q.q_id),
       |rk AS (SELECT *, row_number() OVER
       |         (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
       |       FROM pairs)
       |SELECT q_id, neighbor_id, cos_sim, rnk FROM rk
       |WHERE rnk <= $K ORDER BY q_id, rnk""".stripMargin

  /** Generic SRP-LSH near-neighbor pairs over an `(id, v)` frame: sign
    * bits against literal hyperplanes → band keys → bucket self-join →
    * exact cosine verify (>= threshold). Zero false positives (verify is
    * exact); false negatives are the tunable LSH recall tradeoff. Used by
    * q23 over the embeddings fixture and by the multimodal feature path
    * ([[MediaQueries]]). The (small) verified result is materialized via
    * localCheckpoint and the persisted bits frame released immediately —
    * library callers don't leak cache blocks (same discipline as
    * [[Dedup]]). */
  def annSrpPairs(vectors: DataFrame, planes: Array[Array[Double]],
                  bands: Int, bitsPerBand: Int, threshold: Double): DataFrame = {
    val emb = vectors.select(col("id"), col("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("bits", srpBits(col("v"), planes))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = emb
      .select(col("id"), posexplode(srpBandKeys(col("bits"), bands, bitsPerBand)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    val verified = cand
      .join(emb.select(col("id").as("id1"), col("v").as("v1"), col("nrm").as("n1")), "id1")
      .join(emb.select(col("id").as("id2"), col("v").as("v2"), col("nrm").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        round(cosineWithNorms(col("v1"), col("n1"), col("v2"), col("n2")), 4)
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
    val out = verified.localCheckpoint(true)
    emb.unpersist()
    out
  }

  /** [[annSrpPairs]] with this module's shared planes/bands/threshold —
    * the exact parameterization [[srpPairsCtes]] mirrors, exposed so
    * compositions (q69's semantic funnel stage) reuse one edge
    * definition across Scala and oracle. */
  private[graft] def srpPairsShared(vectors: DataFrame): DataFrame =
    annSrpPairs(vectors, Planes, SrpBands, SrpBitsPerBand, SrpThreshold)

  /** q23: SRP-LSH pairs over the embeddings fixture, against the shared
    * literal hyperplanes the generated DuckDB oracle also embeds. */
  def q23AnnSrp(spark: SparkSession, dir: String): DataFrame =
    annSrpPairs(
      Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("v")),
      Planes, SrpBands, SrpBitsPerBand, SrpThreshold)
      .orderBy(col("id1"), col("id2"))

  /** The q23 SRP pair pipeline as reusable CTEs ending in
    * `${prefix}pairs(id1, id2, cos_sim)` — shared verbatim by the q23
    * oracle, the q53 semantic-clustering oracle, and (prefixed, over the
    * funnel's post-lexical survivors) the q69 semantic-funnel oracle, so
    * all gates agree on the edge set by construction (same pattern as
    * TextQueries.simhashPairsCtes). `src` must expose (vec_id,
    * embedding); `prefix` namespaces the internal CTEs so callers can
    * splice these next to the simhash CTEs' unprefixed `pairs`. */
  private[operators] def srpPairsCtes(src: String = "embeddings",
                                      prefix: String = ""): String = {
    // Explicit left-associated term chains, NOT list_apply lambdas: the
    // lambda form re-constructed the 64-element plane literal per list
    // element (quadratic — measured 20.9 s for the 500-row fixture's
    // `bits` CTE alone), where the unrolled chain is one vectorized
    // expression. Addition order (i = 1..Dim, left to right) is the
    // lambda form's exact order, so every double — and therefore every
    // sign bit and every round(cos, 4) — is bit-identical (verified
    // value-equal against the lambda formulation on the sf0.001/sf0.01
    // fixtures before the swap).
    val bitEntries = Planes.map { p =>
      val dot = p.zipWithIndex.map { case (w, i) =>
        s"${if (w > 0) "+" else "-"} v[${i + 1}]::DOUBLE"
      }.mkString(" ")
      s"CASE WHEN ($dot) >= 0 THEN 1 ELSE 0 END"
    }.mkString(",\n    ")
    val keyExpr = (0 until SrpBitsPerBand).map { j =>
      s"bs[b.band * $SrpBitsPerBand + ${j + 1}] * ${1 << (SrpBitsPerBand - 1 - j)}"
    }.mkString(" + ")
    val cosDot = (1 to Dim)
      .map(i => s"e1.v[$i]::DOUBLE * e2.v[$i]::DOUBLE").mkString(" + ")
    // MATERIALIZED throughout: DuckDB inlines CTEs per reference, and
    // every stage here is multi-referenced (bands twice by cand, bits
    // twice by pairs, pairs twice by the symmetric edge union) — without
    // the hint each reference re-runs the full upstream pipeline.
    val p = prefix
    s"""${p}n AS MATERIALIZED (SELECT vec_id AS id, embedding AS v,
       |             sqrt(list_sum(list_apply(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
       |           FROM $src),
       |${p}bits AS MATERIALIZED (SELECT id, v, nrm, [
       |    $bitEntries
       |  ] AS bs FROM ${p}n),
       |${p}bands AS MATERIALIZED (SELECT id, b.band, $keyExpr AS key
       |          FROM ${p}bits, range($SrpBands) b(band)),
       |${p}cand AS MATERIALIZED (SELECT DISTINCT a.id AS id1, b.id AS id2
       |         FROM ${p}bands a JOIN ${p}bands b
       |         ON a.band = b.band AND a.key = b.key AND a.id < b.id),
       |${p}pairs AS MATERIALIZED (SELECT * FROM (
       |  SELECT id1, id2,
       |    round(($cosDot) / (e1.nrm * e2.nrm), 4) AS cos_sim
       |  FROM ${p}cand JOIN ${p}bits e1 ON ${p}cand.id1 = e1.id JOIN ${p}bits e2 ON ${p}cand.id2 = e2.id)
       |WHERE cos_sim >= $SrpThreshold)""".stripMargin
  }

  val q23AnnSrpSql: String =
    s"""WITH ${srpPairsCtes()}
       |SELECT id1, id2, cos_sim FROM pairs ORDER BY id1, id2""".stripMargin

  /** q53: SEMANTIC dedup clusters — connected components over the q23
    * embedding-cosine pair set, the embedding-space analogue of q52's
    * lexical (simhash) clustering. Together the two close the dedup
    * story end-to-end in both spaces: pair emitters bound candidates,
    * component formation closes transitive chains, min-id doubles as
    * the canonical survivor. The oracle recomputes the SAME SRP edge
    * set (shared CTEs with q23) and closes it with the certified
    * unrolled closure ([[OracleSql.closureCtes]]), so
    * the gate value-checks chains with no direct qualifying pair. */
  def q53SemanticClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
        annSrpPairs(
          Tables.embeddings(spark, dir)
            .select(col("vec_id").as("id"), col("embedding").as("v")),
          Planes, SrpBands, SrpBitsPerBand, SrpThreshold))
      .select(col("id").as("vec_id"), col("comp").as("cluster_id"))
      .orderBy(col("vec_id"))

  val q53SemanticClustersSql: String =
    s"""WITH ${srpPairsCtes()},
       |${OracleSql.closureCtes("pairs")}
       |SELECT id AS vec_id, comp AS cluster_id
       |FROM clus ORDER BY vec_id""".stripMargin

  // q146 parameters: negatives kept per anchor.
  private val HnK = 5

  /** q146: HARD-NEGATIVE MINING — for each anchor (the q22 query set),
    * the [[HnK]] most-similar vectors that are NOT in the anchor's
    * semantic near-dup CLUSTER (q53's transitive components, not a raw
    * cosine threshold: a chained duplicate whose direct cosine to the
    * anchor is low would pass a threshold test and poison the batch as
    * a false negative — the exact failure contrastive training cares
    * about). This is the DPR/contrastive-mining step q119's ring
    * negatives deliberately avoid being: q119 draws UNIFORM negatives
    * with zero similarity computation; q146 mines the hardest ones.
    *
    * Scale: the cluster map is q53's banded pipeline (candidates
    * bounded by SRP buckets); the ranking scan is q22's broadcast-
    * queries × one-corpus-scan shape; the exclusion is two id-keyed
    * probes of the cluster map. Per-anchor top-k via rank window. */
  def q146HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Dedup.clusterComponents(
        srpPairsShared(Tables.embeddings(spark, dir)
          .select(col("vec_id").as("id"), col("embedding").as("v"))))
      .localCheckpoint(true) // probed from both sides of the pair
    val corpus = embWithNorm(spark, dir)
    val queries = corpus.filter(col("id") < NQueries)
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = broadcast(queries)
      .join(corpus, col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("neg_id"),
        round(cosineWithNorms(col("qv"), col("qn"), col("v"), col("nrm")), 4)
          .as("cos_sim"))
    val qc = clusters.select(col("id").as("q_id"), col("comp").as("q_cl"))
    val nc = clusters.select(col("id").as("neg_id"), col("comp").as("n_cl"))
    val kept = scored
      .join(qc, Seq("q_id"), "left")
      .join(nc, Seq("neg_id"), "left")
      .filter(col("q_cl").isNull || col("n_cl").isNull ||
        col("q_cl") =!= col("n_cl"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("neg_id").asc)
    kept.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= HnK)
      .select(col("q_id"), col("rank"), col("neg_id"), col("cos_sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  val q146HardNegativesSql: String =
    s"""WITH ${srpPairsCtes(prefix = "c")},
       |${OracleSql.closureCtes("cpairs", prefix = "c")},
       |cl AS MATERIALIZED (SELECT id, comp AS cluster_id FROM cclus),
       |n AS MATERIALIZED (SELECT vec_id AS id, embedding AS v,
       |        sqrt(list_sum(list_apply(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
       |      FROM embeddings),
       |q AS (SELECT id AS q_id, v AS qv, nrm AS qn FROM n WHERE id < $NQueries),
       |sc AS (
       |  SELECT q.q_id, n.id AS neg_id,
       |    round((${(1 to Dim).map(i => s"qv[$i]::DOUBLE * n.v[$i]::DOUBLE").mkString(" + ")}) / (qn * n.nrm), 4) AS cos_sim
       |  FROM q, n WHERE n.id != q.q_id),
       |kept AS (
       |  SELECT sc.* FROM sc
       |  LEFT JOIN cl a ON a.id = sc.q_id
       |  LEFT JOIN cl b ON b.id = sc.neg_id
       |  WHERE a.cluster_id IS NULL OR b.cluster_id IS NULL
       |     OR a.cluster_id != b.cluster_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |        ORDER BY cos_sim DESC, neg_id)::BIGINT AS rank FROM kept)
       |SELECT q_id, rank, neg_id, cos_sim FROM r WHERE rank <= $HnK
       |ORDER BY q_id, rank""".stripMargin

  /** q90's fixed linear probe: a deterministic public weight vector
    * (the trained-model stand-in — this sandbox trains nothing) plus a
    * threshold. The gate's subject is the INFERENCE SHAPE, which is the
    * part that matters at 100 TB: a linear head over an embedding
    * column is one broadcast literal + one codegen dot product per row. */
  private val ProbeW: Array[Double] =
    Array.tabulate(Dim)(i => ((i * 37 + 11) % 19 - 9) / 10.0)
  private val ProbeCut = 0.0

  /** q90: EMBEDDING-classifier quality filter — the model-based
    * curation stage (FineWeb-style: score each document with a trained
    * classifier head over its embedding; keep above threshold). Join
    * documents to their embeddings, score with the native
    * [[graft.expressions.DotProduct]] against the broadcast literal
    * probe, emit score + keep decision row-level exact (the oracle
    * recomputes the identical dot product via `list_apply`, q22's
    * machinery — same summation order, so the 4-dp round is safe).
    *
    * Scale: a stateless narrow map after one key join (co-located when
    * both tables are bucketed on the id — the q83 layout); the weight
    * vector is a plan literal, so nothing is broadcast at runtime and
    * nothing shuffles. A real transformer-scored filter would swap the
    * dot product for batched model inference (`mapInPandas`, the
    * [[graft.multimodal.Media]] plumbing); the selection semantics and
    * layout stay exactly this. */
  def q90EmbedFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val w = array(ProbeW.map(x => lit(x.toFloat)): _*)
    docs.join(emb, Seq("doc_id"))
      .withColumn("score",
        round(graft.functions.VectorFunctions.dot(col("embedding"), w), 4))
      .select(col("doc_id"), col("lang"), col("score"),
        (col("score") >= ProbeCut).as("kept"))
      .orderBy(col("doc_id"))
  }

  val q90EmbedFilterSql: String = {
    val wLit = ProbeW.map(x => s"${x.toFloat}::DOUBLE").mkString("[", ", ", "]")
    s"""WITH j AS (
       |  SELECT d.doc_id, d.lang, e.embedding
       |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
       |s AS (SELECT doc_id, lang,
       |  round(list_sum(list_apply(range(1, ${Dim + 1}),
       |    i -> embedding[i]::DOUBLE * ($wLit)[i])), 4) AS score
       |FROM j)
       |SELECT doc_id, lang, score, score >= $ProbeCut AS kept
       |FROM s ORDER BY doc_id""".stripMargin
  }

  // q125 parameters: every SemDeconMod-th vector is the pretend eval
  // suite; flag training vectors with cosine >= SemDeconTau to any of it.
  private[operators] val SemDeconMod = 10
  private[operators] val SemDeconTau = 0.4

  /** SEMANTIC decontamination: flag training vectors whose embedding is
    * within cosine `tau` of any eval-suite vector — the embedding-space
    * analogue of the lexical shingle probes (q60 exact / q117 Bloom).
    * Lexical decontamination misses paraphrases of a leaked benchmark
    * item; an embedding probe catches them (the method the phi/FineWeb
    * class of pipelines runs next to n-gram checks). Returns one row per
    * contaminated training vector: hit count, the closest eval vector
    * (cos desc, id asc de-tie), and its rounded cosine.
    *
    * Scale: q60's bounded-side argument, moved to embedding space — the
    * eval suite is small and broadcasts; the corpus is scanned ONCE
    * through a broadcast nested-loop probe (per-row codegen dot
    * products, q22's shape), and the only exchange carries HIT rows
    * (bounded by contamination volume) into a per-vector aggregate with
    * map-side partials. The corpus itself never shuffles. If the eval
    * suite outgrows a broadcast, the SRP band join ([[annSrpPairs]]) is
    * the prefilter with this probe as its verify — same funnel shape as
    * the lexical q60→q117 escalation. */
  def semanticContaminated(train: DataFrame, evalVecs: DataFrame,
                           tau: Double): DataFrame = {
    val tr = train.select(col("id"), col("v")).withColumn("nrm", norm(col("v")))
    val ev = evalVecs.select(col("id").as("e_id"), col("v").as("ev"))
      .withColumn("en", norm(col("ev")))
    val hits = broadcast(ev).join(tr)
      .select(col("id").as("vec_id"), col("e_id"),
        round(cosineWithNorms(col("v"), col("nrm"), col("ev"), col("en")), 4)
          .as("cos_sim"))
      .filter(col("cos_sim") >= tau)
    // best-hit as ONE max(struct) aggregate (the q115 move: never a
    // window sort over the hit set); the oracle's rank-window
    // formulation certifies the rewrite semantics-free
    hits.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_hits"),
        max(struct(col("cos_sim").as("c"), (-col("e_id")).as("ni"))).as("m"))
      .select(col("vec_id"), col("n_hits"),
        (-col("m.ni")).as("best_eval_id"), col("m.c").as("best_cos"))
  }

  /** q125: semantic decontamination over the embeddings fixture. */
  def q125SemanticDecon(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    semanticContaminated(
        all.filter(col("id") % SemDeconMod =!= 0),
        all.filter(col("id") % SemDeconMod === 0), SemDeconTau)
      .orderBy(col("vec_id"))
  }

  val q125SemanticDeconSql: String =
    s"""WITH n AS (SELECT vec_id AS id, embedding AS v,
       |             sqrt(list_sum(list_apply(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
       |           FROM embeddings),
       |ev AS (SELECT id AS e_id, v AS ev, nrm AS en FROM n WHERE id % $SemDeconMod = 0),
       |tr AS (SELECT * FROM n WHERE id % $SemDeconMod != 0),
       |hits AS (SELECT * FROM (
       |    SELECT tr.id AS vec_id, ev.e_id,
       |      round(list_sum(list_apply(range(1, ${Dim + 1}),
       |              i -> tr.v[i]::DOUBLE * ev.ev[i]::DOUBLE)) / (tr.nrm * ev.en), 4) AS cos_sim
       |    FROM tr, ev)
       |  WHERE cos_sim >= $SemDeconTau),
       |rk AS (SELECT vec_id, e_id, cos_sim,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, e_id) AS rn,
       |    count(*) OVER (PARTITION BY vec_id) AS n_hits
       |  FROM hits)
       |SELECT vec_id, n_hits::BIGINT AS n_hits, e_id AS best_eval_id, cos_sim AS best_cos
       |FROM rk WHERE rn = 1 ORDER BY vec_id""".stripMargin

  // q196 parameters: candidate pool fetched by the quantized stage
  // before the exact re-rank.
  private val QuantPool = 50

  /** Per-vector symmetric int8 quantization: q_i = round(x_i·127 / s)
    * with s = max|x_i| (0 → all-zero codes). The standard
    * 4-8× scan-byte reduction for embedding search — and, unlike every
    * float path in this file, the quantized DOT PRODUCT is pure BIGINT
    * algebra, so the candidate stage is bit-exact across engines with
    * no rounding discipline needed at all. */
  def int8Quantize(v: Column): Column = {
    import graft.functions.TextFunctions.bind
    bind(array_max(transform(v, x => abs(x.cast("double"))))) { s =>
      transform(v, x =>
        when(s === 0.0, lit(0))
          .otherwise(round(x.cast("double") * 127.0 / s).cast("int")))
    }
  }

  /** Exact integer dot product of two int8 code arrays. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** q196: QUANTIZED-PREFILTER KNN — q22's exact search with the
    * corpus-scan stage run on int8 codes instead of float vectors: per
    * query, the top-[[QuantPool]] candidates by INTEGER quantized dot
    * (deterministic: qdot desc, id asc — exact BIGINTs, no float
    * discipline needed), then the exact-cosine re-rank of the pool
    * only. The int8 analog of q167's SRP-sketch stage: at rest the
    * code column is 4× narrower than the float vector (plus one scale
    * per vector), so the stage-1 scan reads a quarter of the bytes;
    * unlike the 256-bit sketch it preserves magnitude structure, so
    * the pool needs no hamming-style band tuning. Gate = the full
    * pipeline output row-level exact (pool cut, integer dots, re-rank
    * order, final top-k), not a recall boolean — the oracle recomputes
    * the identical quantization, so a codebook off by one level fails
    * row-level. Recall vs exact KNN is spec-pinned next to q167's.
    *
    * Scale: broadcast queries × one corpus scan (stage 1, codes only)
    * → per-query TakeOrdered pool → re-rank joins float vectors for
    * POOL rows only (at rest: a parquet point-read by id, the q167
    * stage-2 shape). */
  def q196QuantKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embWithNorm(spark, dir)
      .withColumn("v8", int8Quantize(col("v")))
    val queries = corpus.filter(col("id") < NQueries)
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("v8").as("q8"))
    val cand = broadcast(queries)
      .join(corpus, col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("neighbor_id"),
        intDot(col("q8"), col("v8")).as("qdot"),
        col("qv"), col("qn"), col("v"), col("nrm"))
    val poolW = Window.partitionBy(col("q_id"))
      .orderBy(col("qdot").desc, col("neighbor_id").asc)
    val pool = cand.withColumn("prnk", row_number().over(poolW))
      .filter(col("prnk") <= QuantPool)
    val rerankW = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    pool
      .withColumn("cos_sim",
        round(cosineWithNorms(col("qv"), col("qn"), col("v"), col("nrm")), 4))
      .withColumn("rnk", row_number().over(rerankW).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("q_id"), col("neighbor_id"), col("qdot"), col("cos_sim"),
        col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  val q196QuantKnnSql: String = {
    val dotIdx = (a: String, b: String) =>
      s"list_sum(list_apply(range(1, ${Dim + 1}), i -> ($a[i] * $b[i])::BIGINT))::BIGINT"
    s"""WITH n AS (SELECT vec_id AS id, embedding AS v,
       |    sqrt(list_sum(list_apply(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm,
       |    list_max(list_apply(embedding, x -> abs(x::DOUBLE))) AS s
       |  FROM embeddings),
       |c AS (SELECT id, v, nrm,
       |    list_transform(v, x -> CASE WHEN s = 0 THEN 0
       |      ELSE round(x::DOUBLE * 127 / s)::INT END) AS v8
       |  FROM n),
       |q AS (SELECT id AS q_id, v AS qv, nrm AS qn, v8 AS q8 FROM c
       |  WHERE id < $NQueries),
       |cand AS (SELECT q.q_id, c.id AS neighbor_id,
       |    ${dotIdx("q.q8", "c.v8")} AS qdot, q.qv, q.qn, c.v, c.nrm
       |  FROM q JOIN c ON c.id != q.q_id),
       |pool AS (SELECT * FROM (SELECT *, row_number() OVER
       |    (PARTITION BY q_id ORDER BY qdot DESC, neighbor_id) AS prnk FROM cand)
       |  WHERE prnk <= $QuantPool),
       |rr AS (SELECT q_id, neighbor_id, qdot,
       |    round(list_sum(list_apply(range(1, ${Dim + 1}),
       |      i -> qv[i]::DOUBLE * v[i]::DOUBLE)) / (qn * nrm), 4) AS cos_sim
       |  FROM pool),
       |rk AS (SELECT *, row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rnk FROM rr)
       |SELECT q_id, neighbor_id, qdot, cos_sim, rnk::BIGINT AS rnk FROM rk
       |WHERE rnk <= $K ORDER BY q_id, rnk""".stripMargin
  }

  // q194 parameters: selection size and the deterministic seed point.
  private val KcK = 8
  private val KcSeed = 0L

  /** GREEDY k-CENTER (farthest-point) DIVERSITY SELECTION — pick k
    * embeddings such that every corpus point lies near some pick:
    * the classic 2-approximation (Gonzalez 1985) and the standard
    * "choose k DIVERSE exemplars" move in training-data curation
    * (coreset seeding, eval-set design, annotation budgets) — the
    * complement of every similarity-driven selector in this file:
    * q146 mines points NEAR a query; this mines points FAR from each
    * other, so every corpus point ends up close to some pick, with a
    * certified coverage radius.
    *
    * Round r: the point maximizing its min cosine-distance to the
    * selected set joins it (distance = round(1 − cos, 4): rounding at
    * every comparison keeps the argmax identical in both engines —
    * the q22 discipline; ties break on id ascending). The selection
    * ORDER and each pick's radius-at-selection are emitted — the
    * radius sequence is non-increasing, and the final `coverage` row
    * is max over unselected points of min-distance-to-centers: the
    * k-center objective value, certified exact.
    *
    * Scale: the min-distance frame carries one row per corpus vector;
    * each of the k rounds is ONE broadcast of the newly-picked vector
    * + a narrow least() map + a 1-row TakeOrdered — k linear passes,
    * nothing pairwise, no shuffle beyond the top-1 reduce. The 1-row
    * collect per round is the documented BPE/IVF-centroid precedent. */
  def kCenterGreedy(emb: DataFrame, k: Int, seedId: Long,
                    checkpointDir: Option[String] = None,
                    checkpointInterval: Int = 5): DataFrame = {
    require(k >= 1, s"k=$k")
    val sparkSess = emb.sparkSession
    import sparkSess.implicits._
    // checkpointDir: the cluster-safe reliable truncation opt-in
    // (IterCheckpoint, the connectedComponents contract) — default
    // unchanged (localCheckpoint per round)
    val ckpt = new IterCheckpoint(sparkSess, checkpointDir,
      checkpointInterval)
    try {
    def distTo(centerOneRow: DataFrame)(base: DataFrame): DataFrame =
      base.crossJoin(broadcast(centerOneRow
          .select(col("v").as("cv"), col("nrm").as("cn"))))
        .withColumn("d",
          round(lit(1.0) - cosineWithNorms(col("v"), col("nrm"),
            col("cv"), col("cn")), 4))
    val picks = Seq.newBuilder[(String, Option[Long], Option[Long], Option[Double])]
    picks += (("center", Some(1L), Some(seedId), None))
    var mind = ckpt.truncate(distTo(emb.filter(col("id") === seedId))(
        emb.filter(col("id") =!= seedId))
      .select(col("id"), col("v"), col("nrm"), col("d").as("mind")), 0)
    // If k meets/exceeds the number of distinct points the candidate frame
    // drains early: stop picking (every point is already a center) rather
    // than crashing on an empty argmax.
    var exhausted = false
    for (r <- 2 to k if !exhausted) {
      // the 1-row argmax collect is the action that materializes the
      // previous truncation — roll after it costs zero recompute
      val top = mind.orderBy(col("mind").desc, col("id").asc).limit(1)
        .select(col("id"), col("mind")).collect() // ≤1 row — driver-safe
      ckpt.roll(mind)
      if (top.isEmpty) exhausted = true
      else {
        picks += (("center", Some(r.toLong), Some(top(0).getLong(0)),
          Some(top(0).getDouble(1))))
        mind = ckpt.truncate(distTo(mind.filter(col("id") === top(0).getLong(0)))(
            mind.filter(col("id") =!= top(0).getLong(0)))
          .select(col("id"), col("v"), col("nrm"),
            least(col("mind"), col("d")).as("mind")), r - 1)
      }
    }
    // Empty residual (all points selected) ⇒ the objective is met exactly.
    val covRow = mind.agg(max(col("mind"))).head()
    ckpt.roll(mind) // the agg materialized it; release the prior round
    val coverage = if (covRow.isNullAt(0)) 0.0 else covRow.getDouble(0)
    picks += (("coverage", None, None, Some(coverage)))
    // finish: the result is a tiny driver-built frame, but running it
    // through finish releases the last persisted min-distance frame
    ckpt.finish(picks.result().toDF("sect", "rank", "center_id", "radius")
      .orderBy(col("sect"), col("rank")))
    } finally ckpt.restore()
  }

  /** q194: the diversity-selection gate — 8 greedy k-center picks over
    * the embeddings fixture from seed 0, each with its
    * radius-at-selection, plus the certified coverage radius. The
    * oracle unrolls the identical rounds as CTEs (1-row argmax per
    * round, the q120 loop-gate precedent), so a wrong argmax, a tie
    * broken the other way, a stale min-distance, or a coverage radius
    * off by one pick all fail row-level. */
  def q194KCenter(spark: SparkSession, dir: String): DataFrame =
    kCenterGreedy(embWithNorm(spark, dir), KcK, KcSeed)

  val q194KCenterSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_apply(range(1, ${Dim + 1}), i -> $a.v[i]::DOUBLE * $b.v[i]::DOUBLE))"
    val rounds = (2 to KcK).map { r =>
      s"""c$r AS MATERIALIZED (SELECT id, v, nrm, mind FROM m${r - 1}
         |  ORDER BY mind DESC, id LIMIT 1),
         |m$r AS MATERIALIZED (SELECT m.id, m.v, m.nrm,
         |    least(m.mind, round(1 - ${dot("m", "c")} / (m.nrm * c.nrm), 4)) AS mind
         |  FROM m${r - 1} m CROSS JOIN c$r c WHERE m.id != c.id)""".stripMargin
    }.mkString(",\n")
    val centerRows = (2 to KcK).map { r =>
      s"SELECT 'center', $r::BIGINT, (SELECT id FROM c$r)::BIGINT, (SELECT mind FROM c$r)::DOUBLE"
    }.mkString("\n  UNION ALL ")
    s"""WITH n AS (SELECT vec_id AS id, embedding AS v,
       |    sqrt(list_sum(list_apply(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
       |  FROM embeddings),
       |c1 AS MATERIALIZED (SELECT id, v, nrm FROM n WHERE id = $KcSeed),
       |m1 AS MATERIALIZED (SELECT m.id, m.v, m.nrm,
       |    round(1 - ${dot("m", "c")} / (m.nrm * c.nrm), 4) AS mind
       |  FROM n m CROSS JOIN c1 c WHERE m.id != $KcSeed),
       |$rounds
       |SELECT * FROM (
       |  SELECT 'center' AS sect, 1::BIGINT AS rank, $KcSeed::BIGINT AS center_id,
       |    NULL::DOUBLE AS radius
       |  UNION ALL $centerRows
       |  UNION ALL SELECT 'coverage', NULL::BIGINT, NULL::BIGINT,
       |    (SELECT max(mind) FROM m$KcK)::DOUBLE)
       |ORDER BY sect, rank""".stripMargin
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Corpus-statistics relevance ranking (north-star mandate — the
  * reference has no search/ranking operator; this is the retrieval
  * primitive a training-data pipeline uses to mine topical subsets and
  * to audit "what does the corpus say about X" during curation).
  *
  * BM25 (Robertson et al., TREC-3, 1994; the +1 idf smoothing is the
  * Lucene variant that keeps idf positive for df > N/2):
  *
  *   score(d, Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))
  *
  * Shape, built for 100 TB:
  *  - ONE narrow projection computes per-doc dl and the per-term tfs
  *    (`dl − size(array_remove(toks, t))` — no explode, no shuffle; the
  *    tokenize runs once per doc and the query's term count is a small
  *    constant, so this is a single codegen'd scan stage).
  *  - Corpus statistics (N, Σdl, per-term df) are ONE single-row
  *    aggregate — partial map-side agg, a few dozen bytes to the driver
  *    stage, then a broadcast 1-row cross join back onto the scan.
  *  - The top-k is `orderBy(...).limit(k)` → TakeOrderedAndProject:
  *    per-partition heaps of k rows, no global sort.
  *
  * Gate determinism: every MULTI-ROW aggregate is integer (counts, Σdl),
  * so engine-side summation order cannot perturb them; doubles appear
  * only in the per-row score, and the gate emits the RANK plus the
  * integer evidence (dl, per-term tf, n_matched), never the raw double —
  * `ln` may legitimately differ by an ulp between libm and the JVM, and
  * a rank only moves if two distinct-stat docs' scores collide within
  * that ulp (ties on identical stats break on doc_id in both engines).
  */
object Ranking {

  val K1 = 1.2
  val B  = 0.75

  /** Fixed query — terms chosen from the fixture vocabulary with a df
    * spread; order is part of the contract (score terms are summed in
    * this written order on both engines, keeping the fold bit-identical
    * per engine). */
  val QueryTerms: Seq[String] = Seq("spark", "vector", "merge", "customer", "window", "slow")

  private val TopN = 25

  /** Per-document BM25 scores for `terms` over `docs(idCol, textCol)`.
    * Returns (id, dl, tf_<term>…, n_matched, score). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = K1, b: Double = B): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct, s"bad query: $terms")
    val toks = TextFunctions.tokens(col(textCol))
    def tfCol(t: String): String = s"tf_$t"
    // one narrow pass: dl + per-term tf (dl minus the array with the term
    // removed — counts every occurrence, never explodes the token list)
    val perDoc = docs
      .select(col(idCol).as("id"), toks.as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .filter(col("dl") > 0)
      .select(Seq(col("id"), col("dl")) ++ terms.map { t =>
        (col("dl") - size(array_remove(col("toks"), t))).as(tfCol(t))
      }: _*)
    // single-row corpus stats: N, Σdl, df per term — all integer sums
    val stats = perDoc.agg(
      count(lit(1)).as("n_corpus"),
      Seq(sum(col("dl")).as("sum_dl")) ++ terms.map { t =>
        sum(when(col(tfCol(t)) > 0, 1L).otherwise(0L)).as(s"df_$t")
      }: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_corpus")
    def termScore(t: String): Column = {
      val tf  = col(tfCol(t)).cast("double")
      val idf = log(lit(1.0) +
        (col("n_corpus") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)))
      idf * (tf * (k1 + 1.0)) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / avgdl)))
    }
    val score = terms.map(termScore).reduce(_ + _) // fixed written order
    val matched = terms.map(t => when(col(tfCol(t)) > 0, 1L).otherwise(0L)).reduce(_ + _)
    perDoc.crossJoin(broadcast(stats)) // 1-row stats onto the scan
      .withColumn("n_matched", matched)
      .withColumn("score", score)
      .select(Seq(col("id"), col("dl")) ++ terms.map(t => col(tfCol(t))) ++
        Seq(col("n_matched"), col("score")): _*)
  }

  /** q95: BM25 top-25 over the documents fixture for [[QueryTerms]] —
    * rank + integer evidence columns (see object scaladoc for why the
    * double score stays out of the gate row). */
  def q95Bm25Rank(spark: SparkSession, dir: String): DataFrame = {
    val scored = bm25(Tables.documents(spark, dir), "doc_id", "text", QueryTerms)
    val top = scored.orderBy(col("score").desc, col("id").asc).limit(TopN)
    top.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("id").asc)))
      .select(Seq(col("rank"), col("id").as("doc_id"), col("dl")) ++
        QueryTerms.map(t => col(s"tf_$t")) ++ Seq(col("n_matched")): _*)
      .orderBy(col("rank"))
  }

  /** The scored-documents CTE chain `t, d, s, sc` ending in
    * `sc(id, dl, tf_*, n_matched, score)` — shared verbatim by the q95
    * oracle and the q100 retrieval stage so both gates agree on the
    * BM25 scores by construction (the simhashPairsCtes precedent). */
  private def bm25Ctes: String = {
    val tfDefs = QueryTerms.map { t =>
      s"(len(toks) - len(list_filter(toks, x -> x != '$t')))::BIGINT AS tf_$t"
    }.mkString(",\n  ")
    val dfDefs = QueryTerms.map { t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)::BIGINT AS df_$t"
    }.mkString(",\n  ")
    val scoreTerms = QueryTerms.map { t =>
      s"""ln(1.0 + (s.n_corpus - s.df_$t + 0.5) / (s.df_$t + 0.5))
         | * (tf_$t * ${K1 + 1.0}) / (tf_$t + $K1 * (${1.0 - B} + $B * (dl / (s.sum_dl::DOUBLE / s.n_corpus))))""".stripMargin
    }.mkString("\n + ")
    val matched = QueryTerms.map(t => s"CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END").mkString(" + ")
    s"""t AS (SELECT doc_id, ${TextQueries.tokSqlExpr} AS toks FROM documents),
       |d AS (SELECT doc_id AS id, len(toks)::BIGINT AS dl,
       |  $tfDefs
       |  FROM t WHERE len(toks) > 0),
       |s AS (SELECT count(*)::BIGINT AS n_corpus, sum(dl)::BIGINT AS sum_dl,
       |  $dfDefs
       |  FROM d),
       |sc AS (SELECT d.*, ($matched)::BIGINT AS n_matched,
       |  ($scoreTerms) AS score
       |  FROM d, s)""".stripMargin
  }

  val q95Bm25RankSql: String = {
    val tfCols = QueryTerms.map(t => s"tf_$t").mkString(", ")
    s"""WITH $bm25Ctes
       |SELECT row_number() OVER (ORDER BY score DESC, id) AS rank,
       |  id AS doc_id, dl, $tfCols, n_matched
       |FROM sc ORDER BY score DESC, id LIMIT $TopN""".stripMargin
  }

  private val RetrieveK = 100
  private val RerankK = 10
  private val Dim = 64

  /** q100: retrieve-then-rerank — the two-stage retrieval pipeline every
    * production search/mining stack runs: a cheap lexical stage (BM25,
    * q95's scorer) cuts the corpus to `RetrieveK` candidates, then an
    * expensive semantic stage (embedding cosine against the top lexical
    * hit's vector) reorders only those candidates to `RerankK`.
    *
    * Scale: stage 1 is q95's zero-shuffle scan + TakeOrdered; stage 2
    * touches `RetrieveK` rows — its embedding join probes by id and the
    * 1-row query vector broadcasts, so rerank cost is independent of
    * corpus size (the whole point of the funnel: the expensive model
    * only ever sees a constant-size candidate set). The candidate frame
    * is referenced twice (query-vector row + rerank probe) →
    * materialized once. Gate: rank-only output with the integer
    * `bm25_rank` as cross-stage evidence — same `ln`/ulp discipline as
    * q95, extended to the cosine doubles. */
  /** The two-stage funnel over arbitrary frames: `docs(idCol, textCol)`
    * scored lexically, top `k1` rerank by cosine in `emb(id, embedding)`
    * space against the lexical top-1's vector. Candidates missing an
    * embedding drop at the rerank join (inner) — at 100 TB the embedding
    * store is the corpus's own derived table, so absence means the doc
    * was never embedded and cannot be semantically ranked. Returns
    * (rank, doc_id, bm25_rank, cos). */
  def retrieveRerank(docs: DataFrame, emb: DataFrame, idCol: String,
                     textCol: String, terms: Seq[String],
                     k1: Int, k2: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k1 >= 1 && k2 >= 1, s"k1=$k1 k2=$k2")
    val scored = bm25(docs, idCol, textCol, terms)
    val cand = scored.orderBy(col("score").desc, col("id").asc).limit(k1)
      .withColumn("bm25_rank",
        row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
      .select(col("id"), col("bm25_rank"))
      .localCheckpoint(true) // query-vector row + rerank probe both read it
    val qv = cand.filter(col("bm25_rank") === 1).join(emb, "id")
      .select(col("embedding").as("qe"))
    val rr = cand.join(emb, "id").crossJoin(broadcast(qv))
      .withColumn("cos",
        graft.functions.VectorFunctions.cosine(col("embedding"), col("qe")))
    rr.orderBy(col("cos").desc, col("id").asc).limit(k2)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cos").desc, col("id").asc)))
      .select(col("rank"), col("id").as("doc_id"), col("bm25_rank"), col("cos"))
      .orderBy(col("rank"))
  }

  def q100RetrieveRerank(spark: SparkSession, dir: String): DataFrame =
    retrieveRerank(Tables.documents(spark, dir),
      Tables.embeddings(spark, dir).select(col("vec_id").as("id"), col("embedding")),
      "doc_id", "text", QueryTerms, RetrieveK, RerankK)
      .drop("cos") // rank-only gate: see the q95 ln/ulp discipline

  val q100RetrieveRerankSql: String = {
    def dot(a: String, b: String): String =
      s"list_sum(list_apply(range(1, ${Dim + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"
    s"""WITH $bm25Ctes,
       |cand AS (SELECT id, bm25_rank FROM (
       |    SELECT id, row_number() OVER (ORDER BY score DESC, id) AS bm25_rank FROM sc)
       |  WHERE bm25_rank <= $RetrieveK),
       |qv AS (SELECT e.embedding AS qe FROM cand c
       |  JOIN embeddings e ON e.vec_id = c.id WHERE c.bm25_rank = 1),
       |rr AS (SELECT c.id, c.bm25_rank,
       |  ${dot("e.embedding", "q.qe")}
       |    / (sqrt(${dot("e.embedding", "e.embedding")}) * sqrt(${dot("q.qe", "q.qe")})) AS cos
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.id, qv q)
       |SELECT row_number() OVER (ORDER BY cos DESC, id) AS rank,
       |  id AS doc_id, bm25_rank
       |FROM rr ORDER BY cos DESC, id LIMIT $RerankK""".stripMargin
  }

  // q135 parameters: RRF constant (Cormack et al. 2009's k), per-list
  // depth, fused cut.
  private val RrfC = 60
  private val RrfDepth = 50
  private val RrfTopN = 20

  /** Reciprocal-rank fusion of two ranked candidate lists (Cormack,
    * Clarke & Büttcher, SIGIR 2009): rrf(d) = Σ_lists 1/(c + rank_l(d)),
    * absent-from-a-list contributing 0 — the standard HYBRID-retrieval
    * combiner (lexical ∪ semantic) that needs no score calibration
    * between the lists, only their ranks. Complements q100's sequential
    * funnel (retrieve THEN rerank): fusion keeps a doc that only ONE
    * retriever surfaces, which is the property hybrid search exists for.
    *
    * Determinism: inputs are integer ranks, rrf is two IEEE divisions
    * summed in fixed written order — bit-identical cross-engine; doc_id
    * de-ties (a lex/sem rank SWAP produces exactly equal scores, so the
    * tie path is exercised by construction, not luck). Gate emits fused
    * rank + the integer per-list ranks, never the double (q95's rule).
    *
    * Scale: both lists arrive as TakeOrdered results (≤ depth rows), so
    * the fusion is a full-outer join of two constant-size frames —
    * nothing corpus-sized reaches it. */
  def rrfFuse(lex: DataFrame, sem: DataFrame, c: Int, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val j = lex.join(sem, Seq("id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(c) + col("sem_rank")), lit(0.0)))
    j.orderBy(col("rrf").desc, col("id").asc).limit(topN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf").desc, col("id").asc)))
      .select(col("rank"), col("id").as("doc_id"),
        col("lex_rank"), col("sem_rank"))
      .orderBy(col("rank"))
  }

  /** q135: hybrid retrieval for [[QueryTerms]] — the BM25 top-[[RrfDepth]]
    * (lexical list) fused with the cosine top-[[RrfDepth]] against the
    * lexical champion's embedding (the pseudo-relevance-feedback query
    * vector, q100's convention), via [[rrfFuse]]. Both lists are
    * zero-shuffle TakeOrdered scans; the fusion touches 2·depth rows. */
  def q135HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding"))
    val scored = bm25(docs, "doc_id", "text", QueryTerms)
    val lex = scored.orderBy(col("score").desc, col("id").asc).limit(RrfDepth)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
      .select(col("id"), col("lex_rank"))
      .localCheckpoint(true) // champion row + fusion both read it
    val qv = lex.filter(col("lex_rank") === 1).join(emb, "id")
      .select(col("embedding").as("qe"))
    val sem = emb.crossJoin(broadcast(qv))
      .withColumn("cos",
        graft.functions.VectorFunctions.cosine(col("embedding"), col("qe")))
      .orderBy(col("cos").desc, col("id").asc).limit(RrfDepth)
      .withColumn("sem_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("id").asc)))
      .select(col("id"), col("sem_rank"))
    rrfFuse(lex, sem, RrfC, RrfTopN)
  }

  val q135HybridRrfSql: String = {
    def dot(a: String, b: String): String =
      s"list_sum(list_apply(range(1, ${Dim + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"
    s"""WITH $bm25Ctes,
       |lex AS (SELECT id, lex_rank FROM (
       |    SELECT id, row_number() OVER (ORDER BY score DESC, id) AS lex_rank FROM sc)
       |  WHERE lex_rank <= $RrfDepth),
       |qv AS (SELECT e.embedding AS qe FROM lex l
       |  JOIN embeddings e ON e.vec_id = l.id WHERE l.lex_rank = 1),
       |cosl AS (SELECT e.vec_id AS id,
       |  ${dot("e.embedding", "q.qe")}
       |    / (sqrt(${dot("e.embedding", "e.embedding")}) * sqrt(${dot("q.qe", "q.qe")})) AS cos
       |  FROM embeddings e, qv q),
       |sem AS (SELECT id, sem_rank FROM (
       |    SELECT id, row_number() OVER (ORDER BY cos DESC, id) AS sem_rank FROM cosl)
       |  WHERE sem_rank <= $RrfDepth),
       |fused AS (SELECT coalesce(l.id, s.id) AS id, l.lex_rank, s.sem_rank,
       |  coalesce(1.0 / ($RrfC + l.lex_rank), 0.0)
       |    + coalesce(1.0 / ($RrfC + s.sem_rank), 0.0) AS rrf
       |  FROM lex l FULL OUTER JOIN sem s ON s.id = l.id)
       |SELECT row_number() OVER (ORDER BY rrf DESC, id) AS rank,
       |  id AS doc_id, lex_rank, sem_rank
       |FROM fused ORDER BY rrf DESC, id LIMIT $RrfTopN""".stripMargin
  }

  // q118 parameters: fixed-point scale (micro-nats) + kept top-N.
  private val LmScale = 1000000L
  private val LmTopN = 50

  /** UNIGRAM-LM QUALITY SCORING — the CCNet/RedPajama "perplexity
    * filter" stage: score every document by its average token log-
    * probability under a unigram language model trained on the corpus
    * itself, and keep the most-fluent tail (low perplexity = high avg
    * log-prob). The LM is `p(t) = c_t / C` (corpus token counts), so
    *
    *   lp(d) = Σ_{t∈d} ln c_t − n_d·ln C,   score(d) = lp(d) / n_d.
    *
    * Determinism — the fixed-point trick: a raw `sum(ln c_t)` is a
    * multi-row DOUBLE aggregate whose value depends on summation order
    * (engine- and partitioning-dependent). Instead each ln is rounded
    * ONCE to integer micro-nats, `round(ln(c_t)·10⁶)::BIGINT`, and the
    * per-doc sum is an INTEGER aggregate — order-free, row-level exact
    * in both engines (ln is applied to the bounded set of distinct
    * corpus counts; a cross-engine ulp flip would need `ln(c)·10⁶`
    * within ~1e-10 of a rounding boundary). The ranking key is the one
    * allowed double: a single IEEE division `lp_micro / n`, identical
    * in both engines, with doc_id de-tie.
    *
    * Scale: unigram counts are one token-hash groupBy whose shuffle is
    * bounded by the TYPE vocabulary (q109's argument), then broadcast;
    * the scoring pass is explode → broadcast-probe → per-doc integer
    * aggregate — map-side partials collapse each doc inside its scan
    * partition, so the exchange carries |docs| rows, not |tokens|; the
    * top-N is TakeOrderedAndProject. Two corpus scans total (count
    * pass + score pass), no corpus-volume shuffle anywhere. */
  def lmUnigramScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perTok = docs
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
    val counts = perTok.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("c_total"))
    perTok
      .join(broadcast(counts), Seq("t"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("c")).as("sum_c"),
        sum(round(log(col("c").cast("double")) * LmScale, 0).cast("long"))
          .as("sum_ln_micro"))
      .crossJoin(broadcast(total))
      .withColumn("lp_micro",
        col("sum_ln_micro") - col("n_tokens") *
          round(log(col("c_total").cast("double")) * LmScale, 0).cast("long"))
      .withColumn("avg_lp", col("lp_micro").cast("double") / col("n_tokens"))
  }

  /** q118: top-[[LmTopN]] documents by unigram-LM average log-prob —
    * every gate column is an integer (rank + micro-nat evidence); the
    * double ranking key never leaves the plan. */
  def q118LmQuality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    lmUnigramScores(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("avg_lp").desc, col("id").asc).limit(LmTopN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("avg_lp").desc, col("id").asc)))
      .select(col("rank"), col("id").as("doc_id"),
        col("n_tokens"), col("sum_c"), col("lp_micro"))
      .orderBy(col("rank"))
  }

  // q126 parameters: feature-hash width, seed, target domain, kept top-N.
  private[operators] val DsirBuckets = 64
  private[operators] val DsirSeed = "dsir"
  private val DsirTarget = "src0"
  private val DsirTopN = 40

  private[operators] def lnMicro(c: Column): Column =
    round(log(c.cast("double")) * LmScale, 0).cast("long")

  /** DATA SELECTION VIA IMPORTANCE RESAMPLING (DSIR — Xie et al.,
    * NeurIPS 2023, public): rank a raw pool by how target-domain-like
    * each document is, using hashed n-gram importance weights. Both the
    * target and raw distributions are unigram models over `buckets`
    * hashed feature buckets (hashing IS the method's point — the feature
    * space stays fixed-size no matter the vocabulary), smoothed add-one;
    * a document's log importance weight is
    *
    *   w(d) = Σ_{t∈d} [ln p_tgt(b(t)) − ln p_raw(b(t))]
    *        = Σ_{t∈d} λ_{b(t)} + n_d·C
    *
    * with λ_b = ln(ct_b+1) − ln(cr_b+1) and C = ln(R+B) − ln(T+B).
    *
    * Determinism is q118's fixed-point discipline, one notch stricter:
    * EVERY ln here is applied to an integer (counts+1, totals+B) and
    * rounded once to micro-nats, so λ and C are exact BIGINTs, per-doc
    * sums are order-free integer aggregates, and the ranking key is the
    * single allowed IEEE division (avg micro-nats per token, doc_id
    * de-tie). The md5-bucket hash is [[TrainingData.hashBucket]] — the
    * oracle reproduces it byte-for-byte.
    *
    * Scale: the λ table is `buckets` rows REGARDLESS of corpus size —
    * that is DSIR's scaling argument, and this plan keeps it: pass 1
    * collapses tokens to bucket counts (map-side partials into a
    * `buckets`-row shuffle), the 1-row totals derive from that table,
    * both broadcast; pass 2 re-scans the corpus, probes the broadcast λ,
    * and folds per-doc integer partials map-side (the exchange carries
    * |docs| rows, not |tokens|); top-N is TakeOrderedAndProject. Two
    * corpus scans, zero corpus-volume shuffles — q118's shape with the
    * vocabulary dependence removed. */
  /** The DSIR model state: per-bucket (bk, ct, cr) token counts for the
    * target and raw distributions — ADDITIVE and `buckets` rows no
    * matter the corpus, which is what makes it the cheapest incremental
    * state in the library (see [[dsirIngest]]). One grouped pass over
    * the token stream with map-side partials. */
  def dsirBucketCounts(docs: DataFrame, textCol: String, isTarget: Column,
                       buckets: Int, seed: String): DataFrame = {
    require(buckets > 0, s"buckets=$buckets")
    docs
      .select(isTarget.as("is_t"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
      .withColumn("bk",
        TrainingData.hashBucket(col("t"), seed) % buckets.toLong)
      .groupBy(col("bk"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("is_t"), 1L).otherwise(0L)).as("cr"))
  }

  /** The scoring tail over a prepared count state: λ table + totals
    * from `counts`, broadcast probe over the pool's token stream,
    * per-doc integer fold. `counts` must be shaped (bk, ct, cr). */
  def dsirScoresFromCounts(docs: DataFrame, counts: DataFrame,
                           idCol: String, textCol: String, isTarget: Column,
                           buckets: Int, seed: String,
                           carryCols: Seq[String] = Seq.empty): DataFrame = {
    val keys = (idCol +: carryCols).map(col)
    // materialized once (`buckets` rows) — the totals row and the
    // probe both read it
    val lam = counts
      .select(col("bk"),
        (lnMicro(col("ct") + 1L) - lnMicro(col("cr") + 1L)).as("lam"),
        col("ct"), col("cr"))
      .localCheckpoint(true)
    val tot = lam.agg(
      (lnMicro(sum(col("cr")) + buckets.toLong) -
        lnMicro(sum(col("ct")) + buckets.toLong)).as("c_const"))
    docs.filter(!isTarget)
      .select(keys :+ explode(TextFunctions.tokens(col(textCol))).as("t"): _*)
      .withColumn("bk",
        TrainingData.hashBucket(col("t"), seed) % buckets.toLong)
      .join(broadcast(lam.select(col("bk"), col("lam"))), Seq("bk"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_tokens"), sum(col("lam")).as("sum_lam"))
      .crossJoin(broadcast(tot)) // 1-row constant onto the doc frame
      .withColumn("score_micro",
        col("sum_lam") + col("n_tokens") * col("c_const"))
      .withColumn("avg_score",
        col("score_micro").cast("double") / col("n_tokens"))
  }

  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int, seed: String,
                 carryCols: Seq[String] = Seq.empty): DataFrame =
    dsirScoresFromCounts(docs,
      dsirBucketCounts(docs, textCol, isTarget, buckets, seed),
      idCol, textCol, isTarget, buckets, seed, carryCols)

  /** INCREMENTAL DSIR — fold a batch's bucket counts into a persistent
    * `buckets`-row state (ledger-guarded additive fold, the q110 shape):
    * the model a nightly selection run consults is kept current without
    * ever re-scanning the corpus, and unlike the vocabulary state
    * (which grows with the type vocabulary) this state is FIXED-WIDTH —
    * `buckets` rows forever, the cheapest incremental state the library
    * maintains. Returns false iff `batchId` was already absorbed. */
  def dsirIngest(spark: SparkSession, path: String, batch: DataFrame,
                 batchId: String, textCol: String, isTarget: Column,
                 buckets: Int, seed: String): Boolean = {
    import graft.sinks.LedgeredState
    if (LedgeredState.absorbed(spark, path, batchId)) return false
    val bs = dsirBucketCounts(batch, textCol, isTarget, buckets, seed)
    val merged = LedgeredState.readPart(spark, path, "counts") match {
      case Some(st) => st.unionByName(bs)
        .groupBy(col("bk"))
        .agg(sum(col("ct")).as("ct"), sum(col("cr")).as("cr"))
      case None => bs
    }
    // counts + ledger in ONE atomic commit — no window where the fold
    // is applied but unrecorded (a replay would double-count)
    LedgeredState.commit(spark, path, batchId, Seq("counts" -> merged))
    true
  }

  /** The shared q126/q131 gate tail: top-[[DsirTopN]] by avg micro-nat
    * weight, integer-evidence row (the double ranking key never leaves
    * the plan, q118's gate rule). */
  private def dsirTop(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored
      .orderBy(col("avg_score").desc, col("doc_id").asc).limit(DsirTopN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("avg_score").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("lang"), col("source"),
        col("n_tokens"), col("score_micro"))
      .orderBy(col("rank"))
  }

  /** q126: DSIR selection over the documents fixture — the raw pool is
    * every non-`src0` document ranked by similarity to the `src0`
    * "curated domain". */
  def q126DsirSelect(spark: SparkSession, dir: String): DataFrame =
    dsirTop(dsirScores(Tables.documents(spark, dir), "doc_id", "text",
      col("source") === DsirTarget, DsirBuckets, DsirSeed,
      carryCols = Seq("lang", "source")))

  /** q131: the incremental DSIR state under the q110 day-split harness
    * plus a whole-batch replay (ledger no-op); selection FROM THE
    * SNAPSHOT must equal the whole-corpus batch answer — the oracle IS
    * q126's, verbatim. */
  def q131DsirIngest(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q131_")
    try {
      val path = s"$base/dsir_state"
      val docs = Tables.documents(spark, dir)
      val isT = col("source") === DsirTarget
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
      require(dsirIngest(spark, path, docs.filter(col("doc_id") <= cut),
        "day1", "text", isT, DsirBuckets, DsirSeed))
      require(dsirIngest(spark, path, docs.filter(col("doc_id") > cut),
        "day2", "text", isT, DsirBuckets, DsirSeed))
      require(!dsirIngest(spark, path, docs.filter(col("doc_id") > cut),
        "day2", "text", isT, DsirBuckets, DsirSeed),
        "replayed batch must be a ledger no-op")
      dsirTop(dsirScoresFromCounts(docs, graft.sinks.LedgeredState.readPart(spark, path, "counts").get,
          "doc_id", "text", isT, DsirBuckets, DsirSeed,
          carryCols = Seq("lang", "source")))
        .localCheckpoint(true) // materialize before the state dir dies
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** The whole point of the incremental path: its oracle IS q126's. */
  def q131DsirIngestSql: String = q126DsirSelectSql

  val q126DsirSelectSql: String =
    s"""WITH t AS (SELECT doc_id, lang, source, unnest(${TextQueries.tokSqlExpr}) AS tk FROM documents),
       |b AS (SELECT doc_id, lang, source, source = '$DsirTarget' AS is_t,
       |    ('0x' || substring(md5('$DsirSeed:' || tk), 1, 8))::BIGINT % $DsirBuckets AS bk FROM t),
       |cnt AS (SELECT bk,
       |    sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS ct,
       |    sum(CASE WHEN is_t THEN 0 ELSE 1 END)::BIGINT AS cr
       |  FROM b GROUP BY bk),
       |lam AS (SELECT bk,
       |    (round(ln(ct + 1) * $LmScale)::BIGINT - round(ln(cr + 1) * $LmScale)::BIGINT) AS lam
       |  FROM cnt),
       |tot AS (SELECT (round(ln(sum(cr) + $DsirBuckets) * $LmScale)::BIGINT
       |              - round(ln(sum(ct) + $DsirBuckets) * $LmScale)::BIGINT) AS c_const FROM cnt),
       |d AS (SELECT doc_id, lang, source, count(*)::BIGINT AS n_tokens,
       |    sum(lam.lam)::BIGINT AS sum_lam
       |  FROM b JOIN lam USING (bk) WHERE NOT is_t GROUP BY 1, 2, 3),
       |sc AS (SELECT d.*, (sum_lam + n_tokens * tot.c_const)::BIGINT AS score_micro FROM d, tot)
       |SELECT row_number() OVER (ORDER BY score_micro::DOUBLE / n_tokens DESC, doc_id) AS rank,
       |  doc_id, lang, source, n_tokens, score_micro
       |FROM sc ORDER BY score_micro::DOUBLE / n_tokens DESC, doc_id LIMIT $DsirTopN""".stripMargin

  val q118LmQualitySql: String =
    s"""WITH t AS (SELECT doc_id, unnest(${TextQueries.tokSqlExpr}) AS tk FROM documents),
       |c AS (SELECT tk, count(*)::BIGINT AS c FROM t GROUP BY 1),
       |tot AS (SELECT sum(c)::BIGINT AS c_total FROM c),
       |d AS (SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(c)::BIGINT AS sum_c,
       |    sum(round(ln(c) * $LmScale)::BIGINT)::BIGINT AS sum_ln_micro
       |  FROM t JOIN c USING (tk) GROUP BY doc_id),
       |sc AS (SELECT d.*,
       |    (sum_ln_micro - n_tokens * round(ln(c_total) * $LmScale)::BIGINT)::BIGINT AS lp_micro
       |  FROM d, tot)
       |SELECT row_number() OVER (ORDER BY lp_micro::DOUBLE / n_tokens DESC, doc_id) AS rank,
       |  doc_id, n_tokens, sum_c, lp_micro
       |FROM sc ORDER BY lp_micro::DOUBLE / n_tokens DESC, doc_id LIMIT $LmTopN""".stripMargin
}

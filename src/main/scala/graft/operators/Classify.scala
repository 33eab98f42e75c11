package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** IN-ENGINE TEXT CLASSIFICATION + COLLOCATION STATISTICS — the two
  * supervised/lexical-statistics stages a curation pipeline runs that
  * the library did not yet own end to end:
  *
  *  - a multinomial NAIVE BAYES text classifier trained and applied
  *    inside the engine (the CCNet / fastText-style "model-based
  *    filter" loop: label a split, count, smooth, argmax) — q90 scores
  *    documents with an EXTERNALLY-trained linear head over embeddings;
  *    this operator closes the loop where the model itself is fit on
  *    the corpus with nothing but counts;
  *  - PMI COLLOCATION extraction (Church & Hanks 1990), the lexical
  *    statistic vocabulary/tokenizer work reads off a corpus before
  *    deciding what deserves a merged token.
  *
  * Both are exact-integer analytics end to end: every logarithm is
  * applied ONCE to an integer count and rounded to micro-nats
  * ([[Ranking.lnMicro]] — q118's fixed-point discipline), so per-doc
  * and per-pair scores are order-free BIGINT aggregates the DuckDB
  * oracle reproduces bit for bit; the only doubles are single IEEE
  * divisions/comparisons identical in both engines.
  */
object Classify {

  // q173 parameters: hashed-feature width, hash seed, test-split modulus.
  val NbBuckets = 256
  val NbSeed = "nb"
  private val NbTestMod = 5L

  // q174 parameters: minimum pair support and kept top-N.
  private val PmiMinCount = 5L
  private val PmiTopN = 40

  import Ranking.lnMicro

  /** The trained NB model: one row per (label, feature-bucket) carrying
    * the raw count and its micro-nat log `ln(c+1)`, plus a per-label
    * frame of (prior, likelihood-denominator) micro-nats.
    *
    * Features are seeded-md5 hashed token buckets
    * ([[TrainingData.hashBucket]] — DSIR's fixed-width argument: the
    * model is ≤ labels×buckets rows NO MATTER the vocabulary, so it
    * broadcasts at any corpus size, and the oracle reproduces the hash
    * byte for byte). Add-one smoothing on both the likelihood
    * (`(c_lb+1)/(n_l+B)`) and the prior (`(d_l+1)/(D+L)`).
    *
    * Scale: one token pass with map-side partials into a ≤ L·B-row
    * shuffle (the q126 bucket-counts shape) + one |docs|-row label
    * count. Training cost is ONE corpus scan regardless of label
    * cardinality. */
  def nbTrain(docs: DataFrame, labelCol: String, textCol: String,
              buckets: Int = NbBuckets, seed: String = NbSeed)
      : (DataFrame, DataFrame) = {
    val (lamCounts, docCounts) = nbCounts(docs, labelCol, textCol, buckets, seed)
    nbModelFromCounts(lamCounts, docCounts, buckets)
  }

  /** The NB model's RAW STATE: per-(label, bucket) token counts and
    * per-label doc counts. Both frames are ADDITIVE (counts of disjoint
    * batches sum to the whole-corpus counts), which is what makes the
    * model incrementally maintainable ([[nbIngest]]) — and like DSIR's
    * the token state is FIXED-WIDTH: ≤ labels×buckets rows forever. */
  def nbCounts(docs: DataFrame, labelCol: String, textCol: String,
               buckets: Int = NbBuckets, seed: String = NbSeed)
      : (DataFrame, DataFrame) = {
    require(buckets > 0, s"buckets=$buckets")
    val lamCounts = docs
      .select(col(labelCol).as("label"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
      .withColumn("bk",
        TrainingData.hashBucket(col("t"), seed) % buckets.toLong)
      .groupBy(col("label"), col("bk"))
      .agg(count(lit(1)).as("c"))
    val docCounts = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("d_l"))
    (lamCounts, docCounts)
  }

  /** Derive the scoring model (classes, λ) from raw counts — the
    * model-state/derivation split q131 uses: the persisted state is the
    * counts; priors, denominators, and log tables are recomputed on
    * demand (model-sized math, never a corpus scan). */
  def nbModelFromCounts(lamCounts: DataFrame, docCounts: DataFrame,
                        buckets: Int = NbBuckets): (DataFrame, DataFrame) = {
    val lam = lamCounts.withColumn("lnc1", lnMicro(col("c") + 1L))
    val totals = docCounts
      .agg(sum(col("d_l")).as("dd"), count(lit(1)).as("ll"))
    // a label whose train docs carry zero tokens still needs a denom —
    // coalesce its token total to 0 (smoothing keeps the ln argument > 0)
    val tokTotals = lam.groupBy(col("label")).agg(sum(col("c")).as("n_l"))
    val classes = docCounts
      .join(tokTotals, Seq("label"), "left")
      .crossJoin(broadcast(totals))
      .select(col("label"),
        (lnMicro(col("d_l") + 1L) - lnMicro(col("dd") + col("ll")))
          .as("prior_micro"),
        lnMicro(coalesce(col("n_l"), lit(0L)) + buckets.toLong)
          .as("denom_micro"))
    (classes, lam)
  }

  /** INCREMENTAL NB — fold a batch's counts into the persistent model
    * state (ledger-guarded additive fold, the q131/q110 shape): the
    * classifier a nightly filter run consults stays current without
    * re-scanning the corpus. Both parts (token counts + doc counts)
    * commit ATOMICALLY with the batch ledger — a token fold without its
    * prior fold would silently skew every score. Returns false iff
    * `batchId` was already absorbed. */
  def nbIngest(spark: SparkSession, path: String, batch: DataFrame,
               batchId: String, labelCol: String, textCol: String,
               buckets: Int = NbBuckets, seed: String = NbSeed): Boolean = {
    import graft.sinks.LedgeredState
    if (LedgeredState.absorbed(spark, path, batchId)) return false
    val (lc, dc) = nbCounts(batch, labelCol, textCol, buckets, seed)
    val mergedLam = LedgeredState.readPart(spark, path, "lam_counts") match {
      case Some(st) => st.unionByName(lc)
        .groupBy(col("label"), col("bk")).agg(sum(col("c")).as("c"))
      case None => lc
    }
    val mergedDoc = LedgeredState.readPart(spark, path, "doc_counts") match {
      case Some(st) => st.unionByName(dc)
        .groupBy(col("label")).agg(sum(col("d_l")).as("d_l"))
      case None => dc
    }
    LedgeredState.commit(spark, path, batchId,
      Seq("lam_counts" -> mergedLam, "doc_counts" -> mergedDoc))
    true
  }

  /** Score every document against every class and keep the argmax:
    *
    *   score(d, l) = prior_l + Σ_{t∈d} ln(c_{l,b(t)}+1) − n_d·ln(n_l+B)
    *
    * in integer micro-nats (unseen (l, b) pairs contribute ln(1) = 0,
    * so the λ probe is a left join + coalesce). Ties break on label
    * ascending — deterministic in both engines.
    *
    * Scale: the corpus-sized frames only ever carry (doc, bucket)
    * partial counts; both model frames broadcast (≤ L·B rows). The one
    * exchange is the (doc, label) integer aggregate — map-side partials
    * collapse each doc inside its scan partition, so it carries
    * |docs|·L rows, never |tokens|. Empty documents survive explode
    * via the doc-frame left join and score as the pure prior argmax —
    * which is also what the whole classifier degrades to when features
    * carry no signal (the fixture's labels are independent of its
    * synthetic text, so the gate pins exactly that degeneration along
    * with the full count/smooth/argmax arithmetic). */
  def nbScore(test: DataFrame, idCol: String, textCol: String,
              classes: DataFrame, lam: DataFrame,
              buckets: Int = NbBuckets, seed: String = NbSeed): DataFrame =
    nbScoresAll(test, idCol, textCol, classes, lam, buckets, seed)
      .withColumn("rn", row_number().over(nbRankWindow))
      .filter(col("rn") === 1)
      .drop("rn")

  /** The deterministic per-doc label order every consumer ranks by:
    * score descending, label ascending — identical in both engines. */
  private def nbRankWindow =
    Window.partitionBy(col("id"))
      .orderBy(col("score_micro").desc, col("label").asc)

  /** The FULL per-(doc, label) score matrix [[nbScore]] argmaxes over —
    * exposed because calibration ([[marginReliability]]) needs the
    * runner-up too, not just the winner. */
  def nbScoresAll(test: DataFrame, idCol: String, textCol: String,
                  classes: DataFrame, lam: DataFrame,
                  buckets: Int = NbBuckets, seed: String = NbSeed): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val perDoc = test.select(col(idCol).as("id"), col(textCol),
      size(toks).as("n_tokens"))
    val docBuckets = test
      .select(col(idCol).as("id"), explode(toks).as("t"))
      .withColumn("bk",
        TrainingData.hashBucket(col("t"), seed) % buckets.toLong)
      .groupBy(col("id"), col("bk"))
      .agg(count(lit(1)).as("cnt"))
    val sums = docBuckets
      .crossJoin(broadcast(classes.select(col("label"))))
      .join(broadcast(lam.select(col("label"), col("bk"), col("lnc1"))),
        Seq("label", "bk"), "left")
      .groupBy(col("id"), col("label"))
      .agg(sum(col("cnt") * coalesce(col("lnc1"), lit(0L))).as("sum_lnc"))
    perDoc
      .crossJoin(broadcast(classes))
      .join(sums, Seq("id", "label"), "left")
      .select(col("id"), col("label"), col("n_tokens"),
        (col("prior_micro") - col("n_tokens") * col("denom_micro") +
          coalesce(col("sum_lnc"), lit(0L))).as("score_micro"))
  }

  /** q173: the NB loop end to end — train on `doc_id % 5 != 0` with
    * `lang` as the label, score the held-out fifth, emit every
    * prediction (doc, true label, argmax label, its micro-nat score,
    * token count) plus the confusion-matrix section the curator actually
    * reads. The oracle restates the entire train/score/argmax pipeline
    * in SQL over the same md5 buckets, so one miscounted bucket, a
    * smoothing slip, or an argmax tie broken differently fails the hash
    * row-level. */
  def q173NbClassifier(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val train = docs.filter(col("doc_id") % NbTestMod =!= 0L)
    val (classes, lam) = nbTrain(train, "lang", "text")
    nbGateTail(docs.filter(col("doc_id") % NbTestMod === 0L), classes, lam)
  }

  /** The shared q173/q175 gate tail: score the held-out fifth, emit the
    * per-doc predictions plus the confusion-matrix section. */
  private def nbGateTail(test: DataFrame, classes: DataFrame,
                         lam: DataFrame): DataFrame = {
    val scored = nbScore(test, "doc_id", "text", classes, lam)
      .join(test.select(col("doc_id").as("id"), col("lang").as("true_lang")),
        Seq("id"))
      .localCheckpoint(true) // feeds both sections below
    val pred = scored.select(lit("pred").as("sect"), col("id").as("doc_id"),
      col("true_lang"), col("label").as("pred_lang"),
      col("score_micro"), col("n_tokens"))
    val confusion = scored.groupBy(col("true_lang"), col("label"))
      .agg(count(lit(1)).as("n_tokens"))
      .select(lit("confusion").as("sect"),
        lit(null).cast("long").as("doc_id"), col("true_lang"),
        col("label").as("pred_lang"), lit(null).cast("long").as("score_micro"),
        col("n_tokens"))
    pred.unionByName(confusion)
      .orderBy(col("sect"), col("doc_id"), col("true_lang"), col("pred_lang"))
  }

  /** q175: the NB model INCREMENTAL — the train split arrives as two
    * day batches folded into the persistent count state ([[nbIngest]],
    * q131's day-split + whole-batch-replay harness: the replayed day
    * must no-op via the ledger), the model derives from the SNAPSHOT,
    * and scoring the same held-out fifth must equal training in one
    * shot — the oracle IS q173's, verbatim (count additivity is the
    * whole claim, so the gate states it as batch ≡ incremental). */
  def q175NbIngest(spark: SparkSession, dir: String): DataFrame = {
    import graft.sinks.LedgeredState
    val base = java.nio.file.Files.createTempDirectory("graft_q175_")
    try {
      val path = s"$base/nb_state"
      val docs = Tables.documents(spark, dir)
      val train = docs.filter(col("doc_id") % NbTestMod =!= 0L)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
      require(nbIngest(spark, path, train.filter(col("doc_id") <= cut),
        "day1", "lang", "text"))
      require(nbIngest(spark, path, train.filter(col("doc_id") > cut),
        "day2", "lang", "text"))
      require(!nbIngest(spark, path, train.filter(col("doc_id") > cut),
        "day2", "lang", "text"), "replayed batch must be a ledger no-op")
      val (classes, lam) = nbModelFromCounts(
        LedgeredState.readPart(spark, path, "lam_counts").get,
        LedgeredState.readPart(spark, path, "doc_counts").get)
      nbGateTail(docs.filter(col("doc_id") % NbTestMod === 0L), classes, lam)
        .localCheckpoint(true) // materialize before the state dir dies
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** The whole point of the incremental path: its oracle IS q173's. */
  def q175NbIngestSql: String = q173NbClassifierSql

  /** The shared q173/q175/q184 oracle prefix — train counts, smoothing,
    * the per-(doc, label) score matrix `sc` — kept ONE string so the
    * calibration oracle scores with exactly the classifier the
    * prediction oracle gates (a drifted copy would gate two different
    * models and prove nothing). */
  private def nbScoreCtesSql: String = {
    val tok = TextQueries.tokSqlExpr
    val bk = s"('0x' || substring(md5('$NbSeed:' || tk), 1, 8))::BIGINT % $NbBuckets"
    s"""tr AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % $NbTestMod != 0),
       |te AS (SELECT doc_id, lang, text, len($tok)::BIGINT AS n FROM documents
       |       WHERE doc_id % $NbTestMod = 0),
       |lam AS (SELECT lang AS label, $bk AS bkt, count(*)::BIGINT AS c,
       |    round(ln(count(*) + 1) * 1000000)::BIGINT AS lnc1
       |  FROM (SELECT lang, unnest($tok) AS tk FROM tr) GROUP BY 1, 2),
       |dc AS (SELECT lang AS label, count(*)::BIGINT AS d_l FROM tr GROUP BY 1),
       |tots AS (SELECT sum(d_l)::BIGINT AS dd, count(*)::BIGINT AS ll FROM dc),
       |nl AS (SELECT label, sum(c)::BIGINT AS n_l FROM lam GROUP BY 1),
       |cl AS (SELECT dc.label,
       |    (round(ln(d_l + 1) * 1000000)::BIGINT
       |     - round(ln(dd + ll) * 1000000)::BIGINT) AS prior,
       |    round(ln(coalesce(n_l, 0) + $NbBuckets) * 1000000)::BIGINT AS denom
       |  FROM dc CROSS JOIN tots LEFT JOIN nl ON nl.label = dc.label),
       |db AS (SELECT doc_id, $bk AS bkt, count(*)::BIGINT AS cnt
       |  FROM (SELECT doc_id, unnest($tok) AS tk FROM te) GROUP BY 1, 2),
       |sums AS (SELECT db.doc_id, cl.label,
       |    sum(db.cnt * coalesce(lam.lnc1, 0))::BIGINT AS s
       |  FROM db CROSS JOIN cl
       |  LEFT JOIN lam ON lam.label = cl.label AND lam.bkt = db.bkt
       |  GROUP BY 1, 2),
       |sc AS (SELECT te.doc_id, te.lang AS true_lang, cl.label, te.n,
       |    (cl.prior - te.n * cl.denom + coalesce(s.s, 0))::BIGINT AS score
       |  FROM te CROSS JOIN cl
       |  LEFT JOIN sums s ON s.doc_id = te.doc_id AND s.label = cl.label)""".stripMargin
  }

  val q173NbClassifierSql: String = {
    s"""WITH $nbScoreCtesSql,
       |pr AS (SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, label) AS rn FROM sc)
       |SELECT * FROM (
       |  SELECT 'pred' AS sect, doc_id, true_lang, label AS pred_lang,
       |    score AS score_micro, n AS n_tokens
       |  FROM pr WHERE rn = 1
       |  UNION ALL
       |  SELECT 'confusion', NULL::BIGINT, true_lang, label,
       |    NULL::BIGINT, count(*)::BIGINT
       |  FROM pr WHERE rn = 1 GROUP BY true_lang, label)
       |ORDER BY sect, doc_id, true_lang, pred_lang""".stripMargin
  }

  // q184 parameters: margin bin width (micro-nats) and the top bin every
  // larger margin clamps into.
  val MarginBinMicro = 2000000L
  val MarginMaxBin = 9L

  /** MARGIN RELIABILITY — the curve a curator reads before turning a
    * classifier into a FILTER: bin the held-out predictions by argmax
    * margin (winner's score minus runner-up's, integer micro-nats — the
    * exact-arithmetic confidence proxy; softmax probabilities would put
    * IEEE transcendentals on both engines' disagreement surface), and
    * for each bin report its accuracy plus the CUMULATIVE precision of
    * "keep only predictions with margin >= this bin" — i.e. the
    * precision/selectivity tradeoff of every candidate confidence
    * threshold at once. Choosing the operating threshold for a
    * model-based quality filter IS reading this table.
    *
    * Exactness: margins and bins are pure BIGINT algebra (`div` floor
    * division on non-negative margins ≡ DuckDB's `//`); the only
    * doubles are the final display ratios, each one IEEE division of
    * two exact integers. Single-class corpora degrade to margin 0
    * (runner-up coalesces to the winner), never null.
    *
    * Scale: per-(doc, label) scores are the q173 map-side-partial
    * aggregate; everything after the argmax window is ≤ |test docs|
    * rows, and the report is ≤ maxBin+1 rows. */
  def marginReliability(test: DataFrame, idCol: String, textCol: String,
                        labelCol: String, classes: DataFrame, lam: DataFrame,
                        binMicro: Long = MarginBinMicro,
                        maxBin: Long = MarginMaxBin,
                        buckets: Int = NbBuckets, seed: String = NbSeed): DataFrame = {
    require(binMicro > 0, s"binMicro=$binMicro")
    val w = nbRankWindow
    val top = nbScoresAll(test, idCol, textCol, classes, lam, buckets, seed)
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead(col("score_micro"), 1).over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("label").as("pred"),
        (col("score_micro") - coalesce(col("nxt"), col("score_micro")))
          .as("margin"))
      .join(test.select(col(idCol).as("id"), col(labelCol).as("truth")), Seq("id"))
    val binned = top
      .withColumn("bin", least(expr(s"margin div $binMicro"), lit(maxBin)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum((col("pred") === col("truth")).cast("long")).as("n_correct"))
    val wd = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .select(col("bin"), (col("bin") * binMicro).as("lo_micro"),
        col("n"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n"), 4).as("acc"),
        sum(col("n")).over(wd).as("cum_n"),
        sum(col("n_correct")).over(wd).as("cum_correct"),
        round(sum(col("n_correct")).over(wd).cast("double") /
          sum(col("n")).over(wd), 4).as("prec_at_margin"))
      .orderBy(col("bin"))
  }

  /** q184: the calibration gate — train q173's classifier on the same
    * 4/5 split, score the held-out fifth, and emit the margin
    * reliability curve. The oracle restates the whole pipeline from
    * [[nbScoreCtesSql]] (the IDENTICAL model CTEs q173 gates) through
    * the margin window, binning, and cumulative fold, so a margin
    * computed off the wrong runner-up, a bin boundary off by one, or a
    * cumulative window running the wrong direction all fail row-level. */
  def q184MarginCalibration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val train = docs.filter(col("doc_id") % NbTestMod =!= 0L)
    val (classes, lam) = nbTrain(train, "lang", "text")
    marginReliability(docs.filter(col("doc_id") % NbTestMod === 0L),
      "doc_id", "text", "lang", classes, lam)
  }

  val q184MarginCalibrationSql: String = {
    s"""WITH $nbScoreCtesSql,
       |pr AS (SELECT *,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn,
       |    lead(score) OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS nxt
       |  FROM sc),
       |m AS (SELECT doc_id, true_lang,
       |    label AS pred_lang,
       |    (score - coalesce(nxt, score))::BIGINT AS margin
       |  FROM pr WHERE rn = 1),
       |b AS (SELECT least(margin // $MarginBinMicro, $MarginMaxBin)::BIGINT AS bin,
       |    count(*)::BIGINT AS n,
       |    sum((pred_lang = true_lang)::int)::BIGINT AS n_correct
       |  FROM m GROUP BY 1)
       |SELECT bin, (bin * $MarginBinMicro)::BIGINT AS lo_micro, n, n_correct,
       |  round(n_correct::double / n, 4) AS acc,
       |  (sum(n) OVER wd)::BIGINT AS cum_n,
       |  (sum(n_correct) OVER wd)::BIGINT AS cum_correct,
       |  round((sum(n_correct) OVER wd)::double / (sum(n) OVER wd), 4) AS prec_at_margin
       |FROM b
       |WINDOW wd AS (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY bin""".stripMargin
  }

  /** q174: PMI COLLOCATIONS — the top adjacent-token pairs by pointwise
    * mutual information,
    *
    *   pmi(x,y) = ln p(x,y) − ln p(x) − ln p(y)
    *            = ln c_xy − ln M − ln c_x − ln c_y + 2·ln N
    *
    * with c_xy adjacent-bigram counts (support ≥ [[PmiMinCount]]), c_x
    * unigram counts, M/N the bigram/token totals — every ln applied to
    * one integer and micro-nat-rounded, so pmi is an exact BIGINT.
    *
    * Scale: bigram and unigram counts are type-bounded groupBys (Zipf's
    * argument — the shuffles carry distinct TYPES with map-side
    * partials, never corpus volume); the pair table joins its two
    * unigram legs on type-level frames (AQE broadcasts the small side);
    * top-N is TakeOrderedAndProject. Two corpus scans, zero
    * corpus-volume shuffles — q118's shape over pairs. */
  def q174PmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = TextFunctions.tokens(col("text"))
    val perTok = docs.select(explode(toks).as("t"))
    val uni = perTok.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val nTotal = uni.agg(sum(col("c")).as("n_total"))
    val pairs = docs
      .select(explode(arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))).as("p"))
      .select(col("p.0").as("t1"), col("p.1").as("t2"))
    val bi = pairs.groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c_xy"))
    val mTotal = bi.agg(sum(col("c_xy")).as("m_total"))
    bi.filter(col("c_xy") >= PmiMinCount)
      .join(uni.select(col("t").as("t1"), col("c").as("c_x")), Seq("t1"))
      .join(uni.select(col("t").as("t2"), col("c").as("c_y")), Seq("t2"))
      .crossJoin(broadcast(nTotal))
      .crossJoin(broadcast(mTotal))
      .select(col("t1"), col("t2"), col("c_xy"), col("c_x"), col("c_y"),
        (lnMicro(col("c_xy")) - lnMicro(col("m_total"))
          - lnMicro(col("c_x")) - lnMicro(col("c_y"))
          + lit(2L) * lnMicro(col("n_total"))).as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("t1").asc, col("t2").asc)
      .limit(PmiTopN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi_micro").desc, col("t1").asc, col("t2").asc)))
      .select(col("rank"), col("t1"), col("t2"), col("c_xy"),
        col("c_x"), col("c_y"), col("pmi_micro"))
      .orderBy(col("rank"))
  }

  val q174PmiCollocationsSql: String = {
    val tok = TextQueries.tokSqlExpr
    s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
       |p AS (SELECT toks[g.i] AS t1, toks[g.i + 1] AS t2
       |  FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) AS g(i)),
       |bi AS (SELECT t1, t2, count(*)::BIGINT AS c_xy FROM p GROUP BY 1, 2),
       |uni AS (SELECT tk, count(*)::BIGINT AS c
       |  FROM (SELECT unnest(toks) AS tk FROM t) GROUP BY 1),
       |tot AS (SELECT (SELECT sum(c) FROM uni)::BIGINT AS n_total,
       |               (SELECT sum(c_xy) FROM bi)::BIGINT AS m_total),
       |sc AS (SELECT bi.t1, bi.t2, bi.c_xy, ux.c AS c_x, uy.c AS c_y,
       |    (round(ln(bi.c_xy) * 1000000)::BIGINT
       |     - round(ln(tot.m_total) * 1000000)::BIGINT
       |     - round(ln(ux.c) * 1000000)::BIGINT
       |     - round(ln(uy.c) * 1000000)::BIGINT
       |     + 2 * round(ln(tot.n_total) * 1000000)::BIGINT) AS pmi_micro
       |  FROM bi
       |  JOIN uni ux ON ux.tk = bi.t1
       |  JOIN uni uy ON uy.tk = bi.t2
       |  CROSS JOIN tot
       |  WHERE bi.c_xy >= $PmiMinCount)
       |SELECT row_number() OVER (ORDER BY pmi_micro DESC, t1, t2) AS rank,
       |  t1, t2, c_xy, c_x, c_y, pmi_micro
       |FROM sc ORDER BY pmi_micro DESC, t1, t2 LIMIT $PmiTopN""".stripMargin
  }

  // q185 parameters: synchronous propagation rounds and the seed stride.
  val LpRounds = 3
  private val LpSeedMod = 3L

  /** SEMI-SUPERVISED LABEL PROPAGATION — spread a trusted label subset
    * through a similarity graph (here: near-dup pairs), the standard
    * move for extending expensive labels (human ratings, audited
    * quality verdicts, licensing decisions) to the near-duplicates that
    * obviously share them. Synchronous frontier rounds:
    *
    *   round k labels every still-unlabeled node adjacent to >= 1
    *   labeled node with the MAJORITY label of its labeled neighbors
    *   (ties: label ascending); labeled nodes are CLAMPED (never flip),
    *   so the fold is monotone and each node's (label, src_round) is
    *   deterministic regardless of execution order.
    *
    * Nodes never reached stay unlabeled (left-join null downstream).
    * The clamped/monotone variant is chosen over classic re-labeling LP
    * deliberately: it terminates in <= diameter rounds, its fixpoint is
    * order-free (a re-labeling vote can oscillate), and "seed labels
    * are ground truth" is precisely the curation contract.
    *
    * Scale: one edge-frame checkpoint, then per round ONE join of edges
    * against the (small, grows-by-frontier) labeled frame, an integer
    * vote aggregate keyed by node, and an anti-join — all shuffles carry
    * (node, label, count), never documents. Bounded `rounds` like the
    * pointer-jumping CC (each round is one localCheckpoint barrier). */
  def labelPropagation(seeds: DataFrame, idCol: String, labelCol: String,
                       pairs: DataFrame, rounds: Int,
                       checkpointDir: Option[String] = None,
                       checkpointInterval: Int = 5): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds=$rounds out of [1,16]")
    // checkpointDir: the cluster-safe reliable truncation opt-in
    // (IterCheckpoint, the connectedComponents contract) — default
    // unchanged (localCheckpoint per round)
    val ckpt = new IterCheckpoint(pairs.sparkSession, checkpointDir,
      checkpointInterval)
    try {
      val edges = ckpt.truncate(pairs
        .select(col("id1").as("src"), col("id2").as("dst"))
        .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst"))),
        0)
      var labeled = ckpt.truncate(seeds
        .select(col(idCol).as("id"), col(labelCol).as("label"),
          lit(0L).as("src_round")), 0)
      for (r <- 1 to rounds) {
        val votes = edges
          .join(labeled.select(col("id").as("src"), col("label")), "src")
          .join(labeled.select(col("id").as("dst")), Seq("dst"), "left_anti")
          .groupBy(col("dst"), col("label"))
          .agg(count(lit(1)).as("c"))
        val newly = votes
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("dst")).orderBy(col("c").desc, col("label").asc)))
          .filter(col("rn") === 1)
          .select(col("dst").as("id"), col("label"), lit(r.toLong).as("src_round"))
        // no natural per-round action here — truncateRoll materializes
        // the new frame before releasing its parent (no recompute cascade)
        labeled = ckpt.truncateRoll(labeled.unionByName(newly), r)
      }
      ckpt.finish(labeled)
    } finally ckpt.restore()
  }

  /** q185: the propagation gate — seed `lang` on every third document,
    * spread it [[LpRounds]] rounds over the q19-grade exact near-dup
    * graph (token Jaccard >= 0.8 inside a source block), and emit every
    * document with its propagated label and the round that labeled it
    * (0 = seed, null = never reached). The oracle unrolls the identical
    * rounds as CTEs over the brute-forced pair set, so a wrong majority,
    * a tie broken the other way, a node relabeled after clamping, or a
    * frontier off by one round all fail row-level. */
  def q185LabelProp(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 1, threshold = 0.8, blockCol = Some("source"))
    val seeds = docs.filter(col("doc_id") % LpSeedMod === 0L)
      .select(col("doc_id"), col("lang"))
    val out = labelPropagation(seeds, "doc_id", "lang", pairs, LpRounds)
    docs.select(col("doc_id"))
      .join(out.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .orderBy(col("doc_id"))
  }

  val q185LabelPropSql: String = {
    val tok = TextQueries.tokSqlExpr
    val roundCtes = (1 to LpRounds).map { k =>
      s"""v$k AS (SELECT e.dst AS id, l.label, count(*)::BIGINT AS c
         |  FROM e JOIN l${k - 1} l ON l.id = e.src
         |  WHERE e.dst NOT IN (SELECT id FROM l${k - 1}) GROUP BY 1, 2),
         |n$k AS (SELECT id, label, $k::BIGINT AS src_round FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
         |    FROM v$k) WHERE rn = 1),
         |l$k AS (SELECT * FROM l${k - 1} UNION ALL SELECT * FROM n$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (SELECT doc_id, source, list_distinct($tok) AS g FROM documents),
       |p AS (SELECT id1, id2 FROM (
       |    SELECT a.doc_id AS id1, b.doc_id AS id2,
       |      round(CASE WHEN len(list_distinct(list_concat(a.g, b.g))) = 0 THEN 0.0
       |            ELSE len(list_intersect(a.g, b.g))::double
       |                 / len(list_distinct(list_concat(a.g, b.g))) END, 4) AS j
       |    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
       |  WHERE j >= 0.8),
       |e AS (SELECT id1 AS src, id2 AS dst FROM p
       |      UNION ALL SELECT id2, id1 FROM p),
       |l0 AS (SELECT doc_id AS id, lang AS label, 0::BIGINT AS src_round
       |       FROM documents WHERE doc_id % $LpSeedMod = 0),
       |$roundCtes
       |SELECT d.doc_id, l.label, l.src_round
       |FROM documents d LEFT JOIN l$LpRounds l ON l.id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }
}

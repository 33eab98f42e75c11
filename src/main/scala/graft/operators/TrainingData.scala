package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Training-data pipeline operators the reference's ETL never needed but a
  * 100 TB corpus build does: reproducible mixture sampling and token-budget
  * sequence packing. Both are deterministic by construction — a re-run (or
  * a backfill over one shard) reproduces byte-identical decisions, which is
  * the property that makes them safe to run incrementally at scale.
  *
  * Scale design:
  *  - [[mixtureSample]] is a stateless map-side filter on a seeded hash of
  *    the document id: no shuffle, no global count, no coordination. The
  *    alternative — rank-based sampling (`ORDER BY random() LIMIT n`) —
  *    needs a global sort AND changes every row's fate when the corpus
  *    grows; hash-threshold sampling keeps prior members stable, so a
  *    nightly incremental run only decides the NEW rows.
  *  - [[packAssignments]] is concat-and-chunk packing (the standard
  *    pretraining batch construction): one cumulative sum per
  *    (stratum, shard) stream. The shard key bounds the window sort — at
  *    1000 executors you raise `shards` so each stream's token ledger fits
  *    one task, and packs never cross shards, so parallelism costs no
  *    packing quality beyond one partial tail pack per stream.
  */
object TrainingData {

  /** Deterministic uniform bucket in [0, 2^32) from a seeded md5 of the
    * id — the same 8-hex-digit prefix read as an unsigned int on both
    * engines, so sampling decisions are exact integer compares (no float
    * rounding surface). */
  def hashBucket(id: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** Production twin of [[hashBucket]]: the same uniform [0, 2^32) bucket
    * from a seeded xxhash64 — one codegen'd 64-bit hash per row instead of
    * a 128-bit md5 plus hex/conv round-trip (md5-per-row is the 100 TB
    * sampler's only avoidable cost; the md5 form stays as the
    * oracle-reproducible reference). `pmod` folds the signed 64-bit hash
    * into the same unsigned 32-bit bucket space, so [[rateThreshold]]
    * compares work unchanged. */
  def hashBucketXxh(id: Column, seed: String): Column =
    pmod(xxhash64(concat(lit(seed + ":"), id.cast("string"))), lit(4294967296L))

  /** The integer threshold a rate maps to: keep iff bucket < floor(rate·2³²). */
  def rateThreshold(rate: Double): Long = (rate * 4294967296.0).toLong

  /** Weighted mixture sampling: keep each row of stratum s with
    * probability rates(s), decided by the seeded id hash (`bucketFn`:
    * [[hashBucket]] = oracle-reproducible md5 form, [[hashBucketXxh]] =
    * production form — same decision semantics, different hash family).
    * Strata absent from `rates` are dropped (threshold -1). Adds `bucket`
    * so callers (and the oracle) can audit the decision. */
  def mixtureSample(docs: DataFrame, idCol: String, strataCol: String,
                    rates: Map[String, Double], seed: String,
                    bucketFn: (Column, String) => Column = hashBucket): DataFrame = {
    val thr = rates.foldLeft(lit(-1L)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(rateThreshold(r))).otherwise(acc)
    }
    docs.withColumn("bucket", bucketFn(col(idCol), seed))
      .filter(col("bucket") < thr)
  }

  /** Per-document pack assignment for concat-and-chunk sequence packing:
    * documents are laid head-to-tail in (partCol, shard, orderCol) order
    * and a document belongs to the pack its FIRST token lands in (it may
    * straddle into the next — that is the chunking semantic, not a bug).
    * Returns the input plus `shard`, `tokens`, `start_off`, `pack_id`.
    *
    * Determinism contract: `orderCol` MUST be unique within each
    * (partCol, shard) stream — the running sum orders by it alone, and a
    * duplicate key would make `start_off` engine/run-dependent for the
    * tied rows. Pass a document id, not a timestamp. `tokensCol` is cast
    * to long internally: the pack boundary is exact integer division
    * (`div`), never float `floor` — double division diverges from the
    * exact ledger once a stream's cumulative offset passes 2^53. */
  def packAssignments(docs: DataFrame, partCol: String, orderCol: String,
                      tokensCol: Column, budget: Int, shards: Int,
                      seed: String): DataFrame = {
    require(budget >= 1 && shards >= 1,
      s"packing needs budget >= 1 and shards >= 1, got budget=$budget shards=$shards")
    val w = Window.partitionBy(col(partCol), col("shard"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", hashBucket(col(orderCol), seed) % shards)
      .withColumn("tokens", tokensCol.cast("long"))
      .withColumn("start_off", sum(col("tokens")).over(w) - col("tokens"))
      .withColumn("pack_id", expr(s"start_off div $budget"))
  }

  /** Materialized pack CONTENTS — the exporter half of concat-and-chunk
    * packing. [[packAssignments]] decides which pack each document STARTS
    * in; a pretraining exporter also needs every (pack, document-span)
    * segment, including the straddle splits where a document crosses a
    * pack boundary. One row per segment:
    *
    *  - `pack_id`: every pack the document occupies (first through last);
    *  - `seg_start`/`seg_end`: the half-open token span WITHIN the
    *    document that lands in this pack (`[0, tokens)` overall — a
    *    document's segments tile its token range exactly);
    *  - `pack_off`: where the segment begins within the pack
    *    (`[0, budget)`), so interior packs tile `[0, budget)` exactly.
    *
    * Zero-token documents occupy no pack and emit no segment (they still
    * sit in the ledger upstream, contributing 0 to every offset).
    *
    * Scale: the explode is a narrow map over the assignment output — a
    * document spanning k packs emits k rows, and k ≤ tokens/budget + 1,
    * so output volume is bounded by total-tokens/budget + n_docs
    * regardless of document size distribution. No new shuffle beyond
    * [[packAssignments]]'s one window. */
  def packSegments(docs: DataFrame, partCol: String, orderCol: String,
                   tokensCol: Column, budget: Int, shards: Int,
                   seed: String): DataFrame =
    packAssignments(docs, partCol, orderCol, tokensCol, budget, shards, seed)
      .filter(col("tokens") > 0L)
      .withColumn("pack_id",
        explode(sequence(col("pack_id"),
          expr(s"(start_off + tokens - 1) div $budget"))))
      .withColumn("seg_start",
        greatest(col("pack_id") * budget, col("start_off")) - col("start_off"))
      .withColumn("seg_end",
        least((col("pack_id") + 1) * budget, col("start_off") + col("tokens"))
          - col("start_off"))
      .withColumn("pack_off",
        greatest(col("pack_id") * budget, col("start_off"))
          - col("pack_id") * budget)

  // ---- gated queries ------------------------------------------------------

  /** The q44 mixture: per-language sampling rates over the documents
    * fixture. Shared between the Spark plan and the generated oracle so
    * the driver hash-checks the exact thresholds. */
  val MixRates: Seq[(String, Double)] = Seq(
    "en" -> 0.9, "zh" -> 0.7, "de" -> 0.5, "fr" -> 0.3, "es" -> 0.15)
  val MixSeed = "mix"

  private val PackBudget = 1024
  private val PackShards = 4
  private val PackSeed = "shard"

  /** q44: deterministic weighted mixture sample of the documents table,
    * stratified by language. */
  def q44MixtureSample(spark: SparkSession, dir: String): DataFrame =
    mixtureSample(Tables.documents(spark, dir), "doc_id", "lang",
      MixRates.toMap, MixSeed)
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
      .orderBy(col("doc_id"))

  val q44MixtureSampleSql: String = {
    val cases = MixRates
      .map { case (s, r) => s"WHEN '$s' THEN ${rateThreshold(r)}" }
      .mkString(" ")
    s"""SELECT doc_id, lang, source, bucket FROM (
       |  SELECT doc_id, lang, source,
       |    ('0x' || substring(md5('$MixSeed:' || doc_id), 1, 8))::BIGINT AS bucket
       |  FROM documents)
       |WHERE bucket < CASE lang $cases ELSE -1 END
       |ORDER BY doc_id""".stripMargin
  }

  /** q50: the PRODUCTION mixture sampler ([[hashBucketXxh]]) under the
    * driver's gate, q20b-style — the md5 form is the oracle-reproducible
    * anchor, and the xxhash64 form is certified by properties DuckDB can
    * assert as literal TRUEs. One row per language:
    *
    *  - `n_total` / `n_md5`: stratum size and the md5-form kept count —
    *    exact anchors the oracle recomputes (n_md5 is q44's cardinality
    *    per stratum, tying the two gates together);
    *  - `xxh_in_band`: the xxh kept count sits within a 5σ binomial band
    *    of rate·n_total (xxhash64 is deterministic, so this is a fixed
    *    property of corpus + seed, not a flaky sample — the band certifies
    *    the hash family is unbiased for this sampling use);
    *  - `xxh_stable`: incremental-stability, the property that justifies
    *    hash-threshold sampling at 100 TB — re-running the sampler over an
    *    arbitrary sub-corpus (here: even doc_ids) selects EXACTLY the
    *    full-run members that fall in the sub-corpus. Rank-based sampling
    *    (ORDER BY random() LIMIT n) fails this: membership churns whenever
    *    the corpus grows, forcing full recomputes instead of
    *    incremental-only runs. Verified as an exact set compare
    *    (exceptAll both directions), not a count compare. */
  def q50MixtureXxh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rates = MixRates.toMap
    val rate = MixRates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(col("lang") === s, lit(r)).otherwise(acc)
    }
    val totals = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"))
    val md5Kept = mixtureSample(docs, "doc_id", "lang", rates, MixSeed)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_md5"))
    // the xxh member set is referenced three times (count + both exceptAll
    // directions): materialize the small (doc_id, lang) projection once
    val xxh = mixtureSample(docs, "doc_id", "lang", rates, MixSeed, hashBucketXxh _)
      .select(col("doc_id"), col("lang")).localCheckpoint(true)
    val xxhKept = xxh.groupBy(col("lang")).agg(count(lit(1)).as("n_xxh"))
    val sub = mixtureSample(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "lang", rates, MixSeed, hashBucketXxh _)
      .select(col("doc_id"), col("lang"))
    val full2 = xxh.filter(col("doc_id") % 2 === 0)
    val nDiff = full2.exceptAll(sub).union(sub.exceptAll(full2))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_diff"))
    totals
      .join(md5Kept, Seq("lang"), "left")
      .join(xxhKept, Seq("lang"), "left")
      .join(nDiff, Seq("lang"), "left")
      .select(col("lang"), col("n_total"),
        coalesce(col("n_md5"), lit(0L)).as("n_md5"),
        (abs(coalesce(col("n_xxh"), lit(0L)) - rate * col("n_total")) <=
          lit(5.0) * sqrt(rate * (lit(1.0) - rate) * col("n_total")) + lit(3.0))
          .as("xxh_in_band"),
        (coalesce(col("n_diff"), lit(0L)) === 0L).as("xxh_stable"))
      .orderBy(col("lang"))
  }

  val q50MixtureXxhSql: String = {
    val cases = MixRates
      .map { case (s, r) => s"WHEN '$s' THEN ${rateThreshold(r)}" }
      .mkString(" ")
    s"""SELECT lang, count(*)::BIGINT AS n_total,
       |  (count(*) FILTER (
       |    ('0x' || substring(md5('$MixSeed:' || doc_id), 1, 8))::BIGINT
       |      < CASE lang $cases ELSE -1 END))::BIGINT AS n_md5,
       |  TRUE AS xxh_in_band, TRUE AS xxh_stable
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** q45: token-budget sequence packing over (lang, shard) streams —
    * per-pack document counts and token ledgers. `pack_tokens` counts the
    * tokens of documents STARTING in the pack, so interior packs carry at
    * least `budget` minus the largest straddle; the last pack per stream
    * holds the remainder. */
  def q45SeqPack(spark: SparkSession, dir: String): DataFrame =
    packAssignments(Tables.documents(spark, dir), "lang", "doc_id",
      TextFunctions.tokenCount(col("text")).cast("long"),
      PackBudget, PackShards, PackSeed)
      .groupBy(col("lang"), col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("shard"), col("pack_id"))

  /** q49: the materialized pack contents for the q45 packing — one row
    * per (pack, document-segment), straddle splits included. Same
    * streams, budget, and ledger as q45, so the two gates cross-check:
    * q45's per-pack token totals equal the sum of q49's segment lengths
    * for documents STARTING in the pack. */
  def q49PackSegments(spark: SparkSession, dir: String): DataFrame =
    packSegments(Tables.documents(spark, dir), "lang", "doc_id",
      TextFunctions.tokenCount(col("text")), PackBudget, PackShards, PackSeed)
      .select(col("lang"), col("shard"), col("pack_id"), col("doc_id"),
        col("seg_start"), col("seg_end"), col("pack_off"))
      .orderBy(col("lang"), col("shard"), col("pack_id"), col("doc_id"))

  val q49PackSegmentsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substring(md5('$PackSeed:' || doc_id), 1, 8))::BIGINT % $PackShards AS shard,
       |    len(${TextQueries.tokSqlExpr})::BIGINT AS tokens
       |  FROM documents),
       |offs AS (
       |  SELECT *, (sum(tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens)::BIGINT AS start_off
       |  FROM toks),
       |segs AS (
       |  -- scalar generate_series + unnest: DuckDB's table-function form
       |  -- can't take lateral column parameters
       |  SELECT *, unnest(generate_series(start_off // $PackBudget,
       |    (start_off + tokens - 1) // $PackBudget))::BIGINT AS pack_id
       |  FROM offs WHERE tokens > 0)
       |SELECT lang, shard, pack_id, doc_id,
       |  (greatest(pack_id * $PackBudget, start_off) - start_off)::BIGINT AS seg_start,
       |  (least((pack_id + 1) * $PackBudget, start_off + tokens) - start_off)::BIGINT AS seg_end,
       |  (greatest(pack_id * $PackBudget, start_off) - pack_id * $PackBudget)::BIGINT AS pack_off
       |FROM segs ORDER BY lang, shard, pack_id, doc_id""".stripMargin

  private val QualityMin = 0.55
  private val MinTokens = 20

  /** q54: the end-to-end CURATION FUNNEL — the composed pipeline a
    * pretraining corpus build actually runs, as ONE lazy Spark plan:
    *
    *   documents → quality filter (q16's score, thresholded on the
    *   4-dp-rounded value both engines agree on exactly) → exact-dedup
    *   survivors (min doc_id per content hash, q15's rule) → seeded
    *   mixture sample (q44's decisions) → sequence packing (q45's
    *   ledger) → per-language funnel counts.
    *
    * Each stage is individually gated elsewhere; this entry gates their
    * COMPOSITION — stage ordering, column flow, and the funnel counts a
    * curation run reports. One row per language: `n_docs` → `n_quality`
    * → `n_unique` → `n_sampled`, plus `n_packs`/`pack_tokens` from the
    * packing ledger over the sampled set.
    *
    * Scale: the funnel is filters + one dedup shuffle + a map-side
    * sample + the bounded per-stream pack windows — no stage widens.
    * The quality projection is localCheckpointed once (five downstream
    * references — survivor agg, semi join, three funnel counts — would
    * otherwise re-run the tokenizer five times); at 100 TB that
    * checkpoint is the stage boundary you'd materialize to parquet. */
  def q54CurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, dir)
    val scored = docs.select(col("doc_id"), col("lang"), col("text"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        alphaRatio(col("text")).as("alpha_raw"),
        punctRatio(col("text")).as("punct_raw"),
        stopwordRatio(col("text")).as("stop_raw"))
      .withColumn("quality", round(
        lit(0.25) * col("alpha_raw") +
        lit(0.25) * col("stop_raw") +
        lit(0.25) * least(lit(1.0), col("n_tokens").cast("double") / 100.0) +
        lit(0.25) * (lit(1.0) - col("punct_raw")), 4))
    val keep = scored
      .filter(col("quality") >= QualityMin && col("n_tokens") >= MinTokens)
      .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"))
      .localCheckpoint(true)
    val surv = keep.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val uniq = keep.join(surv.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("n_tokens"))
    val samp = mixtureSample(uniq, "doc_id", "lang", MixRates.toMap, MixSeed)
    val packed = packAssignments(samp, "lang", "doc_id", col("n_tokens"),
      PackBudget, PackShards, PackSeed)
    val f0 = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val f1 = keep.groupBy(col("lang")).agg(count(lit(1)).as("n_quality"))
    val f2 = uniq.groupBy(col("lang")).agg(count(lit(1)).as("n_unique"))
    val f3 = samp.groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
    val f4 = packed.groupBy(col("lang")).agg(
      countDistinct(col("shard"), col("pack_id")).as("n_packs"),
      sum(col("tokens")).as("pack_tokens"))
    f0.join(f1, Seq("lang"), "left").join(f2, Seq("lang"), "left")
      .join(f3, Seq("lang"), "left").join(f4, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("n_packs"), lit(0L)).as("n_packs"),
        coalesce(col("pack_tokens"), lit(0L)).as("pack_tokens"))
      .orderBy(col("lang"))
  }

  val q54CurationFunnelSql: String = {
    val stops = graft.functions.TextFunctions.stopwords
      .map(s => s"'$s'").mkString(", ")
    val cases = MixRates
      .map { case (s, r) => s"WHEN '$s' THEN ${rateThreshold(r)}" }
      .mkString(" ")
    s"""WITH t AS (SELECT doc_id, lang, text, ${TextQueries.tokSqlExpr} AS toks FROM documents),
       |r AS (SELECT doc_id, lang, text, len(toks)::bigint AS n_tokens,
       |  CASE WHEN len(text) = 0 THEN 0.0 ELSE len(regexp_replace(lower(text), '[^a-z]', '', 'g'))::double / len(text) END AS alpha_raw,
       |  CASE WHEN len(text) = 0 THEN 0.0 ELSE len(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::double / len(text) END AS punct_raw,
       |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE len(list_filter(toks, x -> x IN ($stops)))::double / len(toks) END AS stop_raw
       |FROM t),
       |q AS (SELECT *, round(0.25 * alpha_raw + 0.25 * stop_raw
       |        + 0.25 * least(1.0, n_tokens::double / 100.0)
       |        + 0.25 * (1.0 - punct_raw), 4) AS quality FROM r),
       |keep AS (SELECT * FROM q WHERE quality >= $QualityMin AND n_tokens >= $MinTokens),
       |surv AS (SELECT min(doc_id) AS doc_id FROM keep GROUP BY md5(text)),
       |uniq AS (SELECT k.doc_id, k.lang, k.n_tokens FROM keep k
       |         WHERE k.doc_id IN (SELECT doc_id FROM surv)),
       |samp AS (SELECT * FROM uniq
       |         WHERE ('0x' || substring(md5('$MixSeed:' || doc_id), 1, 8))::BIGINT
       |               < CASE lang $cases ELSE -1 END),
       |sh AS (SELECT *, ('0x' || substring(md5('$PackSeed:' || doc_id), 1, 8))::BIGINT % $PackShards AS shard FROM samp),
       |offs AS (SELECT *, (sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)::BIGINT AS start_off
       |  FROM sh),
       |packed AS (SELECT *, (start_off // $PackBudget)::BIGINT AS pack_id FROM offs),
       |f0 AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
       |f1 AS (SELECT lang, count(*)::BIGINT AS n_quality FROM keep GROUP BY 1),
       |f2 AS (SELECT lang, count(*)::BIGINT AS n_unique FROM uniq GROUP BY 1),
       |f3 AS (SELECT lang, count(*)::BIGINT AS n_sampled FROM samp GROUP BY 1),
       |f4 AS (SELECT lang, count(DISTINCT (shard, pack_id))::BIGINT AS n_packs,
       |         sum(n_tokens)::BIGINT AS pack_tokens FROM packed GROUP BY 1)
       |SELECT f0.lang, n_docs,
       |  coalesce(n_quality, 0) AS n_quality,
       |  coalesce(n_unique, 0) AS n_unique,
       |  coalesce(n_sampled, 0) AS n_sampled,
       |  coalesce(n_packs, 0) AS n_packs,
       |  coalesce(pack_tokens, 0) AS pack_tokens
       |FROM f0 LEFT JOIN f1 USING (lang) LEFT JOIN f2 USING (lang)
       |  LEFT JOIN f3 USING (lang) LEFT JOIN f4 USING (lang)
       |ORDER BY lang""".stripMargin
  }

  val q45SeqPackSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substring(md5('$PackSeed:' || doc_id), 1, 8))::BIGINT % $PackShards AS shard,
       |    len(${TextQueries.tokSqlExpr})::BIGINT AS tokens
       |  FROM documents),
       |offs AS (
       |  SELECT *, sum(tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens AS start_off
       |  FROM toks)
       |SELECT lang, shard, (start_off // $PackBudget)::BIGINT AS pack_id,
       |  count(*) AS n_docs, sum(tokens)::BIGINT AS pack_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM offs GROUP BY 1, 2, 3 ORDER BY lang, shard, pack_id""".stripMargin
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Distributed BPE merge learning (Sennrich et al. 2016) — the tokenizer-
  * TRAINING half of the vocabulary family (q109 induces a WORD vocabulary;
  * this learns subword merges). Classic BPE over word types:
  *
  *  1. collapse the corpus to its word-type frame `(word, freq)` — the
  *     one corpus-volume pass; everything after runs on the TYPE frame,
  *     which is vocabulary-bounded (q109's argument), not corpus-bounded;
  *  2. represent each word as space-separated symbols, initially its
  *     characters plus a terminal `</w>` marker;
  *  3. per round: count adjacent symbol pairs weighted by word freq
  *     (one vocab-bounded groupBy), pick the most frequent pair
  *     (count-DESC, pair-ASC tie-break — a total order, so both engines
  *     agree), and merge every left-to-right non-overlapping occurrence
  *     in every type.
  *
  * The merge step is pure string algebra, identical in both engines: with
  * every separator doubled and the ends double-padded, each symbol is
  * flanked by two spaces, so the single-space-consuming pattern
  * `' a  b '` matches exactly the left-to-right non-overlapping
  * occurrences (consecutive `a b a b` keeps one free space between
  * matches — `replace`'s scan-after-replacement semantics IS greedy BPE),
  * then collapsing runs of spaces restores canonical form.
  *
  * Driver state: each round's chosen pair is ONE row, collected to drive
  * the next round's literal replace — the IVF-centroid precedent (a
  * plan-building decision, not data moved through the driver). The type
  * frame localCheckpoints per round so round N's three jobs (count, pick,
  * merge) never replay rounds 1..N−1.
  *
  * Scale: the corpus is touched ONCE (type collapse with map-side
  * partial agg); each of the K rounds shuffles ≤ |distinct pairs| ≤
  * |type frame| rows — at 100 TB the type frame is millions of rows
  * against trillions of tokens, so tokenizer training is O(K) tiny jobs
  * after one scan, exactly how production BPE trainers batch it. */
object Bpe {

  private val BpeRounds = 8

  /** One merge round over `types(word, freq, seq)`: returns the chosen
    * (lhs, rhs, cnt) and the updated frame. */
  private def mergeRound(types: DataFrame): ((String, String, Long), DataFrame) = {
    val pairs = types
      .select(col("freq"), split(col("seq"), " ").as("s"))
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("s")) - 1),
        i => concat_ws(" ", element_at(col("s"), i), element_at(col("s"), i + 1))))
        .as("pr"))
      .groupBy(col("pr")).agg(sum(col("freq")).as("cnt"))
    val top = pairs.orderBy(col("cnt").desc, col("pr").asc).limit(1).collect()
    require(top.nonEmpty, "BPE: no adjacent pairs left to merge")
    val Array(lhs, rhs) = top(0).getAs[String]("pr").split(' ')
    val cnt = top(0).getAs[Long]("cnt")
    val merged = types.withColumn("seq", expr(
      s"""trim(regexp_replace(replace(concat('  ', replace(seq, ' ', '  '), '  '),
         | ' $lhs  $rhs ', ' $lhs$rhs '), ' +', ' '))""".stripMargin.replace("\n", "")))
    ((lhs, rhs, cnt), merged)
  }

  /** Learn `rounds` merges from `docs(textCol)`. Returns the merge table
    * (step, lhs, rhs, merged, cnt) — the artifact a BPE tokenizer
    * ships — AND the final type frame (word, freq, seq): every word
    * type's segmentation under the learned merges, which IS the apply
    * artifact (production BPE tokenizers cache exactly this word →
    * segmentation table; unseen words fall back to the merge walk). */
  /** `checkpointDir`/`checkpointInterval`: the cluster-safe reliable
    * truncation opt-in ([[graft.operators.IterCheckpoint]], the
    * [[Dedup.connectedComponents]] contract) — the type frame lands on
    * reliable storage every interval-th merge step, so an executor loss
    * replays at most `checkpointInterval` merge rounds. Default
    * unchanged (localCheckpoint per round). */
  def learnMergesAndTypes(docs: DataFrame, textCol: String,
                          rounds: Int,
                          checkpointDir: Option[String] = None,
                          checkpointInterval: Int = 5): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val ckpt = new IterCheckpoint(spark, checkpointDir, checkpointInterval)
    try {
      val types = ckpt.truncate(docs
        .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .withColumn("seq",
          concat(regexp_replace(col("word"), "(.)", "$1 "), lit("</w>"))), 0)
      val merges = Seq.newBuilder[(Int, String, String, String, Long)]
      var cur = types
      for (step <- 1 to rounds) {
        // mergeRound's top-pair collect is the action that materializes
        // `cur` — roll right after it (zero recompute), BEFORE the next
        // truncation, so the parent is never released while still needed
        val ((lhs, rhs, cnt), next) = mergeRound(cur)
        ckpt.roll(cur)
        merges += ((step, lhs, rhs, lhs + rhs, cnt))
        cur = ckpt.truncate(next, step)
      }
      import spark.implicits._
      (merges.result().toDF("step", "lhs", "rhs", "merged", "cnt"),
        ckpt.finish(cur))
    } finally ckpt.restore()
  }

  /** The merge table alone (see [[learnMergesAndTypes]]). */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int,
                  checkpointDir: Option[String] = None,
                  checkpointInterval: Int = 5): DataFrame =
    learnMergesAndTypes(docs, textCol, rounds, checkpointDir,
      checkpointInterval)._1

  def q120BpeMerges(spark: SparkSession, dir: String): DataFrame =
    learnMerges(Tables.documents(spark, dir), "text", BpeRounds)
      .select(col("step").cast("long").as("step"), col("lhs"), col("rhs"),
        col("merged"), col("cnt"))
      .orderBy(col("step"))

  /** q123: BPE APPLY — tokenize the corpus with the learned merges, the
    * stage that runs at corpus volume once training (q120) is done. The
    * per-word segmentations live in the final type frame, so apply is a
    * LOOKUP, not a merge walk: explode doc tokens, broadcast-probe the
    * (word → symbol count) table (type-vocabulary-bounded, q118's
    * broadcast argument), and fold per-doc integer aggregates — subword
    * count, token count, character mass. Emits one row per doc, all
    * integers, row-level exact: `n_subwords` between `n_tokens` (fully
    * merged) and `n_chars_tok + n_tokens` (no merges, + the </w>
    * markers), the compression a consumer divides for chars/subword.
    *
    * Scale: learning runs on types (q120); apply is ONE corpus scan with
    * a broadcast probe and a per-doc map-side partial aggregate — the
    * shuffle carries |docs| rows. No corpus-volume shuffle, no per-doc
    * string surgery at apply time (the segmentation was computed once
    * per TYPE, amortized across every occurrence — the whole point of
    * the type-frame representation). */
  def q123BpeSegment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (_, types) = learnMergesAndTypes(docs, "text", BpeRounds)
    val segs = types.select(col("word"),
      size(split(col("seq"), " ")).cast("long").as("n_sym"))
    docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("word"))
      .join(broadcast(segs), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(length(col("word"))).as("n_chars_tok"),
        sum(col("n_sym")).as("n_subwords"))
      .orderBy(col("doc_id"))
  }

  /** The q120 CTE chain re-derives the merges; t8 (the final type frame)
    * supplies the oracle's segmentations — shared round logic verbatim.
    * (lazy: `roundsCtePrefix` is declared below, after the q120 family.) */
  lazy val q123BpeSegmentSql: String = {
    val tok = TextQueries.tokSqlExpr
    s"""$roundsCtePrefix,
       |segs AS (SELECT word, len(string_split(seq, ' '))::BIGINT AS n_sym FROM t$BpeRounds),
       |d AS (SELECT doc_id, unnest($tok) AS word FROM documents)
       |SELECT d.doc_id, count(*)::BIGINT AS n_tokens,
       |  sum(len(d.word))::BIGINT AS n_chars_tok,
       |  sum(s.n_sym)::BIGINT AS n_subwords
       |FROM d JOIN segs s USING (word)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  /** The shared K-round CTE chain: w (types), t0 (char seqs), then per
    * round p_i (pair counts) / b_i (chosen pair, MATERIALIZED — DuckDB
    * otherwise inlines each CTE per reference and the chain expands
    * exponentially) / t_i (merged seqs). Ends at t{BpeRounds}. */
  private val roundsCtePrefix: String = {
    val tok = TextQueries.tokSqlExpr
    def pairCte(i: Int): String =
      s"""p$i AS (SELECT pr, sum(freq)::BIGINT AS cnt FROM (
         |    SELECT freq, unnest([s[i] || ' ' || s[i+1] FOR i IN range(1, len(s))]) AS pr
         |    FROM (SELECT freq, string_split(seq, ' ') AS s FROM t${i - 1}))
         |  GROUP BY pr),
         |b$i AS MATERIALIZED (SELECT pr, cnt FROM p$i ORDER BY cnt DESC, pr LIMIT 1)""".stripMargin
    def mergeCte(i: Int): String =
      s"""t$i AS MATERIALIZED (SELECT word, freq,
         |  trim(regexp_replace(replace('  ' || replace(seq, ' ', '  ') || '  ',
         |    ' ' || (SELECT split_part(pr, ' ', 1) FROM b$i) || '  ' || (SELECT split_part(pr, ' ', 2) FROM b$i) || ' ',
         |    ' ' || (SELECT replace(pr, ' ', '') FROM b$i) || ' '),
         |  ' +', ' ', 'g')) AS seq FROM t${i - 1})""".stripMargin
    val rounds = (1 to BpeRounds)
      .map(i => s"${pairCte(i)},\n${mergeCte(i)}").mkString(",\n")
    s"""WITH w AS (SELECT tk AS word, count(*)::BIGINT AS freq
       |  FROM (SELECT unnest($tok) AS tk FROM documents) GROUP BY 1),
       |t0 AS MATERIALIZED (SELECT word, freq,
       |  regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS seq FROM w),
       |$rounds""".stripMargin
  }

  /** The oracle re-derives every round itself: K unrolled CTE blocks,
    * each picking its own best pair by the same total order and applying
    * the same doubled-separator replace. */
  val q120BpeMergesSql: String = {
    val union = (1 to BpeRounds)
      .map(i => s"SELECT $i::BIGINT AS step, pr, cnt FROM b$i")
      .mkString("\nUNION ALL ")
    s"""$roundsCtePrefix
       |SELECT step, split_part(pr, ' ', 1) AS lhs, split_part(pr, ' ', 2) AS rhs,
       |  replace(pr, ' ', '') AS merged, cnt
       |FROM ($union)
       |ORDER BY step""".stripMargin
  }
}

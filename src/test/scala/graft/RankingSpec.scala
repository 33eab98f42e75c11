package graft

import org.apache.spark.sql.functions._
import graft.operators.Ranking

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("per-term tf and dl are exact token counts") {
    val docs = Seq(
      (1L, "spark merge spark window"),
      (2L, "the quick spark"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Ranking.bm25(docs, "doc_id", "text", Seq("spark", "merge"))
      .orderBy("id").collect()
    assert(out.length == 2) // empty doc drops out of the corpus
    val r1 = out(0)
    assert(r1.getAs[Long]("dl") == 4)
    assert(r1.getAs[Long]("tf_spark") == 2)
    assert(r1.getAs[Long]("tf_merge") == 1)
    assert(r1.getAs[Long]("n_matched") == 2)
    val r2 = out(1)
    assert(r2.getAs[Long]("dl") == 3)
    assert(r2.getAs[Long]("tf_spark") == 1)
    assert(r2.getAs[Long]("tf_merge") == 0)
    assert(r2.getAs[Long]("n_matched") == 1)
  }

  test("score matches the hand-computed BM25 formula") {
    val docs = Seq(
      (1L, "spark merge window"),
      (2L, "spark spark spark table"),
      (3L, "table scan join")
    ).toDF("doc_id", "text")
    val out = Ranking.bm25(docs, "doc_id", "text", Seq("spark"))
      .orderBy("id").collect()
    val n = 3.0; val sumDl = 3 + 4 + 3
    val avgdl = sumDl / n
    val df = 2.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def expected(tf: Double, dl: Double): Double =
      idf * (tf * (Ranking.K1 + 1.0)) /
        (tf + Ranking.K1 * ((1.0 - Ranking.B) + Ranking.B * (dl / avgdl)))
    assert(math.abs(out(0).getAs[Double]("score") - expected(1, 3)) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("score") - expected(3, 4)) < 1e-12)
    assert(out(2).getAs[Double]("score") == 0.0) // no term match
  }

  test("rarer terms outweigh common ones at equal tf and dl") {
    // "rare" hits 1 of 4 docs, "common" hits 3 of 4; the probe docs are
    // identical in length and tf, so only idf separates their scores
    val docs = Seq(
      (1L, "rare alpha beta"),
      (2L, "common alpha beta"),
      (3L, "common beta gamma"),
      (4L, "common gamma alpha")
    ).toDF("doc_id", "text")
    val out = Ranking.bm25(docs, "doc_id", "text", Seq("rare", "common"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("score") > out(1).getAs[Double]("score"))
  }

  test("retrieve-then-rerank: semantic order overrides lexical order") {
    // lexical: d1 (tf=3) > d2 (tf=2) > d3 (tf=1); d4 never retrieved.
    // semantic: d3's vector aligns with d1's (the query), d2's opposes —
    // the rerank must flip d2 and d3.
    val docs = Seq(
      (1L, "spark spark spark"),
      (2L, "spark spark x"),
      (3L, "spark y z"),
      (4L, "nothing relevant")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(-1.0f, 0.1f)),
      (3L, Array(0.9f, 0.1f)),
      (4L, Array(0.0f, 1.0f))
    ).toDF("id", "embedding")
    val out = Ranking.retrieveRerank(docs, emb, "doc_id", "text",
      Seq("spark"), k1 = 3, k2 = 3).collect()
    assert(out.map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"))).toSeq ==
      Seq((1, 1L), (2, 3L), (3, 2L)))
    assert(out(0).getAs[Int]("bm25_rank") == 1)
    assert(out(0).getAs[Double]("cos") == 1.0) // query doc against itself
    assert(out(1).getAs[Int]("bm25_rank") == 3, "d3 was lexical rank 3")
    assert(out(2).getAs[Double]("cos") < 0.0, "d2 opposes the query vector")
  }

  test("q100 gate shape: dense rerank rank, candidates from the lexical top-100") {
    val rows = Ranking.q100RetrieveRerank(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 10)
    rows.foreach { r =>
      val b = r.getAs[Int]("bm25_rank")
      assert(b >= 1 && b <= 100)
    }
    assert(rows.exists(_.getAs[Int]("bm25_rank") == 1),
      "the query doc itself must survive the rerank (cosine 1 with itself)")
  }

  test("q95 emits a dense rank consistent with its own evidence columns") {
    val rows = Ranking.q95Bm25Rank(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 25))
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 25)
    rows.foreach { r =>
      val tfSum = Ranking.QueryTerms.map(t => r.getAs[Long](s"tf_$t")).sum
      assert(r.getAs[Long]("n_matched") <= Ranking.QueryTerms.size)
      assert(tfSum >= r.getAs[Long]("n_matched")) // every matched term has tf ≥ 1
      assert(r.getAs[Long]("dl") >= tfSum)
    }
  }

  test("unigram LM: hand-computed micro-nat log-probs and fluency ordering") {
    import spark.implicits._
    // corpus: "a a b" / "a b c" / "c" — counts: a=3, b=2, c=2, C=7
    val docs = Seq((1L, "a a b"), (2L, "a b c"), (3L, "c")).toDF("doc_id", "text")
    val out = Ranking.lmUnigramScores(docs, "doc_id", "text")
      .orderBy("id").collect()
    def micro(x: Double): Long = math.round(math.log(x) * 1e6)
    val lnC = micro(7.0)
    val exp = Map(
      1L -> (2 * micro(3.0) + micro(2.0) - 3 * lnC), // a a b
      2L -> (micro(3.0) + 2 * micro(2.0) - 3 * lnC), // a b c
      3L -> (micro(2.0) - lnC))                      // c
    out.foreach { r =>
      assert(r.getAs[Long]("lp_micro") == exp(r.getAs[Long]("id")),
        s"doc ${r.getAs[Long]("id")}")
    }
    // doc 1 (common tokens) must out-rank doc 2 (one rarer token) per token
    val byId = out.map(r => r.getAs[Long]("id") -> r.getAs[Double]("avg_lp")).toMap
    assert(byId(1L) > byId(2L))
    // q118 gate shape: dense integer ranks, no doubles
    val gate = Ranking.q118LmQuality(spark, sf).collect()
    assert(gate.length == 50)
    assert(gate.map(_.getAs[Int]("rank")).toSeq == (1 to 50))
    gate.foreach(r => assert(r.getAs[Long]("sum_c") >= r.getAs[Long]("n_tokens"),
      "every token's corpus count is at least 1"))
  }

  // ---- q126: DSIR importance weighting ----

  /** Driver-side twin of the DSIR feature hash: md5 hex prefix, fully
    * independent of Spark's md5/conv expressions. */
  private def bucketOf(tok: String, buckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"dsir:$tok".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % buckets
  }

  private def toksOf(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  test("DSIR scores match a fully independent driver-side recomputation") {
    import spark.implicits._
    val b = 64
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    // independent model: JVM md5 buckets, integer micro-nat lambdas
    def micro(x: Double): Long = math.round(math.log(x) * 1e6)
    val perTok = docs.flatMap { case (_, src, text) =>
      toksOf(text).map(t => (bucketOf(t, b), src == "src0")) }
    val ct = perTok.filter(_._2).groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val cr = perTok.filterNot(_._2).groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val lam = (ct.keySet ++ cr.keySet).map(k =>
      k -> (micro(ct.getOrElse(k, 0L) + 1.0) - micro(cr.getOrElse(k, 0L) + 1.0))).toMap
    val cConst = micro(cr.values.sum + b.toDouble) - micro(ct.values.sum + b.toDouble)
    val expected = docs.filter(_._2 != "src0").map { case (id, _, text) =>
      val ts = toksOf(text)
      id -> (ts.map(t => lam(bucketOf(t, b))).sum + ts.size * cConst)
    }.toMap
    val got = Ranking.q126DsirSelect(spark, sf)
      .select(col("doc_id"), col("score_micro"), col("n_tokens"), col("source"))
      .as[(Long, Long, Long, String)].collect()
    assert(got.length == 40)
    got.foreach { case (id, score, n, src) =>
      assert(src != "src0", s"target doc $id leaked into the pool")
      assert(score == expected(id), s"doc $id: got $score want ${expected(id)}")
      assert(n == toksOf(docs.find(_._1 == id).get._3).size.toLong)
    }
    // de-tie non-vacuity: the ranking key must actually rank
    assert(got.map(_._2).distinct.length > 30)
  }

  test("rrfFuse: union semantics, swap ties de-tie on id, exact reciprocal scores") {
    import spark.implicits._
    // A in both lists, B lex-only, C sem-only; D/E are an exact rank
    // swap (lex 3/sem 4 vs lex 4/sem 3) — equal rrf by construction
    val lex = Seq((10L, 1), (20L, 2), (40L, 3), (50L, 4))
      .toDF("id", "lex_rank")
    val sem = Seq((10L, 1), (30L, 2), (50L, 3), (40L, 4))
      .toDF("id", "sem_rank")
    val out = Ranking.rrfFuse(lex, sem, 60, 10).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 40L, 50L, 20L, 30L))
    // 10 is in both lists at rank 1; 40/50 swap-tie and de-tie on id;
    // 20 (lex 2) beats 30 (sem 2) only via... both 1/62 — also a tie, id de-tie
    def rrf(l: Option[Int], s: Option[Int]): Double =
      l.map(r => 1.0 / (60 + r)).getOrElse(0.0) + s.map(r => 1.0 / (60 + r)).getOrElse(0.0)
    val expect = Map(10L -> rrf(Some(1), Some(1)), 20L -> rrf(Some(2), None),
      30L -> rrf(None, Some(2)), 40L -> rrf(Some(3), Some(4)),
      50L -> rrf(Some(4), Some(3)))
    assert(rrf(Some(3), Some(4)) == rrf(Some(4), Some(3)), "swap tie is exact")
    val ranks = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    // verify the fused order equals the driver-side sort of exact scores
    val want = expect.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
      .zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    assert(ranks == want)
  }

  test("q135 keeps single-list survivors from both sides") {
    val out = Ranking.q135HybridRrf(spark, sf).collect()
    assert(out.length == 20)
    val lexOnly = out.count(r => !r.isNullAt(2) && r.isNullAt(3))
    val semOnly = out.count(r => r.isNullAt(2) && !r.isNullAt(3))
    val both = out.count(r => !r.isNullAt(2) && !r.isNullAt(3))
    assert(both >= 1, "the champion doc is in both lists by construction")
    assert(lexOnly + semOnly >= 1,
      "fusion must surface docs only one retriever found — else the gate is q100")
  }

  test("DSIR fixed-point boundary tripwire: micro-nat roundings stay far from .5") {
    import spark.implicits._
    // every ln argument is an integer: bucket counts + 1 and totals + B
    val toks = Tables.documents(spark, sf)
      .select(col("source") === "src0", col("text")).as[(Boolean, String)].collect()
      .flatMap { case (t, text) => toksOf(text).map(tok => (bucketOf(tok, 64), t)) }
    val args = (toks.groupBy(identity).values.map(_.size.toLong + 1L) ++
      Seq(toks.count(_._2).toLong + 64L, toks.count(!_._2).toLong + 64L)).toSet
    val worst = args.map { k =>
      val f = (math.log(k.toDouble) * 1e6) % 1.0
      math.abs(f - 0.5)
    }.min
    assert(worst > 1e-3, s"a micro-nat rounding sits $worst from its boundary " +
      "— cross-engine ulp risk; bump LmScale or the seed")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.TextQueries

/** PII redaction: pattern behavior on known strings, count/redaction
  * consistency, and gate non-vacuity (the fixture carries no natural
  * PII — the q74 harness PLANTS it, so every pattern must fire). */
class TextQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("each PII pattern redacts its known form and counts it on the original text") {
    val t = "mail a@b.co and c@d.io node 10.0.0.17 call 555-123-4567 ssn 123-45-6789 end"
    val out = TextQueries.redactPii(Seq((1L, t)).toDF("doc_id", "text"), "text")
      .collect().head
    assert(out.getAs[Int]("n_email") == 2)
    assert(out.getAs[Int]("n_ip") == 1)
    assert(out.getAs[Int]("n_phone") == 1)
    assert(out.getAs[Int]("n_ssn") == 1)
    assert(out.getAs[String]("redacted") ==
      "mail <EMAIL> and <EMAIL> node <IP> call <PHONE> ssn <SSN> end")
  }

  test("normalizeText: NFC composition, control strip, whitespace collapse, trim") {
    val raw = " cafe\u0301  x\tz \u0001ok \u212B "
    val out = Seq((1L, raw)).toDF("doc_id", "text")
      .select(graft.functions.TextFunctions.normalizeText(col("text")).as("n"))
      .collect().head.getString(0)
    assert(out == "caf\u00e9 x z ok \u00c5", s"got <$out>")
    // idempotence: normalizing normalized text is a no-op
    val again = Seq((1L, out)).toDF("doc_id", "text")
      .select(graft.functions.TextFunctions.normalizeText(col("text")).as("n"))
      .collect().head.getString(0)
    assert(again == out)
  }

  test("clean text passes through untouched with zero counts") {
    val t = "nothing sensitive here, version 1.2 and room 101-B"
    val out = TextQueries.redactPii(Seq((1L, t)).toDF("doc_id", "text"), "text")
      .collect().head
    Seq("n_email", "n_ip", "n_phone", "n_ssn").foreach(c =>
      assert(out.getAs[Int](c) == 0, s"$c must be 0"))
    assert(out.getAs[String]("redacted") == t)
  }

  test("repetition stats: hand-computed case, lexicographic tie-break, short-doc nulls") {
    val rows = TextQueries.repetitionStats(
      Seq(
        // "a b" x3 + "b a" x2 interleaved: a b a b a b → bigrams
        // [a b, b a, a b, b a, a b] → top = "a b" (3), dup chars = 3*3+2*3
        (1L, "a b a b a b"),
        // all-distinct bigrams, every count 1 → ties broken to the
        // lexicographically SMALLEST gram; nothing duplicated
        (2L, "x y z"),
        // single token: no bigrams → nulls, dup_word_frac defined
        (3L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text").collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    val r1 = rows(1L)
    assert(r1.getAs[String]("top_bigram") == "a b")
    assert(r1.getAs[Long]("top_bigram_cnt") == 3L)
    // norm = "a b a b a b" (11 chars); top chars 3*3=9; dup chars 9+6=15/11 capped? no cap — fraction may exceed 1 by overlap, Gopher counts occurrences
    assert(math.abs(r1.getAs[Double]("top_bigram_char_frac") - 9.0 / 11) < 1e-9 + 5e-5)
    assert(math.abs(r1.getAs[Double]("dup_bigram_char_frac") - 15.0 / 11) < 1e-9 + 5e-5)
    assert(math.abs(r1.getAs[Double]("dup_word_frac") - 4.0 / 6) < 1e-9 + 5e-5)

    val r2 = rows(2L)
    assert(r2.getAs[String]("top_bigram") == "x y", "count-1 ties must pick the smallest gram")
    assert(r2.getAs[Long]("top_bigram_cnt") == 1L)
    assert(r2.getAs[Double]("dup_bigram_char_frac") == 0.0)

    val r3 = rows(3L)
    assert(r3.isNullAt(r3.fieldIndex("top_bigram")))
    assert(r3.isNullAt(r3.fieldIndex("dup_bigram_char_frac")))
    assert(r3.getAs[Double]("dup_word_frac") == 0.0)
  }

  test("q74 gate is non-vacuous: every planted pattern fires on the fixture") {
    val agg = TextQueries.q74PiiRedact(spark, sf)
      .agg(sum("n_email").as("e"), sum("n_ssn").as("s"),
        sum("n_phone").as("p"), sum("n_ip").as("i"))
      .collect().head
    Seq("e", "s", "p", "i").foreach(c =>
      assert(agg.getAs[Long](c) > 0, s"planted PII class $c never fired"))
  }

  test("vocabCoverage: exact counts, boundary tie-break, and coverage identity") {
    import spark.implicits._
    // 'b' and 'c' tie at 3 occurrences on the V=2 boundary below 'a'(4):
    // token-ASC tie-break must admit 'b' and leave 'c' OOV
    val docs = Seq(
      (1L, "en", "a a b c"),
      (2L, "en", "a b"),
      (3L, "de", "a b c c z")).toDF("doc_id", "lang", "text")
    val out = TextQueries.vocabCoverage(docs, "lang", "text", 2)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("total_tokens") == 6L)   // a a b c a b
    assert(en.getAs[Long]("n_types") == 3L)
    assert(en.getAs[Long]("in_vocab_tokens") == 5L) // a×3 + b×2
    assert(en.getAs[Long]("n_vocab_types") == 2L)
    assert(en.getAs[Long]("oov_tokens") == 1L)      // c
    assert(en.getAs[Double]("oov_rate") == 1.0 / 6)
    val de = out("de")
    assert(de.getAs[Long]("in_vocab_tokens") == 2L) // a + b; c c z are OOV
    assert(de.getAs[Long]("oov_tokens") == 3L)
    // coverage identity on the fixture run: in_vocab + oov = total, per lang
    TextQueries.q109VocabOov(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("in_vocab_tokens") + r.getAs[Long]("oov_tokens") ==
        r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("n_vocab_types") <= 512L)
    }
  }

  test("vocabCoverageCurve: coverage monotone in V, consistent with q109 at V=512") {
    val curve = TextQueries.q114VocabCurve(spark, sf).collect()
    // coverage can only improve as the vocabulary grows
    curve.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("vocab_size"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("in_vocab_tokens") <= b.getAs[Long]("in_vocab_tokens"),
            s"$lang coverage must be monotone in V")
          assert(a.getAs[Long]("total_tokens") == b.getAs[Long]("total_tokens"))
        case _ =>
      }
    }
    // the V=512 point must agree with q109's single-size report exactly
    val at512 = curve.filter(_.getAs[Long]("vocab_size") == 512L)
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("in_vocab_tokens")).toMap
    TextQueries.q109VocabOov(spark, sf).collect().foreach { r =>
      assert(at512(r.getAs[String]("lang")) == r.getAs[Long]("in_vocab_tokens"),
        "curve at V=512 must equal the q109 report")
    }
  }

  test("vocabIngest: state is schedule-independent; replayed batch no-ops") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "en", "a b"), (2L, "en", "a c"), (3L, "de", "b b d"))
      .toDF("doc_id", "lang", "text")
    def run(splits: Seq[Seq[Long]]): Map[(String, String), Long] = {
      val base = java.nio.file.Files.createTempDirectory("graft_vi_")
      try {
        val p = s"$base/v"
        splits.zipWithIndex.foreach { case (ids, i) =>
          assert(TextQueries.vocabIngest(spark, p,
            docs.filter(col("doc_id").isInCollection(ids)), s"b$i", "lang", "text"))
        }
        graft.sinks.LedgeredState.readPart(spark, p, "counts").get.collect()
          .map(r => (r.getAs[String]("lang"), r.getAs[String]("tok")) ->
            r.getAs[Long]("n")).toMap
      } finally {
        val fs = new org.apache.hadoop.fs.Path(base.toString)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base.toString), true)
      }
    }
    // three arrival schedules — one batch, ordered halves, singletons
    // out of id order — must converge to the identical type-count state
    val a = run(Seq(Seq(1L, 2L, 3L)))
    val b = run(Seq(Seq(1L), Seq(2L, 3L)))
    val c = run(Seq(Seq(3L), Seq(1L), Seq(2L)))
    assert(a == b && b == c, "additive type-count state must be schedule-independent")
    assert(a(("en", "a")) == 2L && a(("de", "b")) == 2L && a(("en", "c")) == 1L)
    // replay: same batchId again must refuse and leave state unchanged
    val base = java.nio.file.Files.createTempDirectory("graft_vi_r_")
    try {
      val p = s"$base/v"
      assert(TextQueries.vocabIngest(spark, p, docs, "d1", "lang", "text"))
      assert(!TextQueries.vocabIngest(spark, p, docs, "d1", "lang", "text"))
      val n = graft.sinks.LedgeredState.readPart(spark, p, "counts").get
        .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
      assert(n == 7L, s"replay must not double-count (total token count $n != 7)")
    } finally {
      val fs = new org.apache.hadoop.fs.Path(base.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base.toString), true)
    }
  }

  test("manifested vocab fold: schedule-independent, replay no-ops, one commit per batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sinks.ManifestMergeSink
    val docs = Seq((1L, "en", "a b"), (2L, "en", "a c"), (3L, "de", "b b d"))
      .toDF("doc_id", "lang", "text")
    def run(splits: Seq[Seq[Long]]): Map[(String, String), Long] = {
      val base = java.nio.file.Files.createTempDirectory("graft_vm_")
      try {
        val t = s"$base/v"
        splits.zipWithIndex.foreach { case (ids, i) =>
          assert(TextQueries.vocabIngestManifested(spark, t,
            docs.filter(col("doc_id").isInCollection(ids)), i + 1L,
            "lang", "text", nBuckets = 4))
        }
        assert(ManifestMergeSink.commitSeqs(spark, t).size == splits.size,
          "exactly one commit per applied batch")
        ManifestMergeSink.readManifested(spark, t).collect()
          .map(r => (r.getAs[String]("lang"), r.getAs[String]("tok")) ->
            r.getAs[Long]("n")).toMap
      } finally {
        val fs = new org.apache.hadoop.fs.Path(base.toString)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base.toString), true)
      }
    }
    val a = run(Seq(Seq(1L, 2L, 3L)))
    val b = run(Seq(Seq(1L), Seq(2L, 3L)))
    val c = run(Seq(Seq(3L), Seq(1L), Seq(2L)))
    assert(a == b && b == c, "additive snapshot state must be schedule-independent")
    assert(a(("en", "a")) == 2L && a(("de", "b")) == 2L && a(("en", "c")) == 1L)
    // replay: same batchId must no-op on the ledger, state + head unmoved
    val base = java.nio.file.Files.createTempDirectory("graft_vm_r_")
    try {
      val t = s"$base/v"
      assert(TextQueries.vocabIngestManifested(spark, t, docs, 1L,
        "lang", "text", 4))
      val head = ManifestMergeSink.headState(spark, t).get._1
      assert(!TextQueries.vocabIngestManifested(spark, t, docs, 1L,
        "lang", "text", 4))
      assert(ManifestMergeSink.headState(spark, t).get._1 == head,
        "an absorbed replay must not publish")
      val n = ManifestMergeSink.readManifested(spark, t)
        .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
      assert(n == 7L, s"replay must not double-count (total $n != 7)")
      // the ledgered and the manifested folds agree row-for-row
      val p = s"$base/ledger"
      assert(TextQueries.vocabIngest(spark, p, docs, "d1", "lang", "text"))
      val want = graft.sinks.LedgeredState.readPart(spark, p, "counts").get
        .collect().map(r => (r.getAs[String]("lang"),
          r.getAs[String]("tok")) -> r.getAs[Long]("n")).toMap
      val got = ManifestMergeSink.readManifested(spark, t).collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[String]("tok")) ->
          r.getAs[Long]("n")).toMap
      assert(got == want, "both vocab layouts must hold the identical state")
    } finally {
      val fs = new org.apache.hadoop.fs.Path(base.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base.toString), true)
    }
  }

  test("q117 bloom decontamination gate holds on the fixture; sketch FP floor pinned") {
    val row = TextQueries.q117BloomDecontam(spark, sf).collect().head
    assert(row.getAs[Long]("n_exact") > 0L, "gate must be non-vacuous")
    assert(row.getAs[Boolean]("no_false_negatives"),
      "a Bloom filter can never miss an inserted shingle")
    assert(row.getAs[Boolean]("fp_band"))
    // Pin the claim the q117 band is sized against: Spark's
    // util.sketch.BloomFilter under-delivers tiny fpp targets (its two
    // 32-bit murmur base hashes floor the per-probe FP rate around
    // ~2e-4 at small bit arrays). If a Spark upgrade fixes the floor,
    // this assertion trips and the band can tighten.
    val bf = org.apache.spark.util.sketch.BloomFilter.create(270L, 1e-6)
    (1 to 270).foreach(i => bf.putString(s"inserted item $i"))
    val fp = (1 to 100000).count(i => bf.mightContainString(s"unseen probe $i"))
    assert(fp > 0, "measured FP floor (~2e-4) should show in 100k probes; " +
      "if this trips, the sketch improved — tighten BloomFpp's band")
    assert(fp < 100, "FP rate above 1e-3 would mean the band itself is unsafe")
  }

  test("attribution: idf weighting, df-cap exclusion, tie-break, and exact micro-nat scores") {
    def mn(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val train = Seq(
      (1L, "alpha beta gamma delta"),  // shares capped + one rare shingle
      (2L, "alpha beta gamma zeta"),   // shares ONLY the capped shingle
      (3L, "alpha beta gamma eta"),    // ditto — must be absent entirely
      (4L, "rare token trio here")     // shares a different rare shingle
    ).toDF("doc_id", "text")
    val ev = Seq(
      (97L, "alpha beta gamma delta rare token trio")
    ).toDF("doc_id", "text")
    // dfCap = 2 kills "alpha beta gamma" (df = 3); N = 4 train docs
    val out = TextQueries.attributionTopK(train, ev, "doc_id", "text",
        n = 3, dfCap = 2L, k = 2)
      .orderBy(col("eval_id"), col("rank")).collect()
    assert(out.map(r => (r.getAs[Long]("eval_id"), r.getAs[Long]("rank"),
      r.getAs[Long]("train_id"), r.getAs[Long]("score_micro"),
      r.getAs[Long]("n_shared"))).toSeq == Seq(
      // t1 and t4 each share one df=1 shingle → equal score mn(4)-mn(1);
      // the tie de-ties on train_id; t2/t3 never appear (capped-only)
      (97L, 1L, 1L, mn(4) - mn(1), 1L),
      (97L, 2L, 4L, mn(4) - mn(1), 1L)))
    // weighting bites: one RARE shared shingle (df=1) outranks two
    // COMMON ones (df=2), even though n_shared is smaller
    val train2 = Seq(
      (1L, "x y z common one two"),     // shares 3 shingles (df 2,2,1)
      (2L, "x y z common one alt"),     // shares 2 shingles (df 2,2)
      (3L, "very unique marker words")  // shares 1 shingle  (df 1)
    ).toDF("doc_id", "text")
    val ev2 = Seq((97L, "x y z common one two very unique marker words plus"))
      .toDF("doc_id", "text")
    val out2 = TextQueries.attributionTopK(train2, ev2, "doc_id", "text",
        n = 4, dfCap = 10L, k = 3)
      .orderBy(col("rank")).collect()
    assert(out2.map(r => (r.getAs[Long]("rank"), r.getAs[Long]("train_id"),
      r.getAs[Long]("score_micro"), r.getAs[Long]("n_shared"))).toSeq == Seq(
      (1L, 1L, 2 * (mn(3) - mn(2)) + mn(3), 3L),
      (2L, 3L, mn(3), 1L),         // rare beats...
      (3L, 2L, 2 * (mn(3) - mn(2)), 2L))) // ...two common shares
  }

  test("novelty ingest: a doc LOSES novelty when a later batch re-says its gram") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_novspec_")
    try {
      val path = s"$base/state"
      // day 1: doc 1's "alpha beta" bigram is corpus-unique (df=1)
      val day1 = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
      // day 2: doc 3 says the same bigram — doc 1's novelty must drop to 0
      val day2 = Seq((3L, "alpha beta")).toDF("doc_id", "text")
      assert(TextQueries.noveltyIngest(spark, path, day1, "d1"))
      val all1 = Seq((1L, ""), (2L, "")).toDF("doc_id", "ignored")
      val mid = TextQueries.noveltyFromState(
        graft.sinks.LedgeredState.readPart(spark, path, "gram_df").get,
        graft.sinks.LedgeredState.readPart(spark, path, "doc_grams").get, all1)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_unique")).toMap
      assert(mid(1L) == 1L, "day-1 snapshot: doc 1 owns its unique gram")
      assert(TextQueries.noveltyIngest(spark, path, day2, "d2"))
      assert(!TextQueries.noveltyIngest(spark, path, day2, "d2"), "replay no-op")
      val all2 = Seq((1L, ""), (2L, ""), (3L, "")).toDF("doc_id", "ignored")
      val fin = TextQueries.noveltyFromState(
        graft.sinks.LedgeredState.readPart(spark, path, "gram_df").get,
        graft.sinks.LedgeredState.readPart(spark, path, "doc_grams").get, all2)
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_unique")))).toMap
      assert(fin(1L) == ((1L, 0L)), s"the owner-merge rule must null doc 1's gram: ${fin(1L)}")
      assert(fin(3L) == ((1L, 0L)))
      assert(fin(2L) == ((1L, 1L)), "doc 2's gram stays unique")
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainingData

/** Properties of the training-data pipeline operators: the determinism
  * and stability guarantees that make them safe to run incrementally at
  * 100 TB (values are gated by the q44/q45 DuckDB oracles; this pins the
  * WHY — membership stability, rate accuracy, packing invariants). */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("mixture sampling is deterministic and membership-stable under growth") {
    val rates = Map("en" -> 0.6, "de" -> 0.3)
    val full = TrainingData.mixtureSample(docs, "doc_id", "lang", rates, "t")
      .select("doc_id").as[Long].collect().toSet
    val again = TrainingData.mixtureSample(docs, "doc_id", "lang", rates, "t")
      .select("doc_id").as[Long].collect().toSet
    assert(full == again, "re-running the sample must reproduce it exactly")
    // hash-threshold sampling decides each row independently: sampling a
    // PREFIX of the corpus yields exactly the full sample's members that
    // are in the prefix — the property rank-based sampling lacks, and the
    // reason an incremental run never re-decides old rows
    val prefix = TrainingData.mixtureSample(
      docs.filter(col("doc_id") < 200), "doc_id", "lang", rates, "t")
      .select("doc_id").as[Long].collect().toSet
    assert(prefix == full.filter(_ < 200), "growth must not change prior decisions")
  }

  test("mixture sampling hits the stratum rates and drops unlisted strata") {
    val n = 4000
    val syn = spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0, "a").otherwise("b").as("lang"))
    val sampled = TrainingData.mixtureSample(syn, "doc_id", "lang",
      Map("a" -> 0.5), "t2")
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!byLang.contains("b"), "strata without a rate are dropped")
    val kept = byLang.getOrElse("a", 0L).toDouble / (n / 2)
    assert(math.abs(kept - 0.5) < 0.05, s"empirical rate $kept should be ~0.5")
    // different seed, different sample — seeds isolate concurrent mixtures
    val other = TrainingData.mixtureSample(syn, "doc_id", "lang",
      Map("a" -> 0.5), "t3").select("doc_id").as[Long].collect().toSet
    val first = sampled.select("doc_id").as[Long].collect().toSet
    assert(first != other, "distinct seeds must decide independently")
  }

  test("pack assignments recompute from the ledger and cover every doc") {
    val budget = 512
    val assigned = TrainingData.packAssignments(docs, "lang", "doc_id",
      functions.TextFunctions.tokenCount(col("text")).cast("long"),
      budget, shards = 4, seed = "shard")
    assert(assigned.count() == docs.count(), "packing drops or duplicates no document")
    // pack_id is exactly the chunk the doc's first token lands in
    val bad = assigned.filter(col("pack_id") =!= floor(col("start_off") / budget))
    assert(bad.isEmpty, "pack_id must equal start_off div budget")
    // within a (lang, shard) stream: offsets are the running token ledger
    val rows = assigned
      .select("lang", "shard", "doc_id", "tokens", "start_off")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
    rows.foreach { case ((lang, shard), rs) =>
      val sorted = rs.sortBy(_._3)
      var expect = 0L
      sorted.foreach { case (_, _, id, toks, off) =>
        assert(off == expect, s"($lang,$shard) doc $id: start_off $off != ledger $expect")
        expect += toks
      }
    }
    // interior packs are filled: every pack except a stream's last starts
    // its successor within budget tokens (no empty chunks, no gaps)
    val packs = assigned.groupBy("lang", "shard", "pack_id")
      .agg(min("start_off").as("first_off"))
      .select("lang", "shard", "pack_id")
      .as[(String, Long, Long)].collect()
      .groupBy(t => (t._1, t._2))
    packs.foreach { case (_, ps) =>
      val ids = ps.map(_._3).sorted
      // a stream may SKIP a pack id only when one doc straddles the whole
      // chunk (tokens > budget); the fixture's docs are shorter than 512
      // tokens, so ids must be contiguous from 0
      assert(ids.head == 0 && ids.zipWithIndex.forall { case (p, i) => p == i },
        s"pack ids must be contiguous, got ${ids.mkString(",")}")
    }
  }

  test("pack segments tile every document and every interior pack exactly") {
    val budget = 512
    val toks = functions.TextFunctions.tokenCount(col("text"))
    val assigned = TrainingData.packAssignments(docs, "lang", "doc_id",
      toks, budget, shards = 4, seed = "shard")
      .select("lang", "shard", "doc_id", "tokens", "start_off")
      .as[(String, Long, Long, Long, Long)].collect()
    val segs = TrainingData.packSegments(docs, "lang", "doc_id",
      toks, budget, shards = 4, seed = "shard")
      .select("lang", "shard", "pack_id", "doc_id", "seg_start", "seg_end", "pack_off")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    // 1) per doc: segments are contiguous half-open spans tiling [0, tokens)
    val byDoc = segs.groupBy(s => (s._1, s._2, s._4))
    assigned.filter(_._4 > 0).foreach { case (lang, shard, id, tokens, _) =>
      val ss = byDoc((lang, shard, id)).sortBy(_._5)
      assert(ss.head._5 == 0L && ss.last._6 == tokens,
        s"doc $id: segments must span [0, $tokens)")
      ss.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 == b._5, s"doc $id: gap between segments")
          assert(b._3 == a._3 + 1, s"doc $id: segments must hit consecutive packs")
        case _ => ()
      }
    }
    assert(segs.length >= assigned.count(_._4 > 0),
      "every non-empty doc emits at least one segment")
    val straddled = byDoc.count(_._2.length > 1)
    assert(straddled > 0, "fixture must exercise the straddle-split path")
    // 2) per interior pack: segments tile [0, budget) with no gap/overlap
    val streams = segs.groupBy(s => (s._1, s._2))
    streams.foreach { case ((lang, shard), ss) =>
      val lastPack = ss.map(_._3).max
      ss.groupBy(_._3).filter(_._1 < lastPack).foreach { case (pid, ps) =>
        val spans = ps.map(p => (p._7, p._7 + (p._6 - p._5))).sortBy(_._1)
        assert(spans.head._1 == 0L && spans.last._2 == budget,
          s"($lang,$shard) pack $pid must be filled to $budget")
        spans.sliding(2).foreach {
          case Array(a, b) => assert(a._2 == b._1,
            s"($lang,$shard) pack $pid: gap/overlap at ${a._2}")
          case _ => ()
        }
      }
    }
  }

  test("xxh bucket is in [0, 2^32) and the xxh sampler shares md5-form properties") {
    val range = docs.select(
        min(TrainingData.hashBucketXxh(col("doc_id"), "t")).as("lo"),
        max(TrainingData.hashBucketXxh(col("doc_id"), "t")).as("hi"))
      .as[(Long, Long)].head()
    assert(range._1 >= 0L && range._2 < 4294967296L,
      s"xxh bucket out of [0, 2^32): $range")
    val rates = Map("en" -> 0.6, "de" -> 0.3)
    val full = TrainingData.mixtureSample(docs, "doc_id", "lang", rates, "t",
        TrainingData.hashBucketXxh _)
      .select("doc_id").as[Long].collect().toSet
    val again = TrainingData.mixtureSample(docs, "doc_id", "lang", rates, "t",
        TrainingData.hashBucketXxh _)
      .select("doc_id").as[Long].collect().toSet
    assert(full == again, "xxh sampling must be deterministic")
    // incremental stability: sampling a sub-corpus = full sample ∩ sub-corpus
    val sub = TrainingData.mixtureSample(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "lang", rates, "t",
        TrainingData.hashBucketXxh _)
      .select("doc_id").as[Long].collect().toSet
    assert(sub == full.filter(_ % 3 == 0))
    // the two hash families must disagree on membership somewhere —
    // otherwise q50's band/stability booleans would be re-testing md5
    val md5 = TrainingData.mixtureSample(docs, "doc_id", "lang", rates, "t")
      .select("doc_id").as[Long].collect().toSet
    assert(md5 != full, "xxh and md5 samples should differ (independent families)")
  }

  test("curation funnel stages only ever shrink, and the pack ledger balances") {
    val rows = TrainingData.q54CurationFunnel(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, nQuality, nUnique, nSampled, nPacks, packTokens) =>
      assert(nDocs >= nQuality && nQuality >= nUnique && nUnique >= nSampled,
        s"$lang: funnel must be monotone, got $nDocs/$nQuality/$nUnique/$nSampled")
      // every sampled doc lands in exactly one pack's ledger
      assert((nSampled == 0L) == (nPacks == 0L), s"$lang: packs iff sampled docs")
      assert(nPacks <= nSampled || nSampled == 0L,
        s"$lang: a pack holds >= 1 starting doc, so n_packs <= n_sampled")
    }
    // the filter has teeth on the fixture: some docs are dropped at the
    // quality stage and some at the sampling stage, else the gate is vacuous
    assert(rows.map(_._2).sum > rows.map(_._3).sum, "quality filter must drop docs")
    assert(rows.map(_._4).sum > rows.map(_._5).sum, "sampler must drop docs")
    // ledger identity, replayed INDEPENDENTLY of the Spark window: collect
    // the sampled set, recompute each doc's shard from md5 driver-side,
    // and walk each (lang, shard) stream's token ledger as plain scalars
    val funnel = rows.map(r => r._1 -> (r._5, r._6, r._7)).toMap
    val sampled = TrainingData.curationSampled(spark, sf)
      .select("doc_id", "lang", "n_tokens").as[(Long, String, Long)].collect()
    def md5Bucket(seed: String, id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    sampled.groupBy(_._2).foreach { case (lang, docs) =>
      val (nSampled, nPacks, packTokens) = funnel(lang)
      assert(docs.length.toLong == nSampled, s"$lang: sampled-set size mismatch")
      assert(docs.map(_._3).sum == packTokens,
        s"$lang: pack_tokens must equal the sampled set's token sum")
      // walk each (lang, shard) stream's token ledger as plain scalars and
      // count the packs that receive a STARTING doc (a stream's tail can
      // straddle into a pack no doc starts in — that pack is not counted)
      val budget = TrainingData.PackBudget
      val expectPacks = docs
        .groupBy(d => md5Bucket(TrainingData.PackSeed, d._1) % TrainingData.PackShards)
        .values.map { ds =>
          var off = 0L
          val packs = scala.collection.mutable.Set[Long]()
          ds.sortBy(_._1).foreach { case (_, _, toks) =>
            packs += off / budget; off += toks
          }
          packs.size.toLong
        }.sum
      assert(expectPacks == nPacks, s"$lang: n_packs must match the replayed ledger")
    }
  }

  test("near-dup cluster stage shrinks the funnel between exact dedup and sampling") {
    val rows = TrainingData.q56NearDupFunnel(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, nQuality, nUnique, nNeardup, nSampled, nPacks, _) =>
      assert(nDocs >= nQuality && nQuality >= nUnique &&
        nUnique >= nNeardup && nNeardup >= nSampled,
        s"$lang: funnel must be monotone, got " +
          s"$nDocs/$nQuality/$nUnique/$nNeardup/$nSampled")
      assert((nSampled == 0L) == (nPacks == 0L), s"$lang: packs iff sampled docs")
    }
    // non-vacuity: the fixture has near-dup clusters among the exact-dedup
    // survivors, so the cluster stage must actually drop docs — otherwise
    // this gate re-tests q54
    assert(rows.map(_._4).sum > rows.map(_._5).sum,
      "cluster dedup must drop docs between n_unique and n_neardup")
  }

  test("semantic stage composes after lexical deletion and stays monotone") {
    val rows = TrainingData.q69SemanticFunnel(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, nQuality, nUnique, nNeardup, nSemantic,
                         nSampled, nPacks, _) =>
      assert(nDocs >= nQuality && nQuality >= nUnique && nUnique >= nNeardup &&
        nNeardup >= nSemantic && nSemantic >= nSampled,
        s"$lang: funnel must be monotone, got " +
          s"$nDocs/$nQuality/$nUnique/$nNeardup/$nSemantic/$nSampled")
      assert((nSampled == 0L) == (nPacks == 0L), s"$lang: packs iff sampled docs")
    }
    // non-vacuity of the LEXICAL stage at this sf (the semantic stage's
    // own deletions are pinned by the driver gate at sf0.01, where the
    // post-lexical survivor set still contains SRP cosine clusters)
    assert(rows.map(_._4).sum > rows.map(_._5).sum,
      "cluster dedup must drop docs between n_unique and n_neardup")
  }

  test("repetition pre-filter composes ahead of quality and cuts non-vacuously") {
    val rows = TrainingData.q76RepetitionFunnel(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, nClean, nQuality, nUnique,
                         nSampled, nPacks, _) =>
      assert(nDocs >= nClean && nClean >= nQuality && nQuality >= nUnique &&
        nUnique >= nSampled,
        s"$lang: funnel must be monotone, got " +
          s"$nDocs/$nClean/$nQuality/$nUnique/$nSampled")
      assert((nSampled == 0L) == (nPacks == 0L), s"$lang: packs iff sampled docs")
    }
    assert(rows.map(_._2).sum > rows.map(_._3).sum,
      "the repetition stage must drop docs between n_docs and n_clean")
  }

  test("pack export writes a stream-partitioned layout that reads back exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_packexp_").toString
    try {
      val toks = functions.TextFunctions.tokenCount(col("text"))
      val re = TrainingData.exportPacks(docs, "lang", "doc_id", toks,
        budget = 512, shards = 4, seed = "shard", path = s"$dir/packs")
      val computed = TrainingData.packSegments(docs, "lang", "doc_id", toks,
        budget = 512, shards = 4, seed = "shard")
        .select("lang", "shard", "pack_id", "doc_id",
          "seg_start", "seg_end", "pack_off")
      val got = re.select("lang", "shard", "pack_id", "doc_id",
        "seg_start", "seg_end", "pack_off")
      assert(got.exceptAll(computed).isEmpty && computed.exceptAll(got).isEmpty,
        "reopened layout must equal the computed segments exactly")
      // the layout IS the partition structure: one directory per
      // (lang, shard) stream, so a loader reading one stream touches
      // only its own files
      val langDirs = new java.io.File(s"$dir/packs").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(langDirs.exists(_.startsWith("lang=")),
        s"expected lang= partition dirs, got $langDirs")
      val shardDirs = new java.io.File(s"$dir/packs/${langDirs.head}")
        .listFiles().filter(_.isDirectory).map(_.getName)
      assert(shardDirs.nonEmpty && shardDirs.forall(_.startsWith("shard=")),
        s"expected shard= partition dirs, got ${shardDirs.toSeq}")
      // partition pruning: a one-stream read prunes directories at the
      // scan, it does not filter rows after reading everything
      val one = spark.read.parquet(s"$dir/packs")
        .filter(col("lang") === "en" && col("shard") === 0)
      val scan = one.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters: [isnotnull(lang"),
        s"the stream predicate must prune directories:\n$scan")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("top-p selection: exact rank cut, in-band approx cut, cutoff is a data value") {
    val rows = TrainingData.q61TopQuality(spark, sf)
      .as[(String, Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nTotal, nKept, cutoff, band) =>
      assert(nKept == math.ceil(0.5 * nTotal).toLong,
        s"$lang: rank cut must keep exactly ceil(frac*n), got $nKept/$nTotal")
      assert(band, s"$lang: the approx cutoff must sit inside its error band")
      assert(cutoff >= 0.0 && cutoff <= 1.0, s"$lang: cutoff $cutoff out of range")
    }
    // the production selector keeps a within-band fraction and only
    // quality >= its own cutoff
    val docs2 = Tables.documents(spark, sf)
    val kept = TrainingData.topQualityFraction(docs2, 0.5)
    val n = docs2.count().toDouble
    val k = kept.count().toDouble
    assert(k > 0.3 * n && k < 0.7 * n,
      s"production top-p kept $k of $n — far outside the band")
    assert(kept.filter(col("quality") < col("q_cutoff")).isEmpty)
  }

  test("upsampling emits exact copy counts and degenerates to sampling below 1") {
    val n = 2000
    val syn = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "a").otherwise("b").as("lang"))
    val up = TrainingData.upsampleMixture(syn, "doc_id", "lang",
      Map("a" -> 2.0, "b" -> 0.5), "u")
    val rows = up.select("doc_id", "lang", "n_copies", "copy")
      .as[(Long, String, Long, Long)].collect()
    // integer rate: every stratum-a doc appears exactly twice, copies 1..2
    val a = rows.filter(_._2 == "a")
    assert(a.forall(_._3 == 2L) && a.length == n / 2 * 2)
    assert(a.groupBy(_._1).values.forall(_.map(_._4).sorted.sameElements(Seq(1L, 2L))))
    // fractional rate < 1: behaves like mixtureSample (0 or 1 copies)
    val b = rows.filter(_._2 == "b")
    assert(b.forall(_._3 == 1L))
    val kept = b.length.toDouble / (n / 2)
    assert(math.abs(kept - 0.5) < 0.05, s"empirical frac rate $kept should be ~0.5")
    // incremental stability: a sub-corpus run reproduces its copy lists
    val sub = TrainingData.upsampleMixture(syn.filter(col("doc_id") < 500),
        "doc_id", "lang", Map("a" -> 2.0, "b" -> 0.5), "u")
      .select("doc_id", "copy").as[(Long, Long)].collect().toSet
    assert(sub == rows.filter(_._1 < 500).map(r => (r._1, r._4)).toSet)
  }

  test("hash split is disjoint, exhaustive, growth-stable, and near the fractions") {
    val n = 3000
    val syn = spark.range(n).select(col("id").as("doc_id"), lit("x").as("lang"))
    val split = TrainingData.hashSplit(syn, "doc_id", Seq(0.8, 0.1, 0.1), "s")
      .select("doc_id", "split").as[(Long, Int)].collect()
    assert(split.length == n, "every doc lands in exactly one split")
    val byIdx = split.groupBy(_._2).view.mapValues(_.length.toDouble / n).toMap
    assert(byIdx.keySet == Set(0, 1, 2), s"all splits populated: $byIdx")
    assert(math.abs(byIdx(0) - 0.8) < 0.03 && math.abs(byIdx(1) - 0.1) < 0.02,
      s"empirical fractions off: $byIdx")
    // growth stability: membership never migrates when the corpus grows
    val prefix = TrainingData.hashSplit(syn.filter(col("doc_id") < 1000),
        "doc_id", Seq(0.8, 0.1, 0.1), "s")
      .select("doc_id", "split").as[(Long, Int)].collect().toMap
    assert(prefix == split.filter(_._1 < 1000).toMap)
  }

  test("zero-token documents stay in the ledger but emit no segment") {
    val syn = Seq((1L, "s", 3L), (2L, "s", 0L), (3L, "s", 5L))
      .toDF("doc_id", "lang", "n")
    val segs = TrainingData.packSegments(syn, "lang", "doc_id",
      col("n"), budget = 4, shards = 1, seed = "z")
      .select("doc_id", "pack_id", "seg_start", "seg_end")
      .as[(Long, Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(!segs.exists(_._1 == 2L), "zero-token doc occupies no pack")
    // doc 3 starts at offset 3 (doc 2 contributed nothing): spans packs
    // 0 ([3,4) -> seg [0,1)) and 1 ([4,8) -> seg [1,5))
    assert(segs.filter(_._1 == 3L).toSeq ==
      Seq((3L, 0L, 0L, 1L), (3L, 1L, 1L, 5L)))
  }

  test("takeTokenBudget: greedy prefix per (stratum, shard), crossing doc included") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val budget = 2000L
    val shards = 2
    val out = TrainingData.takeTokenBudget(docs, "doc_id", "lang",
        graft.functions.TextFunctions.tokenCount(col("text")), budget, shards, "t")
      .select("doc_id", "stratum", "shard", "n_tokens", "cum_tokens")
      .collect()
    // independent reference: rescan ALL docs in hash order per stream and
    // apply the greedy rule with a driver-side fold
    val all = docs
      .select(col("doc_id"), col("lang"),
        TrainingData.hashBucket(col("doc_id"), "t").as("bucket"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("nt"))
      .collect()
      .map(r => (r.getString(1), r.getLong(2) % shards, r.getLong(2), r.getLong(0), r.getLong(3)))
    val perShard = budget / shards
    val expected = all.groupBy(t => (t._1, t._2)).flatMap { case (_, rows) =>
      var cum = 0L
      rows.sortBy(t => (t._3, t._4)).takeWhile { t =>
        val start = cum; cum += t._5; start < perShard
      }.map(t => (t._4, t._1, t._2)).toSeq
    }.toSet
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet == expected)
    assert(out.nonEmpty && out.length < all.length, "cut must be non-trivial")
    // every kept doc STARTS under the per-shard budget; totals may cross it
    out.foreach(r => assert(r.getLong(4) - r.getLong(3) < perShard))
  }

  test("chunk-then-pack: segments tile chunks, straddles split, no over-wide items") {
    import org.apache.spark.sql.functions._
    val rows = TrainingData.q84ChunkPack(spark, sf).collect()
    assert(rows.nonEmpty)
    // no single segment can exceed the chunk width (the property chunking buys)
    rows.foreach { r =>
      val len = r.getAs[Long]("seg_end") - r.getAs[Long]("seg_start")
      assert(len >= 1 && len <= 32, s"segment wider than a chunk: $r")
    }
    // straddle splits must actually occur at this budget (non-vacuity)
    val multi = rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"))).filter(_._2.length > 1)
    assert(multi.nonEmpty, "budget must split some chunk across packs")
    // a split chunk's segments tile its token range exactly
    multi.foreach { case (k, segs) =>
      val sorted = segs.sortBy(_.getAs[Long]("seg_start"))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Long]("seg_end") == b.getAs[Long]("seg_start"),
          s"gap/overlap in $k")
      case _ => ()
      }
      assert(sorted.head.getAs[Long]("seg_start") == 0L)
    }
  }

  test("temperature quotas: hand-computed thresholds, rare stratum kept whole") {
    import spark.implicits._
    // a: 100 rows (w=10), b: 4 rows (w=2); N=104, W=12, T=52
    val docs = ((1L to 100L).map(i => (i, "a")) ++ (101L to 104L).map(i => (i, "b")))
      .toDF("doc_id", "s")
    val q = TrainingData.temperatureQuotas(docs, "s", 2)
      .orderBy("s").collect()
    val a = q(0); val b = q(1)
    assert(a.getAs[Long]("n_total") == 100L && a.getAs[Long]("w") == 10L)
    assert(b.getAs[Long]("n_total") == 4L && b.getAs[Long]("w") == 2L)
    // thr_a = floor(52·10·2³² / (12·100)); thr_b caps at 2³² (rate > 1)
    assert(a.getAs[Long]("threshold") == 52L * 10 * 4294967296L / (12 * 100))
    assert(b.getAs[Long]("threshold") == 4294967296L)
    // the capped stratum is kept in full — the α<1 flattening promise
    val kept = TrainingData.temperatureMixture(docs, "doc_id", "s", 2, "t0")
    assert(kept.filter(col("s") === "b").count() == 4L)
  }

  test("temperature mixture flattens: small strata keep a higher fraction") {
    val docs = Tables.documents(spark, sf)
    val q = TrainingData.temperatureQuotas(docs, "lang", 2).collect()
    // thresholds match the ⌊T·w·2³²/(W·n)⌋ formula exactly (rate ∝ w/n;
    // note ⌊√n⌋/n itself is NOT strictly anti-monotone in n — the floor
    // can jump at perfect squares — so the law to pin is the formula)
    val bigW = q.map(_.getAs[Long]("w")).sum
    val t = q.map(_.getAs[Long]("n_total")).sum / 2
    q.foreach { r =>
      val expected = math.min(
        (BigInt(t) * r.getAs[Long]("w") * BigInt(4294967296L) /
          (BigInt(bigW) * r.getAs[Long]("n_total"))).toLong, 4294967296L)
      assert(r.getAs[Long]("threshold") == expected, s"threshold ${r.getString(0)}")
      assert(r.getAs[Long]("w") == math.sqrt(r.getAs[Long]("n_total").toDouble).toLong)
    }
    // and the realized total stays near the budget (hash-binomial noise)
    val total = docs.count()
    val kept = TrainingData.temperatureMixture(docs, "doc_id", "lang", 2, "t1").count()
    assert(math.abs(kept - total / 2.0) < 5.0 * math.sqrt(total / 4.0) + 5.0,
      s"kept=$kept of $total")
  }

  test("shuffled pack: ledger balances and packs cut in hash order, not id order") {
    val rows = TrainingData.q105ShuffledPack(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, packs) =>
      val sorted = packs.sortBy(_.getAs[Long]("pack_id"))
      // pack ids are dense from 0 and pos ranges tile the stream
      assert(sorted.head.getAs[Long]("pack_id") == 0L)
      assert(sorted.map(_.getAs[Long]("pack_id")).toSeq ==
        (0L until sorted.length.toLong))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_pos") + 1 == b.getAs[Long]("first_pos"))
        case _ => ()
      }
      // interior packs carry at least budget minus the largest straddle
      // (the q45 contract); every pack holds at least one doc
      sorted.foreach(r => assert(r.getAs[Long]("n_docs") >= 1L))
    }
    // hash order ≠ id order: some pack must have first_doc > last_doc
    assert(rows.exists(r => r.getAs[Long]("first_doc") > r.getAs[Long]("last_doc")),
      "shuffled order should invert doc ids inside at least one pack")
  }

  test("length batches: hand-computed ledger on a crafted shard") {
    import spark.implicits._
    // one bucket (width 100 swallows all), one shard, batchSize 2:
    // dl desc order = 30, 20, 10, 5 → batches {30,20} waste 10, {10,5} waste 5
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 5L), (4L, 20L)).toDF("doc_id", "n")
    val out = TrainingData.lengthBatches(docs, "doc_id", col("n"),
      bucketWidth = 100, batchSize = 2, shards = 1, seed = "lb")
      .orderBy("batch").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("max_dl") == 30L && out(0).getAs[Long]("sum_dl") == 50L)
    assert(out(0).getAs[Long]("pad_waste") == 10L)
    assert(out(1).getAs[Long]("max_dl") == 10L && out(1).getAs[Long]("sum_dl") == 15L)
    assert(out(1).getAs[Long]("pad_waste") == 5L)
    assert(out(0).getAs[Double]("waste_frac") == 10.0 / 60.0)
  }

  test("length batches: bucketing bounds the per-batch padding") {
    val out = TrainingData.q99LengthBatches(spark, sf).collect()
    assert(out.nonEmpty)
    val byKey = out.groupBy(r => (r.getAs[Long]("bucket"), r.getAs[Long]("shard")))
    byKey.foreach { case ((bucket, _), rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("batch"))
      // every batch is full except possibly the last of its window
      sorted.init.foreach(r => assert(r.getAs[Long]("n_docs") == 8L))
      sorted.foreach { r =>
        val n = r.getAs[Long]("n_docs"); val mx = r.getAs[Long]("max_dl")
        assert(n >= 1L && n <= 8L)
        // dl within a width-16 bucket spans < 16 → padding < n·16
        assert(mx >= bucket * 16 && mx < (bucket + 1) * 16)
        assert(r.getAs[Long]("pad_waste") < n * 16,
          s"bucketing must bound padding (bucket=$bucket)")
        assert(r.getAs[Long]("pad_waste") == n * mx - r.getAs[Long]("sum_dl"))
      }
    }
  }

  test("canonicalByScore: argmax per cluster, min-id on score ties") {
    import spark.implicits._
    // comp 10: clear argmax (id 3, score .9); comp 20: tie at .5 between
    // ids 5 and 7 — canonical must be the SMALLER id, like the oracle's
    // (quality DESC, id ASC) rank window
    val members = Seq((1L, 10L), (3L, 10L), (5L, 20L), (7L, 20L))
      .toDF("id", "comp")
    val scored = Seq((1L, 0.4), (3L, 0.9), (5L, 0.5), (7L, 0.5))
      .toDF("id", "score")
    val out = TrainingData.canonicalByScore(members, scored)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Long]("canon_id") == 3L && !out(1L).getAs[Boolean]("kept"))
    assert(out(3L).getAs[Boolean]("kept"))
    assert(out(5L).getAs[Long]("canon_id") == 5L && out(5L).getAs[Boolean]("kept"),
      "score tie must break to the smaller id")
    assert(out(7L).getAs[Long]("canon_id") == 5L && !out(7L).getAs[Boolean]("kept"))
    assert(out(5L).getAs[Double]("canon_score") == 0.5)
  }

  test("q108: one canonical per cluster, canonical dominates its members") {
    val rows = TrainingData.q108QualityCanon(spark, sf).collect()
    assert(rows.nonEmpty, "fixture must produce simhash clusters")
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, members) =>
      val kept = members.filter(_.getAs[Boolean]("kept"))
      assert(kept.length == 1, s"cluster $cid must keep exactly one member")
      val canon = kept.head
      members.foreach { m =>
        assert(m.getAs[Long]("canon_id") == canon.getAs[Long]("doc_id"))
        // canonical dominance: strictly higher quality, or equal quality
        // with the smaller (or same) id
        val cq = canon.getAs[Double]("canon_quality")
        val mq = m.getAs[Double]("quality")
        assert(cq > mq || (cq == mq &&
          canon.getAs[Long]("doc_id") <= m.getAs[Long]("doc_id")))
      }
    }
  }

  test("rebalance: kept counts hit every quota exactly; binding stratum keeps all") {
    val rows = TrainingData.q111Rebalance(spark, sf).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    val weights = TrainingData.RebWeights.toMap
    val wTotal = weights.values.sum
    // every stratum's kept count equals its integer quota
    byLang.foreach { case (lang, rs) =>
      val required = rs.head.getAs[Long]("required")
      assert(rs.length.toLong == required,
        s"$lang kept ${rs.length}, quota $required")
      assert(required <= rs.head.getAs[Long]("n_before"))
      // ranks are the contiguous global prefix 1..required per stratum
      assert(rs.map(_.getAs[Long]("rn")).sorted.toSeq == (1L to required),
        s"$lang ranks must be the contiguous bottom-$required prefix")
    }
    // the binding stratum keeps everything; at least one stratum is cut
    val binding = byLang.minBy { case (lang, rs) =>
      rs.head.getAs[Long]("n_before") * wTotal / weights(lang)
    }._2.head
    assert(binding.getAs[Long]("required") <= binding.getAs[Long]("n_before"))
    assert(byLang.exists { case (_, rs) =>
      rs.head.getAs[Long]("required") < rs.head.getAs[Long]("n_before")
    }, "rebalance must be non-vacuous — some stratum must be cut")
    // kept mixture matches the target weights within integer rounding:
    // |kept_s * W - w_s * T| < W for T = sum of kept
    val total = rows.length.toLong
    byLang.foreach { case (lang, rs) =>
      assert(math.abs(rs.length * wTotal - weights(lang) * total) < wTotal * 2,
        s"$lang share off target: ${rs.length}/$total vs ${weights(lang)}/$wTotal")
    }
  }

  test("q113: canonical funnel deletes exactly as many as the min-id funnel in total") {
    val canon = TrainingData.q113CanonFunnel(spark, sf).collect()
    val minId = TrainingData.q56NearDupFunnel(spark, sf).collect()
    // one survivor per cluster under either rule, so TOTAL deletions are
    // equal — but a cross-language cluster's surviving copy can sit in a
    // DIFFERENT language, so per-lang counts may shift (observed on the
    // fixture: en 93 → 92). The oracle gates the per-lang values; this
    // spec pins the conservation law and the upstream-stage identity.
    assert(canon.map(_.getAs[Long]("n_canon")).sum ==
      minId.map(_.getAs[Long]("n_neardup")).sum,
      "total survivors must be equal under either survivor rule")
    val mu = minId.map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_unique")).toMap
    canon.foreach { c =>
      assert(c.getAs[Long]("n_unique") == mu(c.getAs[String]("lang")),
        "stages upstream of the survivor rule must not move")
      assert(c.getAs[Long]("surv_id_sum") > 0L)
    }
  }

  test("funnel drift: v2 counts are the funnel's sampled set, drift non-vacuous") {
    val out = TrainingData.q106FunnelDrift(spark, sf).collect()
    // v2 side of the drift must be exactly the curation sample's counts —
    // the composition seam q106 gates (drift OVER the funnel, not beside it)
    val sampCounts = TrainingData.curationSampled(spark, sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    out.filter(_.getAs[Long]("is_total") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_new") ==
        sampCounts.getOrElse(r.getAs[String]("lang"), 0L))
    }
    // the mixture rates differ by language, so curation MUST move the
    // mixture: a zero-TV result means the drift is watching the wrong frame
    val tot = out.filter(_.getAs[Long]("is_total") == 1L).head
    assert(tot.getAs[Long]("drift_num") > 0L, "funnel drift must be non-vacuous")
    assert(tot.getAs[Long]("drift_num") ==
      out.filter(_.getAs[Long]("is_total") == 0L).map(_.getAs[Long]("drift_num")).sum)
  }

  test("negative samples: k per anchor, never self, ring arithmetic self-consistent") {
    val out = TrainingData.q119NegPairs(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(out.length == 3 * n, "every anchor draws exactly k negatives")
    // the output carries its own ring: (shard, rn) → doc_id from the
    // anchor rows is a total map, so the drawn negatives can be replayed
    // driver-side without re-deriving any hash
    val ring = out.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("rn")) ->
      r.getAs[Long]("doc_id")).toMap
    val shardSizes = out.groupBy(_.getAs[Long]("shard"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("rn")).max }
    out.foreach { r =>
      val (shard, rn, j) = (r.getAs[Long]("shard"), r.getAs[Long]("rn"), r.getAs[Long]("j"))
      val expRank = (rn - 1 + j) % shardSizes(shard) + 1
      assert(r.getAs[Long]("neg_rank") == expRank)
      assert(r.getAs[Long]("neg_doc_id") == ring((shard, expRank)))
      assert(r.getAs[Long]("neg_doc_id") != r.getAs[Long]("doc_id"),
        "ring distance ≤ k < shard size ⇒ no self-negatives")
    }
    // each anchor's k negatives are distinct (consecutive ring positions)
    out.groupBy(r => r.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("neg_doc_id")).distinct.length == rs.length)
    }
  }

  // ---- q128: E-S weighted sampling ----

  private def wsBucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"wsample:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("weighted sample replays exactly from the E-S formula, and the weights bite") {
    val pool = docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)].collect()
    def esKey(id: Long, w: Long): Double =
      math.log((wsBucket(id) + 1).toDouble / 4294967296.0) / w
    val expected = pool.filter(_._2 > 0)
      .map { case (id, w) => (id, esKey(id, w)) }
      .sortBy { case (id, k) => (-k, id) }.take(60).map(_._1).toSeq
    val got = TrainingData.q128WeightedSample(spark, sf)
      .orderBy(col("rank")).select(col("doc_id")).as[Long].collect().toSeq
    assert(got == expected)
    // weighting is non-vacuous: the uniform draw (w=1 for all) differs
    val uniform = pool.map { case (id, _) => (id, esKey(id, 1L)) }
      .sortBy { case (id, k) => (-k, id) }.take(60).map(_._1).toSet
    assert(got.toSet != uniform)
    // and longer docs are over-represented vs the corpus median length
    val median = pool.map(_._2).sorted.apply(pool.length / 2)
    assert(got.count(id => pool.find(_._1 == id).get._2 > median) > 30)
  }

  test("weighted stratified k == the per-stratum window formulation, and quantization is faithful") {
    val pool = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, String, Long)].collect().filter(_._3 > 0)
    def esKey(id: Long, w: Long): Double =
      math.log((wsBucket(id) + 1).toDouble / 4294967296.0) / w
    val expected = pool.groupBy(_._2).toSeq.flatMap { case (lang, rs) =>
      rs.map { case (id, _, w) => (id, esKey(id, w)) }
        .sortBy { case (id, k) => (-k, id) }.take(15).zipWithIndex
        .map { case ((id, _), i) => (lang, (i + 1).toLong, id) }
    }.toSet
    val got = TrainingData.q130WeightedTake(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
    // quantization faithfulness: floor((-key)·2^52) preserves the exact
    // double order on this pool (distinct keys -> distinct quanta)
    val quanta = pool.map { case (id, _, w) =>
      math.floor(-esKey(id, w) * 4503599627370496.0).toLong }
    assert(quanta.distinct.length == quanta.length)
  }

  test("dsir bucket counts are additive across any batch split") {
    val isT = col("source") === "src0"
    def counts(d: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      operators.Ranking.dsirBucketCounts(d, "text", isT, 64, "dsir")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val all = counts(docs)
    val cut = 250L
    val a = counts(docs.filter(col("doc_id") <= cut))
    val b = counts(docs.filter(col("doc_id") > cut))
    val folded = (a.keySet ++ b.keySet).map { k =>
      val (a1, a2) = a.getOrElse(k, (0L, 0L)); val (b1, b2) = b.getOrElse(k, (0L, 0L))
      k -> (a1 + b1, a2 + b2)
    }.toMap
    assert(folded == all)
    assert(all.size <= 64 && all.values.map(v => v._1 + v._2).sum > 1000)
  }

  test("sample ingest: state is the top-k of rows seen, under any schedule, replay, or order") {
    val pool = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    def esKey(id: Long, w: Long): Double =
      math.log((wsBucket(id) + 1).toDouble / 4294967296.0) / w
    val rows = pool.as[(Long, String, Long)].collect().filter(_._3 > 0)
    def expectedTop(ids: Set[Long]): Seq[Long] =
      rows.filter(r => ids(r._1))
        .map { case (id, _, w) => (id, esKey(id, w)) }
        .sortBy { case (id, k) => (-k, id) }.take(60).map(_._1).toSeq
    def readState(path: String): Seq[Long] =
      TrainingData.readSampleState(spark, path)
        .orderBy(col("qk").asc, col("doc_id").asc)
        .select(col("doc_id")).as[Long].collect().toSeq
    def fold(path: String, batches: Seq[org.apache.spark.sql.DataFrame]): Unit =
      batches.foreach(b => TrainingData.sampleIngest(spark, path, b,
        "doc_id", "n_chars", Seq("lang"), 60, "wsample"))
    val base = java.nio.file.Files.createTempDirectory("graft_si_spec_")
    try {
      val cut = rows.map(_._1).max / 2
      val d1 = pool.filter(col("doc_id") <= cut)
      val d2 = pool.filter(col("doc_id") > cut)
      // forward schedule, with a mid-fold invariant check
      val p1 = s"$base/fwd"
      fold(p1, Seq(d1))
      assert(readState(p1) == expectedTop(rows.map(_._1).filter(_ <= cut).toSet),
        "after day 1 the state is exactly day 1's top-k")
      fold(p1, Seq(d2))
      val whole = expectedTop(rows.map(_._1).toSet)
      assert(readState(p1) == whole)
      // reversed order + re-delivered slice + whole-batch replay: same state
      val p2 = s"$base/rev"
      fold(p2, Seq(d2, d1.unionByName(pool.filter(col("doc_id") % 5 === 0)), d2))
      assert(readState(p2) == whole,
        "top-k state is order-free, replay-absorbing, and split-invisible")
      // many-small-batches schedule over a subset barely above k
      val p3 = s"$base/drip"
      val sub = rows.map(_._1).sorted.take(70)
      fold(p3, sub.grouped(10).toSeq.map(g =>
        pool.filter(col("doc_id").isin(g: _*))))
      assert(readState(p3) == expectedTop(sub.toSet))
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("skyline2D equals the brute-force dominance set on crafted and randomized pools") {
    def brute(rows: Seq[(Long, Long, Long)]): Set[Long] =
      rows.filter { r =>
        !rows.exists(s =>
          (s._2 > r._2 && s._3 >= r._3) || (s._2 >= r._2 && s._3 > r._3))
      }.map(_._1).toSet
    def run(rows: Seq[(Long, Long, Long)]): Set[Long] =
      TrainingData.skyline2D(rows.toDF("id", "x", "y"), "x", "y")
        .select(col("id")).as[Long].collect().toSet
    // crafted: x-ties, y-ties, an exact (x, y) twin pair (both survive),
    // a strictly-dominated interior, and a corner that dominates a ray
    val crafted = Seq(
      (1L, 10L, 1L), (2L, 10L, 5L),           // x-tie: only the higher y lives
      (3L, 8L, 5L),                           // same y as 2, lower x: dominated
      (4L, 6L, 7L), (5L, 6L, 7L),             // exact twins: both survive
      (6L, 5L, 6L),                           // strictly inside: dominated
      (7L, 1L, 9L), (8L, 0L, 9L))             // y-tie at the far end
    assert(run(crafted) == brute(crafted))
    assert(run(crafted) == Set(2L, 4L, 5L, 7L))
    // randomized pools (fixed seeds), including heavy duplication
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val pool = (1L to 300L).map(i =>
        (i, rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      assert(run(pool) == brute(pool), s"seed=$seed")
    }
    // partitioned: each group's frontier is independent — equals the
    // brute force of each slice, and differs from the pooled frontier
    val rnd = new scala.util.Random(41)
    val gp = (1L to 200L).map(i =>
      (i, s"g${i % 3}", rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    val gotP = TrainingData.skyline2D(gp.toDF("id", "g", "x", "y"),
        "x", "y", partCols = Seq("g"))
      .select(col("id")).as[Long].collect().toSet
    val expP = gp.groupBy(_._2).values.flatMap { slice =>
      val s3 = slice.map(r => (r._1, r._3, r._4))
      brute(s3)
    }.toSet
    assert(gotP == expP)
    assert(gotP != brute(gp.map(r => (r._1, r._3, r._4))),
      "per-group frontiers keep rows the pooled frontier would dominate away")
  }

  test("skyline ingest: frontier state equals the whole-pool skyline under any schedule") {
    def brute(rows: Seq[(Long, Long, Long)]): Set[Long] =
      rows.filter { r =>
        !rows.exists(s =>
          (s._2 > r._2 && s._3 >= r._3) || (s._2 >= r._2 && s._3 > r._3))
      }.map(_._1).toSet
    val rnd = new scala.util.Random(13)
    val pool = (1L to 240L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    def df(rows: Seq[(Long, Long, Long)]) = rows.toDF("id", "x", "y")
    def readState(path: String): Set[Long] =
      TrainingData.readSkylineState(spark, path)
        .select(col("id")).as[Long].collect().toSet
    def fold(path: String, batches: Seq[Seq[(Long, Long, Long)]]): Unit =
      batches.foreach(b => TrainingData.skylineIngest(spark, path, df(b),
        "id", "x", "y", Seq.empty))
    val base = java.nio.file.Files.createTempDirectory("graft_sky_spec_")
    try {
      val (a, b) = pool.partition(_._1 <= 120)
      val whole = brute(pool)
      // forward, with a mid-fold invariant
      val p1 = s"$base/fwd"
      fold(p1, Seq(a))
      assert(readState(p1) == brute(a), "after batch 1 the state is batch 1's skyline")
      fold(p1, Seq(b))
      assert(readState(p1) == whole)
      // reversed + re-delivered slice + whole-batch replay
      val p2 = s"$base/rev"
      fold(p2, Seq(b, a ++ pool.filter(_._1 % 5 == 0), b))
      assert(readState(p2) == whole,
        "frontier state is order-free, replay-absorbing, and split-invisible")
      // eviction is forever: a dominated row from batch 1 never returns
      val interior = a.find(r => !whole.contains(r._1))
      assert(interior.isDefined)
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("curriculum: decomposed global rank equals the single global window, phases balanced") {
    val rnd = new scala.util.Random(5)
    // heavy score duplication so the decomposition (cum_before + in-group
    // rank) is actually exercised across group boundaries
    val pool = (1L to 500L).map(i => (i, rnd.nextInt(12).toLong))
    val got = TrainingData.curriculumPhases(
        pool.toDF("id", "score"), "id", "score", 4, "curric")
      .select(col("id"), col("global_rank"), col("phase"), col("pos"))
      .as[(Long, Long, Long, Long)].collect()
    // driver-side single global sort: score DESC, id ASC
    val expRank = pool.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    got.foreach { case (id, gr, ph, _) =>
      assert(gr == expRank(id), s"id=$id")
      assert(ph == (gr - 1) * 4 / 500)
    }
    // phases are equal-sized; positions are dense 1..N within each phase
    val byPhase = got.groupBy(_._3)
    assert(byPhase.keySet == Set(0L, 1L, 2L, 3L))
    byPhase.values.foreach { rs =>
      assert(rs.length == 125)
      assert(rs.map(_._4).sorted.toSeq == (1L to 125L))
    }
    // within-phase order is the hash shuffle, not the score order
    val p0 = byPhase(0L).sortBy(_._4).map(_._1)
    assert(p0 != byPhase(0L).sortBy(r => expRank(r._1)).map(_._1).toSeq,
      "a phase whose stream order equals the score order defeats the shuffle")
  }

  test("neyman allocation: exact replay, budget conservation, variance steers the budget") {
    // three strata, same size, very different metric variance
    val rnd = new scala.util.Random(11)
    val pool =
      (1L to 300L).map(i => (i, "flat", 5000L)) ++                       // sd 0
      (301L to 600L).map(i => (i, "mid", 5000L + rnd.nextInt(201) - 100L)) ++
      (601L to 900L).map(i => (i, "wild", rnd.nextInt(10001).toLong))    // sd ~2900
    val out = TrainingData.neymanAllocate(
        pool.toDF("id", "stratum", "x"), "id", "stratum", col("x"), 60, "neyman")
      .collect()
    val alloc = out.map(r => r.getAs[String]("stratum") -> r.getAs[Long]("k_alloc"))
      .toMap
    // driver-side replay of the whole allocation
    val g = pool.groupBy(_._2).map { case (s, rs) =>
      val n = rs.size.toLong; val s1 = rs.map(_._3).sum
      val s2 = rs.map(r => r._3 * r._3).sum
      s -> (n, math.sqrt((n * s2 - s1 * s1).toDouble))
    }
    val wt = g.values.map(_._2).sum
    val exact = g.map { case (s, (n, w)) => s -> 60 * w / wt }
    val base = exact.map { case (s, e) => s -> e.toLong }
    val rem = (60L - base.values.sum).toInt
    val order = exact.toSeq.map { case (s, e) => (s, e - math.floor(e)) }
      .sortBy { case (s, f) => (-f, s) }.map(_._1)
    val expK = base.map { case (s, b) =>
      s -> math.min(g(s)._1, b + (if (order.indexOf(s) < rem) 1L else 0L)) }
    // the operator emits DRAWN rows, so a k=0 stratum has no output row
    assert(alloc == expK.filter(_._2 > 0))
    // the budget is fully spent (no stratum hit its cap here)
    assert(alloc.values.sum == 60L)
    // Neyman's point: the zero-variance stratum gets NOTHING, the wild
    // one gets far more than the proportional 20
    assert(expK("flat") == 0L && !alloc.contains("flat"))
    assert(alloc("wild") > 30L)
    // per-stratum draw sizes match the allocation
    val sizes = out.groupBy(_.getAs[String]("stratum")).map { case (s, rs) =>
      s -> rs.length.toLong }
    assert(sizes.filterNot(_._2 == 0) == alloc.filterNot(_._2 == 0))
  }

  test("walk-forward splits: growing train windows, embargoed gaps swallow boundary events") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(hours: Int) = new java.sql.Timestamp(t0.getTime + hours * 3600000L)
    // 0..96h, one event per hour; 2 folds over the range with a 6h embargo:
    // cuts at 32h and 64h; fold 1 tests [38h, 64h), fold 2 tests [70h, 97h]
    val ev = (0 to 96).map(h => (h.toLong, ts(h))).toDF("event_id", "ts")
    val out = TrainingData.walkForwardSplits(ev, "ts", 2, 6 * 3600L)
      .collect().map(r => r.getAs[Long]("fold") ->
        (r.getAs[Long]("train_n"), r.getAs[Long]("test_n"),
         r.getAs[Long]("embargo_ok"))).toMap
    // fold 1: train hours 0..31 (32), test hours 38..63 (26); hours
    // 32..37 fall INSIDE the embargo and belong to neither set
    assert(out(1L) == ((32L, 26L, 1L)))
    // fold 2: train 0..63 (64) — walk-forward means strictly MORE train
    // data than fold 1 — test 70..96 (27)
    assert(out(2L) == ((64L, 27L, 1L)))
    // the embargo actually swallows rows: per fold, train+test < total
    assert(32L + 26L < 97L && 64L + 27L < 97L)
  }

  test("E-S key separation: adjacent keys differ by far more than an ulp") {
    val pool = docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)].collect().filter(_._2 > 0)
    val keys = pool.map { case (id, w) =>
      math.log((wsBucket(id) + 1).toDouble / 4294967296.0) / w
    }.sorted
    val minGap = keys.sliding(2).map(p => p(1) - p(0)).min
    assert(minGap > 1e-9,
      s"two E-S keys sit $minGap apart — a cross-engine ln ulp could flip the order")
  }

  test("group-aware split: no cluster straddles the train/test wall, non-vacuously") {
    val got = TrainingData.q181GroupSplit(spark, sf)
      .select(col("cluster_id"), col("split"))
      .groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("n_splits"),
        count(lit(1)).as("n_docs"))
    import spark.implicits._
    val multi = got.filter($"n_docs" > 1)
    assert(multi.count() > 0,
      "fixture must carry at least one multi-doc near-dup cluster")
    val leaked = got.filter($"n_splits" > 1).count()
    assert(leaked == 0, s"$leaked clusters straddle splits")
    // and the doc-hash split (q63) WOULD leak on this fixture — the
    // operator exists because the naive split demonstrably fails here
    val naive = TrainingData.q63HashSplit(spark, sf)
      .join(TrainingData.q181GroupSplit(spark, sf)
        .select($"doc_id", $"cluster_id"), Seq("doc_id"))
      .groupBy($"cluster_id")
      .agg(countDistinct($"split").as("n_splits"))
      .filter($"n_splits" > 1)
    assert(naive.count() > 0,
      "vacuous gate: the doc-hash split does not leak on this fixture")
  }
}

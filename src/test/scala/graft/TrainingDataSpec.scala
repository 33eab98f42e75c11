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
}

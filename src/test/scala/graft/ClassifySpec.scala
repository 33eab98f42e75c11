package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Pins for the NB classifier and PMI collocations beyond the oracle
  * gate (the gate proves count/smooth/argmax arithmetic vs DuckDB on
  * the no-signal fixture; these prove the operator LEARNS when there
  * is signal, degrades to the prior when a doc is empty, and computes
  * PMI a hand-derivation agrees with). */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def labeled = Seq(
    // "pos" docs carry "good", "neg" docs carry "bad" — fully separable
    (1L, "pos", "good good fine story"), (2L, "pos", "good day good work"),
    (3L, "pos", "a good one"), (4L, "neg", "bad bad ending"),
    (5L, "neg", "very bad story"), (6L, "neg", "bad bad bad day"),
  ).toDF("doc_id", "lang", "text")

  test("NB learns a separable signal and scores held-out docs correctly") {
    val (classes, lam) = Classify.nbTrain(labeled, "lang", "text")
    val test = Seq((10L, "good good good news"), (11L, "bad bad news"))
      .toDF("doc_id", "text")
    val got = Classify.nbScore(test, "doc_id", "text", classes, lam)
      .select($"id", $"label").as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "pos", 11L -> "neg"), s"argmax: $got")
  }

  test("an empty document survives scoring and takes the prior argmax") {
    // priors: neg trains on 3 docs, pos on 3 — tip the prior with a 4th neg
    val (classes, lam) = Classify.nbTrain(
      labeled.unionByName(Seq((7L, "neg", "so bad")).toDF("doc_id", "lang", "text")),
      "lang", "text")
    val got = Classify.nbScore(
        Seq((20L, "...")).toDF("doc_id", "text"), // trims to zero tokens
        "doc_id", "text", classes, lam)
      .select($"id", $"label", $"n_tokens").as[(Long, String, Long)].collect()
    assert(got.toSeq == Seq((20L, "neg", 0L)), s"prior argmax: ${got.toSeq}")
  }

  test("NB model frames stay model-sized and broadcast into the score plan") {
    val (classes, lam) = Classify.nbTrain(labeled, "lang", "text")
    assert(classes.count() == 2 && lam.count() <= 2L * Classify.NbBuckets)
    val plan = Classify.nbScore(labeled, "doc_id", "text", classes, lam)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"),
      s"model joins must broadcast:\n$plan")
  }

  test("NB count state is additive: split-fold equals whole-corpus counts") {
    val (lcAll, dcAll) = Classify.nbCounts(labeled, "lang", "text")
    val (lcA, dcA) = Classify.nbCounts(
      labeled.filter($"doc_id" <= 3), "lang", "text")
    val (lcB, dcB) = Classify.nbCounts(
      labeled.filter($"doc_id" > 3), "lang", "text")
    val lcFold = lcA.unionByName(lcB)
      .groupBy($"label", $"bk").agg(sum($"c").as("c"))
    val dcFold = dcA.unionByName(dcB)
      .groupBy($"label").agg(sum($"d_l").as("d_l"))
    assert(lcFold.exceptAll(lcAll).isEmpty && lcAll.exceptAll(lcFold).isEmpty)
    assert(dcFold.exceptAll(dcAll).isEmpty && dcAll.exceptAll(dcFold).isEmpty)
  }

  test("PMI ranks the engineered collocation first, exact micro-nats") {
    // "ad hoc" always co-occurs (5 times, min support); every other
    // adjacency is diluted across partners, so pmi(ad, hoc) is maximal
    val docs = (1 to 5).map(i => (i.toLong, s"ad hoc w$i x$i ad hoc"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_classify_")
    try {
      // q174 reads the documents table — stage the fixture as one
      docs.select("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$tmp/documents.parquet")
      val top = Classify.q174PmiCollocations(spark, tmp.toString)
        .select($"rank", $"t1", $"t2", $"c_xy", $"c_x", $"c_y", $"pmi_micro")
        .as[(Int, String, String, Long, Long, Long, Long)].collect()
      // pairs with support >= 5: (ad,hoc) x10 and (hoc,ad)... hoc->w_i
      // varies per doc, so only (ad,hoc) survives the support cut
      assert(top.length == 1 && top.head._2 == "ad" && top.head._3 == "hoc",
        s"top pairs: ${top.toSeq}")
      val (_, _, _, cxy, cx, cy, pmi) = top.head
      assert(cxy == 10L && cx == 10L && cy == 10L)
      // hand derivation: N = 30 tokens, M = 25 bigrams,
      // pmi = ln10 - ln25 - ln10 - ln10 + 2 ln30
      def ln(x: Long) = math.round(math.log(x.toDouble) * 1000000L)
      assert(pmi == ln(10) - ln(25) - ln(10) - ln(10) + 2 * ln(30),
        s"pmi_micro: $pmi")
    } finally {
      val fs = new org.apache.hadoop.fs.Path(tmp.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp.toString), true)
    }
  }

  test("margin reliability: bins partition the test set; the cumulative fold runs top-down") {
    val (classes, lam) = Classify.nbTrain(labeled, "lang", "text")
    val test = Seq((10L, "pos", "good good good news"), (11L, "pos", "bad bad news"),
      (12L, "neg", "bad ending"), (13L, "neg", "good fine")).toDF("doc_id", "lang", "text")
    val rep = Classify.marginReliability(test, "doc_id", "text", "lang",
      classes, lam, binMicro = 500000L, maxBin = 4L).collect()
    assert(rep.map(_.getAs[Long]("n")).sum == 4L, "bins must partition the test docs")
    val byBin = rep.sortBy(_.getAs[Long]("bin"))
    assert(byBin.head.getAs[Long]("cum_n") == 4L,
      "the lowest bin's cumulative row covers the whole test set")
    val cums = byBin.map(_.getAs[Long]("cum_n"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a >= b },
      s"cum_n must fall as the margin threshold rises: ${cums.toSeq}")
    assert(rep.forall(r => r.getAs[Long]("bin") >= 0 && r.getAs[Long]("bin") <= 4))
  }

  test("margin reliability: a single-class model degrades to margin 0, never null") {
    val (classes, lam) = Classify.nbTrain(labeled.filter($"lang" === "pos"), "lang", "text")
    val test = Seq((10L, "pos", "anything here"), (11L, "neg", "else entirely"))
      .toDF("doc_id", "lang", "text")
    val rep = Classify.marginReliability(test, "doc_id", "text", "lang", classes, lam)
      .collect()
    assert(rep.length == 1 && rep.head.getAs[Long]("bin") == 0L, "one zero-margin bin")
    assert(rep.head.getAs[Long]("n") == 2L && rep.head.getAs[Long]("n_correct") == 1L)
  }

  test("label propagation: frontier rounds, majority vote, deterministic ties, clamped seeds") {
    val seeds = Seq((1L, "a"), (5L, "b"), (6L, "b")).toDF("id", "lab")
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain: 2,3,4 labeled at rounds 1,2,3
      (5L, 7L), (6L, 7L), (1L, 7L), // 7 sees b,b,a → majority b
      (1L, 8L), (5L, 8L)            // 8 sees a,b 1-1 → tie breaks to 'a'
    ).toDF("id1", "id2")
    val out = Classify.labelPropagation(seeds, "id", "lab", pairs, rounds = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("a", 0L)) && out(5L) == (("b", 0L)) && out(6L) == (("b", 0L)))
    assert(out(2L) == (("a", 1L)) && out(3L) == (("a", 2L)) && out(4L) == (("a", 3L)))
    assert(out(7L) == (("b", 1L)), s"majority vote: ${out(7L)}")
    assert(out(8L) == (("a", 1L)), s"tie must break label-ascending: ${out(8L)}")
  }

  test("label propagation: components with no seed stay unlabeled; seeds never flip") {
    val seeds = Seq((1L, "z")).toDF("id", "lab")
    val pairs = Seq((2L, 3L)).toDF("id1", "id2") // disjoint from the seed
    val out = Classify.labelPropagation(seeds, "id", "lab", pairs, 2).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L), "2 and 3 are unreachable")
    assert(out.head.getString(1) == "z" && out.head.getLong(2) == 0L)
  }
}

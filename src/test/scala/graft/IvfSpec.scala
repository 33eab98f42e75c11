package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, SimilarityQueries}

/** IVF ANN: structure (every vector in exactly one list), query contract
  * (k ranked neighbors, self excluded), and recall against the exact KNN
  * ground truth. Recall bounds are generous — k-means on floating point
  * is only loosely deterministic across partitionings. */
class IvfSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), col("embedding").as("v"))

  test("index assigns every vector to exactly one of nlist lists") {
    val index = Ivf.build(emb, "id", "v", nlist = 8)
    val n = emb.count()
    assert(index.assigned.count() == n)
    val lists = index.assigned.select("list_id").distinct().collect().map(_.getInt(0))
    assert(lists.forall(l => l >= 0 && l < 8))
    assert(index.assigned.groupBy("id").count().filter(col("count") > 1).count() == 0)
  }

  test("probing all lists reproduces exact KNN exactly") {
    val index = Ivf.build(emb, "id", "v", nlist = 8)
    val ivfAll = Ivf.topK(spark, index, emb.filter(col("id") < 10), k = 10, nprobe = 8)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk")) ->
        r.getAs[Long]("neighbor_id")).toMap
    val exact = SimilarityQueries.q22KnnExact(spark, sf)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk")) ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(ivfAll == exact, "nprobe = nlist must equal brute force")
  }

  test("topK returns k ranked neighbors per query, self excluded, with decent mean recall") {
    val index = Ivf.build(emb, "id", "v", nlist = 16)
    val rows = Ivf.topK(spark, index, emb.filter(col("id") < 10), k = 10, nprobe = 4)
      .collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 10, s"query $q")
      assert(rs.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to 10L), s"query $q ranks")
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q))
    }
    val exact = SimilarityQueries.q22KnnExact(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val recalls = byQ.map { case (q, rs) =>
      val got = rs.map(_.getAs[Long]("neighbor_id")).toSet
      (got & exact(q)).size.toDouble / 10
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3,
      f"mean recall@10 probing 4/16 lists should beat random scanning; got $mean%.2f")
  }

  test("q28 gate row: anchors match the oracle formula and recall_ok holds") {
    val rows = Ivf.q28IvfAnn(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows(0)
    val n = emb.count()
    assert(r.getAs[Long]("n_queries") == 10L)
    assert(r.getAs[Long]("n_exact_total") == 10L * math.min(10L, n - 1))
    assert(r.getAs[Boolean]("recall_ok"),
      "micro-averaged recall@10 fell below the gate bound")
  }

  test("k-means fit runs on a bounded sample, not the full corpus") {
    // with a tiny cap the fit set is a sample; the index must still
    // assign EVERY corpus vector and keep topK functional
    val index = Ivf.build(emb, "id", "v", nlist = 4, fitSampleRows = 50)
    assert(index.assigned.count() == emb.count(),
      "assignment must cover the full corpus even when the fit sampled")
    val out = Ivf.topK(spark, index, emb.filter(col("id") < 3), k = 5, nprobe = 4)
    assert(out.groupBy("q_id").count().collect().forall(_.getLong(1) == 5))
  }

  test("probe join broadcasts the probes — the corpus never shuffles on list_id") {
    val index = Ivf.build(emb, "id", "v", nlist = 16)
    val p = Ivf.topK(spark, index, emb.filter(col("id") < 10), k = 10, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"probes must broadcast against the assigned corpus:\n$p")
    // permitted exchanges: the per-query top-k window (+ final orderBy
    // range exchange); the corpus-side join must add none on list_id
    assert(!p.contains("Exchange hashpartitioning(list_id"),
      s"corpus must not shuffle on the 16-value list_id key:\n$p")
  }

  test("written index layout prunes to the probed lists at the scan") {
    val index = Ivf.build(emb, "id", "v", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Ivf.writeIndex(index, dir)
    val reopened = Ivf.readIndex(spark, index.model, dir)
    val probedScan = reopened.assigned.filter(col("list_id").isin(0, 3))
      .select(col("id"), col("v"))
    val p = probedScan.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [list_id"),
      s"probed lists must prune directories, not filter rows:\n$p")
    // the pruned read still returns exactly those lists' vectors
    val expected = index.assigned.filter(col("list_id").isin(0, 3)).count()
    assert(probedScan.count() == expected && expected > 0)
  }

  test("incremental ingest equals batch assignment under out-of-order re-delivery") {
    val index = Ivf.build(emb.filter(col("id") % 3 === 0), "id", "v", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_ing").toString
    Ivf.writeIndex(index, dir)
    // three arrival waves, out of id order, each re-delivering rows the
    // earlier waves (and the initial build) already carried
    val waves = Seq(
      emb.filter(col("id") % 3 === 2),
      emb.filter(col("id") % 3 === 1).union(emb.filter(col("id") % 6 === 0)),
      emb.filter(col("id") % 3 === 2).union(emb.filter(col("id") % 3 === 1)))
    waves.foreach(w => Ivf.ingest(spark, dir, index.model, w, "id", "v"))
    val got = Ivf.readIndexFrame(spark, dir).select("id", "list_id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("list_id")).sorted
    val want = index.model.transform(
        emb.withColumn("features",
          org.apache.spark.ml.functions.array_to_vector(col("v"))))
      .select("id", "list_id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("list_id")).sorted
    assert(got.sameElements(want),
      "any-arrival-order ingest must equal one batch assignment, no dup rows")
  }

  test("post-ingest recall sits well above the q89 gate band") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id").as("id"), col("embedding").as("v"))
    val cut = emb.agg(max(col("id"))).head().getLong(0) / 2
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_recall_")
    try {
      val built = Ivf.build(emb.filter(col("id") <= cut), "id", "v", nlist = 16, fitSampleRows = 20000)
      Ivf.writeIndex(built, idx.toString)
      Ivf.ingest(spark, idx.toString, built.model, emb.filter(col("id") > cut), "id", "v")
      val grown = Ivf.readIndex(spark, built.model, idx.toString)
      val ivf = Ivf.topK(spark, grown, emb.filter(col("id") < 10), k = 10, nprobe = 4)
        .select(col("q_id"), col("neighbor_id")).withColumn("hit", lit(1))
      val exact = graft.operators.SimilarityQueries.q22KnnExact(spark, sf)
        .select(col("q_id"), col("neighbor_id"))
      val r = exact.join(ivf, Seq("q_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)))
        .head().getDouble(0)
      // the q89 gate band is 0.25; a day-1-fit quantizer serving the whole
      // corpus must clear it with real margin or the gate is a coin flip
      assert(r >= 0.35, s"post-ingest recall $r too close to the 0.25 band")
    } finally {
      val p = new org.apache.hadoop.fs.Path(idx.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("the ingest dedup probe prunes the index read to the batch's lists") {
    val index = Ivf.build(emb, "id", "v", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_prn").toString
    Ivf.writeIndex(index, dir)
    // step 3's probe shape for a batch touching two lists: the fixed
    // quantizer guarantees re-delivered ids land in their original
    // list, which is what makes this pruning CORRECT, not just fast.
    // Pruning is METADATA-level under the manifest layout — only the
    // probed lists' mapped dirs are ever listed, stronger than a
    // partition filter over a full listing
    val pruned = Ivf.readIndexLists(spark, dir, Some(Seq(0, 3))).get
    assert(pruned.inputFiles.nonEmpty && pruned.inputFiles.forall(f =>
      f.contains("list_id=0") || f.contains("list_id=3")),
      s"the anti-join's index side must read only the probed lists' dirs:\n" +
        pruned.inputFiles.mkString("\n"))
    val expected = index.assigned
      .filter(col("list_id").isin(Integer.valueOf(0), Integer.valueOf(3)))
      .count()
    assert(pruned.count() == expected && expected > 0)
    // a probe for only-unmapped lists reads nothing and says so
    assert(Ivf.readIndexLists(spark, dir, Some(Seq(999))).isEmpty)
  }

  // --- sketch + exact re-rank (q167) --------------------------------------

  private def sketchedIndexDir(): String = {
    val index = Ivf.build(emb, "id", "v", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_sk").toString
    Ivf.writeIndexSketched(index, dir, Ivf.sketchPlanes(64))
    dir
  }

  test("native SrpSketch equals the composed 256-dot column form bit-for-bit") {
    val planes = Ivf.sketchPlanes(64)
    val both = emb.select(col("id"),
        Ivf.srpSketch(col("v"), planes).as("native"),
        Ivf.srpSketchHof(col("v"), planes).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1).toList == r.getSeq[Long](2).toList,
        s"sketch mismatch for id=${r.getAs[Long]("id")}")
    }
  }

  test("sketch re-rank with candPool = corpus reproduces exact KNN exactly") {
    val dir = sketchedIndexDir()
    try {
      val n = emb.count().toInt
      val got = Ivf.topKSketchRerank(spark, dir, emb.filter(col("id") < 10),
          k = 10, candPool = n, planes = Ivf.sketchPlanes(64))
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk")) ->
          (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toMap
      val exact = SimilarityQueries.q22KnnExact(spark, sf)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk")) ->
          (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toMap
      assert(got == exact,
        "candPool >= corpus must equal brute force incl. rounded cosines")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("sketch re-rank hits are monotone in candPool and high at the gate pool") {
    val dir = sketchedIndexDir()
    try {
      val exact = SimilarityQueries.q22KnnExact(spark, sf)
        .collect().groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
      val hits = Seq(16, 32, 64, 128).map { c =>
        val got = Ivf.topKSketchRerank(spark, dir, emb.filter(col("id") < 10),
            k = 10, candPool = c, planes = Ivf.sketchPlanes(64)).collect()
        c -> got.count(r =>
          exact(r.getAs[Long]("q_id")).contains(r.getAs[Long]("neighbor_id")))
      }
      val vals = hits.map(_._2)
      assert(vals.zip(vals.tail).forall { case (a, b) => b >= a },
        s"hits must be monotone in candPool: $hits")
      val total = exact.values.map(_.size).sum
      assert(vals.last >= (total * 0.95).ceil.toInt,
        s"candPool=128 recall ${vals.last}/$total below the 0.95 regime")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("sketch pass column-prunes and the re-rank point-read pushes an In filter") {
    val dir = sketchedIndexDir()
    try {
      // stage 1's scan shape: only (id, sk) decode — the ⅛-bytes claim
      val s1 = Ivf.readIndexFrame(spark, dir).select(col("id"), col("sk"))
        .queryExecution.executedPlan.toString
      assert(s1.contains("ReadSchema") && !s1.contains("v:array"),
        s"sketch scan must not decode the vector column:\n$s1")
      // stage 2's scan shape: literal IN pushed to the parquet source —
      // the row-group point-read claim on id-sorted list files
      val s2 = Ivf.readIndexFrame(spark, dir)
        .filter(col("id").isin((1L to 40L).map(java.lang.Long.valueOf): _*))
        .select(col("id"), col("v"), col("nrm"))
        .queryExecution.executedPlan.toString
      assert(s2.contains("PushedFilters: [In(id"),
        s"re-rank point-read must push the candidate IN filter:\n$s2")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("ingest into a sketched layout keeps appended rows sketch-complete; mismatch throws") {
    val planes = Ivf.sketchPlanes(64)
    val cut = emb.agg(max(col("id"))).head().getLong(0) / 2
    val index = Ivf.build(emb.filter(col("id") <= cut), "id", "v", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_ski").toString
    try {
      Ivf.writeIndexSketched(index, dir, planes)
      // plain ingest into a sketched layout must fail loudly, not mix schemas
      intercept[IllegalArgumentException] {
        Ivf.ingest(spark, dir, index.model, emb.filter(col("id") > cut), "id", "v")
      }
      val n = Ivf.ingest(spark, dir, index.model, emb.filter(col("id") > cut),
        "id", "v", planes = Some(planes))
      assert(n > 0)
      val after = Ivf.readIndexFrame(spark, dir)
      assert(after.filter(col("sk").isNull).count() == 0,
        "every appended row must carry the sketch")
      // the sketch path still answers over the grown layout, endpoint-exact
      val total = emb.count().toInt
      val got = Ivf.topKSketchRerank(spark, dir, emb.filter(col("id") < 10),
          k = 10, candPool = total, planes = planes)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk")) ->
          r.getAs[Long]("neighbor_id")).toMap
      val exact = SimilarityQueries.q22KnnExact(spark, sf)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk")) ->
          r.getAs[Long]("neighbor_id")).toMap
      assert(got == exact, "grown sketched layout must stay endpoint-exact")
      // and sketching into a PLAIN layout also fails loudly
      val plainDir = java.nio.file.Files.createTempDirectory("graft_ivf_pl").toString
      try {
        Ivf.writeIndex(index, plainDir)
        intercept[IllegalArgumentException] {
          Ivf.ingest(spark, plainDir, index.model, emb.limit(1), "id", "v",
            planes = Some(planes))
        }
      } finally {
        val pp = new org.apache.hadoop.fs.Path(plainDir)
        pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("refit preserves every payload column (incl. the sketch) and re-lays by the new model") {
    val dir = sketchedIndexDir() // nlist=8 layout WITH the sk column
    try {
      val before = Ivf.readIndexFrame(spark, dir)
        .select(col("id"), col("v"), col("nrm"), col("sk")).collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Float](1), r.getDouble(2),
          r.getSeq[Long](3)))).toMap
      val model2 = Ivf.refit(spark, dir, nlist = 4)
      val after = Ivf.readIndexFrame(spark, dir)
      assert(after.columns.toSet == Set("id", "v", "nrm", "sk", "list_id"))
      val lists = after.select("list_id").distinct().collect().map(_.getInt(0))
      assert(lists.forall(l => l >= 0 && l < 4), s"new layout lists: ${lists.toSeq}")
      val got = after.select(col("id"), col("v"), col("nrm"), col("sk")).collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Float](1), r.getDouble(2),
          r.getSeq[Long](3)))).toMap
      assert(got == before, "refit must carry every payload column untouched")
      // assignments match the new model exactly (determinism restored)
      import org.apache.spark.ml.functions.array_to_vector
      val expect = model2.transform(after.drop("list_id")
          .withColumn("features", array_to_vector(col("v"))))
        .select(col("id"), col("list_id").as("e_list"))
      assert(after.select(col("id"), col("list_id")).join(expect, "id")
        .filter(col("list_id") =!= col("e_list")).count() == 0)
      // the rebuild refreshed the drift baseline ATOMICALLY with the
      // layout commit: the nightly localized tool measures zero drift
      // right after a full refit
      assert(Ivf.hasMeansBaseline(spark, dir),
        "refit must re-commit the localized baseline with the layout")
      val (_, drifted) = Ivf.refitLocalized(spark, dir,
        Ivf.centroidsOf(model2), epsilon = 0.05)
      assert(drifted.isEmpty, s"fresh refit must measure zero drift: $drifted")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("a crashed mutation (generation written, commit never published) is invisible; vacuum sweeps") {
    import spark.implicits._
    val index = Ivf.build(emb, "id", "v", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_crash").toString + "/idx"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      Ivf.writeIndex(index, dir)
      val n = Ivf.readIndexFrame(spark, dir).count()
      // a refit/ingest that died after its data write, before its commit
      Seq((999999L, Seq(1f, 2f), 1.0)).toDF("id", "v", "nrm")
        .write.parquet(s"$dir/g-crashed0/list_id=0")
      assert(Ivf.readIndexFrame(spark, dir).count() == n,
        "an uncommitted generation must be invisible to every read")
      assert(Ivf.vacuumIndex(spark, dir) == Seq("g-crashed0"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/g-crashed0")))
      assert(Ivf.readIndexFrame(spark, dir).count() == n)
    } finally fs.delete(p.getParent, true)
  }

  test("concurrent ingests: the loser re-derives — no id lands twice, none lost") {
    val cut = emb.agg(max(col("id"))).head().getLong(0) / 2
    val index = Ivf.build(emb.filter(col("id") <= cut), "id", "v", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_race").toString + "/idx"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      Ivf.writeIndex(index, dir)
      // writer B delivers the even ids PLUS some of A's odd ids; B
      // commits between A's anti-join and A's publish
      val dayA = emb.filter(col("id") > cut && col("id") % 2 === 1)
      val dayB = emb.filter(col("id") > cut)
        .filter(col("id") % 2 === 0 || col("id") % 5 === 0)
      Ivf.ingest(spark, dir, index.model, dayA, "id", "v",
        beforePublish = () =>
          { Ivf.ingest(spark, dir, index.model, dayB, "id", "v"); () })
      val got = Ivf.readIndexFrame(spark, dir)
      assert(got.count() == emb.count(), "no row lost under contention")
      assert(got.groupBy("id").count().filter(col("count") > 1).count() == 0,
        "a stale anti-join must not land an id twice")
      // exactly one commit per writer: build + B + A
      assert(graft.sinks.CommitLog.seqs(fs, p).size == 3)
    } finally fs.delete(p.getParent, true)
  }

  test("the legacy rename-swap layout fails loudly instead of reading as absent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_leg").toString + "/idx"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      emb.limit(5).withColumn("nrm", lit(1.0)).withColumn("list_id", lit(0))
        .write.partitionBy("list_id").parquet(dir)
      intercept[IllegalStateException] { Ivf.readIndexFrame(spark, dir) }
    } finally fs.delete(p.getParent, true)
  }

  test("q168 gate row: refit keeps contents, re-establishes assignment, still answers") {
    val r = Ivf.q168IvfRefit(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_vectors") == emb.count())
    assert(r(0).getAs[Boolean]("contents_match"), s"contents: ${r(0)}")
    assert(r(0).getAs[Boolean]("assign_match"), s"assign: ${r(0)}")
    assert(r(0).getAs[Boolean]("recall_ok"), s"recall: ${r(0)}")
  }

  test("q167 gate rows: anchors, cost, monotone, hi-recall, endpoint booleans") {
    val rows = Ivf.q167SketchRerank(spark, sf).collect()
    val n = emb.count()
    val hiPool = math.max(128L, n / 8)
    assert(rows.map(_.getAs[Long]("cand_pool")).toSeq ==
      ((Seq(16L, 32L, 64L, 128L) :+ hiPool).filter(_ < n) :+ n).distinct.sorted)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vectors") == n)
      assert(r.getAs[Boolean]("cost_ok"), s"cost_ok: $r")
      assert(r.getAs[Boolean]("monotone_ok"), s"monotone_ok: $r")
      assert(r.getAs[Boolean]("hi_recall_ok"), s"hi_recall_ok: $r")
      assert(r.getAs[Boolean]("full_exact_ok"), s"full_exact_ok: $r")
    }
  }

  test("localized refit touches only drifted lists; zero-drift is a no-op") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_local_")
    val root = new org.apache.hadoop.fs.Path(s"$base/idx")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val built = Ivf.build(emb, "id", "v", nlist = 8, fitSampleRows = 20000)
      Ivf.writeIndex(built, root.toString)
      Ivf.snapshotListMeans(spark, root.toString)
      def fp() = Ivf.listDirFingerprints(spark, root.toString)
      // zero drift: nothing moved since the snapshot — a no-op
      val before0 = fp()
      val (c0, d0) = Ivf.refitLocalized(spark, root.toString,
        Ivf.centroidsOf(built.model), epsilon = 0.05)
      assert(d0.isEmpty, s"no list drifted, got $d0")
      assert(c0 == Ivf.centroidsOf(built.model))
      assert(fp() == before0, "zero-drift refit must not touch any dir")
      // drift one region: shifted copies land in few lists
      val batch = emb.filter(col("id") % 4 === 0)
        .select((col("id") + 1000000L).as("id"),
          transform(col("v"), x => x + lit(0.6f)).as("v"))
      Ivf.ingest(spark, root.toString, built.model, batch, "id", "v")
      val before = fp()
      val nAll = Ivf.readIndexFrame(spark, root.toString).count()
      val (c1, drifted) = Ivf.refitLocalized(spark, root.toString,
        Ivf.centroidsOf(built.model), epsilon = 0.05)
      assert(drifted.nonEmpty && drifted.size < before.size,
        s"drift must be localized: $drifted of ${before.size}")
      val after = fp()
      before.keys.filterNot(drifted.toSet)
        .foreach(l => assert(after.get(l).contains(before(l)),
          s"undrifted list $l must keep its exact dirs and files"))
      // a drifted list's append history collapses to ONE dir
      drifted.foreach(l =>
        assert(Ivf.mappingOf(spark, root.toString).get(l).forall(_.size == 1),
          s"drifted list $l must repoint to a single new dir"))
      assert(Ivf.readIndexFrame(spark, root.toString).count() == nAll,
        "reassignment must conserve every row")
      // refreshed centers differ exactly on the drifted lists
      val cm0 = Ivf.centroidsOf(built.model).toMap
      c1.foreach { case (l, c) =>
        if (drifted.contains(l)) assert(!c.sameElements(cm0(l)))
        else assert(c.sameElements(cm0(l)))
      }
      // a second localized refit right after is a no-op (baseline moved)
      val (_, d2) = Ivf.refitLocalized(spark, root.toString, c1, epsilon = 0.05)
      assert(d2.isEmpty, s"post-refresh drift must be ~0, got $d2")
    } finally fs.delete(new org.apache.hadoop.fs.Path(base.toString), true)
  }

  test("q208 gate row: conservation, localized, untouched-identical, recall") {
    val r = Ivf.q208IvfLocalRefit(spark, sf).collect()
    assert(r.length == 1)
    val nExpected = emb.count() + emb.filter(col("id") % 4 === 0).count()
    assert(r(0).getAs[Long]("n_vectors") == nExpected, s"row: ${r(0)}")
    assert(r(0).getAs[Boolean]("drift_localized"), s"localized: ${r(0)}")
    assert(r(0).getAs[Boolean]("untouched_identical"), s"untouched: ${r(0)}")
    assert(r(0).getAs[Boolean]("recall_ok"), s"recall: ${r(0)}")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Classify, Graph, SimilarityQueries}

/** The shared reliable-truncation policy (IterCheckpoint) across every
  * iterative loop that opted in: the cluster-safe mode (reliable
  * checkpoint every N rounds + MEMORY_AND_DISK between) must produce
  * results IDENTICAL to the default localCheckpoint path and leave no
  * cache entry pinned after the call — the DedupSpec CC parity case,
  * replicated for PageRank, BPE, label propagation, and k-center. */
class IterCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def withDir(f: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("graft_iter_ckpt_").toString
    try f(d) finally {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  private def noCachePinned(): Unit =
    assert(org.apache.spark.sql.graft.ColumnBridge.cacheManagerIsEmpty(spark),
      "reliable mode must unpersist its per-round frames")

  test("pageRank reliable-checkpoint mode matches the local path") {
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 1L), (3L, 1L, 1L),
      (1L, 3L, 1L), (4L, 1L, 5L)).toDF("src", "dst", "wt")
    val want = Graph.pageRank(edges, rounds = 7)
      .as[(Long, Long)].collect().toMap
    withDir { d =>
      val got = Graph.pageRank(edges, rounds = 7,
          checkpointDir = Some(d), checkpointInterval = 2)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"$got vs $want")
      noCachePinned()
    }
  }

  test("BPE reliable-checkpoint mode matches the local path") {
    val docs = Seq("low lower lowest", "low low newer newest",
      "wider wide widest low", "new newer wide")
      .toDF("text")
    val (wm, wt) = Bpe.learnMergesAndTypes(docs, "text", rounds = 6)
    val wantMerges = wm.collect().toSeq
    val wantTypes = wt.as[(String, Long, String)].collect().toSet
    withDir { d =>
      val (gm, gt) = Bpe.learnMergesAndTypes(docs, "text", rounds = 6,
        checkpointDir = Some(d), checkpointInterval = 2)
      assert(gm.collect().toSeq == wantMerges)
      assert(gt.as[(String, Long, String)].collect().toSet == wantTypes)
      noCachePinned()
    }
  }

  test("label propagation reliable-checkpoint mode matches the local path") {
    val seeds = Seq((1L, "en"), (10L, "fr")).toDF("id", "lab")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 3L))
      .toDF("id1", "id2")
    val want = Classify.labelPropagation(seeds, "id", "lab", pairs, rounds = 4)
      .as[(Long, String, Long)].collect().toSet
    withDir { d =>
      val got = Classify.labelPropagation(seeds, "id", "lab", pairs,
          rounds = 4, checkpointDir = Some(d), checkpointInterval = 2)
        .as[(Long, String, Long)].collect().toSet
      assert(got == want, s"$got vs $want")
      noCachePinned()
    }
  }

  test("k-center reliable-checkpoint mode matches the local path") {
    val r2 = math.sqrt(2) / 2
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0)),
      (2L, Seq(0.0, 0.0, 1.0)), (3L, Seq(1.0, 0.0, 0.0)),
      (4L, Seq(r2, r2, 0.0)), (5L, Seq(0.0, r2, r2))
    ).toDF("id", "v")
      .withColumn("v", col("v").cast("array<float>"))
      .withColumn("nrm", graft.functions.VectorFunctions.norm(col("v")))
      .localCheckpoint(true)
    val want = SimilarityQueries.kCenterGreedy(emb, k = 5, seedId = 0L)
      .collect().toSeq
    withDir { d =>
      val got = SimilarityQueries.kCenterGreedy(emb, k = 5, seedId = 0L,
        checkpointDir = Some(d), checkpointInterval = 2).collect().toSeq
      assert(got == want, s"$got vs $want")
      noCachePinned()
    }
  }
}

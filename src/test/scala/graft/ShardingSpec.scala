package graft

import org.apache.spark.sql.functions._
import graft.operators.Sharding

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("shard assignment is deterministic and growth-stable") {
    val docs = (1L to 400L).toDF("doc_id")
    val a = Sharding.shuffleShards(docs, "doc_id", 8, "s").select("doc_id", "shard")
    val b = Sharding.shuffleShards(docs, "doc_id", 8, "s").select("doc_id", "shard")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // growing the corpus must not move any existing row's shard
    val grown = Sharding.shuffleShards((1L to 800L).toDF("doc_id"), "doc_id", 8, "s")
      .filter(col("doc_id") <= 400).select("doc_id", "shard")
    assert(a.exceptAll(grown).isEmpty && grown.exceptAll(a).isEmpty)
  }

  test("hash-cut shards are balanced") {
    val docs = (1L to 4000L).toDF("doc_id")
    val sizes = Sharding.shuffleShards(docs, "doc_id", 8, "s")
      .groupBy("shard").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0L to 7L).toSet, s"all shards populated: $sizes")
    // uniform expectation 500 per shard; generous band catches gross skew
    sizes.values.foreach(n => assert(n > 300 && n < 700, s"shard sizes $sizes"))
  }

  test("exported shard files are internally sorted and positions are dense") {
    val base = java.nio.file.Files.createTempDirectory("graft_shard_spec_")
    try {
      val docs = Tables.documents(spark, sf).select(col("doc_id"))
      Sharding.exportShards(docs, "doc_id", 4, "s", s"$base/out")
      for (k <- 0 until 4) {
        // fixture files are far under one split, so collect() order IS file order
        val rows = spark.read.parquet(s"$base/out/shard=$k").collect()
        val poss = rows.map(_.getAs[Long]("pos"))
        assert(poss.toSeq == (1L to rows.length.toLong), s"shard $k dense+ordered")
        val buckets = rows.map(_.getAs[Long]("bucket"))
        assert(buckets.toSeq == buckets.sortBy(identity).toSeq, s"shard $k bucket-sorted")
      }
    } finally {
      val fs = new org.apache.hadoop.fs.Path(base.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base.toString), true)
    }
  }

  test("zOrderKey matches the driver-side Morton interleave exhaustively") {
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val pts = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = pts.toDF("a", "b")
      .withColumn("z", Sharding.zOrderKey(col("a"), col("b"), 8))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == morton(a, b, 8), s"($a, $b)")
    }
    // the defining locality property: z of the 4 sub-quadrants nest
    assert(morton(0, 0, 8) == 0 && morton(1, 0, 8) == 1 &&
      morton(0, 1, 8) == 2 && morton(1, 1, 8) == 3)
  }

  test("z-order files prune on BOTH dims where a 1-D sort only prunes its own") {
    // the full 256x256 grid: every file's (qb, lb) bounding rectangle is
    // a pair of 64x64 tiles, so a predicate on EITHER dim prunes files;
    // a qb-sorted layout gives every file the full lb range
    val grid = (for (a <- 0L until 256L; b <- 0L until 256L) yield (a, b))
      .toDF("qb", "lb")
    val laid = Sharding.zOrderLayout(grid, "qb", "qb", "lb", 8)
    val rects = laid.groupBy(col("file_id"))
      .agg(min(col("qb")).as("q0"), max(col("qb")).as("q1"),
        min(col("lb")).as("l0"), max(col("lb")).as("l1"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rects.length == 8 && rects.forall(_._6 == 65536L / 8))
    // z-layout: predicate lb < 64 prunes at least half the files
    val zPruned = rects.count(r => r._4 >= 64)
    assert(zPruned >= 4, s"z-order pruned only $zPruned of 8 on the non-leading dim")
    // 1-D qb-sorted layout: every equal-cut file spans the full lb range
    val oneD = grid.withColumn("file_id", expr("qb * 8 div 256"))
      .groupBy(col("file_id"))
      .agg(min(col("lb")).as("l0"), max(col("lb")).as("l1"))
      .as[(Long, Long, Long)].collect()
    assert(oneD.forall(r => r._2 == 0 && r._3 == 255),
      "the 1-D layout cannot prune on lb at all - the property z-order buys")
    // and z still prunes on the leading dim too: qb < 64
    assert(rects.count(r => r._2 >= 64) >= 4)
  }

  test("zOrderKeyN matches the driver-side N-D interleave; 2-D case is zOrderKey") {
    def mortonN(ds: Seq[Long], bits: Int): Long =
      (0 until bits).flatMap(i => ds.zipWithIndex.map { case (v, j) =>
        ((v >> i) & 1L) << (i * ds.size + j)
      }).sum
    val pts = for (a <- 0L until 8L; b <- 0L until 8L; c <- 0L until 8L; d <- 0L until 8L)
      yield (a, b, c, d)
    val got = pts.toDF("a", "b", "c", "d")
      .withColumn("z", Sharding.zOrderKeyN(
        Seq(col("a"), col("b"), col("c"), col("d")), 3))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3, r._4) -> r._5).toMap
    pts.foreach { case (a, b, c, d) =>
      assert(got((a, b, c, d)) == mortonN(Seq(a, b, c, d), 3), s"($a,$b,$c,$d)")
    }
    // the 2-D specialization is the N-D key with D = 2
    val two = (for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)).toDF("a", "b")
      .select(Sharding.zOrderKey(col("a"), col("b"), 4).as("z2"),
        Sharding.zOrderKeyN(Seq(col("a"), col("b")), 4).as("zn"))
      .filter(col("z2") =!= col("zn")).count()
    assert(two == 0L)
  }

  test("4-D z-order files prune on EVERY dim where a 1-D sort only prunes its own") {
    // full 16^4 grid, 4 bits per dim, 16 files: every dimension's box
    // predicate must exclude files under the z layout; the 1-D layout
    // (sorted by dim a alone) spans the full range of b/c/d in every file.
    // nFiles >= 2^D so the file cut's top bits include one bit from EVERY
    // dimension (with fewer files only the later-interleaved dims split)
    val grid = (for (a <- 0L until 16L; b <- 0L until 16L;
                     c <- 0L until 16L; d <- 0L until 16L) yield (a, b, c, d))
      .toDF("a", "b", "c", "d")
    val nFiles = 16
    val laid = grid.withColumn("zkey", Sharding.zOrderKeyN(
        Seq(col("a"), col("b"), col("c"), col("d")), 4))
      .withColumn("file_id", expr(s"zkey * $nFiles div ${1L << 16}"))
    val rects = laid.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col("a")).as("a0"), max(col("a")).as("a1"),
        min(col("b")).as("b0"), max(col("b")).as("b1"),
        min(col("c")).as("c0"), max(col("c")).as("c1"),
        min(col("d")).as("d0"), max(col("d")).as("d1"))
      .collect().map(r => (r.getAs[Long]("n"),
        Seq(("a", r.getAs[Long]("a0"), r.getAs[Long]("a1")),
            ("b", r.getAs[Long]("b0"), r.getAs[Long]("b1")),
            ("c", r.getAs[Long]("c0"), r.getAs[Long]("c1")),
            ("d", r.getAs[Long]("d0"), r.getAs[Long]("d1")))))
    assert(rects.length == nFiles && rects.forall(_._1 == 65536L / nFiles))
    // for every dimension, the predicate `dim < 8` excludes some files
    Seq("a", "b", "c", "d").foreach { dim =>
      val pruned = rects.count(_._2.exists(t => t._1 == dim && t._2 >= 8))
      assert(pruned >= 2,
        s"4-D z-order pruned only $pruned of $nFiles files on $dim < 8")
    }
    // the 1-D a-sorted layout spans the full range of every OTHER dim
    val oneD = grid.withColumn("file_id", expr(s"a * $nFiles div 16"))
      .groupBy(col("file_id"))
      .agg(min(col("b")).as("b0"), max(col("b")).as("b1"),
        min(col("c")).as("c0"), max(col("c")).as("c1"))
      .collect()
    assert(oneD.forall(r => r.getAs[Long]("b0") == 0 && r.getAs[Long]("b1") == 15 &&
      r.getAs[Long]("c0") == 0 && r.getAs[Long]("c1") == 15),
      "the 1-D layout cannot prune on b/c/d at all — the property N-D z-order buys")
  }
}

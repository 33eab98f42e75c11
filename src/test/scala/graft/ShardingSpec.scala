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
}

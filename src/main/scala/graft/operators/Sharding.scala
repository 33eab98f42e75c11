package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic global shuffle + balanced sharding — the step a
  * pretraining run performs between curation and packing: break any
  * source/crawl ordering so every shard is an unbiased sample of the
  * corpus, and emit a reproducible shard layout a loader can stream.
  *
  * Scale design: the textbook form — `ORDER BY random()` or
  * `repartitionByRange` on a random key — is wrong at 100 TB twice
  * over: `random()` is non-reproducible (a re-run or a one-shard
  * backfill deals different cards), and range partitioning SAMPLES the
  * key to place its cut points, so the shard a row lands in depends on
  * the sample draw. Here the shard is a PURE FUNCTION of the document
  * id: `shard = bucket * n >> 32` over the seeded [[TrainingData.hashBucket]]
  * uniform bucket — deterministic, uniform (hash balance), and
  * growth-stable (new documents hash into shards without moving any
  * existing row's assignment; only within-shard positions shift).
  * Physically the whole operation is ONE hash shuffle on the shard id
  * plus a per-partition sort — `repartition(shard)` co-locates each
  * shard in exactly one task, `sortWithinPartitions` orders it with no
  * global sort, and `partitionBy(shard)` writes one file per shard a
  * loader (or a single-shard backfill) reads via partition pruning.
  * Reference analog: the batch split its driver deals to upsert workers
  * (main.py:55-68), made deterministic and order-defining.
  */
object Sharding {

  /** Shard assignment + within-shard position for every row: `bucket`
    * (seeded md5 hash), `shard` (hash-cut), `pos` (1-based rank by
    * (bucket, id) — the stream order a loader sees). The rank window is
    * per-shard, so its sort is bounded by shard size, never corpus
    * size; raise `nShards` until a shard fits one task. */
  def shuffleShards(docs: DataFrame, idCol: String, nShards: Int,
                    seed: String): DataFrame = {
    val b = docs.withColumn("bucket", TrainingData.hashBucket(col(idCol), seed))
      .withColumn("shard", expr(s"bucket * $nShards div 4294967296"))
    b.withColumn("pos",
      row_number().over(Window.partitionBy(col("shard"))
        .orderBy(col("bucket"), col(idCol))).cast("long"))
  }

  /** Materialize the shuffled layout: one sorted parquet file per
    * shard directory. Each shard hashes to exactly one task
    * (`repartition` on the shard id), the task sorts its rows by
    * (bucket, id) — the same order `pos` ranks — and `partitionBy`
    * routes the file under `shard=<k>/`. Returns the reopened frame
    * through the partition-discovery path the loader uses. */
  def exportShards(docs: DataFrame, idCol: String, nShards: Int,
                   seed: String, path: String): DataFrame = {
    val shuffled = shuffleShards(docs, idCol, nShards, seed)
    shuffled.repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("bucket"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    docs.sparkSession.read.parquet(path)
      .withColumn("shard", col("shard").cast("long"))
  }

  private[operators] val ShufSeed = "shuf"
  private[operators] val NShards = 8

  /** q78: the sharded layout over `documents`, gated ROW-LEVEL through
    * the PHYSICAL path — written, reopened via partition discovery, and
    * every (doc_id, bucket, shard, pos) compared against the oracle's
    * window recomputation. Any row lost, duplicated, or re-assigned by
    * the write/reopen roundtrip fails the hash (q58's precedent of
    * gating through the layout you'd deploy). */
  def q78ShuffleShard(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q78_")
    try {
      exportShards(Tables.documents(spark, dir).select(col("doc_id")),
        "doc_id", NShards, ShufSeed, s"$base/shards")
        .select(col("doc_id"), col("bucket"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
        .localCheckpoint(true) // materialize before the layout dir is deleted
    } finally {
      val fs = new org.apache.hadoop.fs.Path(base.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base.toString), true)
    }
  }

  val q78ShuffleShardSql: String =
    s"""WITH b AS (SELECT doc_id,
       |  ('0x' || substring(md5('$ShufSeed:' || doc_id), 1, 8))::BIGINT AS bucket
       |  FROM documents),
       |s AS (SELECT doc_id, bucket, bucket * $NShards // 4294967296 AS shard FROM b)
       |SELECT doc_id, bucket, shard,
       |  row_number() OVER (PARTITION BY shard ORDER BY bucket, doc_id) AS pos
       |FROM s ORDER BY shard, pos""".stripMargin
}

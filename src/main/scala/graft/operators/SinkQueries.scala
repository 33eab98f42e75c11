package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.sinks.{BulkForeachSink, CsvBatchClient}

/** Driver-gated entry for the partition-parallel bulk external write —
  * the reference's core pipeline (parquet scan → batched bulk writes with
  * result counts, src/func/job.py:58-87 + mongo.py:103-163) executed
  * end-to-end and then VERIFIED by reading the external system back. */
object SinkQueries {

  /** q48: stream lineitem through [[BulkForeachSink]] (8-way partition
    * parallelism, 1000-row batches) into a [[CsvBatchClient]] staging
    * directory, read the directory back, and gate on:
    *
    *  - anchors DuckDB recomputes from the fixture: `n_rows`, `sum_qty`,
    *    `sum_price` — proving every row survived the external round trip
    *    byte-exactly (`String.valueOf`/CSV round-trips longs and doubles
    *    losslessly);
    *  - `stats_rows_match`: the accumulator-reported row count equals
    *    the read-back count (the reference's result reporting,
    *    mongo.py:140-145);
    *  - `batches_consistent`: one file per reported batch, and the batch
    *    count sits in the only range a correct `grouped(batchSize)` over
    *    8 partitions allows — `ceil(n/B) ≤ batches ≤ n div B + 8` (each
    *    partition adds at most one partial batch);
    *  - `no_failures`: zero dropped batches (the tolerant path is
    *    exercised by BulkForeachSinkSpec with an injected flaky client).
    */
  def q48BulkSink(spark: SparkSession, dir: String): DataFrame = {
    val parts = 8
    val batchSize = 1000
    val base = java.nio.file.Files.createTempDirectory("graft_q48_").toString
    try {
      val rows = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice"))
        .repartition(parts)
      val stats = BulkForeachSink.write(rows, batchSize, () => CsvBatchClient(base))
      val schema = StructType(Seq(
        StructField("l_orderkey", LongType),
        StructField("l_partkey", LongType),
        StructField("l_quantity", DoubleType),
        StructField("l_extendedprice", DoubleType)))
      val nFiles = new java.io.File(base).listFiles()
        .count(_.getName.endsWith(".csv")).toLong
      spark.read.schema(schema).csv(base)
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_price"))
        .select(col("n_rows"), col("sum_qty"), col("sum_price"),
          (col("n_rows") === lit(stats.nRows)).as("stats_rows_match"),
          (lit(stats.nBatches) === lit(nFiles) &&
            lit(stats.nBatches) >=
              expr(s"(n_rows + ${batchSize - 1}) div $batchSize") &&
            lit(stats.nBatches) <= expr(s"n_rows div $batchSize") + parts)
            .as("batches_consistent"),
          (lit(stats.nFailedBatches) === 0L).as("no_failures"))
        .localCheckpoint(true) // materialize before the staging dir is deleted
    } finally {
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    }
  }

  val q48BulkSinkSql: String =
    """SELECT count(*)::BIGINT AS n_rows,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_price,
      |  TRUE AS stats_rows_match,
      |  TRUE AS batches_consistent,
      |  TRUE AS no_failures
      |FROM lineitem""".stripMargin

  /** q94: JSONL SOURCE parity — the interchange format corpora actually
    * ship in (one JSON object per line). The gate round-trips the
    * documents fixture through the engine's jsonl path: write as
    * json-lines, read back with the EXPLICIT schema (schema-on-read
    * validation, the reference's parquet.py:39 discipline — at 100 TB
    * schema INFERENCE would cost a full extra scan before the real
    * one), and emit row-level content vs the parquet fixture. JSONL is
    * line-splittable, so the read parallelizes like parquet; what it
    * lacks — column pruning, predicate pushdown, statistics — is
    * exactly why [[graft.jobs.GenerateDataJob]] lands parquet and jsonl
    * stays an ingest boundary (documented trade, not a preference). */
  def q94JsonlSource(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q94_")
    try {
      val docs = Tables.documents(spark, dir)
      docs.write.json(s"$base/docs_jsonl")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      spark.read.schema(schema).json(s"$base/docs_jsonl")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_hash"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true) // materialize before the staging dir dies
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  val q94JsonlSourceSql: String =
    """SELECT doc_id, lang, source, n_chars, md5(text) AS text_hash
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q149: ORC SOURCE/SINK roundtrip — q94's contract for the other
    * columnar format a Spark shop inherits (Hive-era lakes are ORC):
    * write the corpus as ORC, reopen through the vectorized ORC
    * reader, and gate row-level content (text via md5 — any
    * encoding/compression corruption in the roundtrip flips the
    * hash). Like q94, the oracle reads the PARQUET fixture — equality
    * across the two paths is precisely the roundtrip claim. Predicate
    * pushdown and column pruning work on ORC as on parquet (same
    * DataSource V1 scan machinery); the q1-shape audit transfers. */
  def q149OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q149_")
    try {
      Tables.documents(spark, dir).write.orc(s"$base/docs_orc")
      spark.read.orc(s"$base/docs_orc")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_hash"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true) // materialize before the staging dir dies
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  val q149OrcRoundtripSql: String = q94JsonlSourceSql
}

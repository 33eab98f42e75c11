package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Synthetic data source with the reference generator's schema and
  * distribution (reference: src/cli/generate_data.py:27-68 — UUID4 string
  * ids, 4 uniform-random float features, a random score).
  *
  * Differences from the reference, by design:
  *  - one distributed `spark.range` job instead of a sequential
  *    batch loop (generate_data.py:84-95) — file count is controlled by
  *    `repartition(nFiles)`, which is the Spark-native form of the
  *    reference's one-file-per-batch layout;
  *  - deterministic when seeded: ids are UUID-formatted md5 hashes of the
  *    row index (the reference's uuid4 is irreproducible, which would make
  *    every downstream test flaky);
  *  - optional null fraction on the nullable feature columns so the
  *    null-skip update semantics (mongo.py:60-63) are exercisable.
  */
object SyntheticSource {

  /** Reference schema: generate_data.py:27-34 ≡ job.py:32-41.
    * Column 0 is the match key, the rest are payload (job.py:81-82). */
  val schema: StructType = StructType(Seq(
    StructField("_id", StringType, nullable = false),
    StructField("feature_1", DoubleType, nullable = true),
    StructField("feature_2", DoubleType, nullable = true),
    StructField("feature_3", DoubleType, nullable = true),
    StructField("feature_4", DoubleType, nullable = true),
    StructField("score", DoubleType, nullable = false)))

  val idColumn: String = schema.names.head
  val payloadFields: Seq[String] = schema.names.tail.toSeq

  /** UUID4-shaped deterministic id from the row index + seed. */
  private def uuidLike(rowIdx: org.apache.spark.sql.Column, seed: Long) = {
    val h = md5(concat(lit(seed.toString), lit(":"), rowIdx.cast("string")))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  def generate(spark: SparkSession, nRows: Long, nFiles: Int = 1,
               seed: Long = 42L, nullFraction: Double = 0.0): DataFrame = {
    val base = spark.range(nRows)
    val withCols = payloadFields.zipWithIndex.foldLeft(
      base.select(uuidLike(col("id"), seed).as(idColumn), col("id"))) {
      case (df, (field, i)) =>
        val value = rand(seed + i + 1)
        val nullable = schema(field).nullable && nullFraction > 0
        val c =
          if (nullable) when(rand(seed + 100 + i) < nullFraction, lit(null)).otherwise(value)
          else value
        df.withColumn(field, c)
    }
    withCols.drop("id").repartition(nFiles)
  }

  /** Parquet file sink (reference save_data_batch, generate_data.py:71-81). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Reference batch arithmetic (tests/test_parquet.py:84-86): the number
    * of `batchSize`-row batches a scan yields. In Spark this maps to a
    * partition count, not a loop — kept as the documented equivalence. */
  def batchCount(nRows: Long, batchSize: Int): Int =
    math.ceil(nRows.toDouble / batchSize).toInt

  /** Reference slice arithmetic (tests/test_parquet.py:123):
    * ceil(ceil(n/batch)/slice) — groups of `sliceSize` batches. */
  def sliceCount(nRows: Long, batchSize: Int, sliceSize: Int): Int =
    math.ceil(batchCount(nRows, batchSize).toDouble / sliceSize).toInt
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column functions over `ArrayType(FloatType)` embeddings
  * (SURVEY.md §2B similarity search; fixture: embeddings.parquet,
  * 64-dim unit-norm vectors).
  *
  * All pure Catalyst higher-order expressions (`zip_with` + `aggregate`)
  * — no UDFs, so they run columnar inside any projection and their DuckDB
  * mirrors (`list_sum(list_apply(...))`) compute the identical doubles.
  * Elements are cast to double BEFORE multiplying: float32 products
  * differ from double products in the last bits, and the oracle compare
  * is exact up to in-query rounding.
  */
object VectorFunctions {

  /** Dot product of two equal-length numeric arrays, accumulated in
    * double, left-to-right — a codegen'd native Catalyst expression
    * ([[graft.expressions.DotProduct]]); same summation order (and so
    * bit-identical results) as the interpreted higher-order form below. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The zip_with+aggregate dot product the codegen expression replaced —
    * kept as the readable reference form and for the equivalence test. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** L2 (Euclidean) distance. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Cosine similarity from a precomputed-norm representation:
    * dot(a,b) / (normA * normB). Callers doing many comparisons per
    * vector should materialize `norm` once per side (see
    * [[graft.operators.SimilarityQueries]]) instead of calling a
    * 3-dot-product cosine per pair. */
  def cosineWithNorms(a: Column, normA: Column, b: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Self-contained cosine similarity (three dot products per call). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic Rademacher (±1) hyperplanes for signed-random-projection
    * LSH, `nBits × dim`, from a fixed seed — generated once here and
    * embedded as literals in BOTH the Spark plan and the generated DuckDB
    * oracle SQL, so the two engines bucket identically. (±1 components
    * are a valid SRP family and keep the literal SQL small.) */
  def srpPlanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits, dim)(if (rng.nextBoolean()) 1.0 else -1.0)
  }

  /** SRP sign bits (1/0) of a vector against literal hyperplanes. */
  def srpBits(v: Column, planes: Array[Array[Double]]): Column =
    array(planes.map { p =>
      when(dot(v, typedlit(p.toSeq)) >= 0, lit(1)).otherwise(lit(0))
    }: _*)

  /** Band keys over an SRP bit array: `bands` integer keys of
    * `bitsPerBand` bits each. Two vectors sharing any band key become an
    * ANN candidate pair. Selectivity scales as 2^bitsPerBand per band —
    * at larger corpora raise bitsPerBand (≈ log2(n) - 10) to keep bucket
    * sizes flat. */
  def srpBandKeys(bits: Column, bands: Int, bitsPerBand: Int): Column =
    array((0 until bands).map { b =>
      (0 until bitsPerBand).map { j =>
        element_at(bits, b * bitsPerBand + j + 1) * lit(1 << (bitsPerBand - 1 - j))
      }.reduce(_ + _)
    }: _*)
}

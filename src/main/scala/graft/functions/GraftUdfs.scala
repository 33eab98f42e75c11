package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import scala.util.hashing.MurmurHash3

/** UDF/UDAF surface (SURVEY.md §2B row 9). The engine's query paths use
  * built-in/higher-order Catalyst expressions everywhere (they codegen and
  * mirror exactly in the DuckDB oracle); this module is the EXTENSIBILITY
  * surface — what a user writes when the built-ins genuinely can't express
  * their logic. Registered functions are usable from both the Dataset API
  * and `spark.sql`.
  *
  * A typed `Aggregator` is the scalable custom-aggregation form: partial
  * buffers merge map-side like any built-in agg (reduce → merge → finish),
  * so a group's elements never gather on one node.
  */
object GraftUdfs {

  /** Typed UDAF: MinHash signature over a group of string elements (one
    * element per row — e.g. exploded shingles, grouped by document). The
    * buffer is the element-wise minimum of `numHashes` seeded 32-bit
    * murmur hashes; buffers merge associatively+commutatively, so partial
    * aggregation is exact (SURVEY.md §4 item 3). */
  final class MinHashAggregator(numHashes: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {

    private def hashes(e: String): Array[Long] =
      Array.tabulate(numHashes)(seed => MurmurHash3.stringHash(e, seed).toLong)

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(buf: Array[Long], e: String): Array[Long] = {
      val hs = hashes(e)
      var i = 0
      while (i < numHashes) { if (hs(i) < buf(i)) buf(i) = hs(i); i += 1 }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.javaSerialization[Array[Long]]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Scalar UDF demo: exact Jaccard over two string sequences. The column
    * expression [[TextFunctions.jaccard]] is the production form (codegen,
    * oracle-mirrorable); this exists to exercise + test the registered-UDF
    * path. */
  val jaccardUdf: (Seq[String], Seq[String]) => Double = (a, b) => {
    val sa = a.toSet
    val sb = b.toSet
    val union = (sa ++ sb).size
    if (union == 0) 0.0 else (sa & sb).size.toDouble / union
  }

  /** Registers the UDF/UDAF surface on a session:
    * `minhash_sig(elem)` (grouped) and `jaccard_udf(arr, arr)`. */
  def register(spark: SparkSession, numHashes: Int = 16): Unit = {
    spark.udf.register("minhash_sig",
      org.apache.spark.sql.functions.udaf(new MinHashAggregator(numHashes)))
    spark.udf.register("jaccard_udf", jaccardUdf)
  }
}

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
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The KMV kernel, factored out so the distinct-count aggregator and
    * the SET-ALGEBRA path ([[graft.operators.Overlap]]) share one hash,
    * one insert discipline, and one estimator — two consumers of the
    * same sketch must agree bit-for-bit on what the sketch IS. */
  private[graft] object Kmv {
    def hash(s: String): Long = {
      // 64-bit FNV-1a core + the murmur3 fmix64 finalizer: bare FNV-1a
      // has weak avalanche on short keys, and KMV is EXACTLY the
      // consumer that notices — the k smallest values of a biased hash
      // cluster, and the union estimate came out 2.4× high on
      // sequential-integer keys (OverlapSpec's known-overlap case).
      // The finalizer restores uniformity at two multiplies' cost.
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      h
    }

    /** Insert into an ascending (unsigned order) k-smallest buffer. */
    def insert(k: Int)(buf: Array[Long], h: Long): Array[Long] = {
      val idx = java.util.Arrays.binarySearch(buf.map(_ ^ Long.MinValue),
        h ^ Long.MinValue)
      if (idx >= 0) buf // duplicate hash
      else {
        val pos = -idx - 1
        if (pos >= k) buf
        else {
          val out = new Array[Long](math.min(buf.length + 1, k))
          System.arraycopy(buf, 0, out, 0, pos)
          out(pos) = h
          System.arraycopy(buf, pos, out, pos + 1, out.length - pos - 1)
          out
        }
      }
    }

    /** Distinct-count estimate from a k-smallest buffer: exact below k,
      * (k−1)/frac(kth unsigned min) at saturation. */
    def estimate(k: Int, buf: Array[Long]): Long =
      if (buf.length < k) buf.length.toLong // saw fewer than k distinct: exact
      else {
        // sign-flip gives the unsigned ORDER as a signed long in
        // [-2⁶³, 2⁶³); shift by +2⁶³ for the true unsigned magnitude
        val kthUnsigned = (buf.last ^ Long.MinValue).toDouble + math.pow(2.0, 63)
        val frac = kthUnsigned / math.pow(2.0, 64)
        math.round((k - 1) / frac)
      }
  }

  /** Custom distinct-count sketch: KMV (k minimum values). The buffer
    * keeps the k smallest 64-bit hashes seen; since the k-th smallest of
    * n uniform hashes sits at ≈ k/n of the hash space, the estimate is
    * (k-1) / (kthMin / 2⁶⁴). Buffers merge by union+truncate — associative
    * and commutative, so partial aggregation is exact and the sketch
    * shuffles k longs per group regardless of group size. Standard error
    * ≈ 1/√(k−2) (~7% at k=256). Complements the built-in HLL++
    * (approx_count_distinct, q26): this is the SURVEY §4 "custom sketch
    * via the typed aggregation route" demonstration, with mergeability
    * the tests exercise across partitionings. */
  final class KmvDistinctAggregator(k: Int)
      extends Aggregator[String, Array[Long], Long] {
    require(k >= 8, s"k=$k too small for a meaningful estimate")

    // buffer: ascending k smallest UNSIGNED hashes seen so far
    override def zero: Array[Long] = Array.empty[Long]

    override def reduce(buf: Array[Long], e: String): Array[Long] =
      Kmv.insert(k)(buf, Kmv.hash(e))

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)(Kmv.insert(k))

    override def finish(buf: Array[Long]): Long = Kmv.estimate(k, buf)

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** The RAW KMV sketch as the aggregate value (not the finished
    * estimate): the mergeable k-smallest hash sample set algebra needs —
    * two corpora's sketches combine into union/intersection/Jaccard
    * estimates ([[graft.operators.Overlap]], Beyer et al., SIGMOD 2007)
    * without either corpus rescanning the other. Same kernel as
    * [[KmvDistinctAggregator]], so the sample is identical. */
  final class KmvSketchAggregator(k: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(k >= 8, s"k=$k too small for a meaningful estimate")
    override def zero: Array[Long] = Array.empty[Long]
    override def reduce(buf: Array[Long], e: String): Array[Long] =
      Kmv.insert(k)(buf, Kmv.hash(e))
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)(Kmv.insert(k))
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Count-min sketch: point-frequency estimation in sublinear space —
    * the boilerplate-detection sketch (how often does each shingle occur
    * corpus-wide?) next to KMV's distinct-count. The buffer is a
    * depth×width counter matrix; estimates never UNDERcount (each row's
    * counter ≥ the true count) and overcount by ≤ e/width·N with high
    * probability — q38 turns both bounds into gate booleans.
    *
    * The input is the PRE-HASHED position vector (one position per depth
    * row), computed upstream by codegen'd `xxhash64(gram, depth)`
    * expressions — so the estimate side reuses the IDENTICAL expressions
    * against the finished sketch ([[cmsPositions]]/[[cmsEstimate]]) and
    * the aggregator itself does no hashing. Buffers merge element-wise
    * (associative + commutative): partial aggregation is exact and the
    * shuffle carries one depth×width matrix per partition, regardless of
    * corpus size. */
  final class CmsSketchAggregator(depth: Int, width: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    require(depth >= 1 && width >= 2, s"bad CMS shape ${depth}x$width")

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(buf: Array[Long], pos: Seq[Long]): Array[Long] = {
      // positions are caller-supplied (cms_sketch is registered SQL): a
      // vector built for a DIFFERENT shape would silently write into the
      // wrong depth row — corrupted counters, broken never-undercount —
      // so shape mismatches fail fast instead
      require(pos.length == depth,
        s"cms position vector has ${pos.length} entries, sketch depth is $depth")
      var d = 0
      while (d < depth) {
        val p = pos(d)
        require(p >= 0 && p < width, s"cms position $p out of [0, $width)")
        buf(d * width + p.toInt) += 1L
        d += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Bottom-k SELECTION by (bucket, id): keeps the k lexicographically
    * smallest pairs seen — the KMV idea repurposed from estimation to
    * exact-k SAMPLING. Grouped per stratum, `finish` yields precisely
    * the stratum's k hash-smallest members: union+truncate merging is
    * associative and commutative, so partial aggregation is exact and
    * the shuffle carries ≤ k pairs per partition regardless of stratum
    * size — "take exactly k docs per language" without a per-stratum
    * sort. The id tiebreak makes selection deterministic even under
    * bucket collisions. Amortized O(1) per input: the buffer grows to
    * 2k then sort-truncates to k. */
  final class BottomKAggregator(k: Int)
      extends Aggregator[(Long, Long), scala.collection.mutable.ArrayBuffer[(Long, Long)],
        Seq[(Long, Long)]] {
    require(k >= 1, s"k=$k must be positive")
    import scala.collection.mutable.ArrayBuffer

    private def trim(buf: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
      if (buf.length > k) {
        val kept = buf.sortInPlace().take(k)
        buf.clear(); buf ++= kept
      }
      buf
    }

    override def zero: ArrayBuffer[(Long, Long)] = ArrayBuffer.empty

    override def reduce(buf: ArrayBuffer[(Long, Long)],
                        e: (Long, Long)): ArrayBuffer[(Long, Long)] = {
      buf += e
      if (buf.length >= 2 * k) trim(buf) else buf
    }

    override def merge(a: ArrayBuffer[(Long, Long)],
                       b: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
      // two half-size sorts + an O(k) linear merge, not concat + full
      // sort: shuffled partial buffers arrive already trimmed (sorted),
      // where TimSort's run detection makes each sortInPlace O(len) —
      // so the common case is linear in k, and never worse than the
      // concatenated sort when a side carries an unsorted tail
      a.sortInPlace(); b.sortInPlace()
      val out = new ArrayBuffer[(Long, Long)](math.min(k, a.length + b.length))
      var i = 0
      var j = 0
      while (out.length < k && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length &&
          (a(i)._1 < b(j)._1 || (a(i)._1 == b(j)._1 && a(i)._2 <= b(j)._2)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      }
      out
    }

    override def finish(buf: ArrayBuffer[(Long, Long)]): Seq[(Long, Long)] =
      buf.sortInPlace().take(k).toSeq

    override def bufferEncoder: Encoder[ArrayBuffer[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ArrayBuffer[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Misra-Gries heavy-hitters summary: at most `k` (element, count)
    * pairs. Estimates only ever UNDERcount, by at most n/(k+1) — so
    * every element with true count > n/(k+1) is guaranteed present
    * (Misra & Gries 1982), and the bound survives arbitrary merging
    * (Agarwal et al., "Mergeable Summaries", PODS'12) — the property
    * that makes it a partial-aggregation-safe sketch: buffers combine
    * by count addition + rank-(k+1) subtraction, so the shuffle
    * carries ≤ k pairs per partition regardless of group size. The
    * third sketch family next to KMV (distinct count) and CMS (point
    * frequency): CMS answers "how often does THIS element occur"
    * (overcount-bounded), Misra-Gries answers "WHICH elements are
    * frequent" (undercount-bounded) without knowing them up front.
    * Exact counts depend on merge order; the error bound holds for
    * every order, which is what the q55 gate asserts. */
  final class MisraGriesAggregator(k: Int)
      extends Aggregator[String, scala.collection.mutable.HashMap[String, Long],
        Map[String, Long]] {
    require(k >= 1, s"k=$k must be positive")
    import scala.collection.mutable

    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    // In-place mutation throughout (the Array[Long] CMS buffer above is
    // the precedent): the buffer is touched once per INPUT TOKEN, so a
    // per-token immutable `Map.updated` — and worse, the O(k) rebuild on
    // every full-buffer miss, which for a long-tailed corpus is the
    // common case — would make allocation the aggregate's real cost at
    // 10^13 tokens. The decrement pass reuses the same table
    // (mapValuesInPlace + filterInPlace), allocating nothing but the
    // boxed counts the generic map already pays for.
    override def reduce(buf: mutable.HashMap[String, Long],
                        e: String): mutable.HashMap[String, Long] = {
      buf.get(e) match {
        case Some(c) => buf.update(e, c + 1L)
        case None if buf.size < k => buf.update(e, 1L)
        case None => // full: decrement every counter, drop the zeros
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
      buf
    }

    override def merge(a: mutable.HashMap[String, Long],
                       b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (x, c) => a.update(x, a.getOrElse(x, 0L) + c) }
      if (a.size > k) {
        // subtract the (k+1)-th largest count from everything and drop
        // the non-positives — the Mergeable Summaries compression step
        val vals = a.values.toArray
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - 1 - k)
        a.mapValuesInPlace((_, c) => c - cut)
        a.filterInPlace((_, c) => c > 0L)
      }
      a
    }

    override def finish(buf: mutable.HashMap[String, Long]): Map[String, Long] =
      buf.toMap

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[mutable.HashMap[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{array, element_at, least, lit, pmod, xxhash64}

  /** The depth-d hash position of an element — the ONE definition both
    * the aggregator input and the estimate lookups are built from (the
    * sketch/estimate correspondence is exactly this expression; two
    * drifting copies would silently break it). */
  private def cmsPos(e: Column, d: Int, width: Int): Column =
    pmod(xxhash64(e, lit(d)), lit(width.toLong))

  /** The depth hash positions of an element — the aggregator's input AND
    * the estimate's lookup keys, from the same codegen'd expressions. */
  def cmsPositions(e: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(d => cmsPos(e, d, width)): _*)

  /** Point estimate from a finished sketch: min over depth rows of the
    * element's counter. */
  def cmsEstimate(sketch: Column, e: Column, depth: Int, width: Int): Column =
    (0 until depth).map { d =>
      element_at(sketch, (cmsPos(e, d, width) + lit(d * width) + 1).cast("int"))
    }.reduce(least(_, _))

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

  /** Registers the UDF/UDAF surface on a session: `minhash_sig(elem)`,
    * `kmv_distinct(elem)`, `cms_sketch(positions)` and
    * `misra_gries(elem)` (grouped), `jaccard_udf(arr, arr)`. */
  def register(spark: SparkSession, numHashes: Int = 16, kmvK: Int = 256,
               cmsDepth: Int = 4, cmsWidth: Int = 2048, mgK: Int = 64): Unit = {
    spark.udf.register("misra_gries",
      org.apache.spark.sql.functions.udaf(new MisraGriesAggregator(mgK)))
    spark.udf.register("minhash_sig",
      org.apache.spark.sql.functions.udaf(new MinHashAggregator(numHashes)))
    spark.udf.register("kmv_distinct",
      org.apache.spark.sql.functions.udaf(new KmvDistinctAggregator(kmvK)))
    spark.udf.register("cms_sketch",
      org.apache.spark.sql.functions.udaf(new CmsSketchAggregator(cmsDepth, cmsWidth)))
    spark.udf.register("jaccard_udf", jaccardUdf)
  }
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KLL quantile sketch (Karnin–Lang–Liberty, FOCS'16) — the MERGEABLE
  * quantile state for genuinely continuous domains.
  *
  * The engine's exact tail-quantile story ([[graft.operators.Audit]]
  * histQuantiles) leans on a bounded fixed-point domain (e4 cents): one
  * additive histogram, exact answers, the full batch → incremental →
  * streamed triple. A float metric with no usable bound (model loss,
  * embedding norm, latency) has no such histogram — and the built-in
  * `percentile_approx` is single-shot: it cannot be persisted, merged
  * with tomorrow's batch, or folded behind a stream. KLL restores the
  * house triple for those columns: a ~3k-item summary whose merge is
  * associative and commutative, with a proven normalized rank-error
  * bound ε ≈ O(1/k) (k = 200 ⇒ ~1.65% at 99% confidence; the gates
  * certify a conservative 3% band against exact ranks).
  *
  * Shape: geometrically-capacitied levels; level `l` holds items of
  * weight 2^l. Updates append at level 0; when the sketch is over
  * capacity the lowest over-full level is sorted and every other item
  * (parity chosen per compaction) is promoted one level up. Merge
  * concatenates levels pairwise, then compacts the same way. Min/max
  * and n are carried exactly (the anchor certificates).
  *
  * DETERMINISM: the compaction coin is a hash of (n, level,
  * compaction counter) — replayable across runs for a fixed fold
  * order. Spark's partition-merge order is not fixed, so cross-run
  * results may differ WITHIN the error band; the gates therefore
  * certify the band (and the exact anchors), never sketch internals —
  * the q50/q104 discipline.
  *
  * Scale: the aggregation is one map-side partial per partition (a
  * ~3k-double object) + a log-depth merge — the shuffle carries
  * sketches, never values. State size is O(k log(n/k)) regardless of
  * n: the 100 TB fold ships kilobytes per executor. */
object Kll {

  private val MinCap = 8
  private val Ratio = 2.0 / 3.0

  /** Mutable sketch. `levels(l)` holds the items of weight 2^l,
    * unsorted at level 0, sorted above (compaction sorts). */
  final class KllSketch(val k: Int) extends Serializable {
    require(k >= 16, s"k=$k too small for a useful bound")
    var n: Long = 0L
    var minV: Double = Double.PositiveInfinity
    var maxV: Double = Double.NegativeInfinity
    var compactions: Long = 0L
    var levels: Array[scala.collection.mutable.ArrayBuffer[Double]] =
      Array(new scala.collection.mutable.ArrayBuffer[Double](k))

    private def capacity(l: Int): Int = {
      val fromTop = levels.length - 1 - l
      math.max(MinCap, math.ceil(k * math.pow(Ratio, fromTop)).toInt)
    }

    private def totalCapacity: Int =
      (0 until levels.length).map(capacity).sum

    private def size: Int = levels.map(_.length).sum

    /** Deterministic compaction coin: hash of the sketch's progress —
      * identical folds replay identically. */
    private def coin(level: Int): Boolean = {
      var h = n * 0x9E3779B97F4A7C15L + level * 0xC2B2AE3D27D4EB4FL +
        compactions * 0x165667B19E3779F9L
      h ^= (h >>> 31); h *= 0x7FB5D329728EA185L; h ^= (h >>> 27)
      (h & 1L) == 1L
    }

    def update(v: Double): Unit = {
      n += 1
      if (v < minV) minV = v
      if (v > maxV) maxV = v
      levels(0) += v
      if (size > totalCapacity) compress()
    }

    private def compress(): Unit = {
      var guard = 0
      while (size > totalCapacity && guard < 64) {
        guard += 1
        val l = (0 until levels.length)
          .find(i => levels(i).length >= capacity(i))
          .getOrElse(levels.length - 1)
        if (l == levels.length - 1)
          levels = levels :+ new scala.collection.mutable.ArrayBuffer[Double]
        val buf = levels(l)
        if (buf.length >= 2) {
          val sorted = buf.sorted
          val odd = sorted.length % 2 == 1
          val keepOdd = if (odd) Some(sorted.last) else None
          val even = if (odd) sorted.dropRight(1) else sorted
          val offset = if (coin(l)) 1 else 0
          compactions += 1
          val promoted = even.indices.collect {
            case i if i % 2 == offset => even(i)
          }
          levels(l) = new scala.collection.mutable.ArrayBuffer[Double]
          keepOdd.foreach(levels(l) += _)
          levels(l + 1) ++= promoted
        }
      }
    }

    def merge(other: KllSketch): KllSketch = {
      require(other.k == k, s"merging sketches of different k: $k vs ${other.k}")
      if (other.n == 0) return this
      n += other.n
      if (other.minV < minV) minV = other.minV
      if (other.maxV > maxV) maxV = other.maxV
      compactions += other.compactions
      while (levels.length < other.levels.length)
        levels = levels :+ new scala.collection.mutable.ArrayBuffer[Double]
      other.levels.indices.foreach(l => levels(l) ++= other.levels(l))
      if (size > totalCapacity) compress()
      this
    }

    /** Estimated rank (count of values <= x), from item weights. */
    def rank(x: Double): Long =
      levels.indices.map { l =>
        levels(l).count(_ <= x).toLong << l
      }.sum

    /** Estimated φ-quantile: the smallest retained item whose
      * cumulative weight reaches φ·n (1-based, inclusive). Exact when
      * no compaction ever ran (small n). */
    def quantile(phi: Double): Double = {
      require(phi >= 0.0 && phi <= 1.0, s"phi=$phi")
      if (n == 0) return Double.NaN
      val weighted = levels.indices.flatMap { l =>
        levels(l).map(v => (v, 1L << l))
      }.sortBy(_._1)
      val targetRank = math.max(1L, math.ceil(phi * n).toLong)
      var cum = 0L
      var i = 0
      var res = maxV
      var found = false
      while (i < weighted.length && !found) {
        cum += weighted(i)._2
        if (cum >= targetRank) { res = weighted(i)._1; found = true }
        i += 1
      }
      res
    }

    def serialize(): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(k); out.writeLong(n)
      out.writeDouble(minV); out.writeDouble(maxV)
      out.writeLong(compactions)
      out.writeInt(levels.length)
      levels.foreach { buf =>
        out.writeInt(buf.length)
        buf.foreach(out.writeDouble)
      }
      out.close()
      bos.toByteArray
    }
  }

  def empty(k: Int): KllSketch = new KllSketch(k)

  def deserialize(bytes: Array[Byte]): KllSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new KllSketch(in.readInt())
    sk.n = in.readLong()
    sk.minV = in.readDouble(); sk.maxV = in.readDouble()
    sk.compactions = in.readLong()
    sk.levels = Array.fill(in.readInt()) {
      val len = in.readInt()
      val buf = new scala.collection.mutable.ArrayBuffer[Double](len)
      (0 until len).foreach(_ => buf += in.readDouble())
      buf
    }
    sk
  }

  /** The typed aggregator: partial sketches per partition, log-depth
    * merge, serialized sketch out (BINARY — the persistable state the
    * incremental/streamed folds store in [[graft.sinks.LedgeredState]]).
    * Null-safe: nulls are skipped (arrive as NaN via the udaf's
    * double bridge — filtered before update). */
  final class KllAggregator(k: Int)
      extends Aggregator[Double, KllSketch, Array[Byte]] {
    override def zero: KllSketch = empty(k)
    override def reduce(b: KllSketch, a: Double): KllSketch = {
      if (!a.isNaN) b.update(a)
      b
    }
    override def merge(b1: KllSketch, b2: KllSketch): KllSketch =
      b1.merge(b2)
    override def finish(r: KllSketch): Array[Byte] = r.serialize()
    override def bufferEncoder: Encoder[KllSketch] =
      Encoders.kryo[KllSketch]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge a set of serialized sketches into one (the state fold). */
  def mergeBytes(parts: Seq[Array[Byte]], k: Int): KllSketch =
    parts.foldLeft(empty(k))((acc, b) => acc.merge(deserialize(b)))
}

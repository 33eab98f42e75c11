package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star mandate; no reference counterpart and
  * no driver fixture — the synthetic generator below provides the test
  * corpus): image/audio/video as opaque BINARY columns plus a typed
  * metadata struct, with decode / feature-extract / resize / frame-sample
  * as partition-wise batch operators.
  *
  * The Spark-side plumbing is REAL — schema, partitioning, per-partition
  * batch iteration, init-once-per-partition codec lifecycle (the JVM
  * analog of arrow-batched Python UDFs: expensive codec state is built
  * once per partition and streamed over its rows, never per row, never on
  * the driver). The codec itself is a clearly-marked deterministic STUB
  * (`FakeCodec`) because no real image/audio library ships in this
  * environment; a production deployment swaps one `MediaCodec`
  * implementation in and every operator, test, and plan shape holds.
  *
  * Scale notes: media rows are large (binary payload), so operators here
  * never shuffle payloads — decode/feature/resize are narrow map
  * partitions over the scan, and frame sampling explodes WITHIN the
  * partition. Feature vectors (small) are what downstream joins/ANN
  * shuffle, feeding [[graft.operators.SimilarityQueries]].
  */
object Media {

  final case class MediaMeta(kind: String, format: String, width: Int, height: Int,
                             sampleRate: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class DecodedRow(media_id: Long, kind: String, content: Array[Byte],
                              meta: MediaMeta)
  final case class FeatureRow(media_id: Long, kind: String, feature: Array[Float])
  final case class DecodedFeatureRow(media_id: Long, kind: String,
                                     meta: MediaMeta, feature: Array[Float])
  final case class FrameRow(media_id: Long, frame_idx: Int, ts_ms: Long,
                            frame: Array[Byte])

  /** Codec boundary: one instance per PARTITION (see decode), so an
    * expensive native init amortizes over the partition's rows. */
  trait MediaCodec extends Serializable {
    def init(): Unit
    def decodeMeta(content: Array[Byte]): MediaMeta
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** STUB — deterministic fake codec. "Decoding" parses the synthetic
    * 16-byte header `[magic(4) | width(4) | height(4) | rate(4)]` written
    * by [[SyntheticMedia]]; "resize" rewrites the header and truncates
    * payload proportionally. Every output is a pure function of the
    * input bytes, so tests pin exact values. A real build replaces this
    * with a javacpp/JNI-backed implementation — nothing else changes. */
  final class FakeCodec extends MediaCodec {
    @volatile private var initialized = false
    override def init(): Unit = { initialized = true }
    private def readInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    override def decodeMeta(content: Array[Byte]): MediaMeta = {
      require(initialized, "codec used before init() — per-partition lifecycle broken")
      require(content.length >= 16, s"truncated media header: ${content.length} bytes")
      val magic = readInt(content, 0)
      val kind = magic match {
        case 0x494d4700 => "image" // "IMG\0"
        case 0x41554400 => "audio" // "AUD\0"
        case 0x56494400 => "video" // "VID\0"
        case m => throw new IllegalArgumentException(f"bad magic 0x$m%08x")
      }
      val w = readInt(content, 4)
      val h = readInt(content, 8)
      val rate = readInt(content, 12)
      val durationMs = kind match {
        case "image" => 0L
        case _       => (content.length - 16).toLong * 1000 / math.max(rate, 1)
      }
      MediaMeta(kind, s"fake-$kind", w, h, rate, durationMs)
    }
    override def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      require(initialized, "codec used before init()")
      val meta = decodeMeta(content)
      val scale = (w.toLong * h) / math.max(meta.width.toLong * meta.height, 1L).toDouble
      val bodyAvail = content.length - 16
      // clamp to the available payload: a header-only blob has bodyAvail=0
      // and a lower bound of 1 would arraycopy past the source end
      val bodyLen = math.min(bodyAvail,
        math.max(if (bodyAvail == 0) 0 else 1, (bodyAvail * math.min(scale, 1.0)).toInt))
      val out = new Array[Byte](16 + bodyLen)
      System.arraycopy(content, 0, out, 0, 16)
      writeInt(out, 4, w); writeInt(out, 8, h)
      System.arraycopy(content, 16, out, 16, bodyLen)
      out
    }
    private def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
  }

  /** REAL image codec — `javax.imageio` (on every JVM, zero new
    * dependencies) behind the same per-partition lifecycle as
    * [[FakeCodec]]: decode sniffs the container (PNG/JPEG/GIF/BMP) from
    * the bytes and reads true dimensions; resize re-renders through
    * `Graphics2D` and re-encodes as PNG. The synthetic fixtures keep
    * using [[FakeCodec]] (their blobs are not real images); planted-image
    * tests pin this one (MediaSpec). `init()` disables ImageIO's
    * disk-backed stream cache — an executor-local temp-file write per
    * image is exactly the per-row overhead the per-partition lifecycle
    * exists to avoid. */
  final class ImageIoCodec extends MediaCodec {
    @volatile private var initialized = false
    override def init(): Unit = {
      javax.imageio.ImageIO.setUseCache(false) // heap streams, no temp files
      initialized = true
    }
    private def readerFor(content: Array[Byte]): (javax.imageio.ImageReader,
        javax.imageio.stream.ImageInputStream) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "unrecognized image container")
      val r = readers.next()
      r.setInput(iis)
      (r, iis)
    }
    override def decodeMeta(content: Array[Byte]): MediaMeta = {
      require(initialized, "codec used before init() — per-partition lifecycle broken")
      val (r, iis) = readerFor(content)
      try MediaMeta("image", r.getFormatName.toLowerCase,
        r.getWidth(0), r.getHeight(0), 0, 0L)
      finally { r.dispose(); iis.close() }
    }
    override def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      require(initialized, "codec used before init()")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      require(img != null, "undecodable image payload")
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** REAL multi-frame container — animated GIF through `javax.imageio`'s
    * SEQUENCE reader/writer (on every JVM, zero new dependencies): the
    * container-level analog of [[ImageIoCodec]] for the frame-sampling
    * shape [[sampleFrames]] runs over the fake codec. GIF is LZW
    * LOSSLESS with a per-frame color table, so solid-color frames round
    * trip bit-exactly — which is what lets q232 gate real sampled-frame
    * PIXELS arithmetically, not just counts. Call the helpers from a
    * per-partition `mapPartitions` (the q37/q226 lifecycle); payload
    * bytes never shuffle. */
  object Gif {
    /** Encode same-sized frames as one animated GIF. */
    def encode(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      require(frames.nonEmpty, "an animated GIF needs at least one frame")
      javax.imageio.ImageIO.setUseCache(false)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach(f => writer.writeToSequence(
          new javax.imageio.IIOImage(f, null, null), null))
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    private def readerFor(content: Array[Byte])
        : (javax.imageio.ImageReader, javax.imageio.stream.ImageInputStream) = {
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      r.setInput(iis)
      (r, iis)
    }

    /** Frame count via the sequence reader's index walk (headers only —
      * `getNumImages(true)` seeks, it does not decode pixel data). */
    def frameCount(content: Array[Byte]): Int = {
      val (r, iis) = readerFor(content)
      try r.getNumImages(true) finally { r.dispose(); iis.close() }
    }

    /** Decode exactly frame `i` — the sequence reader seeks to it, so a
      * k-th-frame sample never pays for the frames around it. */
    def frame(content: Array[Byte], i: Int): java.awt.image.BufferedImage = {
      val (r, iis) = readerFor(content)
      try r.read(i) finally { r.dispose(); iis.close() }
    }
  }

  /** REAL audio codec — `javax.sound.sampled` WAV (on every JVM, zero
    * new dependencies) behind the same per-partition lifecycle:
    * `decodeMeta` parses the RIFF header via `AudioSystem` (true sample
    * rate, channel count, bit depth, frame-derived duration);
    * `resize(w, h)` is reinterpreted for the audio axis as TRIM — keep
    * the first `w` frames (h ignored) and re-encode as WAV, the
    * deterministic clip operation a training-data pipeline runs on
    * audio the way it resizes images. Oracle-gated by q227 on real
    * generated PCM; the per-partition `init()` keeps the
    * one-instance-per-partition contract every codec shares. */
  final class WavCodec extends MediaCodec {
    @volatile private var initialized = false
    override def init(): Unit = { initialized = true }
    override def decodeMeta(content: Array[Byte]): MediaMeta = {
      require(initialized, "codec used before init() — per-partition lifecycle broken")
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(content))
      val f = aff.getFormat
      val rate = math.round(f.getSampleRate)
      val durationMs =
        if (aff.getFrameLength < 0 || rate <= 0) 0L
        else aff.getFrameLength.toLong * 1000L / rate
      MediaMeta("audio", aff.getType.getExtension.toLowerCase,
        f.getChannels, f.getSampleSizeInBits, rate, durationMs)
    }
    override def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      require(initialized, "codec used before init()")
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val trimmed = new javax.sound.sampled.AudioInputStream(
          in, in.getFormat, math.min(w.toLong, in.getFrameLength))
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(trimmed,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      } finally in.close()
    }
  }

  /** Decode metadata for every row: one codec per partition, initialized
    * once, streamed over the partition's batch iterator. */
  def decode(media: Dataset[MediaRow],
             mkCodec: () => MediaCodec = () => new FakeCodec): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = mkCodec() // per-partition, NOT per-row
      codec.init()
      rows.map(r => DecodedRow(r.media_id, r.kind, r.content,
        codec.decodeMeta(r.content)))
    }
  }

  /** The histogram kernel shared by [[byteHistogram]] and
    * [[decodeFeatures]] — 64-bin byte histogram of the payload (past the
    * header), L1-normalized. */
  private def histOf(content: Array[Byte], bins: Int): Array[Float] = {
    val counts = new Array[Float](bins)
    var i = 16
    while (i < content.length) {
      counts((content(i) & 0xff) * bins / 256) += 1f
      i += 1
    }
    val total = math.max(1f, (content.length - 16).toFloat)
    var j = 0
    while (j < bins) { counts(j) /= total; j += 1 }
    counts
  }

  /** Feature extraction: 64-bin byte histogram of the payload (past the
    * header), L1-normalized — a real, deterministic computation standing
    * in for an embedding model; output feeds the vector ops/ANN path. */
  def byteHistogram(media: Dataset[MediaRow], bins: Int = 64): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => FeatureRow(r.media_id, r.kind, histOf(r.content, bins)))
    }
  }

  /** Fused decode + feature extraction: ONE pass over the payload bytes
    * per row, emitting only the small (meta, feature) projection. This is
    * the production shape for a payload-heavy corpus — the blobs are read
    * exactly once, and what survives the stage (and is worth persisting
    * downstream) carries no binary payload at all. Separate
    * [[decode]]/[[byteHistogram]] calls each re-run their input's lineage;
    * q37 moved to this form so the decode happens once per document. */
  def decodeFeatures(media: Dataset[MediaRow], bins: Int = 64,
                     mkCodec: () => MediaCodec = () => new FakeCodec)
      : Dataset[DecodedFeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = mkCodec() // per-partition, NOT per-row
      codec.init()
      rows.map(r => DecodedFeatureRow(r.media_id, r.kind,
        codec.decodeMeta(r.content), histOf(r.content, bins)))
    }
  }

  /** 64-bit byte-4-gram SimHash signature of each payload (past the
    * header) as two 32-bit words — the BINARY near-dup sketch (the
    * ssdeep/sdhash idea recast as simhash so it plugs into the existing
    * pigeonhole machinery): distinct rolling 4-byte grams vote per bit
    * via their md5-derived hashes, exactly the word-token rule of
    * [[graft.operators.Dedup.simhashSignatures]] with bytes for words.
    * Gram-set signatures are shift-robust (an insertion perturbs O(4)
    * grams, not every position), which is what makes this a NEAR-dup
    * sketch rather than a block hash; md5-per-gram is the
    * oracle-reproducible hash family (the q20b precedent: production
    * would swap xxhash64, same structure).
    *
    * One narrow pass per row, O(payload) work, emits 16 bytes — the
    * payload itself never shuffles. Output (id, sh_lo, sh_hi) feeds
    * [[graft.operators.Dedup.simhashPairsFromSigs]] or a persistent
    * signature index. Payloads under 4 bytes have no grams and drop. */
  def byteGramSimhash(media: Dataset[MediaRow], headerBytes: Int = 16): Dataset[(Long, Long, Long)] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5") // per partition
      rows.flatMap { r =>
        val c = r.content
        if (c.length - headerBytes < 4) Iterator.empty
        else {
          val seen = new java.util.HashSet[Integer]()
          val votesLo = new Array[Int](32)
          val votesHi = new Array[Int](32)
          var i = headerBytes
          while (i <= c.length - 4) {
            val packed = ((c(i) & 0xff) << 24) | ((c(i + 1) & 0xff) << 16) |
              ((c(i + 2) & 0xff) << 8) | (c(i + 3) & 0xff)
            if (seen.add(packed)) {
              // uppercase hex of the 4 gram bytes == DuckDB's hex(BLOB)
              md.reset()
              val d = md.digest(f"$packed%08X".getBytes("US-ASCII"))
              val lo = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
                ((d(2) & 0xff) << 8) | (d(3) & 0xff)
              val hi = ((d(4) & 0xff) << 24) | ((d(5) & 0xff) << 16) |
                ((d(6) & 0xff) << 8) | (d(7) & 0xff)
              var j = 0
              while (j < 32) {
                if ((lo & (1 << j)) != 0) votesLo(j) += 1 else votesLo(j) -= 1
                if ((hi & (1 << j)) != 0) votesHi(j) += 1 else votesHi(j) -= 1
                j += 1
              }
            }
            i += 1
          }
          var shLo = 0L; var shHi = 0L
          var j = 0
          while (j < 32) {
            if (votesLo(j) >= 0) shLo |= 1L << j
            if (votesHi(j) >= 0) shHi |= 1L << j
            j += 1
          }
          Iterator.single((r.media_id, shLo, shHi))
        }
      }
    }
  }

  /** Resize via the per-partition codec (STUB semantics, real lifecycle
    * + batch shape). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int,
             mkCodec: () => MediaCodec = () => new FakeCodec): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = mkCodec(); codec.init()
      rows.map(r => MediaRow(r.media_id, r.kind, codec.resize(r.content, w, h)))
    }
  }

  /** Frame sampling: one output row per `everyMs` of video duration, the
    * frame payload sliced deterministically from the content — an
    * intra-partition flatMap (explode), so large payloads never shuffle. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long,
                   mkCodec: () => MediaCodec = () => new FakeCodec): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = mkCodec(); codec.init()
      rows.flatMap { r =>
        val meta = codec.decodeMeta(r.content)
        if (meta.kind != "video" || meta.durationMs == 0) Iterator.empty
        else {
          val n = (meta.durationMs / everyMs).toInt + 1
          val body = r.content.length - 16
          (0 until n).iterator.map { i =>
            val tsMs = i * everyMs
            val off = 16 + ((body.toLong * tsMs) / math.max(meta.durationMs, 1)).toInt
            val len = math.min(256, r.content.length - off)
            FrameRow(r.media_id, i, tsMs,
              java.util.Arrays.copyOfRange(r.content, off, off + math.max(len, 0)))
          }
        }
      }
    }
  }

  /** Typed media frame as a DataFrame with the binary + struct schema the
    * mandate names (content binary, meta struct). */
  def asTable(decoded: Dataset[DecodedRow]): DataFrame =
    decoded.toDF().select(col("media_id"), col("kind"), col("content"),
      col("meta.format").as("format"), col("meta.width").as("width"),
      col("meta.height").as("height"), col("meta.sampleRate").as("sample_rate"),
      col("meta.durationMs").as("duration_ms"))
}

/** Deterministic synthetic media generator (seeded; the multimodal analog
  * of [[graft.sources.SyntheticSource]]): binary blobs with the fake
  * 16-byte header + pseudo-random payload. */
object SyntheticMedia {
  import Media._

  def blob(kind: String, id: Long, payloadLen: Int): Array[Byte] = {
    val magic = kind match {
      case "image" => 0x494d4700
      case "audio" => 0x41554400
      case "video" => 0x56494400
    }
    val (w, h, rate) = kind match {
      case "image" => (64 + (id % 8).toInt * 32, 64 + (id % 5).toInt * 32, 0)
      case "audio" => (0, 0, 16000)
      case "video" => (320, 240, 1000) // 1000 B/s → durationMs == payloadLen
    }
    val out = new Array[Byte](16 + payloadLen)
    def writeInt(off: Int, v: Int): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    writeInt(0, magic); writeInt(4, w); writeInt(8, h); writeInt(12, rate)
    val rng = new scala.util.Random(id * 31 + kind.hashCode)
    var i = 16
    while (i < out.length) { out(i) = rng.nextInt(256).toByte; i += 1 }
    out
  }

  def generate(spark: SparkSession, n: Int, nPartitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).repartition(nPartitions).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      MediaRow(id, kind, blob(kind, id, 1000 + (id % 7).toInt * 500))
    }
  }
}

package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import graft.multimodal.{Media, SyntheticMedia}
import graft.multimodal.Media._

/** Multimodal plumbing: schema, partitioning, per-partition codec
  * lifecycle, deterministic stub decode, feature shape, frame-sample
  * cardinality. The codec is a stub; everything the engine owns (batch
  * iteration, explode-without-shuffle, typed schema) is real and pinned. */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = SyntheticMedia.generate(spark, 90, nPartitions = 5)

  test("decode parses the typed metadata struct for every kind") {
    val decoded = Media.decode(corpus).collect()
    assert(decoded.length == 90)
    val byKind = decoded.groupBy(_.kind)
    assert(byKind.keySet == Set("image", "audio", "video"))
    byKind("image").foreach { d =>
      assert(d.meta.kind == "image" && d.meta.width >= 64 && d.meta.durationMs == 0)
    }
    byKind("audio").foreach(d => assert(d.meta.sampleRate == 16000))
    // video rate is 1000 B/s, so durationMs == payload length
    byKind("video").foreach(d => assert(d.meta.durationMs == d.content.length - 16))
  }

  test("codec initializes once per partition, not per row") {
    MediaSpec.initCount.set(0)
    val counting = () => new Media.MediaCodec {
      private val inner = new FakeCodec
      override def init(): Unit = { MediaSpec.initCount.incrementAndGet(); inner.init() }
      override def decodeMeta(c: Array[Byte]): MediaMeta = inner.decodeMeta(c)
      override def resize(c: Array[Byte], w: Int, h: Int): Array[Byte] = inner.resize(c, w, h)
    }
    Media.decode(corpus, counting).collect()
    val inits = MediaSpec.initCount.get()
    assert(inits == 5, s"expected one codec init per partition (5), got $inits")
  }

  test("typed media table exposes binary + flattened metadata columns") {
    val table = Media.asTable(Media.decode(corpus))
    assert(table.schema("content").dataType.typeName == "binary")
    assert(Seq("media_id", "kind", "format", "width", "height", "sample_rate",
      "duration_ms").forall(table.columns.contains))
    assert(table.filter(col("kind") === "video")
      .select(min(col("duration_ms"))).collect()(0).getLong(0) >= 1000)
  }

  test("byte histogram is a normalized fixed-width feature vector") {
    val feats = Media.byteHistogram(corpus, bins = 64).collect()
    assert(feats.length == 90)
    feats.foreach { f =>
      assert(f.feature.length == 64)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3, "L1-normalized")
      assert(f.feature.forall(_ >= 0f))
    }
    // determinism: same input → same feature
    val again = Media.byteHistogram(corpus, bins = 64).collect()
    assert(feats.sortBy(_.media_id).map(_.feature.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.feature.toSeq).toSeq)
  }

  test("fused decodeFeatures equals separate decode + byteHistogram passes") {
    val fused = Media.decodeFeatures(corpus, bins = 64).collect()
      .map(r => r.media_id -> (r.meta, r.feature.toSeq)).toMap
    val metas = Media.decode(corpus).collect()
      .map(r => r.media_id -> r.meta).toMap
    val feats = Media.byteHistogram(corpus, bins = 64).collect()
      .map(r => r.media_id -> r.feature.toSeq).toMap
    assert(fused.keySet == metas.keySet && fused.keySet == feats.keySet)
    fused.foreach { case (id, (meta, feature)) =>
      assert(meta == metas(id), s"meta mismatch for $id")
      assert(feature == feats(id), s"feature mismatch for $id")
    }
  }

  test("features flow into the vector similarity path (dot with itself = |x|²)") {
    val feats = Media.byteHistogram(corpus).toDF()
    val norms = feats.select(
      graft.functions.VectorFunctions.dot(col("feature"), col("feature")).as("d"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(d => d > 0.0 && d <= 1.0), "L1-normalized hist ⇒ 0 < |x|² ≤ 1")
  }

  test("resize handles a header-only (zero-payload) blob without reading past it") {
    val codec = new FakeCodec
    codec.init()
    val headerOnly = java.util.Arrays.copyOf(SyntheticMedia.blob("image", 1L, 0), 16)
    val out = codec.resize(headerOnly, 8, 8)
    assert(out.length == 16)
    assert(codec.decodeMeta(out).width == 8)
  }

  test("resize rewrites dimensions and shrinks payload, never grows it") {
    val images = corpus.filter(_.kind == "image")
    val resized = Media.decode(Media.resize(images, 32, 32)).collect()
    resized.foreach { d =>
      assert(d.meta.width == 32 && d.meta.height == 32)
    }
    val origSizes = images.collect().map(r => r.media_id -> r.content.length).toMap
    resized.foreach(d => assert(d.content.length <= origSizes(d.media_id)))
  }

  test("frame sampling yields duration/everyMs + 1 frames per video, no shuffle") {
    // parquet-backed source so the plan under audit is scan → sample only
    // (the in-memory generator carries its own repartition exchange)
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    corpus.filter(_.kind == "video").write.mode("overwrite").parquet(dir)
    val videos = spark.read.parquet(dir).as[MediaRow]
    val frames = Media.sampleFrames(videos, everyMs = 500)
    val byId = frames.collect().groupBy(_.media_id)
    val durations = Media.decode(corpus.filter(_.kind == "video")).collect()
      .map(d => d.media_id -> d.meta.durationMs).toMap
    byId.foreach { case (id, fs) =>
      assert(fs.length == (durations(id) / 500).toInt + 1, s"video $id")
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
      assert(fs.forall(_.frame.length <= 256))
    }
    // narrow op: no exchange in the sampled-frames plan
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"frame sampling must not shuffle binary payloads:\n$plan")
  }

  test("feature extraction is payload-narrow: scan → histogram with no exchange") {
    // the q37 shape: binary payloads stay within their scan partitions;
    // only the (small) feature vectors continue into the ANN path
    val dir = java.nio.file.Files.createTempDirectory("graft_media_feat").toString
    corpus.write.mode("overwrite").parquet(dir)
    val media = spark.read.parquet(dir).as[MediaRow]
    val feats = Media.byteHistogram(media, bins = 64)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"byte-histogram features must not shuffle binary payloads:\n$plan")
    assert(feats.collect().forall(f => math.abs(f.feature.sum - 1f) < 1e-3))
  }

  test("ImageIoCodec: real PNG/JPEG decode and resize behind the same lifecycle") {
    // plant REAL images (encoded in-test via javax.imageio — no fixtures,
    // no new dependencies), push them through the SAME Media.decode /
    // Media.resize operators the stub codec drives, and pin true
    // dimensions and formats end to end
    def realBlob(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "image", realBlob("png", 48, 32)),
      MediaRow(2L, "image", realBlob("jpg", 20, 60)),
      MediaRow(3L, "image", realBlob("png", 7, 9)))
    val ds = spark.createDataset(rows).repartition(2)
    val decoded = Media.decode(ds, () => new Media.ImageIoCodec)
      .collect().map(d => d.media_id -> d.meta).toMap
    assert(decoded(1L) == MediaMeta("image", "png", 48, 32, 0, 0L))
    assert(decoded(2L).format == "jpeg" || decoded(2L).format == "jpg")
    assert(decoded(2L).width == 20 && decoded(2L).height == 60)
    assert(decoded(3L) == MediaMeta("image", "png", 7, 9, 0, 0L))
    // resize re-renders for real: decoding the output yields the target
    // dimensions whatever the input container was
    val resized = Media.resize(ds, 16, 12, () => new Media.ImageIoCodec)
    val back = Media.decode(resized, () => new Media.ImageIoCodec)
      .collect().map(d => d.media_id -> d.meta).toMap
    rows.foreach(r => assert(back(r.media_id).width == 16 &&
      back(r.media_id).height == 12, s"row ${r.media_id}: ${back(r.media_id)}"))
    // a non-image payload fails loudly, not silently
    val junk = spark.createDataset(Seq(MediaRow(9L, "image",
      Array.fill[Byte](64)(7))))
    intercept[org.apache.spark.SparkException] {
      Media.decode(junk, () => new Media.ImageIoCodec).collect()
    }
  }

  test("WavCodec: real WAV decode and frame-trim behind the same lifecycle") {
    def wavBlob(rate: Float, channels: Int, frames: Int): Array[Byte] = {
      val pcm = new Array[Byte](frames * channels * 2)
      (pcm.indices).foreach(i => pcm(i) = (i % 251).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels,
        true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "audio", wavBlob(8000f, 1, 4000)),   // 500 ms mono
      MediaRow(2L, "audio", wavBlob(16000f, 2, 8000)))  // 500 ms stereo
    val ds = spark.createDataset(rows).repartition(2)
    val decoded = Media.decode(ds, () => new Media.WavCodec)
      .collect().map(d => d.media_id -> d.meta).toMap
    assert(decoded(1L) == MediaMeta("audio", "wav", 1, 16, 8000, 500L))
    assert(decoded(2L) == MediaMeta("audio", "wav", 2, 16, 16000, 500L))
    // trim keeps the first w frames; a trim past the end clamps
    val trimmed = Media.resize(ds, 2000, 0, () => new Media.WavCodec)
    val back = Media.decode(trimmed, () => new Media.WavCodec)
      .collect().map(d => d.media_id -> d.meta).toMap
    assert(back(1L).durationMs == 250L && back(2L).durationMs == 125L)
    val over = Media.resize(ds, 1 << 20, 0, () => new Media.WavCodec)
    val backOver = Media.decode(over, () => new Media.WavCodec)
      .collect().map(d => d.media_id -> d.meta).toMap
    assert(backOver(1L).durationMs == 500L, "over-trim must clamp")
    // junk fails loudly
    val junk = spark.createDataset(Seq(MediaRow(9L, "audio",
      Array.fill[Byte](64)(7))))
    intercept[org.apache.spark.SparkException] {
      Media.decode(junk, () => new Media.WavCodec).collect()
    }
  }

  test("q43 media gate: frame-sampling and resize invariants hold") {
    val row = operators.MediaQueries.q43MediaFrames(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_videos") > 0 && row.getAs[Long]("n_frames") > 0)
    assert(row.getAs[Boolean]("frame0_ok"),
      "frame 0 must start at the first payload byte (independent recompute from text)")
    assert(row.getAs[Boolean]("frame_len_ok"))
    assert(row.getAs[Boolean]("resize_ok"))
  }

  test("q37 media gate: anchors + booleans hold end-to-end") {
    val rows = graft.operators.MediaQueries.q37MediaAnn(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("n_dup_pairs") > 0, "fixture must yield replica pairs")
    assert(r.getAs[Boolean]("meta_ok"), "decoded headers must round-trip")
    assert(r.getAs[Boolean]("hist_ok"), "histograms must be unit-L1")
    assert(r.getAs[Boolean]("dup_found_ok"),
      "SRP over centered features must surface every replica pair")
  }

  test("byte-gram simhash: identical payloads match, edits drift, shorts drop") {
    import spark.implicits._
    def blob(payload: String): Array[Byte] = {
      val b = payload.getBytes("UTF-8")
      val out = new Array[Byte](16 + b.length)
      System.arraycopy(b, 0, out, 0, 0) // header left zeroed: content past 16 is what signs
      System.arraycopy(b, 0, out, 16, b.length)
      out
    }
    val a  = "the quick brown fox jumps over the lazy dog"
    val a2 = a + " qq"
    val b  = "completely different payload bytes with other words entirely"
    val media = Seq(
      Media.MediaRow(1L, "image", blob(a)),
      Media.MediaRow(2L, "image", blob(a)),   // exact copy
      Media.MediaRow(3L, "image", blob(a2)),  // small edit
      Media.MediaRow(4L, "image", blob(b)),   // unrelated
      Media.MediaRow(5L, "image", blob("xy")) // < 4 payload bytes: no grams
    ).toDS()
    val sigs = Media.byteGramSimhash(media).collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(!sigs.contains(5L), "sub-gram payloads carry no signal")
    assert(sigs(1L) == sigs(2L), "identical payloads must sign identically")
    def ham(x: (Long, Long), y: (Long, Long)): Int =
      java.lang.Long.bitCount(x._1 ^ y._1) + java.lang.Long.bitCount(x._2 ^ y._2)
    val editDrift = ham(sigs(1L), sigs(3L))
    val unrelated = ham(sigs(1L), sigs(4L))
    assert(editDrift > 0, "an edit must move the signature")
    assert(editDrift < unrelated,
      s"edit drift $editDrift must stay below unrelated distance $unrelated")
  }

  test("media ingest: the arrival schedule never changes the final index") {
    import graft.operators.{MediaQueries, MergeQueries}
    val corpus = MediaQueries.mediaCorpus(spark, sf)
    def ingest(table: String, days: Seq[Media.MediaRow => Boolean]): Array[(Long, Long)] =
      try {
        days.foreach { pred =>
          val sigs = Media.byteGramSimhash(corpus.filter(pred))
            .toDF("id", "sh_lo", "sh_hi")
          MergeQueries.neardupIngestSigsBucketed(spark, table, sigs, nBuckets = 4)
        }
        spark.table(table).select("doc_id", "survivor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    // schedule A: originals first, then replicas+mutants (q103's split);
    // schedule B: odd underlying ids first, then even (+ a re-delivery)
    val a = ingest("graft_ms_ing_a",
      Seq(r => r.media_id < 10000000L, r => r.media_id >= 10000000L))
    val b = ingest("graft_ms_ing_b",
      Seq(r => (r.media_id % 10000000L) % 2 == 1,
          r => (r.media_id % 10000000L) % 2 == 0 || r.media_id % 3 == 0))
    assert(a.nonEmpty && a.length == b.length)
    assert(a.toSeq == b.toSeq,
      "final (media_id, survivor_id) must be schedule-independent")
    // every exact replica resolves to its original as survivor
    a.filter(_._1 >= 10000000L).filter(_._1 < 20000000L).foreach { case (id, surv) =>
      assert(surv == id - 10000000L || surv < id - 10000000L,
        s"replica $id must cluster with (or below) its original, got $surv")
    }
  }

  test("q98 media near-dup: every exact replica pair surfaces at Hamming 0") {
    val pairs = graft.operators.MediaQueries.q98MediaNeardup(spark, sf).collect()
    assert(pairs.nonEmpty)
    val byPair = pairs.map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
      r.getAs[Long]("hamming")).toMap
    val docs = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) >= 4)
      .select("doc_id").collect().map(_.getLong(0))
    val replicaPairs = docs.filter(_ % 50 == 0).map(id => (id, id + 10000000L))
    replicaPairs.foreach { p =>
      assert(byPair.get(p).contains(0L), s"replica pair $p missing or nonzero")
    }
    pairs.foreach(r => assert(r.getAs[Long]("hamming") <= 3))
  }

  test("animated GIF: frame count, per-frame seek isolation, lossless pixels") {
    val frames = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(5, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = img.createGraphics()
      try {
        g2.setColor(new java.awt.Color(10 + f, 20 + 2 * f, 30 + 3 * f))
        g2.fillRect(0, 0, 5, 4)
      } finally g2.dispose()
      img
    }
    val bytes = Media.Gif.encode(frames)
    assert(Media.Gif.frameCount(bytes) == 3)
    (0 until 3).foreach { f =>
      val img = Media.Gif.frame(bytes, f)
      assert(img.getWidth == 5 && img.getHeight == 4)
      val px = img.getRGB(2, 1)
      assert(((px >> 16) & 0xff) == 10 + f &&
        ((px >> 8) & 0xff) == 20 + 2 * f && (px & 0xff) == 30 + 3 * f,
        s"frame $f color mismatch: ${px.toHexString}")
    }
    // the single-image codec sniffs the same bytes as a gif container
    val codec = new Media.ImageIoCodec; codec.init()
    val meta = codec.decodeMeta(bytes)
    assert(meta.format == "gif" && meta.width == 5 && meta.height == 4)
    // a single-frame animation is still a valid container
    assert(Media.Gif.frameCount(Media.Gif.encode(frames.take(1))) == 1)
  }
}

object MediaSpec {
  // static so executor-side (same-JVM local mode) increments are visible
  val initCount = new AtomicInteger(0)
}

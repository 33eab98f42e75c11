package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._
import graft.multimodal.Media

/** End-to-end multimodal entry (q37): the mandate's "multimodal columns"
  * feeding its "similarity search", not coexisting with it. Deterministic
  * media blobs are derived from the `documents` fixture (payload = the
  * document's UTF-8 bytes behind the synthetic 16-byte header), then:
  *
  *   decode (per-partition codec) → byteHistogram features →
  *   mean-centering → SRP-LSH pairs → gate row
  *
  * Centering is the load-bearing step: RAW byte histograms of natural
  * text are nearly collinear (every document is dominated by the same
  * letter-frequency profile, pairwise cosine ≈ 0.99), so both SRP sign
  * bits and the verify cosine would degenerate — every pair becomes a
  * candidate AND a "near-dup". Subtracting the corpus mean histogram
  * leaves per-document residuals: near-identical documents keep
  * near-identical residuals (cosine ≈ 1) while unrelated documents
  * decorrelate. The mean is a 64-value stats vector — constant-size,
  * collected once and embedded like IVF's broadcast centroids; at 100 TB
  * the same one-pass agg + broadcast applies.
  *
  * The reference pair set is DETERMINISTIC by construction: every 50th
  * document's blob is replicated under a shifted media_id. Identical
  * payloads give identical histograms, identical residuals (cosine
  * exactly 1) and identical SRP bits — so the pipeline MUST surface every
  * replica pair, whatever the hyperplanes; a miss means the plumbing
  * broke, never hash luck. (The fixture's own fingerprint clusters are
  * the wrong reference here: they share token SETS, not byte statistics
  * — measured centered cosine of those pairs falls well under any useful
  * threshold.) Duplicate-media detection via content features is the
  * production task this models.
  *
  * Gate (q26 tolerance-boolean pattern): anchors the oracle can compute
  * from `documents` (`n_media` incl. replicas, `n_dup_pairs`) plus
  * in-engine booleans:
  *  - `meta_ok`: every decoded header round-trips (codec plumbing);
  *  - `hist_ok`: every feature is a unit-L1 histogram (feature plumbing);
  *  - `dup_found_ok`: the SRP pipeline surfaced EVERY replica pair.
  */
object MediaQueries {

  private val Bins = 64
  private val SrpBands = 8
  private val SrpBitsPerBand = 6
  // seed differs from the embeddings planes: these hash 64-bin histogram
  // residuals, not embedding dims
  private val Planes = srpPlanes(SrpBands * SrpBitsPerBand, Bins, seed = 7L)
  private val CosThreshold = 0.8
  private val ReplicaEvery = 50L
  private val ReplicaOffset = 10000000L

  /** Deterministic media blob: synthetic image header (64×48, rate 0) +
    * the document text's UTF-8 bytes as payload. */
  private[operators] def textBlob(text: String): Array[Byte] = {
    val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](16 + body.length)
    def wi(off: Int, v: Int): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    wi(0, 0x494d4700); wi(4, 64); wi(8, 48); wi(12, 0)
    System.arraycopy(body, 0, out, 16, body.length)
    out
  }

  /** Subtract the corpus-mean histogram (one tiny agg, collected like a
    * set of centroids) so SRP bits and cosines act on residuals. */
  private def centered(feats: DataFrame): DataFrame = {
    val mean = feats.select(posexplode(col("v")))
      .groupBy("pos").agg(avg(col("col")).as("m"))
      .orderBy("pos").collect().map(_.getDouble(1)).toSeq
    feats.withColumn("v",
      zip_with(col("v"), typedlit(mean), (x, m) => x.cast("double") - m))
  }

  def q37MediaAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
    // ONE documents scan, ONE pass over the payload bytes: the replica
    // rows are emitted inline by the same flatMap that builds the
    // originals (sharing the blob bytes), and the fused decodeFeatures
    // stage reads each blob exactly once — what persists for the FOUR
    // downstream consumers (meta agg, histogram agg, centering mean, SRP
    // input) is the payload-FREE (meta, feature) projection. At 100 TB
    // this is the shape that matters: binary payloads are never
    // persisted, never shuffled, and decoded once.
    val media = docs.as[(Long, String)]
      .flatMap { case (id, text) =>
        val row = Media.MediaRow(id, "image", textBlob(text))
        if (id % ReplicaEvery == 0)
          Seq(row, Media.MediaRow(id + ReplicaOffset, "image", row.content))
        else Seq(row)
      }
    val decoded = Media.decodeFeatures(media, bins = Bins).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // decode through the per-partition codec: header must round-trip
    val metaAgg = decoded
      .select(col("meta.kind").as("k"), col("meta.width").as("w"),
        col("meta.height").as("h"), col("meta.durationMs").as("d"))
      .agg(count(lit(1)).as("n_media"),
        (sum(when(col("k") === "image" && col("w") === 64 &&
          col("h") === 48 && col("d") === 0L, 0).otherwise(1)) === 0).as("meta_ok"))

    // features: L1-normalized byte histograms (sum must be 1 per doc)
    val feats = decoded.select(col("media_id").as("id"), col("feature").as("v"))
    val histAgg = feats
      .select(aggregate(col("v"), lit(0.0), (a, x) => a + x.cast("double")).as("s"))
      .agg((max(abs(col("s") - 1.0)) < 1e-3).as("hist_ok"))

    // vector path: SRP-LSH pairs over centered features must surface
    // every (doc, replica) pair — identical payloads, cosine exactly 1
    val srp = SimilarityQueries.annSrpPairs(centered(feats),
        Planes, SrpBands, SrpBitsPerBand, CosThreshold)
      .select(col("id1"), col("id2")).withColumn("hit", lit(1))
    val dupPairs = docs.filter(col("doc_id") % ReplicaEvery === 0)
      .select(col("doc_id").as("id1"),
        (col("doc_id") + ReplicaOffset).as("id2"))
    val coverAgg = dupPairs.join(srp, Seq("id1", "id2"), "left")
      .agg(count(lit(1)).as("n_dup_pairs"),
        sum(coalesce(col("hit"), lit(0))).as("n_cov"))
      .select(col("n_dup_pairs"),
        (coalesce(col("n_cov"), lit(0L)) === col("n_dup_pairs")).as("dup_found_ok"))

    val out = metaAgg.crossJoin(histAgg).crossJoin(coverAgg)
      .select(col("n_media"), col("n_dup_pairs"),
        col("meta_ok"), col("hist_ok"), col("dup_found_ok"))
      .localCheckpoint(true)
    decoded.unpersist()
    out
  }

  private val FrameEveryMs = 500L
  private val ResizeW = 32
  private val ResizeH = 24

  /** Deterministic video blob: synthetic header (320×240, rate 1000 B/s —
    * so durationMs == payload byte length) + the document text's UTF-8
    * bytes as payload. */
  private[operators] def textBlobVideo(text: String): Array[Byte] = {
    val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](16 + body.length)
    def wi(off: Int, v: Int): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    wi(0, 0x56494400); wi(4, 320); wi(8, 240); wi(12, 1000)
    System.arraycopy(body, 0, out, 16, body.length)
    out
  }

  /** q43: the remaining multimodal operators — frame sampling and resize —
    * under the driver's gate (q37 covers decode + features). Deterministic
    * video blobs derive from `documents` (rate 1000 B/s, so a doc's
    * durationMs equals its UTF-8 byte length), then:
    *
    *  - `n_frames` (anchor): Σ over non-empty docs of bytes/500 + 1 — the
    *    oracle recomputes the same formula from octet_length(text), so the
    *    codec's duration math and the sampling loop are value-gated;
    *  - `frame0_ok`: the FIRST byte of each doc's frame 0 equals the first
    *    byte of the text's UTF-8 encoding, recomputed INDEPENDENTLY from
    *    the documents table (frame bytes come from the blob slice path, so
    *    an offset bug breaks the equality);
    *  - `frame_len_ok`: every frame payload is within the sampler's
    *    documented 256-byte cap (a zero-length final frame is legal when
    *    the duration is an exact multiple of the sampling interval);
    *  - `resize_ok`: every resized blob round-trips the new dimensions
    *    through the codec AND never grows its payload.
    *
    * The media frames are deliberately NOT persisted: three narrow
    * re-derivations of a cheap blob map beat caching payload bytes — the
    * same payloads-stay-put principle as q37's fused pass. */
  def q43MediaFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def media = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => Media.MediaRow(id, "video", textBlobVideo(t)) }

    val frames = Media.sampleFrames(media, everyMs = FrameEveryMs).toDF()
    val firstBytes = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        substring(encode(col("text"), "UTF-8"), 1, 1).as("b0"))
    val frameAgg = frames
      .join(firstBytes, Seq("media_id"), "left")
      .agg(
        count(lit(1)).as("n_frames"),
        (sum(when(col("frame_idx") =!= 0 ||
          substring(col("frame"), 1, 1) === col("b0"), 0).otherwise(1)) === 0)
          .as("frame0_ok"),
        (sum(when(length(col("frame")) <= 256, 0)
          .otherwise(1)) === 0).as("frame_len_ok"))

    val origLen = media.toDF().select(col("media_id"), length(col("content")).as("olen"))
    val resized = Media.resize(media, ResizeW, ResizeH)
    val resizeAgg = Media.decode(resized).toDF()
      .select(col("media_id"), col("meta.width").as("w"), col("meta.height").as("h"),
        length(col("content")).as("rlen"))
      .join(origLen, "media_id")
      .agg((sum(when(col("w") === ResizeW && col("h") === ResizeH &&
        col("rlen") <= col("olen"), 0).otherwise(1)) === 0).as("resize_ok"))

    val nVideos = Tables.documents(spark, dir).agg(count(lit(1)).as("n_videos"))
    nVideos.crossJoin(frameAgg).crossJoin(resizeAgg)
      .select(col("n_videos"), col("n_frames"),
        col("frame0_ok"), col("frame_len_ok"), col("resize_ok"))
  }

  val q43MediaFramesSql: String =
    """WITH b AS (SELECT octet_length(encode(text)) AS blen FROM documents)
      |SELECT (SELECT count(*) FROM b)::BIGINT AS n_videos,
      |  (SELECT coalesce(sum(blen // 500 + 1), 0) FROM b WHERE blen > 0)::BIGINT
      |    AS n_frames,
      |  TRUE AS frame0_ok, TRUE AS frame_len_ok, TRUE AS resize_ok""".stripMargin

  val q37MediaAnnSql: String =
    """WITH d AS (SELECT doc_id FROM documents WHERE length(text) > 0)
      |SELECT ((SELECT count(*) FROM d)
      |        + (SELECT count(*) FROM d WHERE doc_id % 50 = 0))::BIGINT AS n_media,
      |  (SELECT count(*) FROM d WHERE doc_id % 50 = 0)::BIGINT AS n_dup_pairs,
      |  TRUE AS meta_ok, TRUE AS hist_ok, TRUE AS dup_found_ok""".stripMargin

  /** q92: EXACT MEDIA dedup — q15's content-hash rule lifted to the
    * binary column: one hash-groupBy over the blob bytes, min media_id
    * survives, group sizes for free. Identity is md5 over the blob's
    * hex (DuckDB's md5 is VARCHAR-only; hex is injective and both
    * engines emit uppercase, so the gate stays exact — the header's
    * \\x00 bytes survive where a UTF-8 round-trip would mangle them).
    * Non-vacuity: the q37 replica rows (every 50th doc's blob duplicated
    * at id+10⁷) land in 2-copy groups. At 100 TB the blob never
    * shuffles for identity — only the 16-byte digest does (project the
    * hash FIRST, then group; the payload stays in the scan stage). */
  def q92MediaDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
    val media = docs.as[(Long, String)]
      .flatMap { case (id, text) =>
        val row = Media.MediaRow(id, "image", textBlob(text))
        if (id % ReplicaEvery == 0)
          Seq(row, Media.MediaRow(id + ReplicaOffset, "image", row.content))
        else Seq(row)
      }.toDF()
    media
      .select(col("media_id"), md5(hex(col("content"))).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("media_id")).as("survivor_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("content_hash"))
  }

  val q92MediaDedupSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents WHERE len(text) > 0),
      |m AS (
      |  SELECT doc_id AS media_id,
      |    '\x49\x4D\x47\x00\x00\x00\x00\x40\x00\x00\x00\x30\x00\x00\x00\x00'::BLOB
      |      || encode(text) AS content
      |  FROM d
      |  UNION ALL
      |  SELECT doc_id + 10000000,
      |    '\x49\x4D\x47\x00\x00\x00\x00\x40\x00\x00\x00\x30\x00\x00\x00\x00'::BLOB
      |      || encode(text)
      |  FROM d WHERE doc_id % 50 = 0)
      |SELECT md5(hex(content)) AS content_hash,
      |  min(media_id)::BIGINT AS survivor_id, count(*) AS n_copies
      |FROM m GROUP BY 1 ORDER BY content_hash""".stripMargin

  private val MutantEvery = 25L
  private val MutantOffset = 20000000L
  private val MutantSuffix = " qq zz"

  /** q98: MEDIA near-dup — q92's exact rule relaxed to perceptual
    * closeness over the binary column: byte-4-gram simhash signatures
    * ([[Media.byteGramSimhash]], one narrow pass per payload) into the
    * q21 pigeonhole chunk join ([[Dedup.simhashPairsFromSigs]] — the
    * refactor point: the pair machinery is signature-source agnostic).
    * The fixture plants both relations: exact replicas (q37/q92's every
    * 50th, +10⁷ — Hamming 0) and MUTATED replicas (every 25th, +2·10⁷,
    * a few bytes appended — small but nonzero signature drift, the case
    * exact media dedup (q92) structurally cannot catch). At 100 TB the
    * blobs never shuffle: 16-byte signatures do, and the pair join is
    * bounded by 16-bit chunk buckets, never |media|². */
  def q98MediaNeardup(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Media.byteGramSimhash(mediaCorpus(spark, dir))
      .toDF("id", "sh_lo", "sh_hi")
    Dedup.simhashPairsFromSigs(sigs, maxHamming = 3)
      .orderBy(col("id1"), col("id2"))
  }

  /** The media gram-simhash pipeline as reusable CTEs ending in
    * `mpairs(id1, id2, hamming)` over the signature relation `msig` —
    * shared by the q98 oracle and (closed via [[OracleSql.closureCtes]])
    * the q103 ingest
    * oracle, the simhashPairsCtes precedent for the media family. */
  private def mediaGramPairsCtes: String = {
    def bitTerms(hs: String): String = (0 until 32).map { j =>
      s"(CASE WHEN list_sum(list_apply($hs, h -> CASE WHEN (h & ${1L << j}) != 0 THEN 1 ELSE -1 END)) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("\n  + ")
    s"""mbase AS (
       |  SELECT doc_id AS id, text FROM documents WHERE len(text) >= 4
       |  UNION ALL
       |  SELECT doc_id + $ReplicaOffset, text FROM documents
       |  WHERE doc_id % $ReplicaEvery = 0 AND len(text) >= 4
       |  UNION ALL
       |  SELECT doc_id + $MutantOffset, text || '$MutantSuffix' FROM documents
       |  WHERE doc_id % $MutantEvery = 0 AND len(text) >= 4),
       |mhx AS (SELECT id, hex(encode(text)) AS h FROM mbase),
       |mg AS (SELECT id, list_distinct(
       |    list_transform(range(len(h) // 2 - 3), i -> substring(h, i * 2 + 1, 8))) AS grams
       |  FROM mhx WHERE len(h) // 2 >= 4),
       |mhh AS (SELECT id,
       |  list_apply(grams, x -> ('0x' || substring(md5(x), 1, 8))::BIGINT) AS h_lo,
       |  list_apply(grams, x -> ('0x' || substring(md5(x), 9, 8))::BIGINT) AS h_hi
       |  FROM mg),
       |msig AS MATERIALIZED (SELECT id, (${bitTerms("h_lo")}) AS sh_lo, (${bitTerms("h_hi")}) AS sh_hi FROM mhh),
       |mch AS MATERIALIZED (SELECT id, sh_lo, sh_hi, c.chunk,
       |  CASE WHEN c.chunk = 0 THEN sh_lo & 65535
       |       WHEN c.chunk = 1 THEN (sh_lo >> 16) & 65535
       |       WHEN c.chunk = 2 THEN sh_hi & 65535
       |       ELSE (sh_hi >> 16) & 65535 END AS cval
       |  FROM msig, range(4) c(chunk)),
       |mpairs AS MATERIALIZED (SELECT DISTINCT a.id AS id1, b.id AS id2,
       |  (bit_count(xor(a.sh_lo, b.sh_lo)) + bit_count(xor(a.sh_hi, b.sh_hi)))::BIGINT AS hamming
       |  FROM mch a JOIN mch b ON a.chunk = b.chunk AND a.cval = b.cval AND a.id < b.id
       |  WHERE bit_count(xor(a.sh_lo, b.sh_lo)) + bit_count(xor(a.sh_hi, b.sh_hi)) <= 3)""".stripMargin
  }

  val q98MediaNeardupSql: String =
    s"""WITH $mediaGramPairsCtes
       |SELECT id1, id2, hamming FROM mpairs ORDER BY id1, id2""".stripMargin

  /** The q98 media corpus as a typed frame — shared by the q98 pair
    * gate and the q103 ingest harness so both compute signatures over
    * the identical blob population. */
  private[graft] def mediaCorpus(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Media.MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= 4)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val row = Media.MediaRow(id, "image", textBlob(text))
        val out = scala.collection.mutable.ArrayBuffer(row)
        if (id % ReplicaEvery == 0)
          out += Media.MediaRow(id + ReplicaOffset, "image", row.content)
        if (id % MutantEvery == 0)
          out += Media.MediaRow(id + MutantOffset, "image", textBlob(text + MutantSuffix))
        out.toSeq
      }
  }

  /** q103: incremental MEDIA near-dup ingest — the media family's state
    * story closed (exact q92 → near q98 → incremental q103, mirroring
    * text's q15 → q21 → q68): a persistent BUCKETED signature index
    * ingests the media corpus in two days (day 1 = originals; day 2 =
    * replicas + mutants + a re-delivery of every 5th original), each
    * batch's byte-gram signatures probing the index via
    * [[MergeQueries.neardupIngestSigsBucketed]]. The final index's
    * (media_id, survivor_id) must equal batch clustering of the WHOLE
    * corpus row-for-row — the oracle closes the q98 pair CTEs
    * transitively (q52's recursive pattern). The day split is the
    * stress that matters: every replica and mutant arrives AFTER its
    * original is already indexed, so every near-dup relation in the
    * fixture crosses the batch/index boundary. */
  def q103MediaIngest(spark: SparkSession, dir: String): DataFrame = {
    val table = "graft_q103_idx_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      val corpus = mediaCorpus(spark, dir)
      val day1 = corpus.filter(_.media_id < ReplicaOffset)
      val day2 = corpus.filter(r =>
        r.media_id >= ReplicaOffset || r.media_id % 5 == 0)
      Seq(day1, day2).foreach { day =>
        val sigs = Media.byteGramSimhash(day).toDF("id", "sh_lo", "sh_hi")
        MergeQueries.neardupIngestSigsBucketed(spark, table, sigs, nBuckets = 8)
      }
      spark.table(table)
        .select(col("doc_id").as("media_id"), col("survivor_id"))
        .orderBy(col("media_id"))
        .localCheckpoint(true) // materialize before the table is dropped
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  val q103MediaIngestSql: String =
    s"""WITH $mediaGramPairsCtes,
       |${OracleSql.closureCtes("mpairs")}
       |SELECT s.id AS media_id, coalesce(c.comp, s.id)::BIGINT AS survivor_id
       |FROM msig s LEFT JOIN clus c ON c.id = s.id
       |ORDER BY media_id""".stripMargin

  /** q226: the REAL image codec under the oracle gate — every
    * gated media query before this ran [[Media.FakeCodec]] over
    * synthetic header blobs; here the pipeline carries REAL PNG and
    * JPEG bytes end to end through [[Media.ImageIoCodec]] (the
    * `javax.imageio` decoder MediaSpec pins on planted files):
    *
    *  1. ENCODE (executors, codec-per-partition): each sampled doc_id
    *     derives a deterministic solid-color image — width
    *     `4 + id%13`, height `4 + id%11`, RGB `(id%256, id*7%256,
    *     id*13%256)` — written as a real PNG (even ids) or JPEG (odd);
    *  2. DECODE through the SAME [[Media.decode]] lifecycle the fake
    *     codec runs: the container is sniffed from the bytes (no
    *     format hint), true dimensions read from the header;
    *  3. RESIZE to 8×6 through [[Media.resize]] (Graphics2D bilinear,
    *     PNG re-encode), then PROBE the resized payload: re-decode and
    *     sample the center pixel.
    *
    * The oracle recomputes every expectation ARITHMETICALLY from
    * doc_id: sniffed format, decoded w/h, resized dims, and — for the
    * lossless PNG half — the exact pixel RGB (a solid color survives
    * bilinear resampling bit-exactly; JPEG rows gate dims/format only,
    * quantization makes their pixels approximate by design). A codec
    * that mis-sniffs, swaps dimensions, drops the resize, or corrupts
    * channels fails row-level.
    *
    * Scale: encode/decode/probe are all mapPartitions with one codec
    * init per partition (the q37 lifecycle); payload bytes never
    * shuffle — the join carries metadata only. */
  def q226ImageioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") % 5 === 0)
      .as[Long]
    val blobs: org.apache.spark.sql.Dataset[Media.MediaRow] =
      ids.mapPartitions { it =>
        it.map { id =>
          val w = (4 + id % 13).toInt
          val h = (4 + id % 11).toInt
          val rgb = new java.awt.Color((id % 256).toInt,
            ((id * 7) % 256).toInt, ((id * 13) % 256).toInt)
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = img.createGraphics()
          try { g2.setColor(rgb); g2.fillRect(0, 0, w, h) }
          finally g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img,
            if (id % 2 == 0) "png" else "jpg", bos)
          Media.MediaRow(id, "image", bos.toByteArray)
        }
      }.localCheckpoint(true) // encoded ONCE: decode AND resize consume it
    val decoded = Media.decode(blobs, () => new Media.ImageIoCodec)
      .map(d => (d.media_id, d.meta.format, d.meta.width.toLong,
        d.meta.height.toLong))
      .toDF("doc_id", "fmt", "w", "h")
    val probed = Media.resize(blobs, 8, 6, () => new Media.ImageIoCodec)
      .mapPartitions { it =>
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.content))
          val px = img.getRGB(3, 2)
          (r.media_id, img.getWidth.toLong, img.getHeight.toLong,
            ((px >> 16) & 0xff).toLong, ((px >> 8) & 0xff).toLong,
            (px & 0xff).toLong)
        }
      }.toDF("doc_id", "rw", "rh", "pr", "pg", "pb")
    decoded.join(probed, Seq("doc_id"))
      .select(col("doc_id"), col("fmt"), col("w"), col("h"),
        col("rw"), col("rh"),
        // JPEG pixels are quantization-approximate by design: gate the
        // lossless half exactly, null the lossy half
        when(col("fmt") === "png", col("pr")).as("pr"),
        when(col("fmt") === "png", col("pg")).as("pg"),
        when(col("fmt") === "png", col("pb")).as("pb"))
      .orderBy(col("doc_id"))
  }

  /** q227: the REAL audio codec under the oracle gate — q226's story
    * for the audio column: each sampled doc derives deterministic PCM
    * (rate 8/16 kHz by parity, mono/stereo by `id%3`, 16-bit,
    * `500 + id%300` frames) written as a REAL WAV by
    * `javax.sound.sampled.AudioSystem`, then decoded through
    * [[Media.WavCodec]]'s per-partition lifecycle (container type,
    * channels, bit depth, true sample rate, frame-derived duration)
    * and TRIMMED to 256 frames through the codec's clip operation, the
    * re-decoded duration gating the re-encode. The oracle recomputes
    * every field arithmetically from doc_id — a header mis-parse, a
    * channel/bit mixup, or a trim that re-encodes the wrong frame
    * count fails row-level. Scale: same mapPartitions shape as q226 —
    * payload bytes never shuffle. */
  def q227WavDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") % 7 === 0)
      .as[Long]
    val blobs: org.apache.spark.sql.Dataset[Media.MediaRow] =
      ids.mapPartitions { it =>
        it.map { id =>
          val rate = if (id % 2 == 0) 8000f else 16000f
          val channels = if (id % 3 == 0) 2 else 1
          val nFrames = (500 + id % 300).toInt
          val pcm = new Array[Byte](nFrames * channels * 2)
          var i = 0
          while (i < pcm.length) { pcm(i) = ((id + i) % 256).toByte; i += 1 }
          val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels,
            true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          Media.MediaRow(id, "audio", bos.toByteArray)
        }
      }.localCheckpoint(true) // encoded ONCE: decode AND trim consume it
    val decoded = Media.decode(blobs, () => new Media.WavCodec)
      .map(d => (d.media_id, d.meta.format, d.meta.width.toLong,
        d.meta.height.toLong, d.meta.sampleRate.toLong, d.meta.durationMs))
      .toDF("doc_id", "fmt", "channels", "bits", "rate", "dur_ms")
    val trimmed = Media.resize(blobs, 256, 0, () => new Media.WavCodec)
      .mapPartitions { it =>
        val codec = new Media.WavCodec; codec.init()
        it.map(r => (r.media_id, codec.decodeMeta(r.content).durationMs))
      }.toDF("doc_id", "trim_ms")
    decoded.join(trimmed, Seq("doc_id")).orderBy(col("doc_id"))
  }

  val q227WavDecodeSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate,
      |    500 + doc_id % 300 AS frames
      |  FROM documents WHERE doc_id % 7 = 0)
      |SELECT doc_id, 'wav' AS fmt,
      |  (CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END)::BIGINT AS channels,
      |  16::BIGINT AS bits, rate::BIGINT AS rate,
      |  (frames * 1000 // rate)::BIGINT AS dur_ms,
      |  (256 * 1000 // rate)::BIGINT AS trim_ms
      |FROM p ORDER BY doc_id""".stripMargin

  val q226ImageioDecodeSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
      |  (4 + doc_id % 13)::BIGINT AS w,
      |  (4 + doc_id % 11)::BIGINT AS h,
      |  8::BIGINT AS rw, 6::BIGINT AS rh,
      |  CASE WHEN doc_id % 2 = 0 THEN (doc_id % 256)::BIGINT END AS pr,
      |  CASE WHEN doc_id % 2 = 0 THEN (doc_id * 7 % 256)::BIGINT END AS pg,
      |  CASE WHEN doc_id % 2 = 0 THEN (doc_id * 13 % 256)::BIGINT END AS pb
      |FROM documents WHERE doc_id % 5 = 0
      |ORDER BY doc_id""".stripMargin

  /** q232: a REAL multi-frame container behind q43's frame-sampling
    * shape — animated GIF through [[Media.Gif]] (`javax.imageio`'s
    * sequence reader/writer, zero new deps; q226's pattern):
    *
    *  1. ENCODE (executors, mapPartitions): each sampled doc derives a
    *     deterministic animation — `2 + id%4` solid-color frames of
    *     `(4 + id%5) × (3 + id%4)`, frame f colored
    *     `((id + 31f)%256, (id·7 + 17f)%256, (id·13 + 5f)%256)` —
    *     written as ONE real animated GIF;
    *  2. COUNT frames through the sequence reader's header walk;
    *  3. SAMPLE frame `id % n_frames` (the q43 every-k shape on a real
    *     container: the reader SEEKS, unsampled frames never decode)
    *     and probe its top-left pixel.
    *
    * GIF's per-frame color table is lossless, so the oracle recomputes
    * the sampled frame's exact RGB arithmetically from doc_id — a
    * reader that merges disposal state across frames, miscounts, or
    * samples the wrong frame fails row-level. Payload bytes never
    * shuffle; the join carries metadata only. */
  def q232GifFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") % 11 === 0)
      .as[Long]
    val blobs: org.apache.spark.sql.Dataset[Media.MediaRow] =
      ids.mapPartitions { it =>
        it.map { id =>
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          val nf = (2 + id % 4).toInt
          val frames = (0 until nf).map { f =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = img.createGraphics()
            try {
              g2.setColor(new java.awt.Color(
                ((id + 31L * f) % 256).toInt,
                ((id * 7 + 17L * f) % 256).toInt,
                ((id * 13 + 5L * f) % 256).toInt))
              g2.fillRect(0, 0, w, h)
            } finally g2.dispose()
            img
          }
          Media.MediaRow(id, "video", Media.Gif.encode(frames))
        }
      }.localCheckpoint(true) // encoded ONCE: count AND sample consume it
    blobs.mapPartitions { it =>
      it.map { r =>
        val nf = Media.Gif.frameCount(r.content)
        val k = (r.media_id % nf).toInt
        val img = Media.Gif.frame(r.content, k)
        val px = img.getRGB(0, 0)
        (r.media_id, nf.toLong, img.getWidth.toLong, img.getHeight.toLong,
          k.toLong, ((px >> 16) & 0xff).toLong, ((px >> 8) & 0xff).toLong,
          (px & 0xff).toLong)
      }
    }.toDF("doc_id", "n_frames", "w", "h", "k", "pr", "pg", "pb")
      .orderBy(col("doc_id"))
  }

  val q232GifFramesSql: String =
    """WITH p AS (
      |  SELECT doc_id, 2 + doc_id % 4 AS nf,
      |    doc_id % (2 + doc_id % 4) AS k
      |  FROM documents WHERE doc_id % 11 = 0)
      |SELECT doc_id, nf::BIGINT AS n_frames,
      |  (4 + doc_id % 5)::BIGINT AS w, (3 + doc_id % 4)::BIGINT AS h,
      |  k::BIGINT AS k,
      |  ((doc_id + 31 * k) % 256)::BIGINT AS pr,
      |  ((doc_id * 7 + 17 * k) % 256)::BIGINT AS pg,
      |  ((doc_id * 13 + 5 * k) % 256)::BIGINT AS pb
      |FROM p ORDER BY doc_id""".stripMargin
}

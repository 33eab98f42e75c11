package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators (SURVEY.md §2B; not in the reference — the
  * reference never dedups, §2A item 5): exact, fingerprint, n-gram
  * Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: nothing here ever materializes the full pair matrix.
  *  - exact/fingerprint dedup is one hash-groupBy (map-side partial agg);
  *  - near-dup candidate generation goes through bucket self-joins (LSH
  *    band keys / SimHash chunks), so the shuffle carries (id, key) pairs,
  *    not documents², and only bucket-mates are compared;
  *  - hot buckets (degenerate band keys) are the known skew risk — AQE
  *    skew-join splitting handles moderate skew; a bucket-size cap is the
  *    escape hatch at extreme scale.
  */
object Dedup {

  /** Exact dedup by content hash: one survivor (min id) per distinct text.
    * (groupBy beats dropDuplicates here because it also yields group sizes
    * and a deterministic survivor.) */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** Fingerprint (sorted distinct token set) clusters — catches
    * reorderings/duplicated words that exact hashing misses. */
  def fingerprintClusters(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_docs"))

  /** All qualifying near-dup pairs by exact n-gram Jaccard within a
    * blocking column (brute force within blocks — the correctness
    * baseline; LSH below is the scale path). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        blockCol: Option[String] = None): DataFrame = {
    val grams = if (n == 1) tokens(col(textCol)) else shingles(col(textCol), n)
    val base = df.select(col(idCol).as("id"), array_distinct(grams).as("grams"),
      blockCol.map(col).getOrElse(lit(0)).as("blk"))
    val a = base.alias("a")
    val b = base.alias("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        round(jaccard(col("a.grams"), col("b.grams")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash + LSH near-dup pairs: shingle → k minhashes → band keys →
    * bucket self-join → exact Jaccard verify. False positives are removed
    * by the verify step; false negatives are the (tunable) LSH recall
    * tradeoff. `hashFn` = xxHash for production, md5Hash for oracle
    * reproducibility. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int, numHashes: Int, bands: Int,
                      threshold: Double,
                      hashFn: (Column, Int) => Column = xxHash): DataFrame = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val rowsPerBand = numHashes / bands
    val grams = if (shingleN == 1) tokens(col(textCol)) else shingles(col(textCol), shingleN)
    val docs = df.select(col(idCol).as("id"), array_distinct(grams).as("grams"))
      .filter(size(col("grams")) > 0)
    val banded = docs
      .withColumn("sig", minhashSignature(col("grams"), numHashes, hashFn))
      .select(col("id"), posexplode(bandKeys(col("sig"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    cand
      .join(docs.select(col("id").as("id1"), col("grams").as("g1")), "id1")
      .join(docs.select(col("id").as("id2"), col("grams").as("g2")), "id2")
      .select(col("id1"), col("id2"), round(jaccard(col("g1"), col("g2")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit hash of a token from its md5 hex prefix — reproducible in
    * DuckDB as ('0x' || substring(md5(t),1,8))::BIGINT. */
  def tokenHash32(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** 32-bit SimHash over the distinct token set: per bit, the sign of the
    * +1/-1 vote sum across token hashes. */
  def simhash32(text: Column): Column = {
    val hs = transform(array_distinct(tokens(text)), tokenHash32 _)
    val bits = (0 until 32).map { j =>
      val votes = aggregate(hs, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1))
      when(votes >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (<= 3).
    * Candidate generation by the pigeonhole chunk trick: the 32-bit
    * simhash splits into 4 byte chunks; any pair within distance 3 must
    * agree on at least one chunk, so matching on exploded (chunk_idx,
    * chunk_value) keys finds ALL qualifying pairs — a bucket join with
    * zero false negatives, no pair matrix. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4 chunks guarantee recall only up to distance 3")
    val docs = df
      .filter(size(array_distinct(tokens(col(textCol)))) > 0) // empty docs have no signal
      .select(col(idCol).as("id"), simhash32(col(textCol)).as("sh"))
    val chunked = docs.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map { c =>
        shiftright(col("sh"), c * 8).bitwiseAND(lit(0xffL))
      }: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cval")
    chunked.alias("a")
      .join(chunked.alias("b"),
        col("a.chunk") === col("b.chunk") && col("a.cval") === col("b.cval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

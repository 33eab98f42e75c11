package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions (SURVEY.md §2B: language-ID, quality
  * scoring, token counting, fingerprinting, shingling, MinHash).
  *
  * Everything is built from Catalyst higher-order / string functions — no
  * UDFs, so the expressions stay inside codegen'd projections and are
  * evaluated columnar-batch-at-a-time at any scale. Where an operation has
  * both a "fast" and an "oracle-reproducible" form (hashing), the hash
  * function is a parameter: xxhash64 for production (cheap, 64-bit),
  * md5 for cross-engine determinism (DuckDB computes the same digests).
  */
object TextFunctions {

  /** Whitespace/punctuation tokenizer: lowercase, split on non-alnum runs,
    * drop empties. Mirrors `list_filter(regexp_split_to_array(lower(t),
    * '[^a-z0-9]+'), x -> len(x) > 0)` in DuckDB.
    *
    * Implemented WITHOUT a higher-order `filter` (which is interpreted and
    * taxed every text query): trimming leading/trailing separator runs
    * before the split means the split can produce no empty tokens — the
    * whole expression stays inside whole-stage codegen. The `trimmed`
    * subexpression appears twice; both are codegen'd regex calls, still
    * far cheaper than one interpreted lambda filter pass. */
  def tokens(text: Column): Column = {
    def trimmed = regexp_replace(lower(text), "^[^a-z0-9]+|[^a-z0-9]+$", "")
    when(trimmed === "", array().cast("array<string>"))
      .otherwise(split(trimmed, "[^a-z0-9]+"))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: matches of lowercase-letter runs, digit runs,
    * and single non-alnum-non-space marks — a cheap proxy for byte-pair
    * token counts over ASCII-ish text. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Fraction of characters that are ASCII letters. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(lower(text), "[^a-z]", "")).cast("double") / length(text))

  /** Fraction of characters that are neither alnum nor whitespace. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(lower(text), "[a-z0-9\\s]", "")).cast("double") / length(text))

  val stopwords: Seq[String] = Seq(
    "the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

  /** Fraction of tokens that are stopwords — a fluency signal. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isInCollection(stopwords))).cast("double") / size(toks))
  }

  /** Composite document quality score in [0,1]: alpha share, stopword
    * share, length saturation (caps at 100 tokens), low punctuation.
    * Weights are heuristic; determinism is what matters for the gate. */
  def qualityScore(text: Column): Column =
    round(
      lit(0.25) * alphaRatio(text) +
      lit(0.25) * stopwordRatio(text) +
      lit(0.25) * least(lit(1.0), tokenCount(text).cast("double") / 100.0) +
      lit(0.25) * (lit(1.0) - punctRatio(text)), 4)

  /** Language-marker sets for the n-gram-heuristic language ID. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "que", "de", "y"),
    "fr" -> Seq("le", "les", "et", "des", "un"))

  /** Marker-token count for one language. */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers)))

  /** CJK character count (the zh signal — script detection beats word
    * markers for unsegmented text). */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))

  /** Heuristic language ID with a fixed priority order (zh by script, then
    * the marker languages by score with first-wins ties, else "und").
    * The marker scores are let-bound into one array: every score is
    * referenced ~4× (any-hit, best, per-branch compare), and each unbound
    * reference would re-run tokenize + an interpreted filter. */
  def langId(text: Column): Column =
    bind(tokens(text)) { toks =>
      bind(array(langMarkers.map { case (_, m) =>
        size(filter(toks, t => t.isInCollection(m)))
      }: _*)) { scores =>
        val s = (i: Int) => element_at(scores, i + 1)
        val n = langMarkers.length
        val anyHit = (0 until n).map(s).reduce(_ + _) > 0
        val best = (0 until n).map(s).reduce((a, b) => greatest(a, b))
        val pick = langMarkers.map(_._1).zipWithIndex.foldRight(lit("und")) {
          case ((lang, i), els) => when(anyHit && s(i) === best, lit(lang)).otherwise(els)
        }
        when(cjkCount(text) > 0, lit("zh")).otherwise(pick)
      }
    }

  /** Key-collision fingerprint: md5 of the sorted distinct token set
    * (OpenRefine-style). Identical in DuckDB:
    * `md5(array_to_string(list_sort(list_distinct(tokens)), ' '))`. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Winnowing fingerprint set (Schleimer et al., MOSS): hash every char
    * k-gram, then keep the minimum of each length-w hash window — the
    * classic rolling-hash document fingerprint. Robust to local edits:
    * a change only perturbs the k-grams (and windows) it overlaps.
    * Returns the distinct selected hashes, sorted. The hash is the
    * md5-prefix 32-bit form so DuckDB mirrors it; a production variant
    * would swap in a true O(1)-update Rabin-Karp — selection semantics
    * (and therefore results at the algorithm level) are unchanged. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    // Both lets matter: expressions captured inside a higher-order lambda
    // are re-evaluated PER ELEMENT (no hoisting), so an unbound lower(text)
    // would be recomputed — a full string copy — for every k-gram.
    // Hashes stay as 8-char hex PREFIX STRINGS: fixed-width lowercase hex
    // orders lexicographically exactly as its numeric value in both
    // engines, so the window minima need no base-16 parse (conv was the
    // per-gram hot spot).
    bind(lower(text)) { s =>
      val nGrams = length(s) - (k - 1)
      val hashes = transform(sequence(lit(1), nGrams),
        i => substring(md5(substr(s, i, lit(k))), 1, 8))
      val mins = bind(hashes) { hs =>
        transform(sequence(lit(1), size(hs) - (w - 1)),
          j => array_min(slice(hs, j, lit(w))))
      }
      when(nGrams < w, array().cast("array<string>"))
        .otherwise(array_sort(array_distinct(mins)))
    }

  /** The HOF oracle form above at native-loop cost: a codegen'd one-pass
    * expression ([[graft.expressions.WinnowMd5]]) producing BIT-IDENTICAL
    * values (same char-gram md5-hex-prefix hashes, same selection), so
    * gated entries can use it without touching their DuckDB oracles.
    * DedupSpec pins the equivalence, including multi-byte text. */
  def winnowFingerprintsMd5(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.WinnowMd5(
      ColumnBridge.expression(lower(text)), k, w))
  }

  /** PRODUCTION winnowing: one-pass Rabin-Karp rolling hashes inside a
    * codegen'd expression ([[graft.expressions.WinnowRk]]) — O(1) per
    * position vs an md5 digest per k-gram. The md5 variant above stays as
    * the oracle-mirrorable form the q29 gate runs; this is what a 100 TB
    * deployment calls. Same selection scheme and guards; hash family
    * differs, so fingerprints are not interchangeable between the two. */
  def winnowFingerprintsRk(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.WinnowRk(
      ColumnBridge.expression(text), k, w))
  }

  /** Unicode NFC canonical composition (native codegen expression
    * [[graft.expressions.NfcNormalize]]; DuckDB mirror: `nfc_normalize`).
    * Folds composed/decomposed spellings to one representation so exact
    * dedup, fingerprints, and shingles agree on identity. */
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.NfcNormalize(
      ColumnBridge.expression(text)))
  }

  /** Control characters stripped by [[normalizeText]] — written in the
    * Java∩RE2 dialect (the q74 discipline) so the oracle is exact.
    * Includes \\x0B deliberately: Java's `\\s` matches it but RE2's does
    * not, so it must be GONE before the whitespace collapse for the two
    * engines to agree. */
  val controlClass: String = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

  /** C4/Dolma-style text normalization: NFC composition → control-char
    * strip → whitespace-run collapse → trim. A stateless narrow map
    * (codegen'd end to end) — fuses into the scan at any corpus size. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfcNormalize(text), controlClass, ""), "\\s+", " "))

  /** Let-binding for column expressions: evaluates `e` once and passes it
    * to `body` as a lambda variable — `transform` over a 1-element array.
    * Spark has no expression-level let; without this, an expression used k
    * times in one projection is evaluated k times (tokenization appearing
    * 3× inside a single shingle expression was a real round-1 cost). */
  def bind(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)

  /** Word n-gram shingles: ["a b", "b c", ...]. Empty array when the
    * document has fewer than n tokens. Tokenizes once (let-bound). */
  def shingles(text: Column, n: Int): Column =
    bind(tokens(text)) { toks =>
      when(size(toks) < n, array().cast("array<string>")).otherwise(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    }

  /** MinHash signature of a token/shingle array: for seed i, the minimum
    * of hashFn(i || ":" || element). `md5Hash` reproduces in DuckDB
    * (string min over hex digests); `xxHash` is the fast production form
    * (long min, one 64-bit hash per element). */
  def minhashSignature(elems: Column, numHashes: Int,
                       hashFn: (Column, Int) => Column = xxHash): Column =
    array((0 until numHashes).map(i => array_min(transform(elems, e => hashFn(e, i)))): _*)

  /** Oracle-reproducible MinHash signature that shares digests: one md5
    * per (seed, element) yields EIGHT 16-bit hash values (hex chars
    * 4c+1..4c+4 per chunk c), so numHashes=16 costs 2 md5 calls per
    * element instead of 16 — md5 is the only hash both engines compute
    * identically, and it dominated the round-1 q20 bench. 16-bit minhash
    * values collide more than 64-bit ones, slightly shifting LSH recall;
    * the exact-Jaccard verify step keeps the output precise either way.
    * DuckDB mirror per entry: list_min(list_apply(g, e ->
    * ('0x' || substring(md5(s || ':' || e), 4c+1, 4))::BIGINT)). */
  def minhashSignatureMd5Chunked(elems: Column, numHashes: Int): Column = {
    require(numHashes % 8 == 0, s"numHashes=$numHashes must be a multiple of 8")
    // ONE fused codegen'd pass ([[graft.expressions.MinhashMd5Chunked]]):
    // per element one md5 per seed, all eight 16-bit chunk minima
    // tracked in the same pass. The previous form ran, per element, an
    // interpreted md5 transform plus EIGHT conv(substring) transform
    // lambdas over the digest array — the q20 bench's dominant cost.
    // Values are IDENTICAL (hex chars 4c+1..4c+4 are digest bytes
    // 2c..2c+1 big-endian); TextFunctionsSpec pins the equivalence, so
    // the q20 oracle is untouched.
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.MinhashMd5Chunked(
      ColumnBridge.expression(elems), numHashes))
  }

  /** The interpreted HOF pipeline [[minhashSignatureMd5Chunked]] fuses —
    * kept as the readable reference and for the equivalence test. */
  def minhashSignatureMd5ChunkedHof(elems: Column, numHashes: Int): Column = {
    require(numHashes % 8 == 0, s"numHashes=$numHashes must be a multiple of 8")
    val perSeed = (0 until numHashes / 8).map { s =>
      bind(transform(elems, e => md5(concat(lit(s"$s:"), e)))) { digests =>
        array((0 until 8).map { c =>
          array_min(transform(digests,
            d => conv(substring(d, c * 4 + 1, 4), 16, 10).cast("long")))
        }: _*)
      }
    }
    concat(perSeed: _*)
  }

  def xxHash(e: Column, seed: Int): Column = xxhash64(lit(seed), e)
  def md5Hash(e: Column, seed: Int): Column = md5(concat(lit(s"$seed:"), e))

  /** Production MinHash signature with two-level hashing: each element is
    * string-hashed ONCE (xxhash64), then the k per-seed hashes re-hash
    * that 8-byte long — k× fewer variable-length string hashes than
    * hashing the element under every seed. The (seed, base-hash) family
    * is as uniform as the direct form; signatures differ numerically but
    * MinHash/LSH semantics are identical. */
  def minhashSignatureXx(elems: Column, numHashes: Int): Column = {
    // fused one-pass form ([[graft.expressions.MinhashXx]]): one string
    // hash + k long re-hashes per element through Spark's own XXH64
    // statics — value-identical to the HOF pipeline below
    // (TextFunctionsSpec-pinned), which evaluated k interpreted
    // transform lambdas over an intermediate hash array per document
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.MinhashXx(
      ColumnBridge.expression(elems), numHashes))
  }

  /** The interpreted HOF pipeline [[minhashSignatureXx]] fuses — kept as
    * the readable reference and for the equivalence test. */
  def minhashSignatureXxHof(elems: Column, numHashes: Int): Column =
    bind(transform(elems, e => xxhash64(e))) { hs =>
      array((0 until numHashes).map(i =>
        array_min(transform(hs, h => xxhash64(lit(i), h)))): _*)
    }

  /** LSH band keys over a signature: bands of `rowsPerBand` consecutive
    * signature entries, each band hashed to one key. Docs sharing any
    * band key become a candidate pair. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws(",", slice(signature, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  /** Exact Jaccard similarity of two string arrays (as distinct sets). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val union = size(array_union(da, db))
    when(union === 0, lit(0.0))
      .otherwise(size(array_intersect(da, db)).cast("double") / union)
  }
}

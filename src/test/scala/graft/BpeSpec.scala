package graft

import graft.operators.Bpe

/** BPE merge learning on hand corpora: the classic low/lower/newest
  * example (merge counts + tie-breaks computed by hand) and the
  * left-to-right non-overlapping merge semantics the doubled-separator
  * replace must reproduce. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("low/lower/newest: hand-computed merges, counts, and lexicographic ties") {
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 3)
      .orderBy("step").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("cnt"))).toSeq
    // round 1: "l o" and "o w" both count 5 → lexicographic min "l o";
    // round 2: "lo w" now counts 5; round 3: "low </w>" counts 3.
    assert(merges == Seq(
      (1, "l", "o", 5L),
      (2, "lo", "w", 5L),
      (3, "low", "</w>", 3L)))
  }

  test("overlapping pair run merges left-to-right non-overlapping (a a a → aa a)") {
    val docs = Seq("aaa").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 2)
      .orderBy("step").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[Long]("cnt"))).toSeq
    // round 1: pair (a, a) appears twice in "a a a </w>" (adjacent-pair
    // COUNT sees both) and merges left-to-right to "aa a </w>" — if the
    // merge were right-to-left or overlap-greedy the round-2 candidates
    // would differ: from "aa a </w>" they are {"aa a", "a </w>"} (tie at
    // 1 → lex min "a </w>"); from "a aa </w>" they would be
    // {"a aa", "aa </w>"} → "a aa".
    assert(merges == Seq(("a", "a", 2L), ("a", "</w>", 1L)))
  }

  test("final type frame carries the apply-time segmentations (q123's lookup table)") {
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val (_, types) = Bpe.learnMergesAndTypes(docs, "text", 3)
    val segs = types.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[String]("seq")).toMap
    // after (l o), (lo w), (low </w>): low is ONE symbol, lower keeps
    // its tail unmerged, newest never participated in any merge
    assert(segs("low") == "low</w>")
    assert(segs("lower") == "low e r </w>")
    assert(segs("newest") == "n e w e s t </w>")
  }

  test("merged symbols participate in later rounds (chain growth)") {
    val docs = Seq.fill(4)("abab").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 3)
      .orderBy("step").collect().map(r =>
        (r.getAs[String]("merged"), r.getAs[Long]("cnt"))).toSeq
    // "a b a b </w>": (a b)=2·4 beats (b a)=1·4 and (b </w>)=1·4;
    // then "ab ab </w>" → (ab ab)=4 ties (ab </w>)=4 and '<' sorts
    // before 'a', so "ab </w>" wins the lex tie; then (ab ab</w>)=4.
    assert(merges(0) == ("ab", 8L))
    assert(merges(1) == ("ab</w>", 4L))
    assert(merges(2) == ("abab</w>", 4L))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sinks.MergeSink

/** Property-based merge algebra (SURVEY §5 plan item 2), sampled with
  * ScalaCheck generators over randomized target/update sets:
  *  - idempotence: applying an update set twice equals applying it once;
  *  - null-skip never loses data: a stored non-null survives any update;
  *  - upsert count = |update keys ∉ target|;
  *  - duplicate-key fold ≡ sequential per-row application. */
class MergePropsSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq("f1", "f2")
  private type Rows = List[(String, Option[Double], Option[Double])]

  private val keyGen = Gen.oneOf((0 until 12).map(i => s"k$i"))
  private val valGen = Gen.option(Gen.choose(0, 99).map(_.toDouble))
  private val rowsGen: Gen[Rows] =
    Gen.listOfN(10, for (k <- keyGen; a <- valGen; b <- valGen) yield (k, a, b))

  private def sample(seed: Long): (Rows, Rows) = {
    val p = Gen.Parameters.default
    val t = rowsGen.pureApply(p, Seed(seed)).distinctBy(_._1)
    val u = rowsGen.pureApply(p, Seed(seed + 1000)).distinctBy(_._1)
    (t, u)
  }

  private def df(rows: Rows): DataFrame =
    rows.map(r => (r._1, r._2.map(Double.box).orNull, r._3.map(Double.box).orNull))
      .toDF("k", "f1", "f2")

  private def target(rows: Rows): DataFrame =
    df(rows).withColumn("updatedAt", to_timestamp(lit("2020-01-01 00:00:00")))

  private val now = to_timestamp(lit("2026-01-01 00:00:00"))

  private def snap(d: DataFrame): Set[(String, Option[Double], Option[Double])] =
    d.collect().map { r =>
      (r.getAs[String]("k"),
        Option(r.getAs[java.lang.Double]("f1")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("f2")).map(_.doubleValue))
    }.toSet

  test("idempotence: merging the same update set twice changes nothing") {
    for (seed <- 1L to 8L) {
      val (t, u) = sample(seed)
      val once = MergeSink.mergePlan(target(t), df(u), "k", fields, now = now)
      val twice = MergeSink.mergePlan(once, df(u), "k", fields, now = now)
      assert(snap(once) == snap(twice), s"seed=$seed")
      val s2 = MergeSink.mergeStats(once, df(u), "k", fields)
      assert(s2.nModified == 0 && s2.nUpserted == 0, s"seed=$seed: $s2")
    }
  }

  test("null-skip never loses data: every stored non-null survives") {
    for (seed <- 1L to 8L) {
      val (t, u) = sample(seed)
      val merged = snap(MergeSink.mergePlan(target(t), df(u), "k", fields, now = now))
      val byKey = merged.map(r => r._1 -> (r._2, r._3)).toMap
      t.foreach { case (k, f1, f2) =>
        val (m1, m2) = byKey(k)
        assert(f1.isEmpty || m1.nonEmpty, s"seed=$seed key=$k lost f1")
        assert(f2.isEmpty || m2.nonEmpty, s"seed=$seed key=$k lost f2")
      }
    }
  }

  test("upsert count equals |update keys not in target|") {
    for (seed <- 1L to 8L) {
      val (t, u) = sample(seed)
      val expected = (u.map(_._1).toSet -- t.map(_._1).toSet).size
      val s = MergeSink.mergeStats(target(t), df(u), "k", fields)
      assert(s.nUpserted == expected, s"seed=$seed")
    }
  }

  test("duplicate-key fold equals sequential per-row application") {
    for (seed <- 1L to 8L) {
      val p = Gen.Parameters.default
      val dups = rowsGen.pureApply(p, Seed(seed + 5000)) // duplicates allowed
      val seq = dups.zipWithIndex
        .map { case ((k, a, b), i) => (k, a.map(Double.box).orNull, b.map(Double.box).orNull, i.toLong) }
        .toDF("k", "f1", "f2", "seq")
      val folded = snap(MergeSink.collapseUpdates(seq, "k", fields, Some("seq"))
        .select("k", "f1", "f2"))
      // sequential last-non-null-wins reference fold
      val expected = dups.zipWithIndex.groupBy(_._1._1).map { case (k, rs) =>
        val ordered = rs.sortBy(_._2).map(_._1)
        (k,
          ordered.flatMap(_._2.toList).lastOption,
          ordered.flatMap(_._3.toList).lastOption)
      }.toSet
      assert(folded == expected, s"seed=$seed")
    }
  }

  test("incremental dedup ingest keeps the FIRST arrival, whatever the order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_").toString
    try {
      val target = s"$dir/idx"
      // day A arrives FIRST but carries the LARGER ids for hash h1 — a
      // later day's smaller id must NOT steal the survivor slot
      val dayA = Seq((50L, "h1"), (60L, "h2")).toDF("doc_id", "content_hash")
      val dayB = Seq((10L, "h1"), (70L, "h3"), (75L, "h3"))
        .toDF("doc_id", "content_hash")
      val s1 = operators.MergeQueries.dedupIngest(spark, target, dayA)
      assert(s1.nUpserted == 2L && s1.nMatched == 0L)
      val s2 = operators.MergeQueries.dedupIngest(spark, target, dayB)
      assert(s2.nUpserted == 1L, "only the never-seen hash h3 may insert")
      val idx = spark.read.parquet(target)
        .select("content_hash", "doc_id").as[(String, Long)].collect().toMap
      assert(idx == Map("h1" -> 50L, "h2" -> 60L, "h3" -> 70L),
        s"first arrival must survive (h3 dedups within its batch): $idx")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}

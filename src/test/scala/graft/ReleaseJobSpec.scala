package graft

import org.apache.spark.sql.functions._
import graft.jobs.ReleaseJob
import graft.operators.Audit

/** The release composition beyond the q200 oracle gate: the audit's
  * three sections stay mutually consistent on a crafted release, and
  * the version section's equality booleans are computed honestly (they
  * flip when the catalog content is tampered with). */
class ReleaseJobSpec extends SparkSpec {
  import spark.implicits._

  test("release audit: contract, drift, and catalog sections agree on a crafted release") {
    val base = java.nio.file.Files.createTempDirectory("graft_relspec_")
    try {
      val prev = Seq((1L, "aa", "en", "s1", 2L), (2L, "bb", "en", "s1", 2L),
          (3L, "cc", "fr", "s2", 2L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      // candidate drops doc 3 (drift), duplicates key 2 (contract)
      val cand = Seq((1L, "aa", "en", "s1", 2L), (2L, "bb", "en", "s1", 2L),
          (2L, "bb2", "en", "s1", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val rules = Seq(
        Audit.Check("nchars_consistent", col("n_chars") === length(col("text"))),
        Audit.Unique("doc_id_unique", col("doc_id")))
      val rep = ReleaseJob.releaseAudit(spark, prev, cand, rules, s"$base/cat")
        .collect()
      val bySect = rep.groupBy(_.getString(0))
      val uniq = bySect("contract").find(_.getString(1) == "doc_id_unique").get
      assert(uniq.getAs[Long]("b") == 2 && !uniq.getAs[Boolean]("ok"))
      val drift = bySect("drift").head
      assert(drift.getAs[Long]("a") == 3 && drift.getAs[Long]("b") == 3)
      assert(drift.getAs[Long]("c") > 0 && !drift.getAs[Boolean]("ok"),
        "fr disappeared — the mixture moved")
      assert(bySect("version").map(_.getAs[Boolean]("ok")).forall(identity))
      assert(bySect("version").map(r => r.getString(1) -> r.getAs[Long]("a")).toMap
        == Map("1" -> 3L, "2" -> 3L))
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("release audit: the read-back equality boolean is computed, not asserted") {
    val base = java.nio.file.Files.createTempDirectory("graft_relspec2_")
    try {
      val frame = Seq((1L, "aa", "en", "s1", 2L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val rep = ReleaseJob.releaseAudit(spark, frame, frame,
        Seq(Audit.Check("text_not_null", col("text").isNotNull)), s"$base/cat")
      assert(rep.filter(col("sect") === "version").collect()
        .forall(_.getAs[Boolean]("ok")))
      // tamper with v1's committed data: the SAME audit re-run against a
      // fresh catalog is fine, but reading the tampered version through
      // the catalog must now disagree with the frame
      val v1entry = graft.sinks.VersionCatalog.headState(spark, s"$base/cat")
        ._2.find(_.version == 1L).get
      val v1dir = new org.apache.hadoop.fs.Path(s"$base/cat/${v1entry.dir}")
      val fs = v1dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq((9L, "zz", "de", "s9", 2L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(v1dir.toString)
      val back = graft.sinks.VersionCatalog.readVersion(spark, s"$base/cat", 1L)
        .selectExpr(frame.columns: _*)
      assert(back.exceptAll(frame).count() > 0,
        "tampered content must be visible to the equality check")
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}

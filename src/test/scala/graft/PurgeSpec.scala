package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sinks.MergeSink

/** Pins for the key purge beyond the q176 oracle gate: the IO contract
  * (untouched buckets byte-identical), emptied-bucket removal, absent-key
  * idempotence, and exact stats. */
class PurgeSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: java.nio.file.Path) =
    new Path(p.toString).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def files(dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty[String, Long]
    else fs.listStatus(p).filter(_.getPath.getName.startsWith("pb="))
      .flatMap(d => fs.listStatus(d.getPath))
      .map(st => st.getPath.toString -> st.getModificationTime).toMap
  }

  test("purge rewrites only touched buckets; untouched files byte-identical") {
    val base = java.nio.file.Files.createTempDirectory("graft_purge1_")
    try {
      val snap = s"$base/snap"
      val rows = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "payload")
      MergeSink.mergeIntoPartitioned(spark, snap, rows, "id",
        Seq("payload"), nBuckets = 8)
      val before = files(snap)
      // purge 5 keys — they hash to a strict subset of the 8 buckets
      val keys = Seq(3L, 7L, 11L, 19L, 23L)
      val touchedPb = keys
        .toDF("id").select(pmod(xxhash64($"id"), lit(8L))).as[Long]
        .collect().toSet
      assert(touchedPb.size < 8, s"fixture must leave untouched buckets")
      val st = MergeSink.purgePartitionedKeys(spark, snap, keys, "id", 8)
      assert(st.nPurged == 5 && st.nBucketsTouched == touchedPb.size, s"$st")
      val after = files(snap)
      val untouched = before.filter { case (f, _) =>
        !touchedPb.exists(b => f.contains(s"pb=$b/")) }
      untouched.foreach { case (f, m) =>
        assert(after.get(f).contains(m), s"untouched file changed: $f") }
      // content: exactly the purged keys are gone
      val got = MergeSink.readPartitioned(spark, snap)
        .select($"id").as[Long].collect().toSet
      assert(got == (1L to 200L).toSet -- keys)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("the purge read is plan-time directory pruning, not a filtered full scan") {
    val base = java.nio.file.Files.createTempDirectory("graft_purge4_")
    try {
      val snap = s"$base/snap"
      MergeSink.mergeIntoPartitioned(spark, snap,
        (1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload"),
        "id", Seq("payload"), nBuckets = 8)
      val keys = Seq(3L, 7L)
      val touched = keys.toDF("id")
        .select(pmod(xxhash64($"id"), lit(8L))).as[Long].collect().toSet
      // the exact read shape purgePartitioned issues before the anti-join
      val read = MergeSink.readPartitioned(spark, snap)
        .filter($"pb".isin(touched.toSeq.map(java.lang.Long.valueOf): _*))
      val parts = read.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
      assert(parts == Seq(touched.size),
        s"scan must select exactly the touched bucket dirs: $parts vs $touched")
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("purging absent keys is a content no-op; empty purge set touches nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft_purge2_")
    try {
      val snap = s"$base/snap"
      MergeSink.mergeIntoPartitioned(spark,
        snap, (1L to 50L).map(i => (i, i * 10L)).toDF("id", "v"),
        "id", Seq("v"), nBuckets = 4)
      val st = MergeSink.purgePartitionedKeys(spark, snap,
        Seq(999L, 1000L), "id", 4)
      assert(st.nPurged == 0, s"$st")
      val got = MergeSink.readPartitioned(spark, snap)
        .select($"id", $"v").as[(Long, Long)].collect().toSet
      assert(got == (1L to 50L).map(i => (i, i * 10L)).toSet)
      val empty = MergeSink.purgePartitioned(spark, snap,
        spark.emptyDataset[Long].toDF("id"), "id", 4)
      assert(empty == MergeSink.PurgeStats(0L, 0L, 0))
    } finally fsOf(base).delete(new Path(base.toString), true)
  }

  test("a bucket emptied by the purge disappears; reads stay row-correct") {
    val base = java.nio.file.Files.createTempDirectory("graft_purge3_")
    try {
      val snap = s"$base/snap"
      val rows = (1L to 64L).map(i => (i, s"p$i")).toDF("id", "payload")
      MergeSink.mergeIntoPartitioned(spark, snap, rows, "id",
        Seq("payload"), nBuckets = 4)
      // purge EVERY key of one bucket (and nothing else)
      val bucketOf = rows.select($"id",
        pmod(xxhash64($"id"), lit(4L)).as("pb")).as[(Long, Long)].collect()
      val victim = bucketOf.head._2
      val doomedIds = bucketOf.filter(_._2 == victim).map(_._1)
      val st = MergeSink.purgePartitionedKeys(spark, snap,
        doomedIds.toSeq, "id", 4)
      assert(st.nPurged == doomedIds.length && st.nBucketsTouched == 1, s"$st")
      val fs = fsOf(base)
      assert(!fs.exists(new Path(s"$snap/pb=$victim")),
        "fully-purged bucket dir must disappear")
      val got = MergeSink.readPartitioned(spark, snap)
        .select($"id").as[Long].collect().toSet
      assert(got == (1L to 64L).toSet -- doomedIds)
    } finally fsOf(base).delete(new Path(base.toString), true)
  }
}

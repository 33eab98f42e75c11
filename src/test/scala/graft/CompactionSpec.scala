package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sinks.Compaction

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(dir: String): Array[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(new Path(dir)).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  test("fragmented dirs compact to their byte target, content preserved exactly") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_spec_")
    val path = s"$base/snap"
    try {
      val rows = (1L to 1000L).map(i => (i, s"payload-$i")).toDF("id", "v")
        .withColumn("pb", pmod(col("id"), lit(2L)))
      for (b <- 0L until 6L)
        rows.filter(pmod(col("id"), lit(6L)) === b)
          .write.mode("append").partitionBy("pb").parquet(path)
      val beforeFiles = dataFiles(s"$path/pb=0").length
      assert(beforeFiles >= 6, s"fixture must be fragmented, got $beforeFiles files")
      val beforeContent = spark.read.parquet(path)
        .select("id", "v", "pb").collect().toSet

      val stats = Compaction.compactPartitioned(spark, path, targetBytes = 64L << 20)
      assert(stats.nCompacted == 2 && stats.nSkipped == 0)
      assert(stats.filesBefore == beforeFiles * 2L)
      assert(stats.filesAfter == 2)
      assert(dataFiles(s"$path/pb=0").length == 1)
      assert(dataFiles(s"$path/pb=1").length == 1)
      val afterContent = spark.read.parquet(path)
        .select("id", "v", "pb").collect().toSet
      assert(afterContent == beforeContent)
    } finally fs.delete(new Path(base.toString), true)
  }

  test("a second pass is a no-op and skipped dirs stay byte-identical") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_spec2_")
    val path = s"$base/snap"
    try {
      val rows = (1L to 400L).map(i => (i, s"v$i")).toDF("id", "v")
        .withColumn("pb", pmod(col("id"), lit(2L)))
      for (b <- 0L until 4L)
        rows.filter(pmod(col("id"), lit(4L)) === b)
          .write.mode("append").partitionBy("pb").parquet(path)
      val first = Compaction.compactPartitioned(spark, path, targetBytes = 64L << 20)
      assert(first.nCompacted == 2)
      val sig = dataFiles(s"$path/pb=0")
        .map(st => (st.getPath.getName, st.getLen, st.getModificationTime)).toSeq
      val second = Compaction.compactPartitioned(spark, path, targetBytes = 64L << 20)
      assert(second.nCompacted == 0 && second.nSkipped == 2)
      val sig2 = dataFiles(s"$path/pb=0")
        .map(st => (st.getPath.getName, st.getLen, st.getModificationTime)).toSeq
      assert(sig2 == sig, "skipped dir must be untouched, not rewritten")
    } finally fs.delete(new Path(base.toString), true)
  }

  test("a small byte target splits a directory into multiple files") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_spec3_")
    val path = s"$base/snap"
    try {
      val rows = (1L to 2000L).map(i => (i, "x" * 100)).toDF("id", "v")
        .withColumn("pb", lit(0L))
      for (b <- 0L until 8L)
        rows.filter(pmod(col("id"), lit(8L)) === b)
          .write.mode("append").partitionBy("pb").parquet(path)
      val bytes = dataFiles(s"$path/pb=0").map(_.getLen).sum
      val target = bytes / 3 + 1 // desired = 3 files
      val stats = Compaction.compactPartitioned(spark, path, target)
      assert(stats.nCompacted == 1)
      assert(dataFiles(s"$path/pb=0").length == 3)
      assert(spark.read.parquet(path).count() == 2000L)
    } finally fs.delete(new Path(base.toString), true)
  }
}

package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.Row
import graft.sinks.BulkForeachSink
import graft.sinks.BulkForeachSink.{BulkClient, WriteStats}

/** External bulk sink: grouped(batchSize) round trips, one client per
  * partition, per-batch error containment — mirror of the reference's
  * batch_size bulk writes and mongo.py:148-159 policy. */
class BulkForeachSinkSpec extends SparkSpec {
  import spark.implicits._

  test("rows stream in grouped(batchSize) round trips; one client per partition") {
    BulkForeachSinkSpec.reset()
    val df = (1 to 95).toDF("x").repartition(4)
    val stats = BulkForeachSink.write(df, batchSize = 10, BulkForeachSinkSpec.recording)
    assert(stats.nRows == 95 && stats.nFailedBatches == 0)
    assert(BulkForeachSinkSpec.opens.get() == 4, "one open per partition")
    assert(BulkForeachSinkSpec.closes.get() == 4, "client closed even on success")
    val sizes = BulkForeachSinkSpec.sizes()
    assert(sizes.sum == 95)
    assert(sizes.forall(_ <= 10), "no batch may exceed batchSize")
    assert(stats.nBatches == sizes.length)
    // ceil arithmetic holds per partition: at most one short batch each
    assert(sizes.count(_ < 10) <= 4)
  }

  test("tolerant mode drops a poisoned batch and continues (mongo.py:148-159)") {
    BulkForeachSinkSpec.reset()
    val failing = BulkForeachSinkSpec.poisoned
    val df = (1 to 40).toDF("x").repartition(1)
    val stats = BulkForeachSink.write(df, batchSize = 10, failing, tolerant = true)
    assert(stats.nFailedBatches == 1)
    assert(stats.nRows == 30, "the other three batches still apply")
    intercept[org.apache.spark.SparkException] {
      BulkForeachSink.write(df, batchSize = 10, failing, tolerant = false)
    }
  }

  test("CsvBatchClient: one atomically-renamed file per batch, lossless round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csvclient").toString
    val client = graft.sinks.CsvBatchClient(dir)
    client.open()
    client.writeBatch(Seq(Row(1L, 2.5), Row(2L, -0.125)))
    client.writeBatch(Seq(Row(3L, 1e-300)))
    client.close()
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".csv")) == 2 && !files.exists(_.endsWith(".tmp")),
      s"two batch files, no temp leftovers: ${files.mkString(",")}")
    val lines = files.filter(_.endsWith(".csv"))
      .flatMap(f => scala.io.Source.fromFile(s"$dir/$f").getLines()).sorted
    assert(lines.toSeq == Seq("1,2.5", "2,-0.125", "3,1.0E-300"),
      "String.valueOf rendering round-trips numerics exactly")
  }

  test("q48 gate: external write round trip verified against the fixture") {
    val row = graft.operators.SinkQueries.q48BulkSink(spark, sf).collect()(0)
    val n = Tables.lineitem(spark, sf).count()
    assert(row.getAs[Long]("n_rows") == n, "every fixture row reached the sink")
    assert(row.getAs[Boolean]("stats_rows_match"), "accumulator counts agree")
    assert(row.getAs[Boolean]("batches_consistent"), "file-per-batch + ceil bounds")
    assert(row.getAs[Boolean]("no_failures"))
  }
}

object BulkForeachSinkSpec {
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  val batchSizes = new ConcurrentLinkedQueue[Int]()
  def sizes(): Seq[Int] = { import scala.jdk.CollectionConverters._; batchSizes.asScala.toSeq }
  def reset(): Unit = { opens.set(0); closes.set(0); batchSizes.clear() }

  // factories live on the object so closures don't capture the spec
  // instance (which holds the non-serializable SparkSession)
  val recording: () => BulkClient = () => new BulkClient {
    override def open(): Unit = opens.incrementAndGet()
    override def writeBatch(rows: Seq[Row]): Int = { batchSizes.add(rows.size); rows.size }
    override def close(): Unit = closes.incrementAndGet()
  }

  val poisoned: () => BulkClient = () => new BulkClient {
    override def open(): Unit = ()
    override def writeBatch(rows: Seq[Row]): Int = {
      if (rows.exists(_.getInt(0) == 13)) throw new RuntimeException("poison")
      batchSizes.add(rows.size)
      rows.size
    }
    override def close(): Unit = ()
  }
}

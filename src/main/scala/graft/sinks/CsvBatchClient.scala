package graft.sinks

import org.apache.spark.sql.Row

/** A [[BulkForeachSink.BulkClient]] whose external system is a staging
  * directory: each batch becomes ONE atomically-renamed CSV file — the
  * per-batch round trip of the reference's bulk writes (reference:
  * src/func/mongo.py:103-163) with the filesystem standing in for the
  * database, which makes the write VERIFIABLE (read the directory back
  * and compare — the q48 gate does exactly that). Also the template for
  * any client whose protocol is "one durable put per batch".
  *
  * Fields are rendered with `String.valueOf` and joined with commas — no
  * quoting or escaping, so callers must send delimiter-free fields
  * (numeric columns, ids). Atomicity: each batch is written to a
  * dot-prefixed temp name then renamed; Spark's CSV reader ignores
  * dot-prefixed files, so a concurrent reader never sees half a batch
  * even if a writer dies mid-file. */
final case class CsvBatchClient(dir: String) extends BulkForeachSink.BulkClient {
  def open(): Unit = ()

  def writeBatch(rows: Seq[Row]): Int = {
    val name = java.util.UUID.randomUUID().toString
    val tmp = new java.io.File(dir, s".$name.tmp")
    val out = new java.io.PrintWriter(new java.io.BufferedWriter(
      new java.io.FileWriter(tmp)))
    try rows.foreach(r => out.println(r.toSeq.map(String.valueOf).mkString(",")))
    finally out.close()
    val dst = new java.io.File(dir, s"$name.csv")
    if (!tmp.renameTo(dst))
      throw new java.io.IOException(s"atomic rename failed: $dst")
    rows.size
  }

  def close(): Unit = ()
}

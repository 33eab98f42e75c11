package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Design-for-scale defaults: AQE on (runtime re-plan, skew-join handling,
  * partition coalescing), shuffle partitions sized to the local core count
  * rather than the 200 default (on a real cluster this would be set to
  * ~2-3x total cores via `--conf`), UTC session time zone for oracle parity.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions) // native expressions as SQL fns
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE re-plan (coalesce) the stages under persist()ed frames —
      // the label-propagation/persist loops otherwise pin every round's
      // stages at the raw shuffle-partition count (guide §2.2: fewer,
      // larger partitions; cached-plan exchange reuse matters less here
      // than right-sized stages)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as long nanos and
      // truncate in Tables.events (Spark has no nanosecond timestamp type).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local file:// without per-file chmod FORKS or duplicate .crc
      // writes (see graft.hadoop.NioLocalFileSystem — thread sampling
      // showed every parquet-writing task forking `chmod` through
      // Hadoop's Shell fallback); scheme and O_EXCL semantics are
      // unchanged, and cluster schemes (hdfs/s3a) never touch this
      .config("spark.hadoop.fs.file.impl",
        "graft.hadoop.NioLocalFileSystem")
      // the FileContext mirror: streaming checkpoint/state files go
      // through the AbstractFileSystem API (see graft.hadoop.NioLocalFs)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.hadoop.NioLocalFs")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

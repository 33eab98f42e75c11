package graft

import org.apache.spark.sql.SparkSession

/** Tiny session helpers shared by operators and specs. */
object Sparks {

  /** Run `body` with one SQL conf pinned, restoring the PRIOR value
    * (or unsetting an absent one) afterward — never clobbering a
    * deliberate session-level setting with a hard-coded default. */
  def withConf[T](spark: SparkSession, key: String, value: String)
                 (body: => T): T = {
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

package graft.update

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Upsert-statement construction — the reference's only expression-
  * evaluation step (reference: src/func/mongo.py:28-100).
  *
  * A "statement" row is `(key, set_fields)` where `set_fields` holds only
  * the non-null payload fields (null-skip, mongo.py:60-63). The guard
  * ladder is preserved as row-level filters instead of per-row None
  * returns (mongo.py:46-57, :96-100): null key → dropped, empty field
  * set → dropped. All of it is pure column expressions — no UDF, no
  * driver-side loop, fully codegen'd.
  */
object Statements {

  /** Build upsert statements from an updates frame. Payload values are
    * cast to double (the reference schema's payload type; mixed-type
    * payloads would use a string-keyed variant map at the sink boundary).
    * `passthrough` columns (e.g. an arrival-order column for the sink's
    * duplicate-key fold) ride along unchanged. */
  def build(updates: DataFrame, idColumn: String, fields: Seq[String],
            passthrough: Seq[String] = Nil): DataFrame = {
    require(fields.nonEmpty, "empty field list — nothing to $set (mongo.py:52-57)")
    val kv = fields.flatMap(f => Seq(lit(f), col(f).cast("double")))
    updates
      .filter(col(idColumn).isNotNull)                       // missing key → drop (mongo.py:46-50)
      .select(
        col(idColumn).as("key") +:
        map_filter(map(kv: _*), (_, v) => v.isNotNull).as("set_fields") +:
        passthrough.map(col): _*)
      .filter(size(col("set_fields")) > 0)                   // nothing non-null → drop (mongo.py:96-100)
  }
}

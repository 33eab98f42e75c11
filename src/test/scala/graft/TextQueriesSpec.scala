package graft

import org.apache.spark.sql.functions._
import graft.operators.TextQueries

/** PII redaction: pattern behavior on known strings, count/redaction
  * consistency, and gate non-vacuity (the fixture carries no natural
  * PII — the q74 harness PLANTS it, so every pattern must fire). */
class TextQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("each PII pattern redacts its known form and counts it on the original text") {
    val t = "mail a@b.co and c@d.io node 10.0.0.17 call 555-123-4567 ssn 123-45-6789 end"
    val out = TextQueries.redactPii(Seq((1L, t)).toDF("doc_id", "text"), "text")
      .collect().head
    assert(out.getAs[Int]("n_email") == 2)
    assert(out.getAs[Int]("n_ip") == 1)
    assert(out.getAs[Int]("n_phone") == 1)
    assert(out.getAs[Int]("n_ssn") == 1)
    assert(out.getAs[String]("redacted") ==
      "mail <EMAIL> and <EMAIL> node <IP> call <PHONE> ssn <SSN> end")
  }

  test("clean text passes through untouched with zero counts") {
    val t = "nothing sensitive here, version 1.2 and room 101-B"
    val out = TextQueries.redactPii(Seq((1L, t)).toDF("doc_id", "text"), "text")
      .collect().head
    Seq("n_email", "n_ip", "n_phone", "n_ssn").foreach(c =>
      assert(out.getAs[Int](c) == 0, s"$c must be 0"))
    assert(out.getAs[String]("redacted") == t)
  }

  test("q74 gate is non-vacuous: every planted pattern fires on the fixture") {
    val agg = TextQueries.q74PiiRedact(spark, sf)
      .agg(sum("n_email").as("e"), sum("n_ssn").as("s"),
        sum("n_phone").as("p"), sum("n_ip").as("i"))
      .collect().head
    Seq("e", "s", "p", "i").foreach(c =>
      assert(agg.getAs[Long](c) > 0, s"planted PII class $c never fired"))
  }
}

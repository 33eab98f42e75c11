package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expressions.{DotProduct, NfcNormalize, SimhashWord, SortedIntersectSize, WinnowMd5, WinnowRk}

/** Session extensions (the public Catalyst plug-in point): registers the
  * engine's native expressions as SQL functions so `spark.sql("SELECT
  * graft_dot(a, b) ...")` resolves like a built-in. Installed by
  * [[GraftSession]] via `Builder.withExtensions`, or by config
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Integer-literal argument extraction shared by the winnow builders
    * (k and w parameterize generated code, so they must be literals). */
  private def intLit(fn: String)(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: $name must be an integer literal")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "graft_sorted_intersect_size"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2,
          "graft_sorted_intersect_size(sortedArrA, sortedArrB)")
        SortedIntersectSize(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_rk"),
      new ExpressionInfo(classOf[WinnowRk].getName, "graft_winnow_rk"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 3, "graft_winnow_rk(text, k, w)")
        val lit = intLit("graft_winnow_rk") _
        WinnowRk(args(0), lit(args(1), "k"), lit(args(2), "w"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_md5"),
      new ExpressionInfo(classOf[WinnowMd5].getName, "graft_winnow_md5"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // NOTE: like graft_winnow_rk, the text argument is hashed as
        // given — lower() it at the call site to match the oracle form
        require(args.length == 3, "graft_winnow_md5(lower(text), k, w)")
        val lit = intLit("graft_winnow_md5") _
        WinnowMd5(args(0), lit(args(1), "k"), lit(args(2), "w"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 1, "graft_nfc(text)")
        NfcNormalize(args(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash_word"),
      new ExpressionInfo(classOf[SimhashWord].getName, "graft_simhash_word"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 1, "graft_simhash_word(hashArray)")
        SimhashWord(args(0))
      }))
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd |A ∩ B| for two SORTED, DISTINCT, null-free string arrays —
  * the near-dup verify kernel (the second escalation to a native
  * Expression after [[DotProduct]], again on bench evidence: the exact
  * prefix-filter reference at a permissive threshold feeds ~1.4M
  * candidate pairs through the Jaccard verify at sf0.1, and built-in
  * `array_intersect` builds a hash set PER PAIR — the two-pointer merge
  * over pre-sorted gram arrays does the same count allocation-free).
  *
  * PRECONDITION (caller-owned, [[graft.operators.Dedup]] sorts its gram
  * projection once at build time): both arrays ascending by UTF8String
  * binary order with no duplicates, nulls (if any) last — `array_sort`'s
  * contract. Null elements never match; the merge stops at the first
  * null on either side. On unsorted input the count is undefined — this
  * is a kernel for the dedup pipeline, not a general set function
  * (`array_intersect` remains the general form).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    // null elements never match, and array_sort places them LAST — so the
    // first null on either side ends the merge (the function is exposed
    // as SQL; a crash on a null element would be a task failure, not an
    // analysis error)
    while (i < na && j < nb && !a.isNullAt(i) && !b.isNullAt(j)) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("isectNa")
      val nb = ctx.freshName("isectNb")
      val i = ctx.freshName("isectI")
      val j = ctx.freshName("isectJ")
      val n = ctx.freshName("isectN")
      val c = ctx.freshName("isectC")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $na && $j < $nb && !$a.isNullAt($i) && !$b.isNullAt($j)) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

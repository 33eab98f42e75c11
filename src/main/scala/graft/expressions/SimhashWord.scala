package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd 32-bit SimHash word over an array of token hashes — one
  * pass with 32 counters, replacing the higher-order form's 32
  * interpreted `aggregate` lambdas per word (the last interpreted-HOF
  * hot spot in the dedup family; q21 evaluates two words per document).
  * Bit j of the result is set when at least half the hashes have bit j
  * set (vote sum >= 0 with +1/-1 votes) — IDENTICAL values to
  * [[graft.operators.Dedup.simhashWordHof]], so the q21 oracle is
  * untouched; the equivalence is pinned in DedupSpec.
  *
  * Null elements vote like a zero hash (all bits -1) — the gram
  * pipeline never produces null hashes, and total semantics keep the
  * expression null-safe as a registered SQL function. */
case class SimhashWord(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_word"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = if (a.isNullAt(i)) 0L else a.getLong(i)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("shN")
      val votes = ctx.freshName("shVotes")
      val h = ctx.freshName("shH")
      val i = ctx.freshName("shI")
      val j = ctx.freshName("shJ")
      val out = ctx.freshName("shOut")
      s"""
         |int $n = $c.numElements();
         |int[] $votes = new int[32];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.isNullAt($i) ? 0L : $c.getLong($i);
         |  for (int $j = 0; $j < 32; $j++) {
         |    if ((($h >>> $j) & 1L) != 0L) { $votes[$j]++; } else { $votes[$j]--; }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  if ($votes[$j] >= 0) { $out |= (1L << $j); }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashWord =
    copy(child = newChild)
}

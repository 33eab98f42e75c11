package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product of two numeric arrays (the SURVEY §4 escalation:
  * "promote hot vector ops to `Expression` only on bench evidence" — the
  * evidence arrived: the zip_with+aggregate form is interpreted
  * expression-tree walking per element, and dominated q22/q23 at sf0.1).
  *
  * Accumulates in double, left-to-right — the SAME summation order as the
  * higher-order form it replaces and as the DuckDB oracle's list_sum, so
  * results are bit-identical and no oracle changes.
  *
  * Element null handling: null elements contribute 0 (embeddings carry no
  * null elements; the guard keeps the expression total rather than
  * null-propagating). Mismatched lengths dot the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    // exactly the element types eval/doGenCode implement — DecimalType is
    // NumericType but has no branch below, and this expression is exposed
    // as a SQL function (graft_dot), so an unsupported type must fail
    // ANALYSIS, not crash at runtime
    val supported: Set[DataType] =
      Set(FloatType, DoubleType, IntegerType, LongType, ShortType, ByteType)
    val ok = Seq(left, right).forall { e =>
      e.dataType match {
        case ArrayType(t, _) => supported.contains(t)
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires arrays of float/double/int/long/short/byte elements, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def getDouble(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += getDouble(a, i, lt) * getDouble(b, i, rt)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def acc(arr: String, idx: String, t: DataType): String = t match {
      case FloatType   => s"(double) $arr.getFloat($idx)"
      case DoubleType  => s"$arr.getDouble($idx)"
      case IntegerType => s"(double) $arr.getInt($idx)"
      case LongType    => s"(double) $arr.getLong($idx)"
      case ShortType   => s"(double) $arr.getShort($idx)"
      case ByteType    => s"(double) $arr.getByte($idx)"
      case _ => throw new IllegalStateException(s"unsupported element type $t")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: fixed local names could shadow an enclosing declaration
      // in the generated scope → Janino failure → silent interpreted
      // fallback of the whole stage
      val n = ctx.freshName("dotN")
      val sum = ctx.freshName("dotSum")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += ${acc(a, i, elemType(left))} * ${acc(b, i, elemType(right))};
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Packed signed-random-projection sketch of a numeric vector: bit
  * (p mod 64) of word (p div 64) is set iff dot(v, planes(p)) >= 0 —
  * `planes.length` sign bits packed into `planes.length / 64` longs.
  *
  * The composed column form (one [[DotProduct]] + `when` per plane —
  * kept as `Ivf.srpSketchHof` for the equivalence spec) is correct but
  * catastrophically codegen-hostile at 256 planes: the projection
  * compiles 256 independent dot loops into one oversized generated
  * method, blowing the JIT budget so the stage runs interpreted
  * (measured: the q167 index build + six ladder probes cost 21 s at
  * sf0.1; this expression's one-pass loop with the plane matrix as a
  * reference object brings the sketch back to ~16k fused multiply-adds
  * per row of tight generated code). Same double accumulation order
  * (left-to-right, per plane) as the composed form, so the bits — and
  * every gate downstream — are identical.
  *
  * Element null handling follows [[DotProduct]]: null elements
  * contribute 0; a shorter vector dots the common prefix.
  */
case class SrpSketch(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length % 64 == 0,
    s"planes.length=${planes.length} must be a positive multiple of 64")

  private def nWords: Int = planes.length / 64

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_srp_sketch"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    val supported: Set[DataType] =
      Set(FloatType, DoubleType, IntegerType, LongType, ShortType, ByteType)
    child.dataType match {
      case ArrayType(t, _) if supported.contains(t) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array of float/double/int/long/short/byte " +
          s"elements, got ${other.sql}")
    }
  }

  private def getDouble(a: ArrayData, i: Int): Double = elemType match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $elemType")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val words = new Array[Long](nWords)
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(a.numElements(), pl.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) s += getDouble(a, i) * pl(i)
        i += 1
      }
      if (s >= 0.0) words(p >> 6) |= 1L << (p & 63)
      p += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    val get = elemType match {
      case FloatType   => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case DoubleType  => (a: String, i: String) => s"$a.getDouble($i)"
      case IntegerType => (a: String, i: String) => s"(double) $a.getInt($i)"
      case LongType    => (a: String, i: String) => s"(double) $a.getLong($i)"
      case ShortType   => (a: String, i: String) => s"(double) $a.getShort($i)"
      case ByteType    => (a: String, i: String) => s"(double) $a.getByte($i)"
      case _ => throw new IllegalStateException(s"unsupported element type $elemType")
    }
    nullSafeCodeGen(ctx, ev, a => {
      val words = ctx.freshName("skWords")
      val p = ctx.freshName("skP")
      val pl = ctx.freshName("skPl")
      val n = ctx.freshName("skN")
      val s = ctx.freshName("skS")
      val i = ctx.freshName("skI")
      s"""
         |long[] $words = new long[$nWords];
         |for (int $p = 0; $p < ${planes.length}; $p++) {
         |  double[] $pl = $planesRef[$p];
         |  int $n = java.lang.Math.min($a.numElements(), $pl.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) $s += ${get(a, i)} * $pl[$i];
         |  }
         |  if ($s >= 0.0) $words[$p >> 6] |= 1L << ($p & 63);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSketch =
    copy(child = newChild)

  // Array-valued constructor params compare by reference under the
  // generated case-class equality; sketch expressions over the same
  // vector with different plane sets must not be deduplicated as equal
  override def equals(other: Any): Boolean = other match {
    case SrpSketch(c, pl) =>
      c == child && pl.length == planes.length &&
        pl.indices.forall(i => java.util.Arrays.equals(pl(i), planes(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(
      planes.asInstanceOf[Array[AnyRef]])
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Rabin-Karp winnowing fingerprints — the PRODUCTION form of
  * [[graft.functions.TextFunctions.winnowFingerprints]] (whose md5-hex
  * per-k-gram hashing exists so DuckDB can mirror the selection exactly;
  * the oracle gate keeps using it). This is the form a 100 TB run ships:
  * one pass over the document's UTF-8 bytes, a rolling polynomial hash
  * per k-gram (O(1) per position instead of an md5 digest), window
  * minima, distinct + sort — allocation-bounded, no per-gram string
  * slicing, fully inside whole-stage codegen.
  *
  * Semantics mirror the md5 variant: byte-level k-grams of the input
  * (callers lower-case upstream), minimum hash per length-w window, the
  * DISTINCT selected hashes sorted ascending (signed order — the hash
  * family is fixed, so any total order works as long as it is
  * consistent). Guards identical: fewer than w k-grams → empty array;
  * null input → null. The per-window minimum scan is O(w) with w a small
  * constant (4 in the q29 configuration); the standard monotone-deque
  * form is the escalation if a deployment runs wide windows.
  *
  * Reference: Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms
  * for Document Fingerprinting" (SIGMOD 2003); same scheme as the
  * reference-cited md5 variant (TextFunctions.scala:116-142).
  */
case class WinnowRk(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_rk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  // wrap-around polynomial rolling hash (mod 2^64): BASE chosen prime;
  // BASE^(k-1) precomputed once per expression instance
  private val Base = 1000003L
  private lazy val topPow: Long = {
    var p = 1L
    var i = 1
    while (i < k) { p *= Base; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    hs(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xffL) * topPow) * Base + (bytes(i + k - 1) & 0xffL)
      hs(i) = h
      i += 1
    }
    val mins = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j <= n - w) {
      var m = hs(j)
      var t = j + 1
      while (t < j + w) { if (hs(t) < m) m = hs(t); t += 1 }
      mins.add(m)
      j += 1
    }
    val out = new Array[Long](mins.size)
    val it = mins.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("wrkBytes")
      val n = ctx.freshName("wrkN")
      val hs = ctx.freshName("wrkHs")
      val h = ctx.freshName("wrkH")
      val i = ctx.freshName("wrkI")
      val j = ctx.freshName("wrkJ")
      val t = ctx.freshName("wrkT")
      val m = ctx.freshName("wrkM")
      val mins = ctx.freshName("wrkMins")
      val out = ctx.freshName("wrkOut")
      val o = ctx.freshName("wrkO")
      val iter = ctx.freshName("wrkIter")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $bytes.length - $k + 1;
         |if ($n < $w) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $hs = new long[$n];
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) { $h = $h * ${Base}L + ($bytes[$i] & 0xffL); }
         |  $hs[0] = $h;
         |  for (int $i = 1; $i < $n; $i++) {
         |    $h = ($h - ($bytes[$i - 1] & 0xffL) * ${topPow}L) * ${Base}L
         |        + ($bytes[$i + $k - 1] & 0xffL);
         |    $hs[$i] = $h;
         |  }
         |  java.util.TreeSet<Long> $mins = new java.util.TreeSet<Long>();
         |  for (int $j = 0; $j <= $n - $w; $j++) {
         |    long $m = $hs[$j];
         |    for (int $t = $j + 1; $t < $j + $w; $t++) {
         |      if ($hs[$t] < $m) $m = $hs[$t];
         |    }
         |    $mins.add($m);
         |  }
         |  long[] $out = new long[$mins.size()];
         |  int $o = 0;
         |  for (java.util.Iterator<Long> $iter = $mins.iterator(); $iter.hasNext(); ) {
         |    $out[$o++] = ((Long) $iter.next()).longValue();
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowRk =
    copy(child = newChild)
}

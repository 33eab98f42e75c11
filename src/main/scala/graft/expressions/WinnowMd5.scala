package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd md5-winnowing — BIT-IDENTICAL to the higher-order oracle form
  * [[graft.functions.TextFunctions.winnowFingerprints]] (k-char-gram md5
  * hex prefixes, length-w window minima, distinct sorted), at native-loop
  * cost. The HOF form evaluates an interpreted lambda per character
  * position (one Spark `md5` + `substr` expression tree per gram, then an
  * `array_min(slice(...))` pass per window); this expression makes one
  * pass over the string with a reused MessageDigest — same values, so the
  * q29 DuckDB oracle is untouched.
  *
  * Two equivalences make the fast path safe (pinned in DedupSpec):
  *  - grams are CHARACTER substrings (UTF-8 aware): byte offsets of each
  *    char are precomputed once and the digest reads the gram's byte
  *    range directly — identical bytes to `substr(s, i, k)` + md5;
  *  - the 8-hex-char prefix of an md5 digest orders lexicographically
  *    exactly as its numeric value (fixed-width lowercase hex), so window
  *    minima/dedup/sort run on the first four digest BYTES as an unsigned
  *    int, and only the surviving minima are hex-formatted.
  *
  * Reference: Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms
  * for Document Fingerprinting" (SIGMOD 2003). Selection scheme shared
  * with [[WinnowRk]] (the Rabin-Karp production form); this variant exists
  * so the ORACLE-GATED algorithm also runs at native speed.
  *
  * Like [[WinnowRk]], callers lower-case upstream: the Scala wrapper
  * ([[graft.functions.TextFunctions.winnowFingerprintsMd5]]) applies
  * `lower()`; SQL callers write `graft_winnow_md5(lower(text), k, w)` to
  * match the oracle form's fingerprints.
  */
case class WinnowMd5(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow_md5"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  // per-thread digest so the INTERPRETED path amortizes the JCA lookup the
  // same way the codegen path's mutable state does (expressions may be
  // evaluated concurrently, so a plain lazy val would race on reset/update)
  @transient private lazy val localMd: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    val nChars = u.numChars()
    val n = nChars - k + 1
    if (n < w) return new GenericArrayData(Array.empty[AnyRef])
    // char -> byte offset table, built in one pass (UTF-8 aware grams)
    val off = new Array[Int](nChars + 1)
    var i = 0
    var b = 0
    while (i < nChars) {
      off(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    off(nChars) = bytes.length
    val md = localMd.get()
    val hs = new Array[Long](n)
    i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, off(i), off(i + k) - off(i))
      val d = md.digest()
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
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
    val out = new Array[AnyRef](mins.size)
    val it = mins.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = UTF8String.fromString(String.format("%08x", it.next()))
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdField = ctx.addMutableState("java.security.MessageDigest", "winnowMd5Digest",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("wmBytes")
      val nChars = ctx.freshName("wmNChars")
      val n = ctx.freshName("wmN")
      val off = ctx.freshName("wmOff")
      val hs = ctx.freshName("wmHs")
      val d = ctx.freshName("wmD")
      val i = ctx.freshName("wmI")
      val b = ctx.freshName("wmB")
      val j = ctx.freshName("wmJ")
      val t = ctx.freshName("wmT")
      val m = ctx.freshName("wmM")
      val mins = ctx.freshName("wmMins")
      val out = ctx.freshName("wmOut")
      val o = ctx.freshName("wmO")
      val iter = ctx.freshName("wmIter")
      // NB: Spark's `code` interpolator strips '|' margins AGAIN on the
      // assembled block, so no template line may BEGIN with a `|` operator —
      // it would be eaten as a margin char and the code fails janino.
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $nChars = $c.numChars();
         |int $n = $nChars - $k + 1;
         |if ($n < $w) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  int[] $off = new int[$nChars + 1];
         |  int $b = 0;
         |  for (int $i = 0; $i < $nChars; $i++) {
         |    $off[$i] = $b;
         |    $b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte($bytes[$b]);
         |  }
         |  $off[$nChars] = $bytes.length;
         |  long[] $hs = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $mdField.reset();
         |    $mdField.update($bytes, $off[$i], $off[$i + $k] - $off[$i]);
         |    byte[] $d = $mdField.digest();
         |    $hs[$i] = (($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) |
         |        (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL);
         |  }
         |  java.util.TreeSet<Long> $mins = new java.util.TreeSet<Long>();
         |  for (int $j = 0; $j <= $n - $w; $j++) {
         |    long $m = $hs[$j];
         |    for (int $t = $j + 1; $t < $j + $w; $t++) {
         |      if ($hs[$t] < $m) $m = $hs[$t];
         |    }
         |    $mins.add($m);
         |  }
         |  Object[] $out = new Object[$mins.size()];
         |  int $o = 0;
         |  for (java.util.Iterator<Long> $iter = $mins.iterator(); $iter.hasNext(); ) {
         |    $out[$o++] = org.apache.spark.unsafe.types.UTF8String.fromString(
         |        String.format("%08x", (Long) $iter.next()));
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMd5 =
    copy(child = newChild)
}

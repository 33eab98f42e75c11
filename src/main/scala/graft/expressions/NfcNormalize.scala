package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the one
  * ingredient of C4/Dolma-style text normalization Spark's function
  * library lacks (whitespace collapse and control stripping are plain
  * `regexp_replace`, written in the Java∩RE2 dialect like the q74 PII
  * patterns). Canonical composition folds visually-identical byte
  * sequences (e + U+0301 → é, U+212B Å → U+00C5) so downstream exact
  * dedup, fingerprints, and shingles see ONE representation — without
  * it, q15's content hash treats the composed and decomposed spellings
  * of the same paragraph as distinct documents.
  *
  * Delegates to `java.text.Normalizer` (ICU-equivalent canonical
  * composition); the DuckDB oracle's `nfc_normalize` implements the
  * same Unicode NFC, so the gate is EXACT. Stateless and codegen'd —
  * the narrow normalization map fuses into the scan stage with zero
  * shuffle at any corpus size. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input // common case: already-NFC text skips the rebuild
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("nfcS")
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression
  * (`unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD')`).
  *
  * A text-curation corpus mixes precomposed and combining-sequence
  * encodings of the same glyphs ("é" vs "e"+U+0301); every downstream
  * exact/fingerprint dedup, shingle join, and tokenizer sees them as
  * different bytes unless ingestion canonicalizes. Spark ships no
  * normalization function, so this wraps `java.text.Normalizer` (public
  * JDK API) with whole-stage codegen — the generated Java is a single
  * static call, keeping the scan projection inside one codegen stage
  * rather than falling back to a UDF's boxing + serialization.
  *
  * The normalization form is a compile-time literal (like a cast's
  * target type), so the generated code references the enum constant
  * directly — no per-row form dispatch.
  */
case class NfcNormalize(child: Expression, form: String = "NFC")
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unicode_normalize form must be one of NFC/NFD/NFKC/NFKD, got $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val normForm = Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Fast path: Normalizer.isNormalized avoids allocating for the
    // (overwhelmingly common in clean corpora) already-normal case.
    // The Form enum is resolved once, not valueOf'd twice per row.
    if (Normalizer.isNormalized(s, normForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, normForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
         |String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.$form)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = UTF8String.fromString(
         |    java.text.Normalizer.normalize($str, java.text.Normalizer.Form.$form));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

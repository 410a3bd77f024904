package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * canonicalization step that must run BEFORE any hash-keyed text
  * operator (exact dedup q17, paragraph dedup q152, fingerprints,
  * incremental dedup q153): `café` precomposed (U+00E9) and `cafe` +
  * combining acute (U+0301) are byte-different but canonically equal,
  * so unnormalized corpora silently under-dedup.
  *
  * Spark has no built-in NFC function (DuckDB ships `nfc_normalize`,
  * which the oracle uses — both sides implement the same Unicode
  * normalization standard, so outputs are byte-identical). A Scala UDF
  * would break whole-stage codegen and pay SerDe per row; this
  * expression stays inside the codegen span and fast-paths the
  * already-normalized case (ASCII and most real text) with
  * `Normalizer.isNormalized`, returning the INPUT UTF8String with zero
  * allocation — the scan-speed path for the overwhelmingly common
  * case.
  *
  * Null semantics: null in → null out (nullSafeEval / nullSafeCodeGen).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING input, got ${dt.simpleString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(
        str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("nfcStr")
      s"""
         |java.lang.String $tmp = $c.toString();
         |if (java.text.Normalizer.isNormalized(
         |    $tmp, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String
         |    .fromString(java.text.Normalizer.normalize(
         |      $tmp, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object TextFunctions {
  /** Column API for [[NfcNormalize]]. */
  def nfc_normalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}

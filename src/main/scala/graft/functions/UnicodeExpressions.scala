package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel the generated code calls into — same pattern as
  * [[PolyHash]]. `java.text.Normalizer` is the JDK's ICU-derived
  * implementation of UAX #15; DuckDB's `nfc_normalize` implements the
  * same algorithm, so NFC outputs agree byte-for-byte (the oracle
  * relies on this).
  */
object UnicodeNorm {
  def normalize(s: UTF8String, form: String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form)))
}

/** Unicode normalization as a native codegen'd Catalyst expression.
  *
  * Web-scraped training text arrives in mixed normal forms — the same
  * visible string as composed (NFC) or decomposed (NFD) code points —
  * which breaks exact dedup, fingerprinting, and tokenization equality.
  * Spark has no built-in normalizer; a Scala UDF would box every row
  * and fence whole-stage codegen. This is one generated call into
  * [[UnicodeNorm.normalize]], staying inside the fused pipeline like
  * the surrounding string functions (the [[StringPolyHash]] pattern).
  *
  * The form is a construction-time constant (validated eagerly), so the
  * generated code embeds it as a literal — no per-row form dispatch.
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {

  // Fail at plan construction, not mid-job on an executor.
  java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_unicode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      // NullType: a bare NULL literal — result is null, like built-ins.
      case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.UnicodeNorm.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeFunctions {
  /** NFC-normalize a string column (UAX #15 canonical composition). */
  def nfc(text: Column): Column =
    ColumnBridge.column(NormalizeUnicode(ColumnBridge.expression(text), "NFC"))

  /** Normalize to any UAX #15 form: NFC, NFD, NFKC, NFKD. */
  def normalize(text: Column, form: String): Column =
    ColumnBridge.column(NormalizeUnicode(ColumnBridge.expression(text), form))
}

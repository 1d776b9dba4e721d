package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for the polynomial rolling hash: base-31 Horner fold
  * over the string's code points, mod 1e9+7. The modulus keeps the
  * accumulator below 2^63/31, so the arithmetic never overflows — the
  * same fold a SQL engine evaluates digit-by-digit agrees exactly
  * (DuckDB's `list_reduce` over `ord(c)` is the oracle form).
  */
object PolyHash {
  final val Mod = 1000000007L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Hash of every `width`-code-point window of `s`, O(len) total via
    * the classic Rabin–Karp roll: h(i+1) = (h(i) − cp(i)·31^(w−1))·31 +
    * cp(i+w), all mod 1e9+7. Each window hash equals [[hash]] of that
    * substring, so the DuckDB per-window `list_reduce` fold is an exact
    * oracle. Strings shorter than the window yield an empty array.
    * Peak intermediate is cp·31^(w−1) mod p < 2^50 — no overflow.
    */
  def windowHashes(s: UTF8String, width: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    val out = new Array[Long](math.max(0, n - width + 1))
    if (n >= width) {
      var pw = 1L // 31^(width-1) mod p
      var k = 1
      while (k < width) { pw = (pw * 31L) % Mod; k += 1 }
      var acc = 0L
      var i = 0
      while (i < width) { acc = (acc * 31L + cps(i)) % Mod; i += 1 }
      out(0) = acc
      i = width
      while (i < n) {
        acc = ((acc - cps(i - width) * pw % Mod + Mod) * 31L + cps(i)) % Mod
        out(i - width + 1) = acc
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native Catalyst expression for the rolling-hash fingerprint.
  *
  * The `aggregate(transform(sequence(...)))` higher-order-function
  * formulation evaluates its lambda interpreted per character and
  * re-enters `substring(text, i, 1)` per index — quadratic-ish and
  * outside whole-stage codegen (it regressed 0.35 s → 1.03 s at sf0.1
  * when normalization joined the pipeline). This is one codegen'd call
  * into a tight per-code-point loop — the same pattern as
  * [[FloatVecDot]]. Iteration is by Unicode code point, matching both
  * the HOF form (`ascii` of each 1-char `substring` = its code point)
  * and DuckDB's `ord` — results are identical.
  */
case class StringPolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "string_poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      // NullType: a bare NULL literal — result is null, like built-ins.
      case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Array of rolling hashes of every `width`-code-point window — the
  * Rabin–Karp primitive behind corpus-wide repeated-substring detection
  * (each element equals [[StringPolyHash]] of that window). One codegen
  * call into the O(len) rolling loop; the HOF formulation
  * (`transform(sequence(...), i -> hash(substring(...)))`) would be
  * O(len·width) with an interpreted lambda re-entering the string.
  */
case class PolyWindowHash(child: Expression, width: Int) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_window_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (width <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName width must be positive, got $width")
    else child.dataType match {
      case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    PolyHash.windowHashes(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.windowHashes($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** Codegen'd base-31 rolling hash (mod 1e9+7) of a string column. */
  def polyHash(text: Column): Column =
    ColumnBridge.column(StringPolyHash(ColumnBridge.expression(text)))

  /** Rolling hashes of every `width`-code-point window, as array<long>. */
  def polyWindowHash(text: Column, width: Int): Column =
    ColumnBridge.column(PolyWindowHash(ColumnBridge.expression(text), width))
}

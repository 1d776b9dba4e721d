package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Engine-stable decimal rounding for DOUBLE results that cross an
  * engine boundary (Spark result vs an external SQL oracle, a
  * downstream warehouse, a parity check against another engine).
  *
  * Why `round(_, k)` is NOT engine-stable: Spark's `Round` rounds the
  * double's SHORTEST DECIMAL RENDERING (`BigDecimal.valueOf`, i.e.
  * `Double.toString`), while DuckDB and most C/C++ engines scale the
  * BINARY value (`std::round(x * 10^k) / 10^k`-style). The two agree
  * everywhere except when a quotient's shortest rendering terminates
  * exactly one digit past the grid with a trailing 5 while its binary
  * value sits on the other side of that tie. That is not a freak
  * case: any mean whose reduced denominator is 2^a·5^b with
  * max(a,b) = k+1 lands exactly there — e.g. a 64-element group mean
  * 4264.78/64 = 66.6371875 (shortest rendering a 6-dp tie, binary
  * 66.63718749…) rounds UP on Spark and DOWN on DuckDB at k = 6.
  * Group counts sweep all small integers across a real table, so
  * power-of-two and 5·2^j counts WILL occur.
  *
  * `gridSnap` instead computes `floor(x·10^k + 0.5) / 10^k` — pure
  * IEEE-754 arithmetic on the binary value, so every engine that
  * stores doubles produces the identical bit pattern. Express the
  * oracle side with the same formula
  * (`FLOOR(x * 1000000 + 0.5) / 1000000`) and the comparison is
  * bit-exact by construction.
  *
  * Contract: ties resolve toward +∞ (for the positive measures this
  * library snaps — means, percentages, scores — that is ordinary
  * half-up). |x| must stay below 2^53/10^k for the grid to be exact;
  * at k = 6 that is ≈ 9·10^9, far above any snapped measure here.
  * Non-finite inputs propagate unchanged (NaN → NaN, ±Inf → ±Inf):
  * Spark's `floor` returns LONG, so the naive Column formula would
  * collapse NaN to 0 and +Inf to Long.MaxValue/10^k while the
  * oracle-side double-valued FLOOR propagates them — the guard keeps
  * the two sides bit-identical on the full double domain, and matches
  * what `round(_, k)` did before the sweep (a NaN component in an
  * embedding propagates a NaN cosine, which must stay NaN, not
  * become a rankable 0.0).
  *
  * Implemented as a codegen'd Catalyst expression so the input
  * evaluates ONCE: the Column-formula guard
  * (`when(nonFinite(c), c).otherwise(floor(c·p + 0.5)/p)`) references
  * `c` three times, and `FilterExec` does no subexpression
  * elimination — in pair-filter hot paths (`cosine ≥ threshold` over
  * candidate pairs) that re-evaluated the dot products per reference
  * and measured q_t_cosine_pairs at 2.3× its committed min. One call
  * into [[StableMath.snap]] restores single evaluation inside
  * whole-stage codegen.
  */
object StableMath {
  /** JVM kernel — shared by interpreted eval and generated code.
    * `p` is the precomputed 10^k. */
  def snap(v: Double, p: Double): Double =
    if (java.lang.Double.isFinite(v)) math.floor(v * p + 0.5) / p else v

  /** `floor(x·10^k + 0.5) / 10^k`, non-finite inputs passed through —
    * see object doc. `k` must be a literal scale ≥ 0; the result is
    * DOUBLE. */
  def gridSnap(c: Column, k: Int): Column = {
    require(k >= 0 && k <= 12, s"gridSnap scale $k outside [0,12]")
    ColumnBridge.column(
      GridSnapExpr(ColumnBridge.expression(c.cast("double")), k))
  }

  /** The matching oracle-side SQL fragment, for keeping query and
    * oracle in lockstep: `gridSnapSql("expr", 6)` =
    * `"FLOOR((expr) * 1000000 + 0.5) / 1000000"`. */
  def gridSnapSql(expr: String, k: Int): String = {
    require(k >= 0 && k <= 12, s"gridSnap scale $k outside [0,12]")
    val p = math.pow(10, k).toLong
    s"FLOOR(($expr) * $p + 0.5) / $p"
  }
}

/** The [[StableMath.gridSnap]] expression — see the object doc for the
  * engine-stability derivation and why this is a native expression
  * (single evaluation of the child in non-subexpression-eliminating
  * operators like FilterExec).
  */
case class GridSnapExpr(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  private val p: Double = math.pow(10, k)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "grid_snap"

  // numeric inputs auto-cast to double during analysis (the Scala
  // wrapper casts explicitly; this covers SQL callers the same way)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def nullSafeEval(input: Any): Any =
    StableMath.snap(input.asInstanceOf[Double], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StableMath.snap($c, ${p}D)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

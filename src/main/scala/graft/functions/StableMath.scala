package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, floor, isnan, when}

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
  * Spark's `floor` returns LONG, so the bare formula would collapse
  * NaN to 0 and +Inf to Long.MaxValue/10^k while the oracle-side
  * double-valued FLOOR propagates them — the guard keeps the two
  * sides bit-identical on the full double domain, and matches what
  * `round(_, k)` did before the sweep (a zero-norm embedding's NaN
  * cosine must stay NaN, not become a rankable 0.0).
  */
object StableMath {
  /** `floor(x·10^k + 0.5) / 10^k`, non-finite inputs passed through —
    * see object doc. `k` must be a literal scale ≥ 0; the result is
    * DOUBLE. */
  def gridSnap(c: Column, k: Int): Column = {
    require(k >= 0 && k <= 12, s"gridSnap scale $k outside [0,12]")
    val p = math.pow(10, k)
    when(isnan(c) || abs(c) === Double.PositiveInfinity, c)
      .otherwise(floor(c * p + 0.5) / p)
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

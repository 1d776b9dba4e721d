package graft

import graft.functions.StableMath
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Direct contract spec for [[graft.functions.StableMath]] — pins the
  * engine-stability seam independent of fixture luck: the oracle
  * queries that use gridSnap only exercise whatever quotients the
  * driver data happens to produce, while this spec CONSTRUCTS the
  * documented tie class (reduced denominator 2^a·5^b with
  * max(a,b) = k+1) where Spark's rendering-based `round` and a
  * binary-value round (DuckDB, most C++ engines) disagree.
  *
  * The reference model for "what DuckDB computes" is the pure-JVM
  * IEEE-754 evaluation of `floor(x·10^k + 0.5)/10^k` — the same
  * double ops DuckDB's FLOOR formula runs, so bit-equality here is
  * by construction, not by luck (the cross-engine half of the claim
  * is carried by the 188 oracle queries whose SQL uses the same
  * formula).
  */
class StableMathSpec extends SparkSpec {
  import spark.implicits._

  private def jvmSnap(x: Double, k: Int): Double = {
    val p = math.pow(10, k)
    math.floor(x * p + 0.5) / p
  }

  private def sparkEval(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("one").select(c.as("v")).as[Double].head()

  test("the documented 6-dp tie: 4264.78/64 renders as a tie but sits below it in binary") {
    val d = 4264.78 / 64 // 66.6371875 rendered; 66.63718749…96 in binary
    // shortest decimal rendering terminates exactly one digit past the
    // 6-dp grid with a trailing 5 — the tie class the scaladoc derives
    assert(d.toString === "66.6371875")
    // …while the binary value is strictly below that rendering (the
    // EXACT expansion constructor — scala's BigDecimal(d) would use
    // the shortest rendering and compare equal)
    assert(BigDecimal(new java.math.BigDecimal(d)) < BigDecimal("66.6371875"))
    // binary snap (DuckDB side) rounds DOWN
    assert(jvmSnap(d, 6) === 66.637187)
  }

  test("gridSnap(Spark) equals the JVM floor formula bit-exactly on the tie; round does not") {
    val q = lit(4264.78) / lit(64.0)
    val snapped = sparkEval(StableMath.gridSnap(q, 6))
    assert(java.lang.Double.doubleToLongBits(snapped) ===
      java.lang.Double.doubleToLongBits(jvmSnap(4264.78 / 64, 6)))
    // Spark's Round rounds the SHORTEST RENDERING (66.6371875 → up),
    // disagreeing with every binary-value engine — pinning WHY the
    // seam exists. If this ever starts agreeing, Spark changed Round
    // semantics and the gridSnap sweep should be re-evaluated.
    val rounded = sparkEval(round(q, 6))
    assert(rounded === 66.637188, s"Spark round gave $rounded")
    assert(rounded !== snapped)
  }

  test("gridSnap == JVM floor formula over generated and constructed 2^a·5^b-denominator quotients") {
    // random quotients for breadth (the money/metric shape over mixed
    // 2^a·5^b denominators) …
    val gen = for {
      cents <- Gen.choose(1L, 99999999L)
      a <- Gen.choose(0, 7)
      b <- Gen.choose(0, 7)
    } yield (cents / 100.0, (1 to a).map(_ => 2).product * (1 to b).map(_ => 5).product)
    val random = (1 to 300).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    // … plus the CONSTRUCTED tie family: odd j / 3200 (reduced
    // denominator 2^7·5^2 → the shortest rendering terminates exactly
    // one digit past the 6-dp grid with a trailing 5) with quotients in
    // (64, 67) — high in the 2^6 binade, where ulp(x)·10^6 exceeds
    // ulp(x·10^6)/2, so the x·10^6 product genuinely lands below the
    // rendered tie for a large fraction of members (elsewhere the
    // multiplication rounds back onto the tie and both sides agree).
    // 4264.78/64 = 213239/3200 is this family's canonical member.
    val ties = (0 until 200).map(i => ((204801 + 46 * i).toDouble, 3200))
    val cases = random ++ ties
    assert(cases.nonEmpty)
    val df = cases.toDF("num", "den")
    val got = df
      .select(col("num"), col("den"),
        StableMath.gridSnap(col("num") / col("den"), 6).as("snap"))
      .as[(Double, Int, Double)].collect()
    got.foreach { case (num, den, snap) =>
      val want = jvmSnap(num / den, 6)
      assert(java.lang.Double.doubleToLongBits(snap) ===
        java.lang.Double.doubleToLongBits(want),
        s"$num/$den: spark=$snap jvm=$want")
    }
    // the tie family must actually hit the disagreement class, or this
    // spec silently stops guarding the seam (≈48/200 members disagree;
    // the exact count is deterministic IEEE arithmetic)
    val disagreements = ties.count { case (num, den) =>
      val d = num / den
      BigDecimal.valueOf(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble != jvmSnap(d, 6)
    }
    assert(disagreements > 0,
      "no constructed quotient exercised the round-vs-binary tie class")
  }

  test("gridSnap == JVM floor formula at every scale the repo uses (k = 2, 4, 9, 10)") {
    // the oracle packs snap at 2 (display scores), 4 (correlation,
    // completeness pct), 6 (default), 9 (GD fixed-point), 10
    // (PageRank per-iteration) — same bit-exactness contract per k
    val gen = for {
      cents <- Gen.choose(1L, 9999999L)
      den <- Gen.oneOf(3, 7, 16, 64, 100, 320, 3200, 12800)
    } yield (cents / 100.0, den)
    val cases = (1 to 120).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    for (k <- Seq(2, 4, 9, 10)) {
      val got = cases.toDF("num", "den")
        .select(col("num"), col("den"),
          StableMath.gridSnap(col("num") / col("den"), k).as("snap"))
        .as[(Double, Int, Double)].collect()
      got.foreach { case (num, den, snap) =>
        val want = jvmSnap(num / den, k)
        assert(java.lang.Double.doubleToLongBits(snap) ===
          java.lang.Double.doubleToLongBits(want),
          s"k=$k $num/$den: spark=$snap jvm=$want")
      }
    }
  }

  test("non-finite inputs propagate unchanged, matching the oracle-side double FLOOR") {
    // Spark's floor returns LONG, so the bare formula would collapse
    // NaN → 0 and +Inf → Long.MaxValue/10^k while DuckDB's
    // double-valued FLOOR propagates them — the guard keeps both
    // sides identical on the full double domain. (Under the session's
    // ANSI mode division never yields NaN — it throws — but NaN/Inf
    // arrive in DATA: an embedding with a NaN component propagates it
    // through the dot product with no division involved, and that
    // cosine must stay NaN, not become a rankable 0.0.)
    val nan = sparkEval(StableMath.gridSnap(lit(Double.NaN), 6))
    assert(nan.isNaN, s"NaN collapsed to $nan")
    val pinf = sparkEval(StableMath.gridSnap(lit(Double.PositiveInfinity), 6))
    assert(pinf.isPosInfinity, s"+Inf collapsed to $pinf")
    val ninf = sparkEval(StableMath.gridSnap(lit(Double.NegativeInfinity), 6))
    assert(ninf.isNegInfinity, s"-Inf collapsed to $ninf")
    // and null stays null (nullable measures flow through the snap)
    val row = Seq(1).toDF("one")
      .select(StableMath.gridSnap(lit(null).cast("double"), 6).as("v"))
      .head()
    assert(row.isNullAt(0))
  }

  test("gridSnapSql renders the lockstep FLOOR formula") {
    assert(StableMath.gridSnapSql("x / y", 6) ===
      "FLOOR((x / y) * 1000000 + 0.5) / 1000000")
    assert(StableMath.gridSnapSql("r", 10) ===
      "FLOOR((r) * 10000000000 + 0.5) / 10000000000")
  }

  test("negative values snap toward +∞ (the documented tie contract), identically on both models") {
    // -0.1234565 renders as a 6-dp tie; toward-+∞ means the snapped
    // value is the LARGER neighbour (−0.123456), where HALF_UP on the
    // rendering would give −0.123457 — both models must agree
    val d = -1234565e-7
    val snapped = sparkEval(StableMath.gridSnap(lit(d), 6))
    assert(java.lang.Double.doubleToLongBits(snapped) ===
      java.lang.Double.doubleToLongBits(jvmSnap(d, 6)))
  }
}

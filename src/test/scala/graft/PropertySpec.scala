package graft

import graft.analytics.Demographics
import graft.serve.QueryService
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY §5): semantics that must hold for any
  * input, not just the fixtures — name-concat equivalence, diversity
  * bounds, pagination completeness/disjointness. ScalaCheck generators
  * are driven with explicit seeds (no scalatest bridge in the offline
  * dependency set), so failures are reproducible by seed.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val namePart = Gen.option(Gen.oneOf("ANN", "BOB", "X", "DE LA CRUZ", "J"))

  test("null-skipping concat equals the reference's dropna-join for any parts") {
    samples(Gen.nonEmptyListOf(Gen.zip(namePart, namePart)), 15).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((f, l), i) => (i, f.orNull, l.orNull) }
        .toDF("id", "first", "last")
      val parts = Seq(col("first"), col("last"))
      val got = df.select(col("id"),
          when(coalesce(parts: _*).isNull, lit(null))
            .otherwise(concat_ws(" ", parts: _*)).as("full"))
        .as[(Int, Option[String])].collect().toMap
      rows.zipWithIndex.foreach { case ((f, l), i) =>
        val expected = Seq(f, l).flatten match {
          case Nil => None
          case ps => Some(ps.mkString(" "))
        }
        assert(got(i) === expected, s"row $i parts=($f,$l)")
      }
    }
  }

  test("entropy ∈ [0, log2(n_distinct)] and gini ∈ [0, 1) for any distribution") {
    samples(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e")), 10).foreach { vs =>
      val df = vs.toDF("v")
      val h = Demographics.shannonEntropy(df, "v").select("entropy").as[Double].head()
      val g = Demographics.giniSimpson(df, "v").select("gini_simpson").as[Double].head()
      val nDistinct = vs.distinct.size
      assert(h >= -1e-9 && h <= math.log(nDistinct.toDouble) / math.log(2.0) + 1e-6)
      assert(g >= -1e-9 && g < 1.0)
    }
  }

  test("pagination partitions any table completely and disjointly") {
    samples(Gen.zip(Gen.choose(1, 50), Gen.choose(1, 20)), 8).foreach { case (n, pageSize) =>
      val df = (1 to n).map(i => (i, s"v$i")).toDF("k", "v")
      val pages = (0 until n by pageSize).map(off =>
        QueryService.paginate(df, Seq("k"), off, pageSize)
          .select("k").as[Int].collect().toSeq)
      assert(pages.flatten.sorted === (1 to n).toSeq)            // complete
      assert(pages.flatten.distinct.size === pages.flatten.size) // disjoint
      pages.foreach(p => assert(p.size <= pageSize))
    }
  }
}

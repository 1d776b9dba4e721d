package graft

import graft.analytics.Demographics
import graft.serve.QueryService
import graft.textops.Dedup
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

  test("prefix-filtered jaccard equals the full join for random corpora and thresholds") {
    // tiny vocabulary + short docs → dense shingle overlap, so the
    // prefix filter is exercised at pair-rich corpora, random t
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "g")
    val doc = Gen.choose(5, 10).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    val corpus = Gen.choose(3, 8).flatMap(m => Gen.listOfN(m, doc))
    samples(Gen.zip(corpus, Gen.choose(30, 80)), 6).foreach { case (docs, tPct) =>
      val t = tPct / 100.0
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("doc_id", "text")
      def pairs(r: org.apache.spark.sql.DataFrame) =
        r.select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val full = pairs(Dedup.jaccardPairs(df, "doc_id", "text", 3, t))
      val pref = pairs(Dedup.jaccardPairsPrefix(df, "doc_id", "text", 3, t))
      assert(pref === full, s"t=$t docs=$docs")
    }
  }

  test("intervalJoin equals the nested loop for random intervals, points, and bin widths") {
    val point = Gen.choose(-50L, 150L)
    val interval = Gen.zip(Gen.choose(-60L, 160L), Gen.choose(0L, 40L))
      .map { case (s, len) => (s, s + len) }
    val cfg = Gen.zip(
      Gen.choose(5, 40).flatMap(n => Gen.listOfN(n, point)),
      Gen.choose(2, 15).flatMap(m => Gen.listOfN(m, interval)),
      Gen.choose(1L, 60L))
    samples(cfg, 6).foreach { case (ps, ivs, w) =>
      val pdf = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "t")
      val idf = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("iid", "s", "e")
      val naive = pdf.join(idf, col("t") >= col("s") && col("t") <= col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val binned = graft.operators.Joins.intervalJoin(pdf, "t", idf, "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(binned === naive, s"w=$w ivs=$ivs ps=$ps")
    }
  }

  test("keyset walk enumerates any table completely, in order, for any page size") {
    samples(Gen.zip(Gen.choose(1, 40), Gen.choose(1, 15)), 6).foreach { case (n, ps) =>
      val df = (1 to n).map(i => (i, s"v$i")).toDF("k", "v")
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      var page = QueryService.paginateAfter(df, "k", None, ps)
        .select("k").as[Int].collect()
      while (page.nonEmpty) {
        out ++= page
        page = QueryService.paginateAfter(df, "k", Some(lit(page.last)), ps)
          .select("k").as[Int].collect()
      }
      assert(out.toSeq === (1 to n).toSeq, s"n=$n pageSize=$ps")
    }
  }

  test("string_poly_hash matches the per-code-point Horner reference, in range") {
    val strGen = Gen.listOf(Gen.oneOf('a', 'Z', '0', ' ', 'é', '中', '\t'))
      .map(_.mkString)
    val strs = samples(strGen, 30).distinct
    val got = strs.zipWithIndex.map { case (s0, i) => (i, s0) }.toDF("i", "t")
      .select(col("i"), graft.functions.HashFunctions.polyHash(col("t")).as("h"))
      .as[(Int, Long)].collect().toMap
    strs.zipWithIndex.foreach { case (s0, i) =>
      var acc = 0L
      s0.codePoints().toArray.foreach(cp => acc = (acc * 31 + cp) % 1000000007L)
      assert(got(i) === acc, s"string=${s0.map(_.toInt).mkString(",")}")
      assert(got(i) >= 0L && got(i) < 1000000007L)
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

  test("packGreedy matches a sequential reference walk for any corpus and budget") {
    val row = Gen.zip(Gen.oneOf("s1", "s2", "s3"), Gen.choose(1L, 40L))
    val corpus = Gen.nonEmptyListOf(row)
    val budgetGen = Gen.choose(10L, 80L)
    samples(Gen.zip(corpus, budgetGen), 8).foreach { case (rows, budget) =>
      val df = rows.zipWithIndex
        .map { case ((s, t), i) => (s, i.toLong, t) }
        .toDF("shard", "id", "n_tokens")
      val got = graft.operators.Packing
        .packGreedy(df, "shard", "id", "n_tokens", budget)
        .select("shard", "id", "pack_seq")
        .as[(String, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      // driver-side reference: same greedy walk per shard in id order
      val expected = rows.zipWithIndex.map { case ((s, t), i) => (s, i.toLong, t) }
        .groupBy(_._1).view.mapValues { shardRows =>
          var acc = 0L; var pack = -1L
          shardRows.sortBy(_._2).map { case (_, _, tok) =>
            if (pack < 0 || acc + tok > budget) { pack += 1; acc = tok }
            else acc += tok
            pack
          }.toSeq
        }.toMap
      assert(got === expected, s"budget=$budget rows=$rows")
    }
  }

  test("chunkDocuments windows cover all tokens and respect stride for any doc") {
    val gen = Gen.zip(Gen.choose(1, 30), Gen.choose(1, 8), Gen.choose(1, 8))
    samples(gen, 12).foreach { case (n, chunk, stride) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val got = graft.textops.TextAnalysis
        .chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"),
          "doc_id", "text", chunk, stride)
        .select("start_tok", "n_chunk_tokens")
        .as[(Long, Int)].collect().sortBy(_._1)
      val lastStart = math.max(1, n - chunk + 1)
      // starts are exactly the stride grid plus the final full window
      val expectedStarts =
        ((1L to lastStart.toLong by stride.toLong) ++ Seq(lastStart.toLong)).distinct.sorted
      assert(got.map(_._1).toSeq === expectedStarts, s"n=$n chunk=$chunk stride=$stride")
      // coverage: every token index appears in some window — holds iff
      // windows at least touch (stride ≤ chunk); a larger stride is
      // legitimate subsampling and skips tokens by design
      if (stride <= chunk) {
        val covered = got.flatMap { case (s, len) => s until (s + len) }.toSet
        assert(covered === (1L to n.toLong).toSet)
      }
      // no window exceeds the chunk size; the final window is full-size
      // whenever the doc has at least chunk tokens
      assert(got.forall(_._2 <= chunk))
      if (n >= chunk) assert(got.last._2 === chunk)
    }
  }

  test("file skipping returns exactly the full-scan filter rows for any data and bounds") {
    import graft.lake.VersionedTable
    // random multisets WITH nulls and duplicates, random (possibly
    // empty-result or unbounded) ranges, random file layouts — the
    // pruned read must equal the unpruned filter every time
    val rowGen = Gen.listOfN(60, Gen.option(Gen.chooseNum(-50L, 50L)))
    val boundGen = Gen.option(Gen.chooseNum(-60L, 60L))
    val caseGen = Gen.zip(rowGen, boundGen, boundGen, Gen.chooseNum(1, 5))
    samples(caseGen, 12).foreach { case (vs, lo, hi, nFiles) =>
      if (lo.isDefined || hi.isDefined) {
        val root = java.nio.file.Files
          .createTempDirectory("graft_prop_skip").toString + "/t"
        val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "k")
        VersionedTable.publish(df.repartition(nFiles, col("id")), root,
          statsColumns = Seq("k"))
        val ranges = Seq(VersionedTable.ColRange("k",
          lo.map(_.asInstanceOf[Any]), hi.map(_.asInstanceOf[Any])))
        val got = VersionedTable.readCurrentWhere(spark, root, ranges)
          .select("id").as[Long].collect().sorted.toSeq
        val want = VersionedTable.readCurrent(spark, root)
          .where(ranges.head.rowPredicate)
          .select("id").as[Long].collect().sorted.toSeq
        assert(got === want, s"lo=$lo hi=$hi nFiles=$nFiles")
      }
    }
  }
}

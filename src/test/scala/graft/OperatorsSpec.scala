package graft

import graft.operators.{Joins, Ranking, Sampling}
import graft.serve.QueryService
import graft.analytics.Demographics
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("orEquiJoin equals the semantics of a raw OR join") {
    val l = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("lid", "lk", "lv")
    val r = Seq((7, "a", 99), (8, "z", 20), (9, "c", 30)).toDF("rid", "rk", "rv")
    val or = l.join(r, l("lk") === r("rk") || l("lv") === r("rv"))
      .select("lid", "rid").as[(Int, Int)].collect().toSet
    val rewritten = Joins.orEquiJoin(l, r,
        Seq(l("lk") === r("rk"), l("lv") === r("rv")), Seq("lid", "rid"))
      .select("lid", "rid").as[(Int, Int)].collect().toSet
    assert(rewritten === or)
  }

  test("upsert keeps unmatched old rows and replaces matched keys") {
    val old = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val upd = Seq((2, "B"), (4, "D")).toDF("k", "v")
    val out = Joins.upsert(old, upd, Seq("k"))
      .as[(Int, String)].collect().toMap
    assert(out === Map(1 -> "a", 2 -> "B", 3 -> "c", 4 -> "D"))
  }

  test("globalRowNumber matches the single-window global rank, two-phase") {
    val df = (1 to 500).map(i => (i % 37, s"k%03d".format(i))).toDF("v", "k")
    val order = Seq(desc("v"), asc("k"))
    val expected = df.withColumn("rn",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .orderBy("rn").select("v", "k", "rn").collect().toSeq
    val ranked = Ranking.globalRowNumber(df, order, "rn")
    val got = ranked.orderBy("rn").select("v", "k", "rn").collect().toSeq
    assert(got === expected)
    // overflow-proof long by default; int only under the parity flag
    assert(ranked.schema("rn").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(Ranking.globalRowNumber(df, order, "rn", asInt = true)
      .schema("rn").dataType === org.apache.spark.sql.types.IntegerType)
    // the row_number window is partitioned by _pid (partition-local),
    // never a single-partition global window; the range-repartitioned
    // input reaches it as the materialized checkpoint (Ranking scaladoc
    // — both two-phase consumers must see ONE partition assignment)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(_pid"))
    assert(plan.contains("Scan ExistingRDD"))
  }

  test("globalNtile is bit-identical to ntile, without the global window") {
    val df = (1 to 503).map(i => (i % 37, s"k%03d".format(i))).toDF("v", "k")
    val order = Seq(desc("v"), asc("k"))
    for (k <- Seq(4, 7)) {
      val expected = df.withColumn("b", ntile(k).over(Window.orderBy(order: _*)))
        .select("v", "k", "b").collect().toSet
      val got = Ranking.globalNtile(df, order, k, "b")
        .select("v", "k", "b").collect().toSet
      assert(got === expected, s"k=$k")
    }
    // n < k: every row its own bucket (NTILE degenerate case)
    val tiny = Seq((3, "a"), (1, "b")).toDF("v", "k")
    val buckets = Ranking.globalNtile(tiny, Seq(desc("v")), 4, "b")
      .select("v", "b").as[(Int, Int)].collect().toMap
    assert(buckets === Map(3 -> 1, 1 -> 2))
    // the quartile phase is partition-local (window over _pid on the
    // materialized range-partitioned relation), not a single-partition
    // sort of the input frame
    val plan = Ranking.globalNtile(df, order, 4, "b")
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(_pid"))
    assert(plan.contains("Scan ExistingRDD"))
  }

  test("pagination pages are disjoint, ordered, and complete") {
    val df = Tables100()
    val p1 = QueryService.paginate(df, Seq("k"), 0, 30).select("k").as[Int].collect()
    val p2 = QueryService.paginate(df, Seq("k"), 30, 30).select("k").as[Int].collect()
    val p4 = QueryService.paginate(df, Seq("k"), 90, 30).select("k").as[Int].collect()
    assert(p1.length === 30 && p2.length === 30 && p4.length === 10)
    assert(p1.toSet.intersect(p2.toSet).isEmpty)
    assert((p1 ++ p2).toSeq === (1 to 60).toSeq)
  }

  test("hash split is deterministic, layout-independent, and near the target rate") {
    val df = (1 to 2000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    val split1 = Sampling.withSplit(df, "id", 10)
      .select("id", "split").as[(Long, String)].collect().toMap
    // identical assignment after an arbitrary repartition (rand() would fail this)
    val split2 = Sampling.withSplit(df.repartition(7), "id", 10)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(split1 === split2)
    val testRate = split1.values.count(_ == "test").toDouble / split1.size
    assert(math.abs(testRate - 0.10) < 0.03)
  }

  test("stratified sampling keeps strata and is seed-deterministic") {
    val df = (1 to 1000).map(i => (i, if (i % 4 == 0) "minor" else "major"))
      .toDF("id", "cls")
    val s1 = Sampling.stratified(df, "cls", Map("major" -> 0.1, "minor" -> 1.0), seed = 7L)
    val s2 = Sampling.stratified(df, "cls", Map("major" -> 0.1, "minor" -> 1.0), seed = 7L)
    assert(s1.collect().toSet === s2.collect().toSet)
    val byCls = s1.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(byCls("minor") === 250L)             // fraction 1.0 keeps all
    assert(byCls("major") > 30L && byCls("major") < 150L) // ~10% of 750
  }

  test("keyset pages are disjoint, ordered, and complete") {
    val df = Tables100()
    def page(after: Option[Int]) = QueryService
      .paginateAfter(df, "k", after.map(a => lit(a)), 30)
      .select("k").as[Int].collect()
    val p1 = page(None)
    val p2 = page(Some(p1.last))
    val p3 = page(Some(p2.last))
    val p4 = page(Some(p3.last))
    assert(p1.toSeq === (1 to 30) && p2.toSeq === (31 to 60))
    assert((p1 ++ p2 ++ p3 ++ p4).toSeq === (1 to 100).toSeq)
    assert(page(Some(100)).isEmpty)
  }

  private def Tables100() = (1 to 100).map(i => (i, s"row$i")).toDF("k", "v")

  test("all-null name concat yields null, not empty string") {
    val df = Seq(
      (1, Some("ANN"), Some("SMITH")),
      (2, None: Option[String], None: Option[String])).toDF("id", "first", "last")
    val parts = Seq(col("first"), col("last"))
    val out = df.select(col("id"),
        when(coalesce(parts: _*).isNull, lit(null))
          .otherwise(concat_ws(" ", parts: _*)).as("full"))
      .as[(Int, Option[String])].collect().toMap
    assert(out(1) === Some("ANN SMITH"))
    assert(out(2) === None)
  }

  test("entropy is within [0, log2(n)] and gini within [0, 1)") {
    val df = Seq("a", "a", "b", "c", "c", "c").toDF("v")
    val h = Demographics.shannonEntropy(df, "v").select("entropy").as[Double].head()
    val g = Demographics.giniSimpson(df, "v").select("gini_simpson").as[Double].head()
    assert(h >= 0 && h <= math.log(3) / math.log(2) + 1e-9)
    assert(g >= 0 && g < 1)
    // hand-computed: p = (2/6, 1/6, 3/6)
    val ps = Seq(2.0 / 6, 1.0 / 6, 3.0 / 6)
    val expH = -ps.map(p => p * math.log(p) / math.log(2)).sum
    val expG = 1.0 - ps.map(p => p * p).sum
    assert(math.abs(h - expH) < 1e-6)
    assert(math.abs(g - expG) < 1e-6)
  }

  test("salted join equals the plain join for any key distribution") {
    val fact = (Seq.fill(200)(("hot", 1)) ++ Seq(("a", 2), ("b", 3)))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("a", "A"), ("c", "C")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n")).collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = graft.operators.Skew.saltedJoin(fact, dim, "k", saltFactor = 8)
      .groupBy("k", "label").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("saltedJoin salt is recomputation-stable and spreads a hot key") {
    // payload-varied hot rows: salt = hash(row content), so the hot key
    // spreads over many salts, and two independent evaluations of the
    // same plan (as a task retry would re-run it) agree bit-for-bit
    val fact = (1 to 200).map(i => ("hot", i)).toDF("k", "v")
    val salted = fact.withColumn("_salt",
      graft.operators.Skew.stableSalt(fact, 8))
    val run1 = salted.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    val run2 = salted.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    assert(run1 === run2)
    assert(run1.map(_._3).distinct.length > 1) // hot key really spreads
  }

  test("hotColdJoin tolerates null fact keys (dropped, like the plain join)") {
    val fact = (Seq.fill(50)(Some("hot")) ++ Seq(None, None) ++
      Seq(Some("a"))).zipWithIndex.map { case (k, i) => (i.toLong, k.orNull) }
      .toDF("row_id", "k")
    val dim = Seq(("hot", 1), ("a", 2)).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k"))
      .select("row_id", "attr").as[(Long, Int)].collect().sorted.toSeq
    val split = graft.operators.Skew.hotColdJoin(fact, dim, "k", hotCounters = 4)
      .select("row_id", "attr").as[(Long, Int)].collect().sorted.toSeq
    assert(split === plain)
  }

  test("winsorize passes null-group-key rows through unclipped") {
    val df = Seq((Some("g"), 1.0), (Some("g"), 2.0), (Some("g"), 100.0),
      (None, 999.0)).map { case (k, v) => (k.orNull, v) }.toDF("k", "v")
    val out = graft.analytics.Anomaly.winsorize(df, "k", "v", 0.25, 0.75)
    assert(out.count() === 4) // clip, not drop — null key survives
    val nullRow = out.where(col("k").isNull).collect().head
    assert(nullRow.getAs[Double]("v_winsor") === 999.0)
    assert(nullRow.getAs[Boolean]("was_clipped") === false)
  }

  test("paginateWithMeta carries total_count and has_more") {
    val df = (1 to 45).map(i => (i, s"v$i")).toDF("k", "v")
    val p2 = QueryService.paginateWithMeta(df, Seq("k"), 20, 20).collect()
    assert(p2.length === 20)
    assert(p2.forall(_.getAs[Long]("total_count") === 45L))
    assert(p2.forall(_.getAs[Boolean]("has_more")))
    val p3 = QueryService.paginateWithMeta(df, Seq("k"), 40, 20).collect()
    assert(p3.length === 5)
    assert(p3.forall(!_.getAs[Boolean]("has_more")))
  }

  test("approx_count_distinct stays within 5% of exact on the test corpus") {
    val o = graft.core.Tables.orders(spark, sfDir)
    val (exact, approx) = o.agg(
        countDistinct(col("o_custkey")).as("e"),
        approx_count_distinct(col("o_custkey")).as("a"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("single-pass entropy Aggregator matches the two-stage computation") {
    val df = Tables.documentsLike
    val onePass = df.agg(
      graft.functions.EntropyAggregator.entropyOf(col("v")).as("entropy"))
      .as[Double].head()
    val twoStage = Demographics.shannonEntropy(df, "v")
      .select("entropy").as[Double].head()
    // two-stage output is rounded at 6 dp — compare at that grain
    assert(math.abs(onePass - twoStage) < 1e-6)
  }

  private object Tables {
    def documentsLike = Seq("a", "a", "b", "c", "c", "c", "d", "a")
      .toDF("v")
  }

  test("bounded top-k Aggregator matches the window row_number formulation") {
    val rnd = new scala.util.Random(7)
    // duplicate values on purpose: the id tie-break must decide
    val rows = (1L to 200L).map(i => (s"g${i % 5}", rnd.nextInt(20).toDouble, i))
    val df = rows.toDF("g", "v", "id")
    val agg = df.groupBy("g")
      .agg(graft.functions.TopKAggregator.topK(3, col("v"), col("id")).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "e")))
      .select(col("g"), col("pos"), col("e.value"), col("e.id"))
      .as[(String, Int, Double, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(desc("v"), asc("id"))
    val win = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("g"), (col("rn") - 1).cast("int"), col("v"), col("id"))
      .as[(String, Int, Double, Long)].collect().toSet
    assert(agg === win)
  }

  test("top-k Aggregator returns whole groups smaller than k, in rank order") {
    val df = Seq(("a", 1.0, 1L), ("a", 5.0, 2L), ("b", 2.0, 3L)).toDF("g", "v", "id")
    val out = df.groupBy("g")
      .agg(graft.functions.TopKAggregator.topK(3, col("v"), col("id")).as("t"))
      .select(col("g"), col("t"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(out("a") === Seq((5.0, 2L), (1.0, 1L)))
    assert(out("b") === Seq((2.0, 3L)))
  }

  test("search is case-insensitive and null-safe") {
    val df = Seq((1, Some("Deluxe Widget")), (2, Some("gadget")),
      (3, None: Option[String])).toDF("id", "name")
    val hits = QueryService.search(df, "name", "wIdGeT")
      .select("id").as[Int].collect().toSeq
    assert(hits === Seq(1))
  }

  test("blockedFuzzyJoin links typo'd keys through either blocking pass, never beyond maxDist") {
    val clean = Seq((1L, "jonathan smith"), (2L, "maria garcia"),
      (3L, "wei chen")).toDF("cid", "cname")
    val dirty = Seq(
      (10L, "jonathan smyth"),  // 1 sub mid-string: prefix AND suffix agree
      (11L, "mariah garcia"),   // 1 insert: suffix pass catches it (prefix "mari" still agrees)
      (12L, "wei chan"),        // 1 sub: prefix agrees
      (13L, "completely other") // no fuzzy match
    ).toDF("did", "dname")
    val out = Joins.blockedFuzzyJoin(dirty, "did", "dname",
        clean, "cid", "cname", maxDist = 2)
      .select("did", "cid", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out === Set((10L, 1L, 1), (11L, 2L, 1), (12L, 3L, 1)))
    // blocking is part of the contract: a within-distance pair whose
    // edits disturb BOTH default passes (first-4 and last-4) is out of
    // scope — candidate generation never saw it.
    val c2 = Seq((1L, "abcdefgh")).toDF("cid", "cname")
    val d2 = Seq((20L, "xbcdefgx")).toDF("did", "dname") // 2 edits, both at the ends
    val miss = Joins.blockedFuzzyJoin(d2, "did", "dname",
      c2, "cid", "cname", maxDist = 2)
    assert(miss.count() === 0)
    // ...and a caller-supplied mid-string pass restores it
    val hit = Joins.blockedFuzzyJoin(d2, "did", "dname",
      c2, "cid", "cname", maxDist = 2,
      blockKeys = Seq(k => substring(k, 3, 4)))
    assert(hit.count() === 1)
  }

  test("zFlag marks only values outside the group's own sigma band") {
    val df = Seq((1L, 10.0), (1L, 10.0), (1L, 10.0), (1L, 10.0), (1L, 100.0),
      (2L, 999.0)) // singleton group: variance undefined, never flagged
      .toDF("k", "v")
    val out = graft.analytics.Anomaly.zFlag(df, "k", "v", sigma = 1.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.count(_._3) === 1)
    assert(out.find(_._3).get._2 === 100.0)
    assert(out.filter(_._1 == 2L).forall(!_._3))
  }

  test("mutualInformation: zero for independence, H(X) for determinism, null rows dropped") {
    import graft.analytics.Demographics
    // independent: every (x, y) combination equally frequent → MI 0
    val indep = (for { x <- Seq("a", "b"); y <- Seq(1, 2); _ <- 1 to 5 }
      yield (x, y)).toDF("x", "y")
    val mi0 = Demographics.mutualInformation(indep, "x", "y")
      .collect().head
    assert(mi0.getDouble(0) === 0.0 && mi0.getLong(1) === 20L)
    // y = f(x), uniform x over 4 values → MI = H(X) = 2 bits
    val det = (for { x <- 0 until 4; _ <- 1 to 3 } yield (s"k$x", x))
      .toDF("x", "y")
    val mi2 = Demographics.mutualInformation(det, "x", "y")
      .collect().head.getDouble(0)
    assert(mi2 === 2.0)
    // a null in either column drops the row from n
    val withNull = indep.unionByName(
      Seq((null.asInstanceOf[String], 1)).toDF("x", "y"))
    assert(Demographics.mutualInformation(withNull, "x", "y")
      .collect().head.getLong(1) === 20L)
  }

  test("KMV distinct: exact under the bound, ~1/sqrt(k) above it, duplicate/layout-invariant") {
    import graft.analytics.Sketches
    val small = (1 to 10).flatMap(v => Seq(("a", v), ("a", v))) // dups absorbed
      .toDF("g", "v")
    val s = Sketches.approxDistinctKmv(small, "g", "v", k = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s("a") === 10.0) // below the bound → exact
    val big = spark.range(5000).selectExpr("'b' AS g", "id * 7919 AS v")
    val est = Sketches.approxDistinctKmv(big.toDF("g", "v"), "g", "v", k = 256)
      .collect().head.getDouble(1)
    assert(math.abs(est / 5000.0 - 1.0) < 0.2, s"estimate $est off by >20%")
    // same estimate from any layout and with every row duplicated
    val est2 = Sketches.approxDistinctKmv(
        big.unionAll(big).repartition(13).toDF("g", "v"), "g", "v", k = 256)
      .collect().head.getDouble(1)
    assert(est2 === est)
  }

  test("ewma: hand-checked recursive fold, lookback bounds the memory, layout-invariant") {
    val df = Seq((1L, 1, 10.0), (1L, 2, 20.0), (1L, 3, 40.0), (2L, 1, 5.0))
      .toDF("k", "seq", "v")
    val out = graft.operators.TimeSeries
      .ewma(df, "k", Seq("seq"), "v", alpha = 0.5, lookback = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(out((1L, 1)) === 10.0)   // frame [10] → seed
    assert(out((1L, 2)) === 15.0)   // 10·½ + 20·½
    assert(out((1L, 3)) === 30.0)   // frame [20,40]: the 10 aged out
    assert(out((2L, 1)) === 5.0)    // keys independent
    val out2 = graft.operators.TimeSeries
      .ewma(df.repartition(7), "k", Seq("seq"), "v", alpha = 0.5, lookback = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(out2 === out)
  }

  test("ewma: a null value poisons exactly the windows that contain it") {
    // collect_list drops bare nulls — the struct wrap must carry them
    // through so the documented poison contract (and the oracle's
    // list()/list_reduce behavior) holds instead of silently
    // shrinking the frame and re-weighting every row.
    val df = Seq((1L, 1, Some(10.0)), (1L, 2, None: Option[Double]),
      (1L, 3, Some(40.0)), (1L, 4, Some(8.0)))
      .toDF("k", "seq", "v")
    val out = graft.operators.TimeSeries
      .ewma(df, "k", Seq("seq"), "v", alpha = 0.5, lookback = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        Option(r.get(3)).map(_.toString.toDouble)).toMap
    assert(out((1L, 1)) === Some(10.0))  // before the null: untouched
    assert(out((1L, 2)) === None)        // null value itself
    assert(out((1L, 3)) === None)        // frame [null, 40] → poisoned
    assert(out((1L, 4)) === Some(24.0))  // null aged out: 40·½ + 8·½
  }

  test("madFlag: zero-MAD groups flag only off-median values; robust to the outlier itself") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(1.0)), ("a", Some(1.0)), ("a", Some(1.0)),
      ("a", Some(100.0)),                       // mad 0: only this flags
      ("b", Some(1.0)), ("b", Some(2.0)), ("b", Some(3.0)), ("b", Some(4.0)),
      ("b", Some(100.0)),                       // mad 1: z = 65.4 flags
      ("b", None))                              // null: never flags
      .toDF("k", "v")
    val out = graft.analytics.Anomaly.madFlag(df, "k", "v", cutoff = 3.5)
      .collect().map(r => (r.getString(0), Option(r.get(1)).map(_.toString.toDouble)) ->
        (Option(r.get(2)).map(_.toString.toDouble), r.getBoolean(3))).toMap
    assert(out(("a", Some(100.0))) === ((None, true)))   // zero MAD, off median
    assert(out(("a", Some(1.0))) === ((None, false)))
    assert(out(("b", Some(100.0)))._2 === true)
    assert(math.abs(out(("b", Some(100.0)))._1.get - 0.6745 * 97) < 0.01)
    assert(out(("b", Some(1.0)))._2 === false)           // median can't be dragged
    assert(out(("b", None)) === ((None, false)))
  }

  test("madFlag retains rows with a NULL group key (null-safe stats joins)") {
    // groupBy keeps the null-key group; a plain equi-join would drop
    // every such row from the output — they must instead flag against
    // their OWN group's median/MAD, like any other group.
    val df = Seq(
      (Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 3.0),
      (None: Option[String], 1.0), (None: Option[String], 2.0),
      (None: Option[String], 3.0), (None: Option[String], 4.0),
      (None: Option[String], 100.0))  // null group's own outlier
      .toDF("k", "v")
    val flagged = graft.analytics.Anomaly.madFlag(df, "k", "v", cutoff = 3.5)
    // <=> keys still plan as hash joins — null-safety must not cost a
    // nested loop
    val p = flagged.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    val out = flagged
      .collect().map(r =>
        (Option(r.get(0)), r.getDouble(1)) -> r.getBoolean(3)).toMap
    assert(out.size === 8)                    // no row vanished
    assert(out((None, 100.0)) === true)       // flagged within the null group
    assert(out((None, 2.0)) === false)
    assert(out((Some("a"), 2.0)) === false)
  }

  test("momentsProfile: hand-checked moments, degenerate groups go null, nulls excluded") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)), ("a", Some(5.0)), ("a", None),  // null excluded from n
      ("b", Some(7.0)), ("b", Some(7.0)),               // zero variance
      ("c", Some(9.0)))                                 // n < 3
      .toDF("k", "v")
    val out = graft.analytics.Anomaly.momentsProfile(df, "k", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          Option(r.get(4)), Option(r.get(5)))).toMap
    // group a: mean 3, m2 = 2, m3 = 0, m4 = 6.8 → skew 0, kurt -1.3
    assert(out("a")._1 === 5L)
    assert(out("a")._2 === 3.0)
    assert(out("a")._3 === math.rint(math.sqrt(2.0) * 1e6) / 1e6)
    assert(out("a")._4 === Some(0.0))
    assert(out("a")._5 === Some(-1.3))
    assert(out("b") === ((2L, 7.0, 0.0, None, None)))   // zero variance
    assert(out("c") === ((1L, 9.0, 0.0, None, None)))   // n < 3
  }

  test("pageRank concentrates rank on the hub and conserves total mass") {
    // star: center x linked to a, b, c (symmetrized by the operator)
    val edges = Seq(("x", "a"), ("x", "b"), ("x", "c")).toDF("s", "d")
    val pr = graft.operators.Graph.pageRank(edges, "s", "d", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr.keySet === Set("x", "a", "b", "c"))
    assert(pr("a") === pr("b") && pr("b") === pr("c")) // symmetric leaves tie
    assert(pr("x") > pr("a") * 2)                      // hub dominates
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)       // mass conserved
    // layout invariance: identical ranks from a repartitioned edge list
    val pr2 = graft.operators.Graph.pageRank(edges.repartition(7), "s", "d", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr2 === pr)
  }

  test("personalizedPageRank: rank tracks seed proximity, frontier stays sparse, isolated seeds restart") {
    // path a-b-c-d-e, seed a: rank decays with distance; e is beyond
    // the 2-hop frontier of 2 iterations and must be ABSENT (sparsity)
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")).toDF("s", "d")
    val seedA = Seq("a").toDF("seed")
    val pr2 = graft.operators.Graph
      .personalizedPageRank(path, "s", "d", seedA, "seed", iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(!pr2.contains("e"))
    val pr3 = graft.operators.Graph
      .personalizedPageRank(path, "s", "d", seedA, "seed", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr3("b") > pr3("d"), s"proximity ordering violated: $pr3")
    // an isolated seed never joins the walk but keeps its restart mass
    val seeds2 = Seq("a", "z").toDF("seed")
    val prIso = graft.operators.Graph
      .personalizedPageRank(path, "s", "d", seeds2, "seed", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(prIso("z") === 0.075) // (1 − 0.85) / 2 seeds
    // layout invariance
    val pr3b = graft.operators.Graph
      .personalizedPageRank(path.repartition(7), "s", "d", seedA, "seed", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr3b === pr3)
  }

  test("triangleCounts: hand-checked counts, and junk edges don't distort them") {
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, every node in exactly 3;
    // a pendant path 4-5-6 adds no triangle; self-loop, duplicate,
    // reversed-duplicate, and null edges must all be inert.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L),
      (2L, 1L), (1L, 2L), (5L, 5L)).map { case (a, b) => (Option(a), Option(b)) }
    val df = (edges :+ ((None: Option[Long], Option(9L))))
      .toDF("src", "dst")
    val out = graft.operators.Graph.triangleCounts(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // layout invariance (pure integer arithmetic + orientation is a
    // function of the graph, not the partitioning)
    val out2 = graft.operators.Graph.triangleCounts(df.repartition(7), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 === out)
  }

  test("triangleCounts: degree-ordered orientation matches brute force on a random graph") {
    val rnd = new scala.util.Random(7)
    val es = (1 to 160).map(_ => (rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
    val df = es.toDF("a", "b")
    val got = graft.operators.Graph.triangleCounts(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side brute force over the canonical edge set
    val canon = es.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expect = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(x, y, z) <- nodes.combinations(3)
      if canon((x, y)) && canon((y, z)) && canon((x, z))
      n <- Seq(x, y, z)
    } expect(n) += 1
    assert(got === expect.toMap)
  }

  test("clusteringCoefficients: closed triangle scores 1, open wedge 0, pendant null") {
    // triangle {1,2,3} + pendant 4 off node 3; node 5-6-7 open path
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L)).toDF("src", "dst")
    val out = graft.operators.Graph.clusteringCoefficients(edges, "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.toString.toDouble))).toMap
    assert(out(1L) === ((2L, 1L, Some(1.0))))
    assert(out(2L) === ((2L, 1L, Some(1.0))))
    assert(out(3L) === ((3L, 1L, Some(0.333333))))  // 1 of 3 pairs, 6 dp
    assert(out(4L) === ((1L, 0L, None)))           // degree 1: undefined
    assert(out(6L) === ((2L, 0L, Some(0.0))))      // open wedge
  }

  test("lDiversify suppresses low-diversity groups k-anonymity would release") {
    val df = Seq(
      // group (A,1): size 3, sensitive uniform — k ok (k=3), l fails
      ("A", 1, 101L, "flu"), ("A", 1, 102L, "flu"), ("A", 1, 103L, "flu"),
      // group (B,2): size 3, 3 distinct sensitives — both pass
      ("B", 2, 201L, "flu"), ("B", 2, 202L, "cold"), ("B", 2, 203L, "cut"),
      // group (C,3): size 2 — k fails even though diverse
      ("C", 3, 301L, "flu"), ("C", 3, 302L, "cold"))
      .toDF("seg", "nat", "id", "diag")
    val out = graft.operators.Privacy
      .lDiversify(df, Seq("seg", "nat"), "diag", k = 3, l = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("seg"), r.getAs[String]("nat"), r.getAs[String]("diag")))
      .toMap
    assert(out(101L)._1 === "*" && out(101L)._2 === "*")  // homogeneous
    assert(out(101L)._3 === "flu")                        // payload intact
    assert(out(201L) === (("B", "2", "flu")))             // released
    assert(out(301L)._1 === "*")                          // too small
  }

  test("lDiversify retains rows with NULL quasi-identifiers (null-safe stats join)") {
    // groupBy keeps null groups but a plain equi-join never matches
    // them — the <=> join must keep these rows (suppressed or
    // released by the same k/l bars), matching kAnonymize's window
    // form instead of silently dropping them from the release.
    val df = Seq(
      (Some("A"), 101L, "flu"), (Some("A"), 102L, "cold"),
      (Some("A"), 103L, "cut"),
      (None: Option[String], 901L, "flu"),
      (None: Option[String], 902L, "cold"),
      (None: Option[String], 903L, "cut"),
      (None: Option[String], 904L, "flu"))
      .toDF("seg", "id", "diag")
    val out = graft.operators.Privacy
      .lDiversify(df, Seq("seg"), "diag", k = 3, l = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("seg"), r.getAs[String]("diag"))).toMap
    assert(out.size === 7)                     // no row vanished
    assert(out(101L) === (("A", "flu")))       // released
    // the NULL group (size 4, 3 distinct sensitives) passes both bars:
    // its QI value stays as-is (null, cast to string stays null)
    assert(out(901L)._1 === null && out(901L)._2 === "flu")
    // and under a stricter bar the null group suppresses, not drops
    val strict = graft.operators.Privacy
      .lDiversify(df, Seq("seg"), "diag", k = 5, l = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("seg")).toMap
    assert(strict.size === 7)
    assert(strict(901L) === "*")
  }

  test("gapFillDaily densifies each key's own span and carries values forward") {
    import java.sql.Date
    val df = Seq(
      (1L, Date.valueOf("2024-01-01"), Some(10.0)),
      (1L, Date.valueOf("2024-01-04"), Some(7.0)),
      (2L, Date.valueOf("2024-02-10"), Some(3.0)))
      .toDF("k", "d", "v")
    val out = graft.operators.TimeSeries.gapFillDaily(df, "k", "d", "v")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (Option(r.get(3)).map(_.toString.toDouble), r.getBoolean(4))).toMap
    assert(out.size === 5) // 4 days for key 1, 1 day for key 2 — no cross-key spine
    assert(out((1L, "2024-01-02")) === ((Some(10.0), false))) // gap forward-filled
    assert(out((1L, "2024-01-03")) === ((Some(10.0), false)))
    assert(out((1L, "2024-01-04")) === ((Some(7.0), true)))   // new observation wins
    assert(out((2L, "2024-02-10")) === ((Some(3.0), true)))
  }

  test("funnel requires step order; cohorts bucket by first-event week") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1 completes in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2 clicks BEFORE first view — click must not count
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 11:00:00"), "view"),
      // user 3 views only
      (3L, ts("2024-01-02 08:00:00"), "view"),
      // user 3 active again 8 days later (week offset 1)
      (3L, ts("2024-01-10 08:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val f = graft.analytics.Behavior.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // step 2 = users 1 and 3 (user 3's day-10 click is after their
    // first view); user 2's pre-view click does NOT progress
    assert(f === Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
    val c = graft.analytics.Behavior.retentionCohorts(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    // all three users first appear in the week of 2024-01-01 (Monday);
    // user 3's second week of activity shows as offset 1
    assert(c === Map(("2024-01-01", 0) -> 3L, ("2024-01-01", 1) -> 1L))
  }

  test("registerAll exposes the full SQL surface over temp views") {
    graft.core.Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT n_name, COUNT(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = graft.core.Tables.customer(spark, sfDir)
      .join(graft.core.Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("n_name")).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql === viaDf)
    // events view carries the nanos→micros fix
    assert(spark.sql("SELECT MAX(ts) FROM events").collect()
      .head.getTimestamp(0) != null)
  }

  test("kAnonymize suppresses rare QI combos and the release is k-anonymous") {
    import graft.operators.Privacy
    val df = (
      (1L to 5L).map(i => (i, "A", 1)) ++
      Seq((6L, "B", 2), (7L, "B", 2)) ++
      Seq((8L, "C", 3))).toDF("id", "seg", "nat")
    val out = Privacy.kAnonymize(df, Seq("seg", "nat"), k = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // the size-5 group survives with stringified values
    assert(out(1L) === (("A", "1")))
    // both rare groups collapse to the sentinel
    assert(Seq(6L, 7L, 8L).forall(i => out(i) === (("*", "*"))))
    // audit: released table is 3-anonymous (suppressed rows merged)
    val rep = Privacy.kAnonymityReport(
        Privacy.kAnonymize(df, Seq("seg", "nat"), k = 3), Seq("seg", "nat"))
      .collect().head
    assert(rep.getLong(0) === 3L && rep.getLong(1) === 2L)
  }

  test("weightedSample is deterministic, layout-invariant, and favors heavy weights") {
    val df = (1L to 200L).map(i => (i, if (i == 7L) 1e9 else 1.0)).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", col("w"), k = 10)
      .select("id").as[Long].collect().toSeq
    val b = Sampling.weightedSample(df.repartition(13), "id", col("w"), k = 10)
      .select("id").as[Long].collect().toSeq
    assert(a === b) // pure function of (key, weight, salt) — layout never matters
    assert(a.head === 7L) // −ln(u)/1e9 is far below every unit-weight key
    // a different salt re-draws the uniforms → a different unit-weight tail
    val c = Sampling.weightedSample(df, "id", col("w"), k = 10, salt = "other")
      .select("id").as[Long].collect().toSeq
    assert(c.head === 7L)
    assert(a.tail != c.tail)
    // non-positive weights can never win (and don't shrink k for the rest)
    val few = df.withColumn("w", when(col("id") > 5, lit(0.0)).otherwise(col("w")))
    val d = Sampling.weightedSample(few, "id", col("w"), k = 10)
      .select("id").as[Long].collect().toSeq
    assert(d.toSet === (1L to 5L).toSet)
  }

  test("searchAny matches across columns with null-safe OR") {
    val df = Seq(
      (1, Some("ACME WIDGETS"), None: Option[String]),
      (2, Some("OTHER CO"), Some("Widget Jones")),
      (3, None: Option[String], None: Option[String]),
      (4, Some("PLAIN"), Some("SMITH"))).toDF("id", "legal", "owner")
    val hits = QueryService.searchAny(df, Seq("legal", "owner"), "widget")
      .select("id").as[Int].collect().toSeq.sorted
    assert(hits === Seq(1, 2))
  }

  test("intervalJoin equals the nested-loop BETWEEN join at any bin width") {
    val points = (0L to 200L).map(p => (s"p$p", p)).toDF("pid", "t")
    val ivs = Seq(("a", 0L, 10L), ("b", 5L, 5L), ("c", 7L, 60L),
      ("d", 199L, 210L), ("e", 50L, 40L), // empty: end < start
      ("f", 30L, 30L)).toDF("iid", "s", "e")
    val naive = points.join(ivs, col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").as[(String, String)].collect().toSet
    for (w <- Seq(1L, 7L, 30L, 1000L)) {
      val got = Joins.intervalJoin(points, "t", ivs, "s", "e", binWidth = w)
        .select("pid", "iid").as[(String, String)].collect().toSet
      assert(got === naive, s"binWidth=$w")
    }
    // boundary inclusivity: exactly t=5 ∈ [5,5]; e<s matches nothing
    assert(naive.contains(("p5", "b")) && !naive.contains(("p4", "b")))
    assert(!naive.exists(_._2 == "e"))
    // nulls drop like SQL three-valued BETWEEN
    val nullIv = Seq(("g", Some(1L), None: Option[Long])).toDF("iid", "s", "e")
    assert(Joins.intervalJoin(points, "t", nullIv, "s", "e", 10).count() === 0)
  }

  test("heavyHitters: exact regime (distinct <= counters) equals the exact top-N") {
    import graft.analytics.HeavyHitters
    val df = (1 to 400).map(i => s"k${i % 23}").toDF("key")
    val expected = df.groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("key")).limit(5)
      .as[(String, Long)].collect().toSeq
    val got = HeavyHitters.topHeavy(df, "key", counters = 64, topN = 5)
      .as[(String, Long)].collect().toSeq
    assert(got === expected)
  }

  test("heavyHitters: planted heavies survive a sketch far smaller than the key space") {
    import graft.analytics.HeavyHitters
    // 3 heavy keys (600 rows each) over a 5000-key uniform tail
    // (1 row each): total 6800, threshold total/(k+1) = 6800/65 ≈ 105
    // — the heavies clear it by 5×, the tail never can.
    val heavy = Seq("alpha", "beta", "gamma").flatMap(k => Seq.fill(600)(k))
    val tail = (1 to 5000).map(i => s"t$i")
    val df = (heavy ++ tail).toDF("key")
    for (layout <- Seq(df, df.repartition(17), df.orderBy(desc("key")))) {
      val got = HeavyHitters.topHeavy(layout, "key", counters = 64, topN = 3)
        .as[(String, Long)].collect().toSeq
      assert(got === Seq(("alpha", 600L), ("beta", 600L), ("gamma", 600L)))
    }
  }

  test("labelPropagation: hand-checked synchronous iterations on a path graph") {
    import graft.operators.Graph
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    // iter 1 (labels = own id): 1←{2}→2, 2←{1,3} tie→1, 3←{2}→2
    val l1 = Graph.labelPropagation(edges, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(l1 === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    // iter 2: 1 sees label(2)=1 → 1; 2 sees {label(1)=2, label(3)=2} → 2;
    // 3 sees label(2)=1 → 1
    val l2 = Graph.labelPropagation(edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(l2 === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    // disconnected components never share labels
    val two = Seq((1L, 2L), (10L, 11L)).toDF("src", "dst")
    val lt = Graph.labelPropagation(two, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(Set(lt(1L), lt(2L)).intersect(Set(lt(10L), lt(11L))).isEmpty)
  }

  test("winsorize clips to each group's own percentile band") {
    // g1: 1..10 → p10/p90 interpolated bounds 1.9 / 9.1; g2 untouched
    val df = ((1 to 10).map(i => ("g1", i.toDouble)) ++
      Seq(("g2", 100.0), ("g2", 200.0))).toDF("grp", "v")
    val out = graft.analytics.Anomaly.winsorize(df, "grp", "v", 0.10, 0.90)
      .select("grp", "v", "v_winsor", "was_clipped")
      .as[(String, Double, Double, Boolean)].collect().toSet
    assert(out.contains(("g1", 1.0, 1.9, true)))
    assert(out.contains(("g1", 10.0, 9.1, true)))
    assert(out.contains(("g1", 5.0, 5.0, false)))
    // g2's band comes from g2 only: 100 clips to its own p10 = 110
    assert(out.contains(("g2", 100.0, 110.0, true)))
  }

  test("distinctCounts: exact and HLL approx behind the same call site") {
    val df = spark.range(10000)
      .select((col("id") % 1234).as("a"), (col("id") % 7).as("b"))
    val ex = graft.analytics.Demographics.distinctCounts(
      df, Seq("a" -> "na", "b" -> "nb")).collect().head
    assert(ex.getAs[Long]("na") === 1234L)
    assert(ex.getAs[Long]("nb") === 7L)
    assert(ex.getAs[Long]("n_rows") === 10000L)

    // approx mode: same shape/aliases, HLL error within a generous
    // multiple of the requested rsd (2% → assert within 10%)
    val approx = graft.analytics.Demographics.distinctCounts(
      df, Seq("a" -> "na", "b" -> "nb"), exact = false, rsd = 0.02)
    val ap = approx.collect().head
    assert(approx.columns.toSeq === Seq("na", "nb", "n_rows"))
    assert(math.abs(ap.getAs[Long]("na") - 1234.0) / 1234.0 < 0.1)
    assert(math.abs(ap.getAs[Long]("nb") - 7.0) <= 1.0)

    // the scale rationale, pinned in the plan: multi-column EXACT
    // distinct needs an Expand (input duplicated per distinct agg);
    // the HLL form is one pass with no Expand
    val exactPlan = graft.analytics.Demographics.distinctCounts(
      df, Seq("a" -> "na", "b" -> "nb")).queryExecution.executedPlan.toString
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
    assert(!approxPlan.contains("Expand"))
  }

  test("imputeByGroupMean fills from the group's own mean; empty groups stay null") {
    val df = Seq(
      (Some("g1"), Some(10.0)), (Some("g1"), Some(20.0)), (Some("g1"), None),
      (Some("g2"), Some(5.0)), (Some("g3"), None),
      // NULL group key is its own group: the null-safe means join must
      // fill from ITS mean, not strand the row unimputed
      (None, Some(8.0)), (None, None))
      .map { case (g, v) => (g.orNull, v) }.toDF("grp", "v")
    val out = graft.ingest.Ingestion.imputeByGroupMean(df, "grp", "v")
      .select("grp", "v_imputed", "was_imputed")
      .as[(Option[String], Option[Double], Boolean)].collect().toSet
    assert(out === Set(
      (Some("g1"), Some(10.0), false), (Some("g1"), Some(20.0), false),
      (Some("g1"), Some(15.0), true),     // g1's own mean, not global
      (Some("g2"), Some(5.0), false),
      (Some("g3"), None, false),          // no observed value → stays null
      (None, Some(8.0), false),
      (None, Some(8.0), true)))           // NULL-key group's own mean
  }

  test("rollingDistinct counts trailing-window ids for observed days only") {
    import java.sql.Timestamp
    def t(d: String) = Timestamp.valueOf(s"$d 12:00:00")
    // days 1,2,5 observed; window 3: day1={a,b}, day2={a,b,c},
    // day5=day5-only {a} (days 3,4 fall out and are unobserved)
    val ev = Seq(
      (t("2024-01-01"), "a"), (t("2024-01-01"), "b"),
      (t("2024-01-02"), "c"), (t("2024-01-02"), "a"),
      (t("2024-01-05"), "a")).toDF("ts", "uid")
    val out = graft.operators.TimeSeries.rollingDistinct(ev, "ts", "uid", 3)
      .orderBy("ts_window_end")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toSeq
    assert(out === Seq("2024-01-01" -> 2L, "2024-01-02" -> 3L,
      "2024-01-05" -> 1L))
  }

  test("hotColdJoin equals the plain join under extreme key skew") {
    // one key holds 90% of the fact; dim has extra keys with no fact rows
    val fact = ((1 to 900).map(i => (i.toLong, "hot")) ++
      (901 to 1000).map(i => (i.toLong, s"k${i % 37}"))).toDF("row_id", "k")
    val dim = (Seq("hot") ++ (0 until 37).map(i => s"k$i") ++ Seq("orphan"))
      .zipWithIndex.map { case (k, i) => (k, i * 10) }.toDF("k", "attr")
    val plain = fact.join(dim, Seq("k"))
      .select("row_id", "attr").as[(Long, Int)].collect().sorted.toSeq
    val split = graft.operators.Skew.hotColdJoin(fact, dim, "k", hotCounters = 8)
      .select("row_id", "attr").as[(Long, Int)].collect().sorted.toSeq
    assert(split === plain)
  }

  test("sampleWithTemperature upweights tail sources and is layout-stable") {
    // head: 900 tokens over 90 docs; tail: 100 tokens over 10 docs
    val df = ((1 to 90).map(i => (i.toLong, "head", 10L)) ++
      (101 to 110).map(i => (i.toLong, "tail", 10L))).toDF("id", "src", "n_tok")
    val out = Sampling.sampleWithTemperature(df, "src", "id", "n_tok",
      totalTokens = 500L, alpha = 0.5)
    val fr = out.select("src", "mix_frac").distinct()
      .as[(String, Double)].collect().toMap
    // α=0.5: weights √900=30 / √100=10 → shares 0.75/0.25 →
    // frac_head = 500·0.75/900 ≈ 0.4167, frac_tail = 500·0.25/100 → capped 1
    assert(math.abs(fr("head") - 0.416666667) < 1e-6)
    assert(fr("tail") === 1.0)
    assert(out.filter($"src" === "tail").count() === 10) // tail kept whole
    // proportional (α=1) would keep frac_head = frac_tail = 0.5: the
    // temperature genuinely moved share toward the tail
    val prop = Sampling.sampleWithTemperature(df, "src", "id", "n_tok",
        totalTokens = 500L, alpha = 1.0)
      .select("src", "mix_frac").distinct().as[(String, Double)].collect().toMap
    assert(math.abs(prop("head") - 0.5) < 1e-6 && math.abs(prop("tail") - 0.5) < 1e-6)
    // membership is a pure function of the key — any layout agrees
    val again = Sampling.sampleWithTemperature(df.repartition(9).orderBy(desc("id")),
      "src", "id", "n_tok", 500L, 0.5)
    assert(again.select("id").as[Long].collect().toSet ===
      out.select("id").as[Long].collect().toSet)
  }

  test("stratifiedExactN: exactly n per stratum, layout-stable, small strata whole") {
    val df = ((1 to 40).map(i => (i.toLong, "big")) ++
      (101 to 103).map(i => (i.toLong, "tiny"))).toDF("id", "grp")
    val a = Sampling.stratifiedExactN(df, "grp", "id", n = 6, salt = "x")
      .as[(Long, String)].collect().toSet
    assert(a.count(_._2 == "big") === 6)
    assert(a.count(_._2 == "tiny") === 3) // stratum smaller than n → whole
    // pure function of (salt, key): any layout gives the same sample
    val b = Sampling.stratifiedExactN(df.repartition(13).orderBy(desc("id")),
      "grp", "id", n = 6, salt = "x").as[(Long, String)].collect().toSet
    assert(b === a)
    // a different salt draws a different big-stratum sample
    val c = Sampling.stratifiedExactN(df, "grp", "id", n = 6, salt = "y")
      .as[(Long, String)].collect().toSet
    assert(c !== a)
  }

  test("topHeavyPerGroup ranks each group's keys independently and exactly") {
    import graft.analytics.HeavyHitters
    val df = (Seq.fill(9)(("g1", "a")) ++ Seq.fill(5)(("g1", "b")) ++
      Seq.fill(2)(("g1", "c")) ++ Seq.fill(7)(("g2", "b")) ++
      Seq.fill(7)(("g2", "z")) ++ Seq.fill(1)(("g2", "a")))
      .toDF("grp", "key")
    val got = HeavyHitters.topHeavyPerGroup(df, "grp", "key",
        counters = 16, topN = 2)
      .orderBy("grp", "rank")
      .as[(String, String, Long, Int)].collect().toSeq
    assert(got === Seq(
      ("g1", "a", 9L, 1), ("g1", "b", 5L, 2),
      ("g2", "b", 7L, 1), ("g2", "z", 7L, 2))) // tie → key order
  }

  test("heavyHitters: nulls are excluded, non-string keys count by string form") {
    import graft.analytics.HeavyHitters
    val df = Seq(Some(7L), Some(7L), Some(7L), Some(8L), Some(8L), None, None, None, None)
      .toDF("key")
    val got = HeavyHitters.topHeavy(df, "key", counters = 8, topN = 2)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("7", 3L), ("8", 2L)))
  }
}

package graft

import graft.analytics.{Anomaly, Demographics}
import graft.ingest.Ingestion
import graft.operators.{AsOf, Privacy}
import graft.serve.QueryService
import org.apache.spark.sql.functions._

/** Raw-header robustness: operators that take COLUMN NAMES must accept
  * names containing dots — Spark's `col("a.b")` / `groupBy("a.b")`
  * dot-split into a bogus nested-field path unless the name is
  * backtick-quoted at the reference site. This repo's ingest contract
  * is raw CSV headers (spaces already occur: "Account Number"), and
  * real-world CSV headers carry dots, so every name-taking helper
  * quotes defensively (the round-13 imputeByGroupMean advisory,
  * generalized). Each test would throw UNRESOLVED_COLUMN without the
  * quoting — asserting results, not just survival.
  *
  * CONTRACT BOUNDARY: the quoting guarantee covers the tiers that
  * face raw external headers — `analytics`, `ingest`, `serve` (incl.
  * the pagination sort keys), `operators.Privacy`, `operators.AsOf`
  * (keys, timestamps, and payloads). The corpus-facing
  * tiers (`textops`, `stream`, `multimodal`) take their column names
  * from the documents/embeddings schemas, which are identifier-safe
  * by construction; their operators require identifier-safe names
  * (rename dotted columns before calling) rather than carrying 179
  * defensive-quoting sites through SQL-fragment internals.
  */
class DottedColumnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
    ("b", Some(5.0)), ("b", Some(5.0)))
    .toDF("k.g", "v.x")

  test("the shared bq helper escapes an embedded backtick (and Cols.bqSql doubles it)") {
    // the inline expr(s"`$c`") copies this helper replaced could not
    // survive a backtick INSIDE a name; the shared helper doubles it
    // per the Spark identifier-escape rule
    assert(graft.functions.Cols.bqSql("a`b") === "`a``b`")
    val weird = Seq(("x", 1.0), ("x", 3.0), ("y", 5.0)).toDF("k`g", "v")
    val freq = Demographics.frequencyTable(weird, "k`g")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(freq === Seq(("x", 2L), ("y", 1L)))
  }

  test("frequencyTable / topK group and tie-break on a dotted column") {
    val freq = Demographics.frequencyTable(df, "k.g")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(freq === Seq(("a", 3L), ("b", 2L)))
    assert(Demographics.topK(df, "k.g", 1).collect().head.getString(0) === "a")
  }

  test("groupSizeHistogram / distinctCounts / diversity indices on dotted columns") {
    val h = Demographics.groupSizeHistogram(df, "k.g").collect().head
    assert(h.getAs[Long]("n_groups") === 2L)
    val d = Demographics.distinctCounts(df,
      Seq("k.g" -> "nk", "v.x" -> "nv")).collect().head
    assert(d.getAs[Long]("nk") === 2L && d.getAs[Long]("nv") === 3L)
    val ent = Demographics.shannonEntropy(df, "k.g")
      .select("entropy").as[Double].head()
    assert(ent > 0.9 && ent < 1.0) // H(3/5, 2/5) ≈ 0.971
    val gini = Demographics.giniSimpson(df, "k.g")
      .select("gini_simpson").as[Double].head()
    assert(gini > 0.4 && gini < 0.5) // 1 − (9+4)/25 = 0.48
    val len = Demographics.lengthStats(df, "k.g").collect().head
    assert(len.getAs[Long]("n") === 5L)
  }

  test("imputeByGroupMean fills through dotted group and value columns") {
    val out = Ingestion.imputeByGroupMean(df, "k.g", "v.x")
    val filled = out.where(col("`v.x`").isNull)
      .select(col("`v.x_imputed`")).as[Double].collect()
    assert(filled.toSeq === Seq(2.0)) // mean of group a's (1, 3)
  }

  test("madFlag and winsorize run their percentile SQL on dotted columns") {
    val flags = Anomaly.madFlag(df, "k.g", "v.x", cutoff = 3.5)
    assert(flags.where(col("is_outlier")).count() === 0L)
    val w = Anomaly.winsorize(df, "k.g", "v.x", loPct = 0.25, hiPct = 0.75)
    assert(w.columns.contains("v.x_winsor"))
    assert(w.where(col("was_clipped")).count() >= 1L)
  }

  test("zFlag and momentsProfile aggregate dotted key/value columns") {
    val z = Anomaly.zFlag(df, "k.g", "v.x", sigma = 2.0)
    assert(z.count() === 5L && z.columns.contains("is_outlier"))
    val m = Anomaly.momentsProfile(df, "k.g", "v.x").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("a" -> 2L, "b" -> 2L)) // nulls excluded from n
  }

  test("groupCollect first/list projections accept dotted columns") {
    val g = QueryService.groupCollect(df, "k.g", Seq("v.x"), Seq("v.x"))
    assert(g.count() === 2L)
    assert(g.columns.toSeq === Seq("k.g", "v.x", "v.x_list"))
  }

  test("paginate / paginateWithMeta / paginateAfter order by a dotted sort key") {
    // functions.asc(name) builds Column(name), which dot-splits — these
    // three would throw UNRESOLVED_COLUMN without bq at the orderBy site
    // (the round-14 serve-tier advisory)
    val t = Seq(("c", 3), ("a", 1), ("b", 2)).toDF("s.key", "v")
    val p = QueryService.paginate(t, Seq("s.key"), offset = 1, limit = 1)
    assert(p.select(col("`s.key`")).as[String].collect().toSeq === Seq("b"))
    val pm = QueryService.paginateWithMeta(t, Seq("s.key"), offset = 0, limit = 2)
      .collect()
    assert(pm.map(_.getAs[String]("s.key")).toSeq === Seq("a", "b"))
    assert(pm.head.getAs[Long]("total_count") === 3L)
    assert(pm.head.getAs[Boolean]("has_more"))
    val pa = QueryService.paginateAfter(t, "s.key", Some(lit("a")), limit = 2)
    assert(pa.select(col("`s.key`")).as[String].collect().toSeq === Seq("b", "c"))
  }

  test("asofJoin carries dotted keys, timestamps, and payload columns") {
    // struct(payloadCols.map(col)) dot-split the payload name before the
    // quoted _r extraction was ever reached (round-14 advisory); now every
    // caller-supplied name in AsOf goes through bq
    val l = Seq(("k1", 10L, "e1"), ("k1", 20L, "e2"), ("k2", 5L, "e3"))
      .toDF("k.id", "l.ts", "ev.name")
    val r = Seq(("k1", 10L, 1.0), ("k1", 15L, 2.0), ("k2", 99L, 9.0))
      .toDF("k.id", "r.ts", "p.val")
    val out = AsOf.asofJoin(l, r, Seq("k.id"), "l.ts", "r.ts", Seq("p.val"))
    assert(out.columns.toSeq === Seq("k.id", "l.ts", "ev.name", "p.val"))
    val m = out.collect().map(row => row.getAs[String]("ev.name") ->
      Option(row.getAs[Any]("p.val"))).toMap
    assert(m === Map("e1" -> Some(1.0), "e2" -> Some(2.0), "e3" -> None))
    val fwd = AsOf.asofJoinForward(l, r, Seq("k.id"), "l.ts", "r.ts", Seq("p.val"))
    val fm = fwd.collect().map(row => row.getAs[String]("ev.name") ->
      Option(row.getAs[Any]("p.val"))).toMap
    assert(fm === Map("e1" -> Some(1.0), "e2" -> None, "e3" -> Some(9.0)))
  }

  test("topHeavy / topHeavyPerGroup sketch and verify over dotted key columns") {
    val t = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "z"), ("g2", "z"), ("g2", "z")).toDF("grp.id", "tok.v")
    val top = graft.analytics.HeavyHitters.topHeavy(t, "tok.v",
        counters = 8, topN = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top === Seq(("z", 3L)))
    val per = graft.analytics.HeavyHitters.topHeavyPerGroup(t, "grp.id",
        "tok.v", counters = 8, topN = 1)
      .collect().map(r => (r.getAs[String]("grp.id"), r.getAs[String]("key"),
        r.getAs[Long]("cnt"))).sorted.toSeq
    assert(per === Seq(("g1", "x", 2L), ("g2", "z", 3L)))
  }

  test("kAnonymize / lDiversify suppress on dotted quasi-identifiers") {
    val t = Seq(("x", "s1", 1), ("x", "s2", 2), ("x", "s3", 3),
      ("y", "s1", 4)).toDF("q.i", "sens.v", "row.id")
    val ka = Privacy.kAnonymize(t, Seq("q.i"), k = 3)
      .select(col("`q.i`")).as[String].collect().sorted
    assert(ka.toSeq === Seq("*", "x", "x", "x"))
    val ld = Privacy.lDiversify(t, Seq("q.i"), "sens.v", k = 3, l = 3)
      .select(col("`q.i`")).as[String].collect().sorted
    assert(ld.toSeq === Seq("*", "x", "x", "x"))
  }
}

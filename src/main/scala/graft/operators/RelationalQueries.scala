package graft.operators

import graft.core.{QueryPack, Tables}
import graft.serve.QueryService
import org.apache.spark.sql.functions._

/** Driver-checkable queries for projections/filters (SURVEY §2.2), sorts/
  * pagination (§2.6), set ops (§2.7), and scalar functions (§2.8).
  */
object RelationalQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // P1/F1: string normalization — trim+upper, ''→null. All codegen'd
    // built-ins; pushes the projection into the scan (only 2 columns read).
    "q_p1_normalize" -> ((s, dir) => {
      val norm = upper(trim(col("c_name")))
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          when(norm === "", lit(null)).otherwise(norm).as("name_norm"))
        .orderBy("c_custkey")
    }),

    // P2/F6: null-skipping concatenation with all-null→null preservation
    // (concat_ws alone yields "" for all-null; the reference yields null).
    "q_p2_concat" -> ((s, dir) => {
      val parts = Seq(col("c_mktsegment"), col("c_name"))
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          when(coalesce(parts: _*).isNull, lit(null))
            .otherwise(concat_ws(" ", parts: _*)).as("full_label"))
        .orderBy("c_custkey")
    }),

    // P4: point lookup by key (smallest existing orderkey for stability
    // across scale factors). The key comes from a 1-row scalar relation
    // joined lazily (no driver `.first()` before planning); the
    // user-facing literal-key form — which pushes EqualTo into the scan —
    // is `QueryService.pointLookup`, plan-asserted in PlanSpec.
    "q_p4_point_lookup" -> ((s, dir) => {
      val minKey = Tables.orders(s, dir).agg(min(col("o_orderkey")).as("_k"))
      Joins.withScalar(Tables.lineitem(s, dir), minKey)
        .filter(col("l_orderkey") === col("_k"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_linenumber")
    }),

    // P6: case-insensitive substring search (API search semantics).
    "q_p6_search" -> ((s, dir) =>
      QueryService.search(Tables.part(s, dir), "p_name", "WidGet")
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    // P8/F7/F8/F2: LIKE-based categorization + length buckets.
    "q_p8_like_buckets" -> ((s, dir) => {
      Tables.part(s, dir)
        .withColumn("kind",
          when(col("p_type").like("%BRASS%"), "Brass")
            .when(col("p_type").like("%STEEL%"), "Steel")
            .when(col("p_type").like("%COPPER%"), "Copper")
            .otherwise("Other"))
        .withColumn("name_size",
          when(length(col("p_name")) < 12, "Short")
            .when(length(col("p_name")) < 18, "Medium")
            .otherwise("Long"))
        .groupBy("kind", "name_size")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("kind", "name_size")
    }),

    // P9: keyword categorization via chained when (role-category shape).
    "q_p9_keyword_cat" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("category",
          when(lower(col("event_type")).rlike("purchase|signup"), "Conversion")
            .when(lower(col("event_type")).rlike("error"), "Failure")
            .otherwise("Engagement"))
        .groupBy("category")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("category")
    }),

    // O2: argmax (orderBy desc + limit 1 = TakeOrderedAndProject).
    "q_o2_top1" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("o_orderpriority")).limit(1)),

    // O4: offset/limit pagination with explicit total order.
    "q_o4_pagination" -> ((s, dir) =>
      QueryService.paginate(
          Tables.customer(s, dir).select("c_custkey", "c_name"),
          Seq("c_custkey"), offset = 100, limit = 20)),

    // O4+P6 composite: the API's filtered pagination endpoint
    // (`api/main.py:210-253`) — search then page the results.
    "q_o4_filtered_page" -> ((s, dir) =>
      QueryService.paginate(
        QueryService.search(Tables.part(s, dir), "p_name", "widget")
          .select("p_partkey", "p_name"),
        Seq("p_partkey"), offset = 20, limit = 10)),

    // O4 scale path: keyset (seek) pagination — filter + TakeOrdered,
    // no global window; page cost independent of depth.
    "q_o4_keyset" -> ((s, dir) =>
      QueryService.paginateAfter(
        Tables.customer(s, dir).select("c_custkey", "c_name"),
        "c_custkey", Some(lit(120L)), limit = 20)),

    // D1: SELECT DISTINCT projection.
    "q_d1_distinct" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select("c_nationkey", "c_mktsegment").distinct()
        .orderBy("c_nationkey", "c_mktsegment")),

    // D2/A7: whole-row duplicate count (count − distinct count).
    "q_d2_dup_count" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val n = li.agg(count(lit(1)).as("n"))
      val d = li.distinct().agg(count(lit(1)).as("n_distinct"))
      Joins.withScalar(n, d)
        .select(col("n"), col("n_distinct"), (col("n") - col("n_distinct")).as("n_dups"))
    }),

    // D3: COUNT(DISTINCT CONCAT(...)) composite key.
    "q_d3_distinct_concat" -> ((s, dir) =>
      Tables.lineitem(s, dir).agg(
        countDistinct(concat_ws("-", col("l_orderkey"), col("l_linenumber")))
          .as("n_lines"))),

    // F12/F13: date-part extraction incl. day/month names. Spark
    // dayofweek is 1=Sunday (Postgres-style); oracle shifts DuckDB's 0.
    "q_f12_date_parts" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofweek(col("o_orderdate")).as("dow"),
          date_format(col("o_orderdate"), "EEEE").as("day_name"),
          date_format(col("o_orderdate"), "MMMM").as("month_name"))
        .groupBy("y", "q", "m", "dow", "day_name", "month_name")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("y", "q", "m", "dow")
    }),

    // F15/F16: interval arithmetic + epoch-seconds difference: events in
    // the trailing 24h window before the stream's max timestamp.
    "q_f15_interval_window" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val maxTs = ev.agg(max(col("ts")).as("max_ts"))
      Joins.withScalar(ev, maxTs)
        .filter(col("ts") > col("max_ts") - expr("INTERVAL 24 HOURS"))
        .agg(count(lit(1)).as("n_last_day"),
          sum(floor(unix_timestamp(col("max_ts")) - unix_timestamp(col("ts"))))
            .as("total_age_s"))
    }),

    // F17: date-series generation (replaces the reference's PL/pgSQL
    // dim_date loop with sequence+explode — no driver-side iteration).
    "q_f17_date_series" -> ((s, dir) => {
      s.range(1).select(explode(expr(
          "sequence(to_date('2024-01-01'), to_date('2024-03-31'), interval 1 day)"))
          .as("date_id"))
        .select(col("date_id"),
          year(col("date_id")).as("y"), month(col("date_id")).as("m"),
          dayofmonth(col("date_id")).as("d"),
          (dayofweek(col("date_id")).isin(1, 7)).as("is_weekend"))
        .orderBy("date_id")
    }),

    // F18: timestamp formatting for partition ids (strftime shape).
    "q_f18_ts_format" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(date_format(col("ts"), "yyyyMMdd_HH").as("partition_id"))
        .groupBy("partition_id").agg(count(lit(1)).as("cnt"))
        .orderBy("partition_id")),

    // F20: row→JSON projection (raw_data preservation shape). Struct
    // fields chosen to serialize identically in both engines.
    "q_f20_to_json" -> ((s, dir) =>
      Tables.nation(s, dir)
        .select(col("n_nationkey"),
          to_json(struct(col("n_name").as("name"), col("n_regionkey").as("rk")))
            .as("raw_data"))
        .orderBy("n_nationkey")),

    // F20 inverse: parse the semi-structured props payload (from_json
    // with a declared schema) and aggregate on the extracted field.
    "q_f20_from_json" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("k",
          from_json(col("props"), lit("k BIGINT")).getField("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("k_mod")),

    // D4: set operations (engine extension beyond the reference, which
    // has none): EXCEPT/INTERSECT with set (dedup) semantics — customers
    // with vs without orders, by key.
    "q_d4_setops" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_custkey"))
      val o = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey"))
      val without = c.except(o).agg(count(lit(1)).as("n_without_orders"))
      val withO = c.intersect(o).agg(count(lit(1)).as("n_with_orders"))
      Joins.withScalar(without, withO)
    }),

    // D5: multiset (ALL) set operations — EXCEPT ALL / INTERSECT ALL
    // respect multiplicities (bag difference / min-multiplicity),
    // which the set forms above collapse: part keys shipped under
    // F-status vs O-status orders.
    "q_d5_setops_all" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), expr("l_orderkey = o_orderkey"))
      val f = li.filter(col("o_orderstatus") === "F").select(col("l_partkey"))
      val o = li.filter(col("o_orderstatus") === "O").select(col("l_partkey"))
      val exceptAll = f.exceptAll(o)
        .agg(count(lit(1)).as("n_except_all"),
          countDistinct(col("l_partkey")).as("n_except_keys"))
      val interAll = f.intersectAll(o)
        .agg(count(lit(1)).as("n_intersect_all"))
      Joins.withScalar(exceptAll, interAll)
    }),

    // R1: ROLLUP — hierarchical subtotals (priority → status → grand
    // total) in one Expand-based aggregation pass, no self-unions.
    "q_r1_rollup" -> ((s, dir) =>
      Tables.orders(s, dir)
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("total_price"))
        .orderBy(asc_nulls_first("o_orderpriority"),
          asc_nulls_first("o_orderstatus"))),

    // R2: CUBE — all grouping-set combinations of (segment, nation).
    "q_r2_cube" -> ((s, dir) =>
      Tables.customer(s, dir)
        .cube("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(asc_nulls_first("c_mktsegment"),
          asc_nulls_first("c_nationkey"))),

    // P10+: fuzzy matching (engine extension) — edit-distance join of
    // region names against nation names within distance 8, the
    // data-cleaning primitive for entity resolution. Small side is
    // broadcast so the similarity scan never shuffles the big side.
    "q_p10_levenshtein" -> ((s, dir) => {
      val r = Tables.region(s, dir).select(col("r_name"))
      Tables.nation(s, dir).select(col("n_name"))
        .crossJoin(broadcast(r))
        .withColumn("dist", levenshtein(col("n_name"), col("r_name")))
        .filter(col("dist") <= 8)
        .orderBy("n_name", "r_name")
    }),

    // R3: pivot — orders count reshaped to one column per status
    // (explicit value list: at scale an unbounded pivot would need a
    // driver-side distinct pass first).
    "q_r3_pivot" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy("o_orderpriority")),

    // R5: unpivot/melt — the inverse of q_r3's pivot: a wide per-nation
    // metric row melts to (key, metric, value) long form. Pure map-side
    // Expand, no shuffle beyond the source aggregation.
    "q_r5_unpivot" -> ((s, dir) => {
      val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
      val wide = Tables.customer(s, dir)
        .groupBy("c_nationkey")
        .agg(
          sum(col("c_acctbal").cast(dec2)).cast("double").as("total_bal"),
          count(lit(1)).cast("double").as("n_cust"),
          graft.functions.StableMath.gridSnap(
            avg(length(col("c_name"))), 6).as("avg_name_len"))
      wide.unpivot(Array(col("c_nationkey")),
          Array(col("total_bal"), col("n_cust"), col("avg_name_len")),
          "metric", "value")
        .orderBy("c_nationkey", "metric")
    }),

    // F23: string-function kit — pad/translate/reverse/left/replace in
    // one projection (the remaining §2.8 string surface in one pass).
    "q_f23_string_kit" -> ((s, dir) =>
      Tables.nation(s, dir).select(
        col("n_nationkey"),
        lpad(col("n_nationkey").cast("string"), 4, "0").as("padded_key"),
        translate(col("n_name"), "AEIOU", "aeiou").as("vowels_lowered"),
        reverse(col("n_name")).as("rev_name"),
        substring(col("n_name"), 1, 3).as("prefix3"),
        regexp_replace(col("n_name"), " ", "_").as("snake_name"))
        .orderBy("n_nationkey")),

    // R4: explicit GROUPING SETS (beyond rollup/cube): per-priority and
    // per-status subtotals plus the grand total in one Expand pass.
    "q_r4_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
              |FROM orders_gs
              |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
              |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
    }),

    // A17: exact interpolated percentiles (percentile_cont semantics) —
    // the exact counterpart of the approx_percentile scale path.
    "q_a17_quantiles" -> ((s, dir) =>
      Tables.orders(s, dir)
        .agg(expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.9D))")
          .as("qs"))
        .select(
          graft.functions.StableMath.gridSnap(element_at(col("qs"), 1), 6).as("p25"),
          graft.functions.StableMath.gridSnap(element_at(col("qs"), 2), 6).as("p50"),
          graft.functions.StableMath.gridSnap(element_at(col("qs"), 3), 6).as("p75"),
          graft.functions.StableMath.gridSnap(element_at(col("qs"), 4), 6).as("p90"))),

    // A21 (extension): group-mean imputation — values nulled on a
    // deterministic rule (event_id % 9), group keys nulled on another
    // (event_id % 13, exercising the null-safe means join: the NULL
    // key is its own group), refilled with the per-group DECIMAL-exact
    // mean, summarized per group. The NULL group surfaces as user_key
    // -1 so row order is engine-independent (user_id is positive).
    "q_a21_impute" -> ((s, dir) => {
      val dec6 = org.apache.spark.sql.types.DecimalType(38, 6)
      val ev = Tables.events(s, dir)
        .withColumn("value", when(col("event_id") % 9 === 0, lit(null))
          .otherwise(col("value")))
        .withColumn("user_id", when(col("event_id") % 13 === 0, lit(null))
          .otherwise(col("user_id")))
      graft.ingest.Ingestion.imputeByGroupMean(ev, "user_id", "value")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("was_imputed"), 1L).otherwise(0L)).as("n_imputed"),
          sum(col("value_imputed").cast(dec6)).cast("double").as("sum_imputed"))
        .select(coalesce(col("user_id"), lit(-1L)).as("user_key"),
          col("n"), col("n_imputed"), col("sum_imputed"))
        .orderBy("user_key")
    }),

    // A22 (extension): per-user winsorization — event values clipped
    // to the user's own [p5, p95] interpolated percentiles, summarized.
    "q_a22_winsorize" -> ((s, dir) => {
      val dec6 = org.apache.spark.sql.types.DecimalType(38, 6)
      graft.analytics.Anomaly.winsorize(
          Tables.events(s, dir), "user_id", "value",
          loPct = 0.05, hiPct = 0.95)
        .groupBy("user_id")
        .agg(sum(when(col("was_clipped"), 1L).otherwise(0L)).as("n_clipped"),
          sum(col("value_winsor").cast(dec6)).cast("double").as("sum_winsor"))
        .orderBy("user_id")
    }),

    // A20 (extension): group-wise outlier flags — each customer's
    // orders tested against that customer's own 2σ band, with
    // DECIMAL-exact Σx/Σx² so the variance is identical on any
    // engine or partitioning. Customers with ≥1 flagged order.
    "q_a20_outliers" -> ((s, dir) =>
      graft.analytics.Anomaly.zFlag(
          Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice")),
          "o_custkey", "o_totalprice", sigma = 2.0)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"))
        .filter(col("n_outliers") > 0)
        .orderBy("o_custkey")),

    // A19 (extension): equi-width histogram — data-driven bin bounds
    // via a broadcast 1-row min/max attach (the scalar-subquery
    // pattern), then one map-side bucket expression + hash count. The
    // max lands in the top bin (half-open bins, closed last).
    "q_a19_histogram" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val bounds = o.agg(min(col("o_totalprice")).as("_lo"),
        max(col("o_totalprice")).as("_hi"))
      val nBins = 10
      Joins.withScalar(o.select(col("o_totalprice")), bounds)
        .withColumn("bin", least(
          floor((col("o_totalprice") - col("_lo")) * nBins
            / (col("_hi") - col("_lo"))).cast("int"),
          lit(nBins - 1)))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          graft.functions.StableMath.gridSnap(min(col("o_totalprice")), 6).as("bin_min"),
          graft.functions.StableMath.gridSnap(max(col("o_totalprice")), 6).as("bin_max"))
        .orderBy("bin")
    }),

    // G1 (extension): PageRank over the customer↔supplier bipartite
    // trade graph (symmetrized), 3 exact iterations — per-iteration
    // 10 dp rounding is part of the algorithm so any engine reproduces
    // it bit-for-bit. Node ids ride the iterations as parity-tagged
    // BIGINTs (customer 2k, supplier 2k+1) — the narrow-key discipline
    // the operator documents — and decorate to the reference's
    // 'c…'/'s…' labels only on the 10-row output. Top 10.
    // G2 (extension): label-propagation communities over the same
    // trade graph — 2 synchronous iterations, integer-only (most
    // frequent neighbor label, ties to the smallest), community-size
    // table.
    "q_g2_label_prop" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      Graph.labelPropagation(edges, "src", "dst", iters = 2)
        .groupBy("label").agg(count(lit(1)).as("n_members"))
        .orderBy("label")
    }),

    // G5 (extension): personalized PageRank — restart mass confined
    // to the five lowest-keyed customers, so rank = proximity to THOSE
    // (seed-based corpus expansion), not global centrality. The rank
    // relation only ever holds reached nodes — the sparsity that
    // makes 3-hop PPR frontier-bounded at 100 TB. Top 10.
    "q_g5_ppr" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val seeds = Tables.customer(s, dir)
        .where(col("c_custkey") < 5)
        .select((col("c_custkey") * 2).as("seed"))
      Graph.personalizedPageRank(edges, "src", "dst", seeds, "seed",
          damping = 0.85, iters = 3)
        .select(when(col("node") % 2 === 0,
            concat(lit("c"), expr("node div 2")))
          .otherwise(concat(lit("s"), expr("(node - 1) div 2")))
          .as("node"), col("rank"))
        .orderBy(desc("rank"), asc("node"))
        .limit(10)
    }),

    "q_g1_pagerank" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      Graph.pageRank(edges, "src", "dst", damping = 0.85, iters = 3)
        // `div` = integral division: exact for the full bigint key
        // range (a double `/` is only exact below 2^53)
        .select(when(col("node") % 2 === 0,
            concat(lit("c"), expr("node div 2")))
          .otherwise(concat(lit("s"), expr("(node - 1) div 2")))
          .as("node"), col("rank"))
        .orderBy(desc("rank"), asc("node"))
        .limit(10)
    }),

    // A23 (extension): distribution-shape profile — mean/stddev/skew/
    // excess kurtosis from the first four DECIMAL-exact raw moments in
    // ONE aggregation pass; the drift signal mean/stddev monitoring
    // misses (tails growing under a stable average).
    "q_a23_moments" -> ((s, dir) =>
      graft.analytics.Anomaly.momentsProfile(
          Tables.orders(s, dir), "o_orderpriority", "o_totalprice")
        .orderBy("o_orderpriority")),

    // A25 (extension): robust outliers via the modified z-score —
    // median/MAD have a 50% breakdown point, so the estimator can't
    // be dragged by the outliers it hunts (zFlag's masking problem).
    "q_a25_mad" -> ((s, dir) =>
      graft.analytics.Anomaly.madFlag(
          Tables.events(s, dir), "user_id", "value", cutoff = 3.5)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
          graft.functions.StableMath.gridSnap(max(abs(col("robust_z"))), 6).as("max_abs_z"))
        .orderBy("user_id")),

    // A24 (extension): engine-portable approximate distinct counting —
    // KMV sketch over the md5 uniform, k=256 (~6% error), k-bounded
    // exchange instead of COUNT(DISTINCT)'s full value shuffle. The
    // 2000-part groups exceed k, so this exercises the ESTIMATE path,
    // not the exact small-group fallback.
    "q_a24_kmv_distinct" -> ((s, dir) =>
      graft.analytics.Sketches.approxDistinctKmv(
          Tables.lineitem(s, dir), "l_returnflag", "l_partkey", k = 256)
        .orderBy("l_returnflag")),

    // G3 (extension): exact triangle counting over the part
    // co-occurrence graph (parts sharing an URGENT order) — the
    // clustering-coefficient ingredient for community structure the
    // count tables of G1/G2 can't see. Degree-ordered orientation
    // bounds wedge work at O(m^1.5) with no hot reducer; per-node
    // counts are pure integer arithmetic, engine-exact. Top 20.
    "q_g3_triangles" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
      val sup = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderkey").as("ok"), col("l_partkey").as("nk"))
        .distinct()
      val edges = sup.select(col("ok"), col("nk").as("src"))
        .join(sup.select(col("ok"), col("nk").as("dst")), "ok")
        .where(col("src") < col("dst"))
        .select("src", "dst")
      Graph.triangleCounts(edges, "src", "dst")
        .orderBy(desc("triangles"), asc("node"))
        .limit(20)
    }),

    // G4 (extension): local clustering coefficient over the same
    // co-occurrence graph — 2T/(d(d−1)), the Watts–Strogatz cohesion
    // score; top 20 of the degree-≥2 nodes.
    "q_g4_clustering_coef" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
      val sup = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderkey").as("ok"), col("l_partkey").as("nk"))
        .distinct()
      val edges = sup.select(col("ok"), col("nk").as("src"))
        .join(sup.select(col("ok"), col("nk").as("dst")), "ok")
        .where(col("src") < col("dst"))
        .select("src", "dst")
      Graph.clusteringCoefficients(edges, "src", "dst")
        .where(col("clustering_coef").isNotNull)
        .orderBy(desc("clustering_coef"), asc("node"))
        .limit(20)
    }),

    // P12 (extension): k-anonymity suppression — quasi-identifier
    // combinations rarer than k collapse to '*' before release; one
    // window shuffle on the QI key. k=7 genuinely suppresses groups
    // on this data (min (segment, nation) group is 5 at sf0.01).
    "q_p12_kanon" -> ((s, dir) =>
      Privacy.kAnonymize(
          Tables.customer(s, dir)
            .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey")),
          Seq("c_mktsegment", "c_nationkey"), k = 7)
        .orderBy("c_custkey")),

    // P13 (extension): distinct l-diversity — suppress QI groups that
    // are too small (k) OR whose sensitive balance-bucket is too
    // uniform (l): at sf0.01, 6 of 125 groups pass k=7 yet fail l=4 —
    // the homogeneity attack k-anonymity alone releases.
    "q_p13_ldiversity" -> ((s, dir) =>
      Privacy.lDiversify(
          Tables.customer(s, dir)
            .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
              floor(col("c_acctbal") / 2000).cast("int").as("bal_bucket")),
          Seq("c_mktsegment", "c_nationkey"), "bal_bucket", k = 7, l = 4)
        .orderBy("c_custkey")),

    // A18 (extension): declarative data-quality expectations — five
    // constraints (incl. composite-key uniqueness) checked in ONE
    // aggregation pass; the reference's scattered quality gates as a
    // single declared contract. The 0-floor acctbal range genuinely
    // fails on TPC-H data (negative balances) — nonzero violations are
    // part of the oracle.
    "q_a18_expectations" -> ((s, dir) => {
      import graft.ingest.Expectations._
      violations(Tables.customer(s, dir), Seq(
          NotNull("c_name"),
          Unique(Seq("c_custkey")),
          InRange("c_acctbal", 0.0, 9999.99),
          InSet("c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
            "HOUSEHOLD", "MACHINERY")),
          Satisfies("nation_in_domain",
            col("c_nationkey") >= 0 && col("c_nationkey") <= 24)))
        .orderBy("constraint")
    }),
  )

  override def oracle: Map[String, String] = Map(
    "q_p1_normalize" ->
      """SELECT c_custkey, NULLIF(UPPER(TRIM(c_name)), '') AS name_norm
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_p2_concat" ->
      """SELECT c_custkey,
        |  CASE WHEN COALESCE(c_mktsegment, c_name) IS NULL THEN NULL
        |       ELSE concat_ws(' ', c_mktsegment, c_name) END AS full_label
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_p4_point_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |WHERE l_orderkey = (SELECT MIN(o_orderkey) FROM orders)
        |ORDER BY l_linenumber""".stripMargin,

    "q_p6_search" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE UPPER(p_name) LIKE '%WIDGET%' ORDER BY p_partkey""".stripMargin,

    "q_p8_like_buckets" ->
      """SELECT CASE WHEN p_type LIKE '%BRASS%' THEN 'Brass'
        |            WHEN p_type LIKE '%STEEL%' THEN 'Steel'
        |            WHEN p_type LIKE '%COPPER%' THEN 'Copper'
        |            ELSE 'Other' END AS kind,
        |  CASE WHEN LENGTH(p_name) < 12 THEN 'Short'
        |       WHEN LENGTH(p_name) < 18 THEN 'Medium'
        |       ELSE 'Long' END AS name_size,
        |  COUNT(*) AS cnt
        |FROM part GROUP BY kind, name_size ORDER BY kind, name_size""".stripMargin,

    "q_p9_keyword_cat" ->
      """SELECT CASE WHEN regexp_matches(LOWER(event_type), 'purchase|signup') THEN 'Conversion'
        |            WHEN regexp_matches(LOWER(event_type), 'error') THEN 'Failure'
        |            ELSE 'Engagement' END AS category,
        |  COUNT(*) AS cnt
        |FROM events GROUP BY category ORDER BY category""".stripMargin,

    "q_o2_top1" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
        |GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority LIMIT 1""".stripMargin,

    "q_o4_pagination" ->
      """SELECT c_custkey, c_name,
        |  CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS INTEGER) AS row_num
        |FROM customer ORDER BY c_custkey LIMIT 20 OFFSET 100""".stripMargin,

    "q_o4_filtered_page" ->
      """SELECT p_partkey, p_name,
        |  CAST(ROW_NUMBER() OVER (ORDER BY p_partkey) AS INTEGER) AS row_num
        |FROM part WHERE UPPER(p_name) LIKE '%WIDGET%'
        |ORDER BY p_partkey LIMIT 10 OFFSET 20""".stripMargin,

    "q_o4_keyset" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey > 120 ORDER BY c_custkey LIMIT 20""".stripMargin,

    "q_d1_distinct" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q_d2_dup_count" ->
      """SELECT COUNT(*) AS n,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM lineitem)) AS n_distinct,
        |  COUNT(*) - (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM lineitem)) AS n_dups
        |FROM lineitem""".stripMargin,

    "q_d3_distinct_concat" ->
      """SELECT COUNT(DISTINCT l_orderkey || '-' || l_linenumber) AS n_lines
        |FROM lineitem""".stripMargin,

    "q_f12_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y, CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(month(o_orderdate) AS INTEGER) AS m, CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  dayname(o_orderdate) AS day_name, monthname(o_orderdate) AS month_name,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY 1,2,3,4,5,6 ORDER BY 1,2,3,4""".stripMargin,

    "q_f15_interval_window" ->
      """WITH m AS (SELECT MAX(ts) AS max_ts FROM events)
        |SELECT COUNT(*) AS n_last_day,
        |  CAST(SUM(FLOOR(date_part('epoch', date_trunc('second', max_ts)))::BIGINT
        |    - FLOOR(date_part('epoch', date_trunc('second', ts)))::BIGINT) AS BIGINT) AS total_age_s
        |FROM events, m WHERE ts > max_ts - INTERVAL 24 HOURS""".stripMargin,

    "q_f17_date_series" ->
      """SELECT CAST(d AS DATE) AS date_id,
        |  CAST(year(d) AS INTEGER) AS y, CAST(month(d) AS INTEGER) AS m, CAST(day(d) AS INTEGER) AS d,
        |  dayofweek(d) IN (0, 6) AS is_weekend
        |FROM (SELECT UNNEST(generate_series(DATE '2024-01-01', DATE '2024-03-31',
        |  INTERVAL 1 DAY)) AS d)
        |ORDER BY date_id""".stripMargin,

    "q_f18_ts_format" ->
      """SELECT strftime(ts, '%Y%m%d_%H') AS partition_id, COUNT(*) AS cnt
        |FROM events GROUP BY partition_id ORDER BY partition_id""".stripMargin,

    "q_f20_to_json" ->
      """SELECT n_nationkey,
        |  to_json(struct_pack(name := n_name, rk := n_regionkey)) AS raw_data
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_f20_from_json" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  COUNT(*) AS cnt
        |FROM events GROUP BY k_mod ORDER BY k_mod""".stripMargin,

    "q_d5_setops_all" ->
      """WITH f AS (SELECT l_partkey FROM lineitem JOIN orders
        |    ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'),
        |o AS (SELECT l_partkey FROM lineitem JOIN orders
        |    ON l_orderkey = o_orderkey WHERE o_orderstatus = 'O'),
        |ex AS (SELECT l_partkey FROM f EXCEPT ALL SELECT l_partkey FROM o),
        |ia AS (SELECT l_partkey FROM f INTERSECT ALL SELECT l_partkey FROM o)
        |SELECT
        |  (SELECT COUNT(*) FROM ex) AS n_except_all,
        |  (SELECT COUNT(DISTINCT l_partkey) FROM ex) AS n_except_keys,
        |  (SELECT COUNT(*) FROM ia) AS n_intersect_all""".stripMargin,

    "q_d4_setops" ->
      """SELECT
        |  (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer
        |     EXCEPT SELECT o_custkey FROM orders)) AS n_without_orders,
        |  (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer
        |     INTERSECT SELECT o_custkey FROM orders)) AS n_with_orders""".stripMargin,

    "q_r1_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "q_r2_cube" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_customers
        |FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
        |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin,

    "q_p10_levenshtein" ->
      """SELECT n_name, r_name, CAST(levenshtein(n_name, r_name) AS INTEGER) AS dist
        |FROM nation CROSS JOIN region
        |WHERE levenshtein(n_name, r_name) <= 8
        |ORDER BY n_name, r_name""".stripMargin,

    "q_r3_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_r5_unpivot" ->
      """WITH wide AS (SELECT c_nationkey,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        |    CAST(COUNT(*) AS DOUBLE) AS n_cust,
        |    FLOOR(AVG(LENGTH(c_name)) * 1000000 + 0.5) / 1000000
        |      AS avg_name_len
        |  FROM customer GROUP BY c_nationkey)
        |SELECT * FROM (UNPIVOT wide ON total_bal, n_cust, avg_name_len
        |  INTO NAME metric VALUE value)
        |ORDER BY c_nationkey, metric""".stripMargin,

    "q_f23_string_kit" ->
      """SELECT n_nationkey,
        |  LPAD(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded_key,
        |  translate(n_name, 'AEIOU', 'aeiou') AS vowels_lowered,
        |  reverse(n_name) AS rev_name,
        |  substring(n_name, 1, 3) AS prefix3,
        |  replace(n_name, ' ', '_') AS snake_name
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_r4_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "q_a22_winsorize" ->
      """WITH b AS (SELECT user_id,
        |    quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.user_id,
        |  CAST(SUM(CASE WHEN e.value < b.lo OR e.value > b.hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(SUM(CAST(FLOOR(LEAST(GREATEST(e.value, b.lo), b.hi) * 1000000 + 0.5) / 1000000
        |    AS DECIMAL(38,6))) AS DOUBLE) AS sum_winsor
        |FROM events e JOIN b USING (user_id)
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,

    "q_a21_impute" ->
      """WITH ev AS (SELECT
        |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE user_id END AS user_id,
        |    CASE WHEN event_id % 9 = 0 THEN NULL ELSE value END AS v
        |  FROM events),
        |m AS (SELECT user_id,
        |    FLOOR(CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / COUNT(v)
        |      * 1000000 + 0.5) / 1000000 AS gm
        |  FROM ev GROUP BY 1)
        |SELECT COALESCE(ev.user_id, -1) AS user_key, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN ev.v IS NULL AND m.gm IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
        |  CAST(SUM(CAST(COALESCE(ev.v, m.gm) AS DECIMAL(38,6))) AS DOUBLE)
        |    AS sum_imputed
        |FROM ev LEFT JOIN m ON ev.user_id IS NOT DISTINCT FROM m.user_id
        |GROUP BY ev.user_id ORDER BY user_key""".stripMargin,

    "q_a17_quantiles" ->
      """SELECT FLOOR(quantile_cont(o_totalprice, 0.25) * 1000000 + 0.5) / 1000000 AS p25,
        |  FLOOR(quantile_cont(o_totalprice, 0.50) * 1000000 + 0.5) / 1000000 AS p50,
        |  FLOOR(quantile_cont(o_totalprice, 0.75) * 1000000 + 0.5) / 1000000 AS p75,
        |  FLOOR(quantile_cont(o_totalprice, 0.90) * 1000000 + 0.5) / 1000000 AS p90
        |FROM orders""".stripMargin,

    "q_a20_outliers" ->
      """WITH s AS (SELECT o_custkey, COUNT(*) AS gn,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE) AS gsum,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(38,8))
        |      * CAST(o_totalprice AS DECIMAL(38,8)) AS DECIMAL(38,8))) AS DOUBLE)
        |      AS gsumsq
        |  FROM orders GROUP BY 1),
        |f AS (SELECT o.o_custkey,
        |    CASE WHEN s.gn >= 2 AND
        |      (o.o_totalprice - gsum / gn) * (o.o_totalprice - gsum / gn)
        |        > ((gsumsq - gsum * gsum / gn) / (gn - 1)) * 4.0
        |    THEN 1 ELSE 0 END AS outlier
        |  FROM orders o JOIN s USING (o_custkey))
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(outlier) AS BIGINT) AS n_outliers
        |FROM f GROUP BY 1 HAVING SUM(outlier) > 0 ORDER BY o_custkey""".stripMargin,

    "q_a19_histogram" ->
      """WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |  FROM orders)
        |SELECT CAST(LEAST(FLOOR((o_totalprice - b.lo) * 10 / (b.hi - b.lo)), 9)
        |    AS INTEGER) AS bin,
        |  COUNT(*) AS n,
        |  FLOOR(MIN(o_totalprice) * 1000000 + 0.5) / 1000000 AS bin_min,
        |  FLOOR(MAX(o_totalprice) * 1000000 + 0.5) / 1000000 AS bin_max
        |FROM orders CROSS JOIN b
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_g2_label_prop" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey*2 AS s, l_suppkey*2+1 AS d
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |canon AS (SELECT DISTINCT LEAST(s,d) AS src, GREATEST(s,d) AS dst FROM e0),
        |und AS (SELECT src, dst FROM canon
        |  UNION ALL SELECT dst, src FROM canon WHERE src <> dst),
        |l0 AS (SELECT DISTINCT src AS node FROM und),
        |c1 AS (SELECT u.dst AS node, l.node AS label, COUNT(*) AS c
        |  FROM und u JOIN l0 l ON u.src = l.node GROUP BY 1, 2),
        |a1 AS (SELECT node, label FROM (SELECT node, label,
        |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        |  FROM c1) WHERE rn = 1),
        |c2 AS (SELECT u.dst AS node, a.label, COUNT(*) AS c
        |  FROM und u JOIN a1 a ON u.src = a.node GROUP BY 1, 2),
        |a2 AS (SELECT node, label FROM (SELECT node, label,
        |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        |  FROM c2) WHERE rn = 1)
        |SELECT label, COUNT(*) AS n_members
        |FROM a2 GROUP BY label ORDER BY label""".stripMargin,

    // Median then MAD around it (quantile_cont = Spark's exact
    // interpolated percentile); null robust_z rows resolve the
    // three-valued OR exactly as the engine's coalesce does.
    // Stats joins are null-safe (IS NOT DISTINCT FROM) to mirror the
    // engine's <=> re-attach: rows with a NULL key flag within their
    // own group rather than dropping.
    "q_a25_mad" ->
      """WITH med AS (SELECT user_id, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |mad AS (SELECT e.user_id,
        |    quantile_cont(ABS(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m
        |    ON e.user_id IS NOT DISTINCT FROM m.user_id
        |  GROUP BY e.user_id),
        |f AS (SELECT e.user_id, e.value, m.med, d.mad,
        |    CASE WHEN d.mad > 0
        |      THEN FLOOR(0.6745 * (e.value - m.med) / d.mad * 1000000 + 0.5) / 1000000 END AS rz
        |  FROM events e JOIN med m
        |    ON e.user_id IS NOT DISTINCT FROM m.user_id
        |  JOIN mad d ON e.user_id IS NOT DISTINCT FROM d.user_id)
        |SELECT user_id, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN (ABS(rz) > 3.5) OR (mad = 0 AND value <> med)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  FLOOR(MAX(ABS(rz)) * 1000000 + 0.5) / 1000000 AS max_abs_z
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Window replay of the KMV sketch: distinct md5 uniforms per
    // group, the k-th smallest selects the estimate, groups under the
    // bound fall back to their exact distinct-hash count.
    "q_a24_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT l_returnflag AS g,
        |    (CAST(('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 13))
        |      AS BIGINT) + 1.0) / 4503599627370497.0 AS u
        |  FROM lineitem WHERE l_partkey IS NOT NULL),
        |r AS (SELECT g, u, ROW_NUMBER() OVER (PARTITION BY g ORDER BY u) AS rn,
        |    COUNT(*) OVER (PARTITION BY g) AS nd FROM h)
        |SELECT g AS l_returnflag,
        |  CASE WHEN nd < 256 THEN CAST(nd AS DOUBLE)
        |       ELSE FLOOR(255.0 / u * 1000000 + 0.5) / 1000000 END AS est_distinct
        |FROM r WHERE rn = LEAST(nd, 256)
        |ORDER BY l_returnflag""".stripMargin,

    // Raw moments DECIMAL-summed with the engine's exact per-row
    // power association ((x*x)*x)*x; the central-moment combination
    // mirrors the engine's double expression tree token-for-token.
    "q_a23_moments" ->
      """WITH m AS (SELECT o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,8))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST((o_totalprice * o_totalprice) * o_totalprice
        |      AS DECIMAL(38,4))) AS DOUBLE) AS s3,
        |    CAST(SUM(CAST(((o_totalprice * o_totalprice) * o_totalprice) * o_totalprice
        |      AS DECIMAL(38,4))) AS DOUBLE) AS s4
        |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        |c AS (SELECT o_orderpriority, n, s1 / n AS mu,
        |    s2 / n - (s1 / n) * (s1 / n) AS m2,
        |    s3 / n - 3.0 * (s1 / n) * (s2 / n)
        |      + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
        |    s4 / n - 4.0 * (s1 / n) * (s3 / n)
        |      + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
        |      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        |  FROM m)
        |SELECT o_orderpriority, n, FLOOR(mu * 1000000 + 0.5) / 1000000 AS mean,
        |  FLOOR(SQRT(GREATEST(m2, 0.0)) * 1000000 + 0.5) / 1000000 AS stddev_pop,
        |  CASE WHEN n >= 3 AND m2 > 0
        |    THEN FLOOR(m3 / POWER(m2, 1.5) * 1000000 + 0.5) / 1000000 END AS skewness,
        |  CASE WHEN n >= 3 AND m2 > 0
        |    THEN FLOOR((m4 / (m2 * m2) - 3.0) * 1000000 + 0.5) / 1000000 END AS excess_kurtosis
        |FROM c ORDER BY o_orderpriority""".stripMargin,

    // Triangles are orientation-independent, so the oracle uses the
    // simpler id-ordering (a<b<c once per triangle) instead of the
    // engine's degree-ordering — same result, simplest correct SQL.
    "q_g3_triangles" ->
      """WITH sup AS (SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS nk
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderpriority = '1-URGENT'),
        |e AS (SELECT DISTINCT a.nk AS a, b.nk AS b
        |  FROM sup a JOIN sup b ON a.ok = b.ok AND a.nk < b.nk),
        |t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (SELECT UNNEST([x, y, z]) AS node FROM t)
        |SELECT node, COUNT(*) AS triangles FROM n GROUP BY node
        |ORDER BY triangles DESC, node LIMIT 20""".stripMargin,

    "q_p13_ldiversity" ->
      """WITH t AS (SELECT c_custkey, c_mktsegment, c_nationkey,
        |    CAST(FLOOR(c_acctbal / 2000) AS INT) AS bal_bucket FROM customer),
        |g AS (SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
        |    COUNT(DISTINCT bal_bucket) AS ld FROM t GROUP BY 1, 2)
        |SELECT t.c_custkey,
        |  CASE WHEN g.n < 7 OR g.ld < 4 THEN '*'
        |       ELSE CAST(t.c_mktsegment AS VARCHAR) END AS c_mktsegment,
        |  CASE WHEN g.n < 7 OR g.ld < 4 THEN '*'
        |       ELSE CAST(t.c_nationkey AS VARCHAR) END AS c_nationkey,
        |  t.bal_bucket
        |FROM t JOIN g ON t.c_mktsegment IS NOT DISTINCT FROM g.c_mktsegment
        |  AND t.c_nationkey IS NOT DISTINCT FROM g.c_nationkey
        |ORDER BY c_custkey""".stripMargin,

    "q_g4_clustering_coef" ->
      """WITH sup AS (SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS nk
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderpriority = '1-URGENT'),
        |e AS (SELECT DISTINCT a.nk AS a, b.nk AS b
        |  FROM sup a JOIN sup b ON a.ok = b.ok AND a.nk < b.nk),
        |deg AS (SELECT node, COUNT(*) AS d FROM (
        |  SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
        |  GROUP BY node),
        |t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (SELECT node, COUNT(*) AS triangles FROM (
        |  SELECT UNNEST([x, y, z]) AS node FROM t) GROUP BY node)
        |SELECT deg.node, deg.d AS degree,
        |  COALESCE(n.triangles, 0) AS triangles,
        |  FLOOR(2.0 * COALESCE(n.triangles, 0) / (deg.d * (deg.d - 1)) * 1000000 + 0.5) / 1000000
        |    AS clustering_coef
        |FROM deg LEFT JOIN n ON deg.node = n.node
        |WHERE deg.d >= 2
        |ORDER BY clustering_coef DESC, deg.node LIMIT 20""".stripMargin,

    // PPR replay: teleport base (1-d)/|seeds| on the seeds only, with
    // |seeds| DERIVED from the seed CTE (the engine computes it via
    // seedNodes.count(), so a literal here would silently desync if
    // the data regenerated with different key ranges); walk starts at
    // the personalization vector, FULL OUTER per iteration keeps
    // isolated seeds' restart mass; same DECIMAL/rounding discipline
    // as q_g1_pagerank.
    "q_g5_ppr" ->
      """WITH e0 AS (SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src, COUNT(*) AS dg FROM und GROUP BY 1),
        |sd AS (SELECT 'c' || c_custkey AS node FROM customer WHERE c_custkey < 5),
        |sn AS (SELECT COUNT(*) AS ns FROM sd),
        |sb AS (SELECT node, FLOOR((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / ns * 10000000000 + 0.5) / 10000000000 AS b FROM sd CROSS JOIN sn),
        |r0 AS (SELECT node, FLOOR(CAST(1 AS DOUBLE) / ns * 10000000000 + 0.5) / 10000000000 AS rank FROM sd CROSS JOIN sn),
        |a1 AS (SELECT u.dst AS node,
        |    CAST(0.85 AS DOUBLE) *
        |      CAST(SUM(CAST(r.rank / d.dg AS DECIMAL(38,16))) AS DOUBLE) AS m
        |  FROM und u JOIN r0 r ON u.src = r.node JOIN deg d ON u.src = d.src
        |  GROUP BY u.dst),
        |r1 AS (SELECT COALESCE(a.node, b.node) AS node,
        |    FLOOR((COALESCE(b.b, 0) + COALESCE(a.m, 0)) * 10000000000 + 0.5) / 10000000000 AS rank
        |  FROM a1 a FULL OUTER JOIN sb b ON a.node = b.node),
        |a2 AS (SELECT u.dst AS node,
        |    CAST(0.85 AS DOUBLE) *
        |      CAST(SUM(CAST(r.rank / d.dg AS DECIMAL(38,16))) AS DOUBLE) AS m
        |  FROM und u JOIN r1 r ON u.src = r.node JOIN deg d ON u.src = d.src
        |  GROUP BY u.dst),
        |r2 AS (SELECT COALESCE(a.node, b.node) AS node,
        |    FLOOR((COALESCE(b.b, 0) + COALESCE(a.m, 0)) * 10000000000 + 0.5) / 10000000000 AS rank
        |  FROM a2 a FULL OUTER JOIN sb b ON a.node = b.node),
        |a3 AS (SELECT u.dst AS node,
        |    CAST(0.85 AS DOUBLE) *
        |      CAST(SUM(CAST(r.rank / d.dg AS DECIMAL(38,16))) AS DOUBLE) AS m
        |  FROM und u JOIN r2 r ON u.src = r.node JOIN deg d ON u.src = d.src
        |  GROUP BY u.dst),
        |r3 AS (SELECT COALESCE(a.node, b.node) AS node,
        |    FLOOR((COALESCE(b.b, 0) + COALESCE(a.m, 0)) * 10000000000 + 0.5) / 10000000000 AS rank
        |  FROM a3 a FULL OUTER JOIN sb b ON a.node = b.node)
        |SELECT node, FLOOR(rank * 1000000 + 0.5) / 1000000 AS rank FROM r3
        |ORDER BY rank DESC, node LIMIT 10""".stripMargin,

    "q_g1_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src, COUNT(*) AS dg FROM und GROUP BY 1),
        |nn AS (SELECT COUNT(DISTINCT src) AS n FROM und),
        |r0 AS (SELECT DISTINCT src AS node,
        |    FLOOR(CAST(1 AS DOUBLE) / (SELECT n FROM nn) * 10000000000 + 0.5) / 10000000000 AS rank FROM und),
        |r1 AS (SELECT u.dst AS node,
        |    FLOOR(((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
        |      + CAST(0.85 AS DOUBLE) *
        |        CAST(SUM(CAST(r.rank / d.dg AS DECIMAL(38,16))) AS DOUBLE))
        |      * 10000000000 + 0.5) / 10000000000 AS rank
        |  FROM und u JOIN r0 r ON u.src = r.node JOIN deg d ON u.src = d.src
        |  GROUP BY u.dst),
        |r2 AS (SELECT u.dst AS node,
        |    FLOOR(((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
        |      + CAST(0.85 AS DOUBLE) *
        |        CAST(SUM(CAST(r.rank / d.dg AS DECIMAL(38,16))) AS DOUBLE))
        |      * 10000000000 + 0.5) / 10000000000 AS rank
        |  FROM und u JOIN r1 r ON u.src = r.node JOIN deg d ON u.src = d.src
        |  GROUP BY u.dst),
        |r3 AS (SELECT u.dst AS node,
        |    FLOOR(((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
        |      + CAST(0.85 AS DOUBLE) *
        |        CAST(SUM(CAST(r.rank / d.dg AS DECIMAL(38,16))) AS DOUBLE))
        |      * 10000000000 + 0.5) / 10000000000 AS rank
        |  FROM und u JOIN r2 r ON u.src = r.node JOIN deg d ON u.src = d.src
        |  GROUP BY u.dst)
        |SELECT node, FLOOR(rank * 1000000 + 0.5) / 1000000 AS rank FROM r3
        |ORDER BY rank DESC, node LIMIT 10""".stripMargin,

    "q_p12_kanon" ->
      """WITH g AS (SELECT c_custkey, c_mktsegment, c_nationkey,
        |    COUNT(*) OVER (PARTITION BY c_mktsegment, c_nationkey) AS n
        |  FROM customer)
        |SELECT c_custkey,
        |  CASE WHEN n < 7 THEN '*' ELSE c_mktsegment END AS c_mktsegment,
        |  CASE WHEN n < 7 THEN '*' ELSE CAST(c_nationkey AS VARCHAR) END AS c_nationkey
        |FROM g ORDER BY c_custkey""".stripMargin,

    "q_a18_expectations" ->
      """WITH v AS (
        |  SELECT 'not_null(c_name)' AS c,
        |    SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS n FROM customer
        |  UNION ALL
        |  SELECT 'unique(c_custkey)', COUNT(*) - COUNT(DISTINCT c_custkey)
        |    FROM customer
        |  UNION ALL
        |  SELECT 'in_range(c_acctbal,0.0,9999.99)',
        |    SUM(CASE WHEN c_acctbal < 0.0 OR c_acctbal > 9999.99
        |        THEN 1 ELSE 0 END) FROM customer
        |  UNION ALL
        |  SELECT 'in_set(c_mktsegment)',
        |    SUM(CASE WHEN c_mktsegment IS NOT NULL AND c_mktsegment NOT IN
        |        ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
        |        THEN 1 ELSE 0 END) FROM customer
        |  UNION ALL
        |  SELECT 'satisfies(nation_in_domain)',
        |    SUM(CASE WHEN COALESCE(c_nationkey >= 0 AND c_nationkey <= 24, FALSE)
        |        THEN 0 ELSE 1 END) FROM customer)
        |SELECT c AS "constraint", CAST(n AS BIGINT) AS violations,
        |  n = 0 AS passed
        |FROM v ORDER BY "constraint"""".stripMargin,
  )
}

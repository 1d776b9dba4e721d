package graft.operators

import graft.core.{QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-checkable queries for the join inventory (SURVEY.md §2.3). */
object JoinQueries extends QueryPack {

  private val dec = DecimalType(18, 2)

  override def queries: Map[String, Q] = Map(
    // J1: 3-way equi join, dims broadcast. Revenue per market segment:
    // lineitem ⋈ orders shuffles on orderkey; customer (small side) is
    // broadcast so the second join adds no shuffle.
    "q_j1_3way_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum((col("l_extendedprice").cast(dec) *
            (lit(1.0) - col("l_discount")).cast(dec)).cast(DecimalType(38, 4)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment")
    }),

    // J2: disjunctive OR join — rewritten as union-of-hash-joins + dedup
    // (a raw OR would plan as a nested-loop join). Matches per supplier.
    "q_j2_or_join" -> ((s, dir) => {
      val sup = Tables.supplier(s, dir)
      val cust = Tables.customer(s, dir)
      Joins.orEquiJoin(
          sup, cust,
          Seq(sup("s_nationkey") === cust("c_nationkey"),
              sup("s_acctbal") === cust("c_acctbal")),
          Seq("s_suppkey", "c_custkey"))
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_matches"))
        .orderBy("s_suppkey")
    }),

    // J3: left outer join keeping customers without orders.
    "q_j3_left_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_nationkey")
        .agg(
          countDistinct(col("c_custkey")).as("n_customers"),
          countDistinct(when(col("o_orderkey").isNull, col("c_custkey")))
            .as("n_without_orders"),
          count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_nationkey")
    }),

    // J4: anti-join integrity check. The testdata has full referential
    // integrity, so orphans are synthesized by shrinking the dimension
    // (every 7th customer dropped): orders pointing at a dropped
    // customer are the orphans.
    "q_j4_anti_join" -> ((s, dir) => {
      val dim = Tables.customer(s, dir)
        .filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey").as("o_custkey"))
      Joins.orphans(Tables.orders(s, dir), dim, Seq("o_custkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orphans"),
             countDistinct(col("o_custkey")).as("n_missing_custs"))
        .orderBy("o_orderstatus")
    }),

    // J5: upsert emulation (ON CONFLICT DO UPDATE): every 10th customer
    // gets a deterministic balance bump; result = old ⊎ updates by key.
    "q_j5_upsert" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val updates = c.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      Joins.upsert(c, updates, Seq("c_custkey"))
        .select(col("c_custkey"), col("c_acctbal").as("acctbal"))
        .orderBy("c_custkey")
    }),

    // J6: scalar subquery — global summary + the most common priority
    // (computed as orderBy.limit(1), broadcast-crossed into the 1-row agg).
    "q_j6_scalar_subquery" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val top1 = o.groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("o_orderpriority"))
        .limit(1)
        .select(col("o_orderpriority").as("most_common_priority"))
      val summary = o.agg(count(lit(1)).as("n_orders"))
      Joins.withScalar(summary, top1)
    }),

    // As-of join (training-pipeline extension, no reference analogue):
    // each event picks up the user's most recent order at or before the
    // event date — the point-in-time feature lookup. Right side is
    // deduped to one row per (user, date) first (asofJoin contract).
    "q_j8_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          to_date(col("ts")).as("edate"))
      val ord = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("user_id"),
          to_date(col("o_orderdate")).as("odate"))
        .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("m"))
        .select(col("user_id"), col("odate"),
          col("m.o_orderkey").as("last_orderkey"),
          col("m.o_totalprice").as("last_totalprice"))
      AsOf.asofJoin(ev, ord, Seq("user_id"), "edate", "odate",
          Seq("last_orderkey", "last_totalprice"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(col("last_orderkey")).as("n_matched"),
          sum(col("last_totalprice").cast(dec)).cast("double").as("sum_last_price"),
          max(col("last_orderkey")).as("max_orderkey"))
        .orderBy("event_type")
    }),

    // J12 (extension): forward as-of — each event labeled with the NEXT
    // order at or after it per user (outcome labeling), same
    // union+window single-shuffle shape as q_j8 walked backwards.
    "q_j12_asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          to_date(col("ts")).as("edate"))
      val ord = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("user_id"),
          to_date(col("o_orderdate")).as("odate"))
        .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("m"))
        .select(col("user_id"), col("odate"),
          col("m.o_orderkey").as("next_orderkey"),
          col("m.o_totalprice").as("next_totalprice"))
      AsOf.asofJoinForward(ev, ord, Seq("user_id"), "edate", "odate",
          Seq("next_orderkey", "next_totalprice"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(col("next_orderkey")).as("n_matched"),
          sum(col("next_totalprice").cast(dec)).cast("double")
            .as("sum_next_price"),
          max(col("next_orderkey")).as("max_orderkey"))
        .orderBy("event_type")
    }),

    // J9 (extension): blocked fuzzy join — recover entity links from a
    // deterministically corrupted name column (char 10 replaced) with
    // two selective blocking passes (last-4 / digits 14-17) + exact
    // Levenshtein verify. Never all-pairs: candidates come from one
    // hash equi-join on the blocking keys.
    "q_j9_fuzzy_block" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
      val dirty = cust.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("d_key"),
          concat(substring(col("c_name"), 1, 9), lit("x"),
            substring(col("c_name"), 11, 8)).as("d_name"))
      Joins.blockedFuzzyJoin(dirty, "d_key", "d_name",
          cust, "c_custkey", "c_name", maxDist = 1,
          blockKeys = Seq(k => substring(k, -4, 4), k => substring(k, 14, 4)))
        .select(col("d_key"), col("d_name"), col("c_custkey"), col("c_name"),
          col("dist"))
        .orderBy("d_key", "c_custkey")
    }),

    // J10 (extension): bin-bucketed interval join — orders placed
    // inside each supplier's first-30-days shipping window. The
    // BETWEEN predicate alone would plan a nested loop; binning by the
    // 30-day window width makes it a hash join (plan-asserted).
    "q_j10_interval_join" -> ((s, dir) => {
      val windows = Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey").as("suppkey"))
        .agg(min(unix_date(to_date(col("l_shipdate")))).as("w_start"))
        .withColumn("w_end", col("w_start") + 30)
      val points = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          unix_date(to_date(col("o_orderdate"))).as("o_day"))
      Joins.intervalJoin(points, "o_day", windows, "w_start", "w_end",
          binWidth = 30)
        .groupBy("suppkey")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("suppkey")
    }),

    // J11 (extension): sketch-driven hot/cold differentiated join —
    // MG-detected hot keys take a broadcast path (no shuffle sees
    // them), the cold remainder shuffles normally; the union must be
    // row-identical to the plain join, which is exactly what the
    // oracle's plain join checks.
    "q_j11_hotcold_join" -> ((s, dir) => {
      val fact = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("suppkey"), col("l_quantity"))
      val dim = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      graft.operators.Skew.hotColdJoin(fact, dim, "suppkey", hotCounters = 32)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"))
        .orderBy("s_nationkey")
    }),

    // J7/A8/F21: grouped list collection (sorted for determinism) —
    // parallel arrays of the reference's zip-join presentation shape.
    "q_j7_group_lists" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .withColumn("item", concat_ws(":",
          col("l_partkey"), col("l_quantity").cast("long")))
        .groupBy("l_orderkey")
        // joined to a string: an array column's arrow inner-field name
        // differs between engines ('element' vs 'l') and could trip a
        // strict schema compare
        .agg(array_join(sort_array(collect_list(col("item"))), ",").as("items"),
             count(lit(1)).as("n_items"))
        .orderBy("l_orderkey")
    }),
  )

  override def oracle: Map[String, String] = Map(
    "q_j1_3way_join" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST((CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                 CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_j2_or_join" ->
      """WITH pairs AS (
        |  SELECT DISTINCT s_suppkey, c_custkey
        |  FROM supplier JOIN customer
        |    ON s_nationkey = c_nationkey OR s_acctbal = c_acctbal)
        |SELECT s_suppkey, COUNT(*) AS n_matches
        |FROM pairs GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,

    "q_j3_left_join" ->
      """SELECT c_nationkey,
        |  COUNT(DISTINCT c_custkey) AS n_customers,
        |  COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_without_orders,
        |  COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_j4_anti_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orphans,
        |  COUNT(DISTINCT o_custkey) AS n_missing_custs
        |FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer
        |  WHERE c_custkey = o_custkey AND c_custkey % 7 <> 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_j5_upsert" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_j6_scalar_subquery" ->
      """SELECT COUNT(*) AS n_orders,
        |  (SELECT o_orderpriority FROM orders GROUP BY o_orderpriority
        |   ORDER BY COUNT(*) DESC, o_orderpriority LIMIT 1) AS most_common_priority
        |FROM orders""".stripMargin,

    "q_j8_asof" ->
      """WITH r AS (SELECT o_custkey AS user_id, CAST(o_orderdate AS DATE) AS odate,
        |    MAX(o_orderkey) AS last_orderkey,
        |    arg_max(o_totalprice, o_orderkey) AS last_totalprice
        |  FROM orders GROUP BY 1, 2),
        |l AS (SELECT event_id, user_id, event_type, CAST(ts AS DATE) AS edate
        |  FROM events),
        |j AS (SELECT l.event_type, r.last_orderkey, r.last_totalprice
        |  FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.edate >= r.odate)
        |SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(last_orderkey) AS n_matched,
        |  CAST(SUM(CAST(last_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_last_price,
        |  MAX(last_orderkey) AS max_orderkey
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_j7_group_lists" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_partkey || ':' || CAST(l_quantity AS BIGINT))), ',') AS items,
        |  COUNT(*) AS n_items
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q_j9_fuzzy_block" ->
      """WITH cust AS (SELECT c_custkey, c_name FROM customer),
        |dirty AS (SELECT c_custkey AS d_key,
        |    substr(c_name, 1, 9) || 'x' || substr(c_name, 11, 8) AS d_name
        |  FROM cust WHERE c_custkey % 7 = 0)
        |SELECT d.d_key, d.d_name, c.c_custkey, c.c_name,
        |  CAST(levenshtein(d.d_name, c.c_name) AS INTEGER) AS dist
        |FROM dirty d JOIN cust c
        |  ON (substr(d.d_name, length(d.d_name) - 3, 4) =
        |        substr(c.c_name, length(c.c_name) - 3, 4)
        |      OR substr(d.d_name, 14, 4) = substr(c.c_name, 14, 4))
        |WHERE abs(length(d.d_name) - length(c.c_name)) <= 1
        |  AND levenshtein(d.d_name, c.c_name) <= 1
        |ORDER BY d_key, c_custkey""".stripMargin,

    "q_j12_asof_forward" ->
      """WITH r AS (SELECT o_custkey AS user_id, CAST(o_orderdate AS DATE) AS odate,
        |    MAX(o_orderkey) AS next_orderkey,
        |    arg_max(o_totalprice, o_orderkey) AS next_totalprice
        |  FROM orders GROUP BY 1, 2),
        |l AS (SELECT event_id, user_id, event_type, CAST(ts AS DATE) AS edate
        |  FROM events),
        |j AS (SELECT l.event_type, r.next_orderkey, r.next_totalprice
        |  FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.edate <= r.odate)
        |SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(next_orderkey) AS n_matched,
        |  CAST(SUM(CAST(next_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_next_price,
        |  MAX(next_orderkey) AS max_orderkey
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_j11_hotcold_join" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q_j10_interval_join" ->
      """WITH w AS (SELECT l_suppkey AS suppkey,
        |    MIN(CAST(l_shipdate AS DATE)) AS ws
        |  FROM lineitem GROUP BY 1)
        |SELECT suppkey, COUNT(*) AS n_orders
        |FROM w JOIN orders
        |  ON CAST(o_orderdate AS DATE) >= ws
        | AND CAST(o_orderdate AS DATE) <= ws + INTERVAL 30 DAY
        |GROUP BY suppkey ORDER BY suppkey""".stripMargin,
  )
}

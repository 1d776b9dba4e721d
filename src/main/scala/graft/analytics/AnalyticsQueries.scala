package graft.analytics

import graft.core.{QueryPack, Tables}
import graft.functions.StableMath.gridSnap
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-checkable queries for the aggregation/analytics operator
  * inventory (SURVEY.md §2.4), expressed over the driver's testdata.
  *
  * Float discipline (oracle hash-match): SUM over doubles is cast to
  * DECIMAL(18,2) first — exact, order-independent, bit-identical in
  * Spark and DuckDB — then cast back to DOUBLE. AVG over ints is exact.
  * Ratios/logs are snapped to a 6-dp grid so summation-order ULP noise
  * washes out — via [[graft.functions.StableMath.gridSnap]], not
  * `round`: these are exactly the integer-quotient sites where Spark's
  * decimal-rendering round and DuckDB's binary round disagree on
  * 2^a·5^b-denominator ties (the oracle SQL carries the same FLOOR
  * formula in lockstep).
  */
object AnalyticsQueries extends QueryPack {

  private val dec = DecimalType(18, 2)

  override def queries: Map[String, Q] = Map(
    // A10/q1 flagship: TPC-H Q1-shaped grouped aggregate. Map-side
    // partial agg means the shuffle carries 6 rows, not 600k.
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          gridSnap(avg(length(col("l_returnflag"))), 6).as("avg_flag_len"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // A1: distinct counts through the one-call-site seam
    // (Demographics.distinctCounts) in exact mode — the approx (HLL)
    // mode behind the SAME call is spec-bounded in OperatorsSpec;
    // approx can't hash-match an exact oracle.
    "q_a1_distinct" -> ((s, dir) =>
      Demographics.distinctCounts(Tables.orders(s, dir),
        Seq("o_custkey" -> "n_customers", "o_orderstatus" -> "n_statuses"),
        exact = true, rowCountAlias = "n_orders")),

    // A2: group-size histogram (orders per customer, bucketed).
    "q_a2_histogram" -> ((s, dir) =>
      Demographics.groupSizeHistogram(Tables.orders(s, dir), "o_custkey")),

    // A3/A4/O1: frequency table with deterministic tie-break ordering.
    "q_a3_value_counts" -> ((s, dir) =>
      Demographics.frequencyTable(Tables.events(s, dir), "event_type")),

    // A4/O3: top-k (TakeOrderedAndProject — no global sort at scale).
    "q_a4_topk" -> ((s, dir) =>
      Demographics.topK(Tables.orders(s, dir), "o_orderpriority", 3)),

    // A5: length statistics.
    "q_a5_length_stats" -> ((s, dir) =>
      Demographics.lengthStats(Tables.part(s, dir), "p_name")),

    // A6/P7: regex predicate counts, one scan for all patterns.
    "q_a6_pattern_counts" -> ((s, dir) =>
      Demographics.patternCounts(Tables.documents(s, dir), Seq(
        "has_spark" -> col("text").rlike("spark"),
        "has_digit" -> col("text").rlike("[0-9]"),
        "has_join_word" -> col("text").rlike("\\bjoin\\b"),
        "long_text" -> (length(col("text")) > 70)))),

    // A7: null/completeness profile.
    "q_a7_profile" -> ((s, dir) =>
      Demographics.completenessProfile(
        Tables.customer(s, dir),
        Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))),

    // A9: conditional DISTINCT counts in one grouped pass (Expand-based).
    "q_a9_cond_distinct" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(when(col("o_totalprice") > 1000, col("o_custkey")))
            .as("n_cust_big"),
          countDistinct(when(col("o_orderpriority") === "1-URGENT", col("o_custkey")))
            .as("n_cust_urgent"))
        .orderBy("o_orderstatus")
    }),

    // A10: global summary aggregates (counts + exact ratio).
    "q_a10_summary" -> ((s, dir) => {
      Tables.orders(s, dir).agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        gridSnap(count(lit(1)).cast("double") / countDistinct(col("o_custkey")), 6)
          .as("avg_orders_per_customer"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("total_value"))
    }),

    // A11: Shannon entropy (diversity index).
    "q_a11_entropy" -> ((s, dir) =>
      Demographics.shannonEntropy(Tables.customer(s, dir), "c_mktsegment")),

    // A11 via the custom single-pass Aggregator (graft.functions.
    // EntropyAggregator) — same oracle as the two-stage form proves the
    // UDAF agrees with SQL semantics bit-for-bit at 6 dp.
    "q_a11_entropy_onepass" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .select(col("c_mktsegment").as("v")).as[String]
        .agg(graft.functions.EntropyAggregator.entropyOf(col("v")).as("raw"))
        .select(gridSnap(col("raw"), 6).as("entropy"))
    }),

    // A12: Gini–Simpson index.
    "q_a12_gini" -> ((s, dir) =>
      Demographics.giniSimpson(Tables.customer(s, dir), "c_mktsegment")),

    // A26 (extension): mutual information between segment and nation
    // — the dependence audit marginal entropy/Gini can't see ("is
    // this attribute leaking that one?"). Exact-integer log terms,
    // one division at the end.
    "q_a26_mutual_info" -> ((s, dir) =>
      Demographics.mutualInformation(Tables.customer(s, dir),
        "c_mktsegment", "c_nationkey")),

    // A13/F4/F5: token mining — explode + count + top-k.
    "q_a13_tokens" -> ((s, dir) =>
      Demographics.tokenTopK(Tables.documents(s, dir), "text", 20)),

    // A14: Pearson correlation (the dashboard's correlation-matrix
    // query) per group. Rounded at 4 dp: corr is a ratio of large
    // accumulations, so it carries more float noise than plain sums.
    "q_a14_corr" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(gridSnap(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("qty_price_corr"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // A15: pipeline-health-style aggregates over a time axis: per-day
    // event counts, error counts, exact-decimal value sums, error rate.
    "q_a15_health" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
          sum(col("value").cast(dec)).cast("double").as("total_value"),
          gridSnap(avg(when(col("event_type") === "error", 1.0).otherwise(0.0)), 6)
            .as("error_rate"))
        .orderBy("day")
    }),
  )

  override def oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  FLOOR(AVG(LENGTH(l_returnflag)) * 1000000 + 0.5) / 1000000 AS avg_flag_len,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_a1_distinct" ->
      """SELECT COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(DISTINCT o_orderstatus) AS n_statuses,
        |  COUNT(*) AS n_orders FROM orders""".stripMargin,

    "q_a2_histogram" ->
      """WITH g AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey)
        |SELECT COUNT(*) AS n_groups,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS size_1,
        |  CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS size_2,
        |  CAST(SUM(CASE WHEN n = 3 THEN 1 ELSE 0 END) AS BIGINT) AS size_3,
        |  CAST(SUM(CASE WHEN n = 4 THEN 1 ELSE 0 END) AS BIGINT) AS size_4,
        |  CAST(SUM(CASE WHEN n >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS size_5_plus,
        |  MAX(n) AS max_size
        |FROM g""".stripMargin,

    "q_a3_value_counts" ->
      """SELECT event_type, COUNT(*) AS cnt FROM events
        |WHERE event_type IS NOT NULL
        |GROUP BY event_type ORDER BY cnt DESC, event_type""".stripMargin,

    "q_a4_topk" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
        |WHERE o_orderpriority IS NOT NULL
        |GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority LIMIT 3""".stripMargin,

    "q_a5_length_stats" ->
      """SELECT FLOOR(AVG(LENGTH(p_name)) * 1000000 + 0.5) / 1000000 AS avg_len,
        |  CAST(MIN(LENGTH(p_name)) AS INTEGER) AS min_len, CAST(MAX(LENGTH(p_name)) AS INTEGER) AS max_len,
        |  COUNT(*) AS n
        |FROM part WHERE p_name IS NOT NULL""".stripMargin,

    "q_a6_pattern_counts" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN regexp_matches(text, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS has_spark,
        |  CAST(SUM(CASE WHEN regexp_matches(text, '[0-9]') THEN 1 ELSE 0 END) AS BIGINT) AS has_digit,
        |  CAST(SUM(CASE WHEN regexp_matches(text, '\bjoin\b') THEN 1 ELSE 0 END) AS BIGINT) AS has_join_word,
        |  CAST(SUM(CASE WHEN LENGTH(text) > 70 THEN 1 ELSE 0 END) AS BIGINT) AS long_text
        |FROM documents""".stripMargin,

    "q_a7_profile" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_name_nulls,
        |  FLOOR(AVG(CASE WHEN c_name IS NULL THEN 0.0 ELSE 1.0 END) * 100 * 10000 + 0.5) / 10000 AS c_name_completeness_pct,
        |  CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nationkey_nulls,
        |  FLOOR(AVG(CASE WHEN c_nationkey IS NULL THEN 0.0 ELSE 1.0 END) * 100 * 10000 + 0.5) / 10000 AS c_nationkey_completeness_pct,
        |  CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_acctbal_nulls,
        |  FLOOR(AVG(CASE WHEN c_acctbal IS NULL THEN 0.0 ELSE 1.0 END) * 100 * 10000 + 0.5) / 10000 AS c_acctbal_completeness_pct,
        |  CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_mktsegment_nulls,
        |  FLOOR(AVG(CASE WHEN c_mktsegment IS NULL THEN 0.0 ELSE 1.0 END) * 100 * 10000 + 0.5) / 10000 AS c_mktsegment_completeness_pct
        |FROM customer""".stripMargin,

    "q_a9_cond_distinct" ->
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(DISTINCT CASE WHEN o_totalprice > 1000 THEN o_custkey END) AS n_cust_big,
        |  COUNT(DISTINCT CASE WHEN o_orderpriority = '1-URGENT' THEN o_custkey END) AS n_cust_urgent
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_a10_summary" ->
      """SELECT COUNT(*) AS n_orders,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  FLOOR(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT o_custkey) * 1000000 + 0.5) / 1000000 AS avg_orders_per_customer,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM orders""".stripMargin,

    "q_a11_entropy" ->
      """WITH g AS (SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
        |           WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment)
        |SELECT FLOOR((LOG2(SUM(cnt)) - SUM(cnt * LOG2(cnt)) / SUM(cnt)) * 1000000 + 0.5) / 1000000 AS entropy,
        |  CAST(SUM(cnt) AS BIGINT) AS n
        |FROM g""".stripMargin,

    "q_a11_entropy_onepass" ->
      """WITH g AS (SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
        |           WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment)
        |SELECT FLOOR((LOG2(SUM(cnt)) - SUM(cnt * LOG2(cnt)) / SUM(cnt)) * 1000000 + 0.5) / 1000000 AS entropy
        |FROM g""".stripMargin,

    // Joint/marginal integer counts, per-cell DECIMAL-cast log terms,
    // one division + round at the end (the entropy discipline in 2-D).
    "q_a26_mutual_info" ->
      """WITH j AS (SELECT c_mktsegment AS x, c_nationkey AS y, COUNT(*) AS c
        |  FROM customer
        |  WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL
        |  GROUP BY 1, 2),
        |nn AS (SELECT SUM(c) AS n FROM j),
        |mx AS (SELECT x, SUM(c) AS cx FROM j GROUP BY 1),
        |my AS (SELECT y, SUM(c) AS cy FROM j GROUP BY 1)
        |SELECT FLOOR(CAST(SUM(CAST(CAST(j.c AS DOUBLE) *
        |      (LOG2(j.c) + LOG2(nn.n) - LOG2(mx.cx) - LOG2(my.cy))
        |    AS DECIMAL(38,16))) AS DOUBLE) / ANY_VALUE(nn.n)
        |    * 1000000 + 0.5) / 1000000 AS mi_bits,
        |  CAST(ANY_VALUE(nn.n) AS BIGINT) AS n
        |FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN nn""".stripMargin,

    "q_a12_gini" ->
      """WITH g AS (SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
        |           WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment)
        |SELECT FLOOR((1.0 - CAST(SUM(cnt * cnt) AS DOUBLE) / (SUM(cnt) * SUM(cnt))) * 1000000 + 0.5) / 1000000 AS gini_simpson,
        |  CAST(SUM(cnt) AS BIGINT) AS n
        |FROM g""".stripMargin,

    "q_a13_tokens" ->
      """SELECT word, COUNT(*) AS cnt FROM (
        |  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
        |WHERE regexp_full_match(word, '[a-zA-Z]{3,}')
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin,

    "q_a14_corr" ->
      """SELECT l_returnflag,
        |  FLOOR(corr(l_quantity, l_extendedprice) * 10000 + 0.5) / 10000 AS qty_price_corr,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_a15_health" ->
      """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  FLOOR(AVG(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS error_rate
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}

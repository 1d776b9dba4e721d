package graft.operators

import graft.core.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-checkable queries for the window-function inventory
  * (SURVEY.md §2.5).
  *
  * Scale notes: W1/W2/W3/W6 windows partition on a key — they shuffle
  * once on that key and scale linearly. W4/W5/W10 are windows over an
  * already-aggregated frame (a few rows), where a single-partition global
  * window is fine; the raw-data global-window variant is deliberately
  * avoided (SURVEY §4's "one true hotspot") in favor of orderBy.limit or
  * aggregate-then-window. W8's frame is one row per CUSTOMER — unbounded
  * — so it goes through the two-phase [[Ranking.globalNtile]], never a
  * single-partition sort.
  */
object WindowQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // W1: partitioned count broadcast back to rows ("Has Multiple
    // Owners", `ingestion_pipeline.py:104`), rolled up for compactness.
    "q_w1_partition_count_flag" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
      Tables.orders(s, dir)
        .withColumn("has_multiple", count(lit(1)).over(w) > 1)
        .groupBy("has_multiple")
        .agg(count(lit(1)).as("n_orders"),
             countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy("has_multiple")
    }),

    // W2: row_number ranking within partition — first order per customer
    // (`etl/pipeline.py:389` is_primary_owner). Tie-broken on orderkey.
    "q_w2_rank_in_partition" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
                to_date(col("o_orderdate")).as("first_orderdate"))
        .orderBy("o_custkey")
    }),

    // W3: partitioned count == 1 uniqueness flag
    // (`etl/pipeline.py:464` is_unique_name).
    "q_w3_uniqueness_flag" -> ((s, dir) => {
      val w = Window.partitionBy("o_totalprice")
      Tables.orders(s, dir)
        .withColumn("is_unique_price", count(lit(1)).over(w) === 1)
        .agg(sum(when(col("is_unique_price"), 1L).otherwise(0L)).as("n_unique"),
             sum(when(!col("is_unique_price"), 1L).otherwise(0L)).as("n_dup"))
    }),

    // W4: global ranking over an AGGREGATE (few rows — the safe place
    // for a single-partition window; `etl/pipeline.py:465`).
    "q_w4_global_rank" -> ((s, dir) => {
      val counts = Tables.orders(s, dir)
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      counts
        .withColumn("rank",
          row_number().over(Window.orderBy(desc("cnt"), asc("o_orderpriority"))))
        .orderBy("rank")
    }),

    // W5: percent-of-total via unbounded window over the aggregate
    // (`etl/pipeline.py:542`).
    "q_w5_pct_of_total" -> ((s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      counts
        .withColumn("pct",
          graft.functions.StableMath.gridSnap(
            col("cnt") * 100.0 / sum(col("cnt")).over(Window.partitionBy()), 6))
        .orderBy("event_type")
    }),

    // W6: per-group scalar transforms (complexity/diversity,
    // `streaming_processor.py:522-532`) — window aggregates incl.
    // distinct-over-window via collect_set, then one row per group.
    "q_w6_group_transform" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
      Tables.orders(s, dir)
        .withColumn("complexity",
          graft.functions.StableMath.gridSnap(
            least(count(lit(1)).over(w) * 0.5 +
              avg(length(col("o_orderpriority"))).over(w) * 0.1, lit(10.0)), 6))
        .withColumn("diversity",
          graft.functions.StableMath.gridSnap(
            size(collect_set(col("o_orderstatus")).over(w)).cast("double") /
              count(lit(1)).over(w) * 10.0, 6))
        .select("o_custkey", "complexity", "diversity")
        .dropDuplicates("o_custkey")
        .orderBy("o_custkey")
    }),

    // W7 (engine extension — the reference uses only default frames):
    // lead/lag — days between consecutive orders per customer, rolled up
    // into a histogram of gap buckets.
    "q_w7_lag_delta" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev_date").isNotNull)
        .withColumn("gap_days",
          datediff(to_date(col("o_orderdate")), to_date(col("prev_date"))))
        .groupBy((floor(col("gap_days") / 30) * 30).as("gap_bucket_days"))
        .agg(count(lit(1)).as("n_gaps"))
        .orderBy("gap_bucket_days")
    }),

    // W8: ntile — spend quartiles over per-customer totals. The
    // per-customer frame is UNBOUNDED (billions of customers at the
    // design point), so a plain ntile(4).over(Window.orderBy(...))
    // would funnel it through one partition. Ranking.globalNtile keeps
    // every stage distributed (range partition + local rank + NTILE
    // bucket formula) and is bit-identical to ntile — the oracle's
    // NTILE(4) hash-matches it.
    "q_w8_ntile" -> ((s, dir) => {
      val totals = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("spend"))
      Ranking.globalNtile(totals, Seq(desc("spend"), asc("o_custkey")), 4, "quartile")
        .groupBy("quartile")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("spend")).cast("double").as("total_spend"))
        .orderBy("quartile")
    }),

    // W10: percent_rank / cume_dist — relative standing within an
    // ordering, over the aggregated per-priority frame (W4/W5 rule:
    // global windows only on already-aggregated few-row inputs).
    "q_w10_percent_rank" -> ((s, dir) => {
      val counts = Tables.orders(s, dir)
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(asc("cnt"), asc("o_orderpriority"))
      counts
        .withColumn("pct_rank", graft.functions.StableMath.gridSnap(percent_rank().over(w), 6))
        .withColumn("cume", graft.functions.StableMath.gridSnap(cume_dist().over(w), 6))
        .orderBy("o_orderpriority")
    }),

    // SCD2: rebuild a type-2 dimension history from the order log —
    // per customer, the priority attribute's change intervals with
    // valid_from/valid_to/is_current. One shuffle on the key; both
    // windows (change-detect lag, interval-close lead) reuse it.
    "q_scd2" -> ((s, dir) =>
      graft.warehouse.Scd.buildType2(Tables.orders(s, dir),
          keys = Seq("o_custkey"), attrs = Seq("o_orderpriority"),
          tsCol = "o_orderdate", seqCol = "o_orderkey")
        .orderBy("o_custkey", "valid_from")),

    // W11: top-k per group WITHOUT a window sort — the k-bounded
    // TopKAggregator reduces each partition to <=k rows per group
    // map-side, so the shuffle carries O(groups*k) rows and no group is
    // ever fully sorted (the window row_number form sorts every row of
    // every group; a hot key at 100 TB makes that a straggler). Output
    // = the W2-family shape: (group, rank, id, value).
    "q_w11_group_topk" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(graft.functions.TopKAggregator
          .topK(3, col("o_totalprice"), col("o_orderkey")).as("_top"))
        .select(col("o_orderpriority"),
          posexplode(col("_top")).as(Seq("_pos", "_e")))
        .select(col("o_orderpriority"),
          (col("_pos") + 1).cast("int").as("rk"),
          col("_e.id").as("o_orderkey"),
          col("_e.value").as("o_totalprice"))
        .orderBy("o_orderpriority", "rk")),

    // W9: explicit ROWS frame — 3-event moving average of value per
    // user, summarized as the max smoothed value per user.
    // W12 (extension): per-key daily gap fill + forward fill — sparse
    // per-user daily sums densified over each user's own date span,
    // summarized per user (span length, observed days, exact
    // DECIMAL-summed carried mass).
    "q_w12_gapfill" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"),
          col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
            .as("v"))
        .groupBy("user_id", "d").agg(sum(col("v")).as("day_value"))
      TimeSeries.gapFillDaily(daily, "user_id", "d", "day_value")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("is_observed"), 1L).otherwise(0L)).as("n_observed"),
          sum(col("value_ff")).cast("double").as("sum_ff"))
        .orderBy("user_id")
    }),

    // W13 (extension): rolling 7-day distinct users per observed day —
    // per-day distinct first, then the bin-explode trick; no range
    // self-join, no per-day rescans.
    "q_w13_rolling_dau" -> ((s, dir) =>
      TimeSeries.rollingDistinct(Tables.events(s, dir), "ts", "user_id",
          windowDays = 7)
        .withColumnRenamed("ts_window_end", "win_day")
        .orderBy("win_day")),

    // W14 (extension): recursive EWMA smoothing — the bounded HOF fold
    // replays the recursion with identical op order in both engines;
    // per user, the LAST smoothed level (depends on the final
    // 10-value fold exactly).
    "q_w14_ewma" -> ((s, dir) => {
      val sm = graft.operators.TimeSeries.ewma(Tables.events(s, dir),
        "user_id", Seq("ts", "event_id"), "value", alpha = 0.2, lookback = 10)
      val w2 = Window.partitionBy("user_id")
        .orderBy(desc("ts"), desc("event_id"))
      sm.withColumn("_rn", row_number().over(w2))
        .where(col("_rn") === 1)
        .select(col("user_id"), col("ewma").as("last_ewma"))
        .orderBy("user_id")
    }),

    "q_w9_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("mavg",
          avg(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .over(w))
        .groupBy("user_id")
        .agg(graft.functions.StableMath.gridSnap(max(col("mavg")).cast("double"), 6).as("max_mavg"))
        .orderBy("user_id")
    }),
  )

  override def oracle: Map[String, String] = Map(
    "q_w12_gapfill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS day_value
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1),
        |spine AS (SELECT user_id,
        |    CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
        |      CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM b),
        |j AS (SELECT s.user_id, s.d, daily.day_value
        |  FROM spine s LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d),
        |ff AS (SELECT user_id, d, day_value IS NOT NULL AS obs,
        |    LAST_VALUE(day_value IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vff
        |  FROM j)
        |SELECT user_id, COUNT(*) AS n_days,
        |  CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS n_observed,
        |  CAST(SUM(vff) AS DOUBLE) AS sum_ff
        |FROM ff GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_w13_rolling_dau" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT d.day AS win_day, COUNT(DISTINCT du.user_id) AS n_distinct
        |FROM days d JOIN du
        |  ON du.day >= d.day - INTERVAL 6 DAY AND du.day <= d.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_w7_lag_delta" ->
      """WITH d AS (SELECT o_custkey, o_orderdate,
        |    LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev_date
        |  FROM orders)
        |SELECT CAST(FLOOR((CAST(o_orderdate AS DATE) - CAST(prev_date AS DATE)) / 30) * 30 AS BIGINT) AS gap_bucket_days,
        |  COUNT(*) AS n_gaps
        |FROM d WHERE prev_date IS NOT NULL
        |GROUP BY gap_bucket_days ORDER BY gap_bucket_days""".stripMargin,

    "q_w8_ntile" ->
      """WITH t AS (SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY o_custkey),
        |q AS (SELECT o_custkey, spend,
        |    CAST(NTILE(4) OVER (ORDER BY spend DESC, o_custkey) AS INTEGER) AS quartile FROM t)
        |SELECT quartile, COUNT(*) AS n_customers,
        |  CAST(SUM(spend) AS DOUBLE) AS total_spend
        |FROM q GROUP BY quartile ORDER BY quartile""".stripMargin,

    "q_w10_percent_rank" ->
      """WITH c AS (SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY 1)
        |SELECT o_orderpriority, cnt,
        |  FLOOR(PERCENT_RANK() OVER (ORDER BY cnt, o_orderpriority) * 1000000 + 0.5) / 1000000 AS pct_rank,
        |  FLOOR(CUME_DIST() OVER (ORDER BY cnt, o_orderpriority) * 1000000 + 0.5) / 1000000 AS cume
        |FROM c ORDER BY o_orderpriority""".stripMargin,

    "q_scd2" ->
      """WITH snap AS (SELECT o_custkey, o_orderdate,
        |    arg_max(o_orderpriority, o_orderkey) AS o_orderpriority
        |  FROM orders GROUP BY 1, 2),
        |s AS (SELECT *, LAG(o_orderpriority) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate) AS prev FROM snap),
        |c AS (SELECT o_custkey, o_orderpriority, o_orderdate FROM s
        |  WHERE prev IS NULL OR prev <> o_orderpriority),
        |v AS (SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
        |    LEAD(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate) AS valid_to FROM c)
        |SELECT o_custkey, o_orderpriority, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM v ORDER BY o_custkey, valid_from""".stripMargin,

    "q_w11_group_topk" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
        |  FROM orders)
        |SELECT o_orderpriority, rk, o_orderkey, o_totalprice
        |FROM r WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,

    // list() over the same ordered frame, list_reduce folds left with
    // the first element as seed — the exact aggregate() replay.
    "q_w14_ewma" ->
      """WITH l AS (SELECT user_id, ts, event_id,
        |    list(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS w
        |  FROM events),
        |e AS (SELECT user_id, ts, event_id,
        |    FLOOR(list_reduce(w, (acc, x) -> acc * 0.8 + x * 0.2) * 1000000 + 0.5) / 1000000 AS ewma
        |  FROM l),
        |r AS (SELECT user_id, ewma, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, ewma AS last_ewma FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q_w9_moving_avg" ->
      """WITH m AS (SELECT user_id,
        |    AVG(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mavg
        |  FROM events)
        |SELECT user_id, FLOOR(CAST(MAX(mavg) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS max_mavg
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_w1_partition_count_flag" ->
      """WITH f AS (SELECT o_custkey,
        |    COUNT(*) OVER (PARTITION BY o_custkey) > 1 AS has_multiple
        |  FROM orders)
        |SELECT has_multiple, COUNT(*) AS n_orders,
        |  COUNT(DISTINCT o_custkey) AS n_customers
        |FROM f GROUP BY has_multiple ORDER BY has_multiple""".stripMargin,

    "q_w2_rank_in_partition" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey AS first_orderkey,
        |  CAST(o_orderdate AS DATE) AS first_orderdate
        |FROM r WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q_w3_uniqueness_flag" ->
      """WITH f AS (SELECT COUNT(*) OVER (PARTITION BY o_totalprice) = 1 AS u
        |  FROM orders)
        |SELECT CAST(SUM(CASE WHEN u THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  CAST(SUM(CASE WHEN NOT u THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |FROM f""".stripMargin,

    "q_w4_global_rank" ->
      """WITH c AS (SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
        |  GROUP BY o_orderpriority)
        |SELECT o_orderpriority, cnt,
        |  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, o_orderpriority) AS INTEGER) AS rank
        |FROM c ORDER BY rank""".stripMargin,

    "q_w5_pct_of_total" ->
      """WITH c AS (SELECT event_type, COUNT(*) AS cnt FROM events
        |  GROUP BY event_type)
        |SELECT event_type, cnt,
        |  FLOOR(CAST(cnt AS DOUBLE) * 100.0 / CAST(SUM(cnt) OVER () AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS pct
        |FROM c ORDER BY event_type""".stripMargin,

    "q_w6_group_transform" ->
      """SELECT o_custkey,
        |  FLOOR(LEAST(CAST(COUNT(*) AS DOUBLE) * 0.5 + AVG(LENGTH(o_orderpriority)) * 0.1, 10.0)
        |    * 1000000 + 0.5) / 1000000 AS complexity,
        |  FLOOR(CAST(COUNT(DISTINCT o_orderstatus) AS DOUBLE) / COUNT(*) * 10.0
        |    * 1000000 + 0.5) / 1000000 AS diversity
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
  )
}

package graft.operators

import graft.core.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-checkable queries for the window-function inventory
  * (SURVEY.md §2.5).
  *
  * Scale notes: W1/W2/W3/W6 windows partition on a key — they shuffle
  * once on that key and scale linearly. W4/W5 are windows over an
  * already-aggregated frame (a few rows), where a single-partition global
  * window is fine; the raw-data global-window variant is deliberately
  * avoided (SURVEY §4's "one true hotspot") in favor of orderBy.limit or
  * aggregate-then-window.
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
          round(col("cnt") * 100.0 / sum(col("cnt")).over(Window.partitionBy()), 6))
        .orderBy("event_type")
    }),

    // W6: per-group scalar transforms (complexity/diversity,
    // `streaming_processor.py:522-532`) — window aggregates incl.
    // distinct-over-window via collect_set, then one row per group.
    "q_w6_group_transform" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
      Tables.orders(s, dir)
        .withColumn("complexity",
          round(least(count(lit(1)).over(w) * 0.5 +
            avg(length(col("o_orderpriority"))).over(w) * 0.1, lit(10.0)), 6))
        .withColumn("diversity",
          round(size(collect_set(col("o_orderstatus")).over(w)).cast("double") /
            count(lit(1)).over(w) * 10.0, 6))
        .select("o_custkey", "complexity", "diversity")
        .dropDuplicates("o_custkey")
        .orderBy("o_custkey")
    }),
  )

  override def oracle: Map[String, String] = Map(
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
        |  ROUND(CAST(cnt AS DOUBLE) * 100.0 / CAST(SUM(cnt) OVER () AS DOUBLE), 6) AS pct
        |FROM c ORDER BY event_type""".stripMargin,

    "q_w6_group_transform" ->
      """SELECT o_custkey,
        |  ROUND(LEAST(CAST(COUNT(*) AS DOUBLE) * 0.5 + AVG(LENGTH(o_orderpriority)) * 0.1, 10.0), 6) AS complexity,
        |  ROUND(CAST(COUNT(DISTINCT o_orderstatus) AS DOUBLE) / COUNT(*) * 10.0, 6) AS diversity
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
  )
}

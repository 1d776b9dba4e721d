package graft.warehouse

import graft.core.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable queries for the warehouse aggregate tables
  * (`etl/pipeline.py:479-531` — `agg_daily_business` and
  * `agg_daily_owners`), exercising the REAL StarSchema builder chain
  * end-to-end: staging → dims → fact (disjunctive owner match, role
  * fallback) → metrics → daily aggregates.
  *
  * The staging frame maps the orders table onto the reference's
  * cleaned-ownership shape deterministically: each order is an
  * ownership record of business `o_custkey`; owners are a recurring
  * pool keyed by `o_orderkey % 97` — even order keys are INDIVIDUAL
  * owners, odd keys CORPORATE ("… HOLDINGS"); the order priority maps
  * onto seeded role titles, with the lowest priority deliberately
  * mapping to an UNSEEDED title to exercise the OTHER-category
  * fallback. The DuckDB oracles replay the same chain — owner identity
  * as the (full_name, entity) pair where Spark uses its xxhash64
  * surrogate, which is count-equivalent (the surrogate is injective on
  * the pair).
  */
object WarehouseQueries extends QueryPack {

  /** Orders → the cleaned staging schema the ETL consumes. `pred`
    * restricts the orders feeding a run — the multi-day query uses it
    * to give each simulated day its own staging slice.
    */
  private def staging(s: SparkSession, dir: String,
                      pred: Column = lit(true)): DataFrame = {
    val ind = col("o_orderkey") % 2 === 0
    val who = concat(lit("OWNER "), (col("o_orderkey") % 97).cast("string"))
    Tables.orders(s, dir).where(pred).select(
      col("o_custkey").as("Account Number"),
      concat(lit("BUSINESS "), col("o_custkey").cast("string")).as("Legal Name"),
      when(ind, who).as("Owner Full Name"),
      when(ind, lit("O")).as("Owner First Name"),
      when(ind, who).as("Owner Last Name"),
      when(!ind, concat(who, lit(" HOLDINGS"))).as("Legal Entity Owner"),
      ind.as("Is Individual Owner"),
      when(col("o_orderpriority") === "1-URGENT", "CEO")
        .when(col("o_orderpriority") === "2-HIGH", "MANAGER")
        .when(col("o_orderpriority") === "3-MEDIUM", "OWNER")
        .when(col("o_orderpriority") === "4-NOT SPECIFIED", "MEMBER")
        .otherwise("WIZARD").as("Title"))
  }

  override def queries: Map[String, Q] = Map(
    // agg_daily_business through the full builder chain; "new" business
    // stand-in for the reference's created_at::date test: first order
    // falls in 1998 (the staging has no creation timestamp).
    "q_agg_daily_business" -> ((s, dir) => {
      val st = staging(s, dir)
      val dimB = StarSchema.dimBusiness(st)
      val dimO = StarSchema.dimOwner(st)
      val fact = StarSchema.factOwnership(st, dimB, dimO, StarSchema.dimRole(s))
      val metrics = StarSchema.factBusinessMetrics(fact)
      val created = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("account_number"))
        .agg(min(to_date(col("o_orderdate"))).as("_created"))
      StarSchema.aggDailyBusiness(dimB.join(created, "account_number"),
        metrics, "2024-06-01", isNew = year(col("_created")) === 1998)
    }),

    // agg_daily_owners through the same chain (shared staging and fact
    // subplans dedup via exchange reuse when run together).
    "q_agg_daily_owners" -> ((s, dir) => {
      val st = staging(s, dir)
      val dimB = StarSchema.dimBusiness(st)
      val dimO = StarSchema.dimOwner(st)
      val fact = StarSchema.factOwnership(st, dimB, dimO, StarSchema.dimRole(s))
      StarSchema.aggDailyOwners(dimO, fact, StarSchema.dimRole(s), "2024-06-01")
    }),

    // Multi-day accumulation — the reference's daily ON CONFLICT
    // upsert into agg_daily_business replayed over three simulated
    // days (orders sliced by o_orderkey % 3). Day 2 is first loaded
    // STALE (half its slice) and later re-run corrected: the J5
    // upsert fold must REPLACE the stale row, not append — the final
    // table holds exactly one row per date, day 2's from the re-run.
    "q_agg_daily_multiday" -> ((s, dir) => {
      def dayAgg(pred: Column, dateId: String): DataFrame = {
        val st = staging(s, dir, pred)
        val dimB = StarSchema.dimBusiness(st)
        val dimO = StarSchema.dimOwner(st)
        val fact = StarSchema.factOwnership(st, dimB, dimO, StarSchema.dimRole(s))
        StarSchema.aggDailyBusiness(dimB,
          StarSchema.factBusinessMetrics(fact), dateId)
      }
      StarSchema.accumulateDaily(Seq(
        dayAgg(col("o_orderkey") % 3 === 0, "2024-06-01"),
        dayAgg(col("o_orderkey") % 3 === 1 && col("o_orderkey") % 2 === 0,
          "2024-06-02"), // stale half-load, later replaced
        dayAgg(col("o_orderkey") % 3 === 2, "2024-06-03"),
        dayAgg(col("o_orderkey") % 3 === 1, "2024-06-02"), // corrected re-run
      )).orderBy("date_id")
    }),
  )

  // Shared oracle CTEs: the staging projection, and the fact as the
  // distinct (account, owner, title) relation — the disjunctive owner
  // match collapses to identity here because each staged row carries
  // exactly one of (full_name | entity), which IS its matched owner.
  private val stageCte =
    """stage AS (SELECT o_custkey AS acct,
      |    CASE WHEN o_orderkey % 2 = 0
      |      THEN 'OWNER ' || CAST(o_orderkey % 97 AS VARCHAR) END AS full_name,
      |    CASE WHEN o_orderkey % 2 = 1
      |      THEN 'OWNER ' || CAST(o_orderkey % 97 AS VARCHAR) || ' HOLDINGS' END AS entity,
      |    CASE o_orderpriority WHEN '1-URGENT' THEN 'CEO'
      |      WHEN '2-HIGH' THEN 'MANAGER' WHEN '3-MEDIUM' THEN 'OWNER'
      |      WHEN '4-NOT SPECIFIED' THEN 'MEMBER' ELSE 'WIZARD' END AS title
      |  FROM orders),
      |fact AS (SELECT DISTINCT acct, title,
      |    coalesce(full_name, '') || '|' || coalesce(entity, '') AS owner_key
      |  FROM stage)""".stripMargin

  /** One simulated day's agg_daily_business replay: staging slice →
    * per-account distinct-owner metrics → the one-row daily aggregate.
    * The stale day-2 half-load needs no CTE — the upsert fold replaces
    * it, so only each date's LAST run reaches the accumulated table.
    */
  private def dayBizCtes(i: Int, pred: String): String =
    s"""stage$i AS (SELECT o_custkey AS acct,
       |    CASE WHEN o_orderkey % 2 = 0
       |      THEN 'OWNER ' || CAST(o_orderkey % 97 AS VARCHAR) END AS full_name,
       |    CASE WHEN o_orderkey % 2 = 1
       |      THEN 'OWNER ' || CAST(o_orderkey % 97 AS VARCHAR) || ' HOLDINGS' END AS entity
       |  FROM orders WHERE $pred),
       |m$i AS (SELECT acct, COUNT(DISTINCT
       |      coalesce(full_name, '') || '|' || coalesce(entity, '')) AS total_owners
       |  FROM stage$i GROUP BY acct)""".stripMargin

  private def dayBizSelect(i: Int, dateId: String): String =
    s"""SELECT CAST('$dateId' AS DATE) AS date_id,
       |  COUNT(DISTINCT m.acct) AS total_businesses,
       |  CAST(0 AS BIGINT) AS new_businesses,
       |  COUNT(DISTINCT CASE WHEN m.total_owners > 1 THEN m.acct END) AS multi_owner_businesses,
       |  COUNT(DISTINCT CASE WHEN m.total_owners = 1 THEN m.acct END) AS single_owner_businesses,
       |  ROUND(CAST(SUM(m.total_owners) AS DOUBLE) / COUNT(m.total_owners), 2) AS avg_owners_per_business
       |FROM m$i m""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q_agg_daily_business" ->
      s"""WITH $stageCte,
         |m AS (SELECT acct, COUNT(DISTINCT owner_key) AS total_owners
         |  FROM fact GROUP BY acct),
         |c AS (SELECT o_custkey AS acct,
         |    year(MIN(CAST(o_orderdate AS DATE))) = 1998 AS is_new
         |  FROM orders GROUP BY 1)
         |SELECT CAST('2024-06-01' AS DATE) AS date_id,
         |  COUNT(DISTINCT b.acct) AS total_businesses,
         |  COUNT(DISTINCT CASE WHEN c.is_new THEN b.acct END) AS new_businesses,
         |  COUNT(DISTINCT CASE WHEN m.total_owners > 1 THEN b.acct END) AS multi_owner_businesses,
         |  COUNT(DISTINCT CASE WHEN m.total_owners = 1 THEN b.acct END) AS single_owner_businesses,
         |  ROUND(CAST(SUM(m.total_owners) AS DOUBLE) / COUNT(m.total_owners), 2) AS avg_owners_per_business
         |FROM (SELECT DISTINCT acct FROM stage) b
         |LEFT JOIN m ON b.acct = m.acct
         |JOIN c ON b.acct = c.acct""".stripMargin,

    "q_agg_daily_owners" ->
      s"""WITH $stageCte,
         |owners AS (SELECT DISTINCT full_name, entity,
         |    (full_name IS NOT NULL) AS is_ind,
         |    coalesce(full_name, '') || '|' || coalesce(entity, '') AS owner_key
         |  FROM stage),
         |cur AS (SELECT DISTINCT owner_key FROM fact),
         |top AS (SELECT title FROM fact
         |  WHERE title IN ('CEO','PRESIDENT','MANAGING MEMBER','MANAGER',
         |    'DIRECTOR','OWNER','SHAREHOLDER','PARTNER','MEMBER','OTHER')
         |  GROUP BY title ORDER BY COUNT(*) DESC, title LIMIT 1)
         |SELECT CAST('2024-06-01' AS DATE) AS date_id,
         |  COUNT(DISTINCT o.owner_key) AS total_owners,
         |  COUNT(DISTINCT CASE WHEN o.is_ind THEN o.owner_key END) AS individual_owners,
         |  COUNT(DISTINCT CASE WHEN NOT o.is_ind THEN o.owner_key END) AS corporate_owners,
         |  COUNT(DISTINCT o.full_name) AS unique_owners,
         |  (SELECT title FROM top) AS most_common_role
         |FROM owners o JOIN cur ON o.owner_key = cur.owner_key""".stripMargin,

    "q_agg_daily_multiday" ->
      s"""WITH ${dayBizCtes(1, "o_orderkey % 3 = 0")},
         |${dayBizCtes(2, "o_orderkey % 3 = 1")},
         |${dayBizCtes(3, "o_orderkey % 3 = 2")}
         |SELECT * FROM (
         |  ${dayBizSelect(1, "2024-06-01")}
         |  UNION ALL
         |  ${dayBizSelect(2, "2024-06-02")}
         |  UNION ALL
         |  ${dayBizSelect(3, "2024-06-03")}
         |) ORDER BY date_id""".stripMargin,
  )
}

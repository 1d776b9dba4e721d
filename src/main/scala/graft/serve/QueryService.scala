package graft.serve

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols.bq

/** The reference's API query surface (`dl/src/api/main.py`) as library
  * functions. An HTTP layer is out of engine scope (SURVEY §3.2); these
  * are the plans each endpoint would run.
  */
object QueryService {

  /** Case-insensitive substring search (`api/main.py:135`). pandas'
    * `na=False` semantics hold for free: a null column yields null,
    * which `filter` drops.
    */
  def search(df: DataFrame, col: String, term: String): DataFrame =
    df.filter(upper(bq(col)).contains(term.toUpperCase))

  /** Multi-column variant (`api/main.py:135` searches legal name OR
    * owner name): OR of per-column contains; null columns contribute
    * false, matching pandas' `na=False`.
    */
  def searchAny(df: DataFrame, cols: Seq[String], term: String): DataFrame =
    df.filter(cols.map(c =>
      coalesce(upper(bq(c)).contains(term.toUpperCase), lit(false)))
      .reduce(_ || _))

  /** Point lookup by key (`api/main.py:178`). On a lake table partitioned
    * or bucketed by the key this prunes to one partition/bucket.
    */
  def pointLookup(df: DataFrame, key: String, value: Column): DataFrame =
    df.filter(bq(key) === value)

  /** Offset/limit pagination (`api/main.py:144-156`).
    *
    * Pandas pages by implicit row order; a distributed engine needs an
    * explicit total order, so `sortKeys` is mandatory. row_number over a
    * global window is the faithful general form; the window input is
    * whatever `df` is, so callers paginating a huge unaggregated table
    * should pre-filter (the reference paginates small search results).
    */
  def paginate(df: DataFrame, sortKeys: Seq[String], offset: Int, limit: Int): DataFrame = {
    val w = Window.orderBy(sortKeys.map(c => bq(c).asc): _*)
    df.withColumn("row_num", row_number().over(w))
      .filter(col("row_num") > offset && col("row_num") <= offset + limit)
  }

  /** Pagination with the API's response envelope (`api/main.py:144-156`):
    * every page row carries `total_count` and the page carries
    * `has_more` — computed with one extra unbounded window over the
    * (already small, pre-filtered) pageable set, not a second scan.
    */
  def paginateWithMeta(df: DataFrame, sortKeys: Seq[String],
                       offset: Int, limit: Int): DataFrame = {
    val w = Window.orderBy(sortKeys.map(c => bq(c).asc): _*)
    df.withColumn("row_num", row_number().over(w))
      .withColumn("total_count", count(lit(1)).over(Window.partitionBy()))
      .filter(col("row_num") > offset && col("row_num") <= offset + limit)
      .withColumn("has_more", col("total_count") > offset + limit)
  }

  /** Keyset (seek) pagination — the scale path beside the faithful
    * offset forms above. `WHERE key > last ORDER BY key LIMIT n` plans
    * as a pushed-down filter + TakeOrderedAndProject: no global window,
    * no single-partition funnel, and page cost is independent of page
    * depth (offset pagination re-ranks everything before the page; the
    * reference's endpoint pages the whole businesses table,
    * `api/main.py:144-156` — at 100× that is the failure mode).
    * `lastKey = None` fetches the first page.
    * The caller threads the last row's key into the next call — the
    * standard cursor-API contract. Single sort key (a composite key
    * would need a lexicographic tuple predicate).
    */
  def paginateAfter(df: DataFrame, sortKey: String, lastKey: Option[Column],
                    limit: Int): DataFrame = {
    val base = lastKey.fold(df)(k => df.filter(bq(sortKey) > k))
    base.orderBy(bq(sortKey).asc).limit(limit)
  }

  /** Per-business nested record (`api/main.py:138-142`): group rows into
    * list-valued columns. `collect_list` skips nulls, matching the
    * reference's `list(x.dropna())`; lists are sorted for deterministic
    * output (pandas got insertion order for free).
    */
  def groupCollect(df: DataFrame, key: String, firstCols: Seq[String],
                   listCols: Seq[String]): DataFrame = {
    val aggs = firstCols.map(c => first(bq(c)).as(c)) ++
      listCols.map(c => sort_array(collect_list(bq(c))).as(s"${c}_list"))
    df.groupBy(bq(key)).agg(aggs.head, aggs.tail: _*)
  }
}

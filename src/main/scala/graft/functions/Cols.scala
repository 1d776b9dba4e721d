package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Backtick-quoting for CALLER-SUPPLIED column names — the one shared
  * idiom behind every name-taking operator (frequency tables, privacy
  * generalization, imputation, as-of joins, keyset pagination, …).
  *
  * Why: `col("a.b")` resolves by dot-splitting, so a raw CSV header
  * like `owner.name` mis-resolves (or fails) unless quoted, and the
  * repo's data model deliberately keeps raw header names. Quoting was
  * previously re-implemented inline per operator (`expr(s"`$c`")`,
  * `col(s"_t.`$c`")`, …) — duplicated enough that the next operator
  * was likely to miss a site, and none of the copies escaped a
  * backtick INSIDE a name. This helper is the single point for both:
  * embedded backticks double (the Spark identifier-escape rule), so
  * even a column literally named `` a`b `` round-trips.
  */
object Cols {
  /** The quoted identifier fragment, for splicing into `expr(...)`
    * SQL strings: `bqSql("a.b")` == `` "`a.b`" ``.
    */
  def bqSql(name: String): String = "`" + name.replace("`", "``") + "`"

  /** `Column` for a caller-supplied name, dot- and backtick-safe. */
  def bq(name: String): Column = col(bqSql(name))

  /** Alias-qualified form: `bq("_t", c)` == `` col(s"_t.`c`") `` — for
    * disambiguating the two sides of a self- or stats-join.
    */
  def bq(alias: String, name: String): Column =
    col(s"$alias.${bqSql(name)}")
}

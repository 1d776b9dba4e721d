package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols.bq
import org.apache.spark.sql.types._
import graft.functions.StableMath.gridSnap

/** The reference's ingestion pipeline (`dl/src/data_ingestion/
  * ingestion_pipeline.py`) re-expressed as lazy DataFrame stages:
  * schema-declared CSV scan with NA-sentinel normalization → quality
  * profile → cleaning/derived columns → Parquet.
  *
  * Every stage is a pure DataFrame => DataFrame; the whole pipeline is
  * one lineage with exactly one shuffle (the Has-Multiple-Owners
  * window on Account Number).
  */
object Ingestion {

  /** Canonical business_owners schema (`ingestion_pipeline.py:33-42`,
    * FIXTURES.md §1) — declared, never inferred: schema inference is a
    * second full pass over 100 TB.
    */
  val schema: StructType = StructType(Seq(
    StructField("Account Number", LongType),
    StructField("Legal Name", StringType),
    StructField("Owner First Name", StringType),
    StructField("Owner Middle Initial", StringType),
    StructField("Owner Last Name", StringType),
    StructField("Suffix", StringType),
    StructField("Legal Entity Owner", StringType),
    StructField("Title", StringType)))

  /** NA sentinels normalized to null at load
    * (`ingestion_pipeline.py:43`). Spark's CSV reader takes a single
    * nullValue, so the full sentinel list is applied as a projection —
    * still one pass, fused into the scan by codegen.
    */
  val naSentinels: Seq[String] = Seq("", " ", "N/A", "NULL", "null")

  private def normalizeNa(raw: DataFrame): DataFrame =
    schema.fields.filter(_.dataType == StringType).foldLeft(raw) { (df, f) =>
      df.withColumn(f.name,
        when(trim(col(f.name)).isin(naSentinels: _*), lit(null))
          .otherwise(col(f.name)))
    }

  def readCsv(spark: SparkSession, path: String): DataFrame =
    normalizeNa(spark.read.schema(schema).option("header", "true").csv(path))

  /** Corrupt-record column name for the audited reader. */
  val corruptCol = "_corrupt_record"

  /** Auditing variant of [[readCsv]] for hostile inputs: a 100 TB
    * ingest can neither FAILFAST (one bad line kills the job) nor
    * silently DROPMALFORMED (data loss with no evidence). PERMISSIVE
    * parsing keeps the raw text of every row that fails the declared
    * schema in `_corrupt_record`; [[goodRows]]/[[badRows]] split the
    * result into the clean relation (same shape as readCsv) and an
    * audit relation of raw lines for quarantine.
    */
  def readCsvAudited(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(schema.fields :+ StructField(corruptCol, StringType)))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  /** Clean rows of an audited read, NA-normalized like [[readCsv]]. */
  def goodRows(audited: DataFrame): DataFrame =
    normalizeNa(audited.filter(col(corruptCol).isNull).drop(corruptCol))

  /** Schema-declared JSON-lines scan with the same audit contract as
    * [[readCsvAudited]] — jsonl is how training corpora actually ship
    * (one document object per line). PERMISSIVE parsing keeps each
    * malformed line's raw text in `_corrupt_record`; split with
    * [[goodJsonRows]]/[[badRows]] (no NA-sentinel normalization:
    * JSON has real nulls, so [[goodRows]]'s CSV-schema fold does not
    * apply).
    */
  def readJsonlAudited(spark: SparkSession, path: String,
                       docSchema: StructType): DataFrame =
    spark.read
      .schema(StructType(docSchema.fields :+ StructField(corruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Clean rows of an audited JSONL read (schema-agnostic split). */
  def goodJsonRows(audited: DataFrame): DataFrame =
    audited.filter(col(corruptCol).isNull).drop(corruptCol)

  /** Quarantine relation: the raw text of every malformed line.
    *
    * CACHE CONTRACT: Spark refuses a raw-CSV query whose referenced
    * columns are ONLY the internal corrupt-record column (projection
    * pruning would reduce this plan to exactly that), and caching the
    * parse is its documented requirement — so this caches `audited` as
    * a side effect unless the caller already did. The caller owns the
    * lifetime: `audited.unpersist()` when done with BOTH splits (a
    * splitting caller wants the cache anyway — one parse, two
    * consumers). For a write-and-release shape use
    * [[writeQuarantine]], which scopes the cache itself.
    */
  def badRows(audited: DataFrame): DataFrame = {
    if (audited.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      audited.cache()
    audited.filter(col(corruptCol).isNotNull).select(col(corruptCol))
  }

  /** Scoped quarantine: cache, write the malformed raw lines as text to
    * `path`, unpersist — no storage-memory residue for callers that
    * only want the audit file. Returns the quarantined line count.
    */
  def writeQuarantine(audited: DataFrame, path: String): Long = {
    val alreadyCached =
      audited.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val bad = badRows(audited)
    try {
      bad.write.mode("overwrite").text(path)
      bad.count()
    } finally if (!alreadyCached) audited.unpersist()
  }

  /** S1-adjacent cleaning (`ingestion_pipeline.py:76-107`):
    *  - trim+upper every string column, '' → null            (P1)
    *  - Owner Full Name: null-skipping concat, all-null→null (P2)
    *  - Is Individual Owner = Legal Entity Owner IS NULL     (P3)
    *  - Has Multiple Owners = per-account row count > 1      (W1)
    */
  def clean(df: DataFrame): DataFrame = {
    val strCols = Seq("Legal Name", "Owner First Name", "Owner Middle Initial",
      "Owner Last Name", "Suffix", "Legal Entity Owner", "Title")
    val normalized = strCols.foldLeft(df) { (d, c) =>
      val u = upper(trim(col(c)))
      d.withColumn(c, when(u === "", lit(null)).otherwise(u))
    }
    val nameParts = Seq(col("Owner First Name"), col("Owner Middle Initial"),
      col("Owner Last Name"), col("Suffix"))
    normalized
      .withColumn("Owner Full Name",
        when(coalesce(nameParts: _*).isNull, lit(null))
          .otherwise(concat_ws(" ", nameParts: _*)))
      .withColumn("Is Individual Owner", col("Legal Entity Owner").isNull)
      .withColumn("Has Multiple Owners",
        count(lit(1)).over(Window.partitionBy("Account Number")) > 1)
  }

  /** Quality profile (`ingestion_pipeline.py:54-74`): one single-pass
    * multi-aggregate — row/distinct/duplicate counts plus per-column
    * null counts and completeness percentages. Fully lazy: the duplicate
    * count is `count − countDistinct(whole row)` inside the same
    * aggregate (distinct-aggregate null semantics match
    * `dropDuplicates`), so the returned plan re-evaluates on fresh data
    * instead of baking in a stale driver-side literal.
    */
  def qualityProfile(df: DataFrame): DataFrame = {
    val perCol = schema.fields.flatMap { f =>
      val c = col(f.name)
      Seq(sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name} nulls"),
        gridSnap(avg(when(c.isNull, 0.0).otherwise(1.0)) * 100, 4)
          .as(s"${f.name} completeness_pct"))
    }
    val wholeRow = struct(schema.fields.map(f => col(f.name)): _*)
    val aggs = Seq(
      count(lit(1)).as("total_records"),
      countDistinct(col("Account Number")).as("unique_businesses"),
      (count(lit(1)) - countDistinct(wholeRow)).as("duplicate_rows")) ++ perCol
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Group-mean imputation — the statistical upgrade of the reference's
    * constant-fill cleaning (`ingestion_pipeline.py` NA sentinels →
    * null): nulls in `valueCol` fill with their GROUP's mean, which is
    * what a per-segment fill should use (a global mean drags every
    * group toward the grand average). Adds `<valueCol>_imputed`
    * (double) and `was_imputed`; rows in groups with no observed value
    * stay null (there is nothing defensible to fill with — gate them
    * with an [[Expectations.NotNull]] if that's an error).
    *
    * NULL group keys are a group: the means relation is attached with
    * a null-safe `<=>` join (the [[graft.analytics.Anomaly.madFlag]]
    * fix class), so rows whose group key is NULL impute from the
    * NULL-key group's own mean exactly like any other group —
    * `groupBy` already computes that group, and a null-unsafe equi
    * join would silently strand those rows unimputed.
    *
    * Numerics + scale: the per-group mean is a DECIMAL-exact Σ over
    * observed values divided in double, then snapped to the 6-dp grid
    * with `floor(x·10⁶ + 0.5)/10⁶` rather than `round(_, 6)`. The
    * snap is pure IEEE arithmetic on the quotient's binary value, so
    * the fill is bit-identical under any partitioning AND any engine;
    * `round` is not — Spark rounds the double's shortest decimal
    * rendering (`BigDecimal.valueOf`) while DuckDB and most C++
    * engines scale the binary value, and a quotient whose shortest
    * rendering is a 6-dp tie but whose binary value sits below it
    * (e.g. 66.6371875 = 66.63718749…₂) rounds UP on Spark and DOWN
    * elsewhere. Ties resolve toward +∞ for negative means; callers
    * needing half-away-from-zero semantics at 6 dp on negatives
    * should not (values beyond ±2⁵³/10⁶ ≈ ±9·10⁹ also lose grid
    * precision — at that magnitude a 6-dp fill is meaningless). The
    * means relation is |groups| rows — aggregated map-side and joined
    * back WITHOUT a broadcast hint: group cardinality is
    * caller-data-shaped (q_a21 groups by user id), so a forced
    * broadcast could blow past the 8 GB ceiling at scale — AQE
    * broadcasts whenever the relation fits, and the join degrades to
    * a shuffle only beyond that (the [[graft.analytics.Anomaly]]
    * stats-join rationale).
    */
  def imputeByGroupMean(df: DataFrame, groupCol: String,
                        valueCol: String): DataFrame = {
    require(!df.columns.contains("_grp_mean"),
      "input column _grp_mean collides with imputeByGroupMean's " +
        "working name — rename it first")
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    // Backtick-quote every reference: raw CSV headers may contain
    // dots (the frequencyTable convention), and an unquoted
    // col("alias.name.with.dot") would dot-split into a bogus
    // nested-field path instead of resolving the column.
    val g = bq(groupCol)
    val v = bq(valueCol)
    val means = df.groupBy(g)
      .agg((floor(sum(v.cast(dec)).cast("double")
        / count(v) * 1e6 + 0.5) / 1e6).as("_grp_mean"))
    df.as("_im_t")
      .join(means.as("_im_m"),
        bq("_im_t", groupCol) <=> bq("_im_m", groupCol), "left")
      .select(col("_im_t.*"), col("_im_m._grp_mean").as("_grp_mean"))
      .withColumn(s"${valueCol}_imputed",
        coalesce(v.cast("double"), col("_grp_mean")))
      .withColumn("was_imputed",
        v.isNull && col("_grp_mean").isNotNull)
      .drop("_grp_mean")
  }

  /** Full pipeline: CSV → profile (JSON) + cleaned Parquet.
    * (`run_ingestion_pipeline`, `ingestion_pipeline.py:152-178`.)
    * The parsed CSV is cached across the two actions (clean-write,
    * profile-write) so the text is parsed once, not twice.
    */
  def run(spark: SparkSession, csvPath: String, outDir: String): DataFrame = {
    val raw = readCsv(spark, csvPath).cache()
    try {
      clean(raw).write.mode("overwrite").parquet(s"$outDir/processed")
      qualityProfile(raw)
        .coalesce(1).write.mode("overwrite").json(s"$outDir/quality_report")
    } finally raw.unpersist()
    spark.read.parquet(s"$outDir/processed")
  }
}

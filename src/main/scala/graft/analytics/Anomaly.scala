package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cols.{bq, bqSql}
import graft.functions.StableMath.gridSnap
import org.apache.spark.sql.types.DecimalType

/** Group-wise outlier detection — the batch form of the reference's
  * threshold alerting (`pipeline_monitor.py:66-73` compares metrics to
  * FIXED thresholds; this derives the threshold from each group's own
  * distribution).
  *
  * Numeric discipline for engine-portable exactness: group mean and
  * variance come from DECIMAL-exact Σx and Σx² (order-independent —
  * a running-variance implementation like `stddev_samp` is
  * partition-order-sensitive in the low bits and differs between
  * engines), converted to double only at the end; the outlier test is
  * (x − mean)² > σ²·k² — square both sides, no sqrt, no division by a
  * possibly-zero deviation.
  */
object Anomaly {

  /** Flag rows more than `sigma` sample standard deviations from their
    * group mean. Groups with fewer than 2 rows have undefined variance
    * and produce no flags. One aggregation + one broadcast-joinable
    * stats relation (|groups| rows) + a map-side flag expression.
    * Adds `is_outlier`.
    */
  def zFlag(df: DataFrame, keyCol: String, valueCol: String,
            sigma: Double = 3.0): DataFrame = {
    require(sigma > 0, s"sigma must be positive, got $sigma")
    val dec = DecimalType(38, 8)
    val stats = df.groupBy(bq(keyCol)).agg(
      count(lit(1)).as("_gn"),
      sum(bq(valueCol).cast(dec)).cast("double").as("_gsum"),
      sum((bq(valueCol).cast(dec) * bq(valueCol).cast(dec))
        .cast(DecimalType(38, 8))).cast("double").as("_gsumsq"))
    df.join(stats, keyCol)
      .withColumn("_gmean", col("_gsum") / col("_gn"))
      .withColumn("_gvar",
        (col("_gsumsq") - col("_gsum") * col("_gsum") / col("_gn"))
          / (col("_gn") - 1))
      .withColumn("is_outlier",
        col("_gn") >= 2 &&
          (bq(valueCol) - col("_gmean")) * (bq(valueCol) - col("_gmean"))
            > col("_gvar") * lit(sigma * sigma))
      .drop("_gn", "_gsum", "_gsumsq", "_gmean", "_gvar")
  }

  /** Per-group distribution-shape profile: mean, population standard
    * deviation, skewness and excess kurtosis from the first four raw
    * moments — ONE aggregation pass (the same Σxᵏ discipline as
    * [[zFlag]], extended to k = 3, 4). Skew/kurtosis are the profile
    * columns that catch what mean/stddev monitoring can't: a metric
    * whose average is stable while its tail silently grows.
    *
    * Engine portability: per-row powers evaluate in double
    * (deterministic IEEE, identical association both engines:
    * `((x·x)·x)·x`), each power DECIMAL-cast before its SUM so the
    * across-row reduction is order-independent, and the central-moment
    * combination runs in double with a FIXED expression tree mirrored
    * token-for-token in the oracle SQL. Groups smaller than 3 rows or
    * with zero variance produce null skew/kurtosis (no 0/0). Nulls in
    * the value column are excluded from n and every moment.
    */
  def momentsProfile(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val dec = DecimalType(38, 8)
    val dec4 = DecimalType(38, 4)
    val x = bq(valueCol).cast("double")
    val rows = df.where(bq(valueCol).isNotNull)
    val agg = rows.groupBy(bq(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(x.cast(dec)).cast("double").as("_s1"),
      sum((x * x).cast(dec)).cast("double").as("_s2"),
      sum(((x * x) * x).cast(dec4)).cast("double").as("_s3"),
      sum((((x * x) * x) * x).cast(dec4)).cast("double").as("_s4"))
    agg
      .withColumn("_mu", col("_s1") / col("n"))
      .withColumn("_m2",
        col("_s2") / col("n") - col("_mu") * col("_mu"))
      .withColumn("_m3",
        col("_s3") / col("n")
          - lit(3.0) * col("_mu") * (col("_s2") / col("n"))
          + lit(2.0) * col("_mu") * col("_mu") * col("_mu"))
      .withColumn("_m4",
        col("_s4") / col("n")
          - lit(4.0) * col("_mu") * (col("_s3") / col("n"))
          + lit(6.0) * col("_mu") * col("_mu") * (col("_s2") / col("n"))
          - lit(3.0) * col("_mu") * col("_mu") * col("_mu") * col("_mu"))
      .withColumn("mean", gridSnap(col("_mu"), 6))
      // cancellation can push a constant group's m2 a hair below zero;
      // clamp (mirrored in the oracle) so sqrt never sees a negative
      .withColumn("stddev_pop", gridSnap(sqrt(greatest(col("_m2"), lit(0.0))), 6))
      .withColumn("skewness",
        when(col("n") >= 3 && col("_m2") > 0,
          gridSnap(col("_m3") / pow(col("_m2"), 1.5), 6)))
      .withColumn("excess_kurtosis",
        when(col("n") >= 3 && col("_m2") > 0,
          gridSnap(col("_m4") / (col("_m2") * col("_m2")) - lit(3.0), 6)))
      .select(bq(keyCol), col("n"), col("mean"), col("stddev_pop"),
        col("skewness"), col("excess_kurtosis"))
  }

  /** Robust per-group outlier flags via the modified z-score
    * (Iglewicz & Hoaglin 1993): M = 0.6745·(x − median)/MAD, flag
    * |M| > `cutoff` (3.5 by default). Where [[zFlag]]'s mean/stddev
    * are themselves dragged by the outliers they hunt (masking), the
    * median and MAD have a 50% breakdown point — the estimator the
    * anomaly is hunting can't corrupt.
    *
    * Two aggregation passes over the group key (median, then median
    * absolute deviation around it — MAD is not algebraic, it needs
    * the median first), each producing a |groups|-row stats relation
    * re-attached WITHOUT a broadcast hint: group cardinality is
    * caller-data-shaped (q_a25 groups by user id), and at 100 TB a
    * high-cardinality key would blow a forced broadcast past the 8 GB
    * ceiling and fail the job — AQE picks broadcast when the relation
    * fits and a shuffle hash join when it doesn't. Both re-attaches
    * are NULL-SAFE (`<=>`): groupBy keeps the null-key group, so rows
    * with a NULL key flag against their own group's median/MAD
    * instead of silently vanishing through a never-matching equi-join
    * (the [[graft.operators.Privacy.lDiversify]] fix, applied here).
    * The flag is map-side arithmetic either way. Exact
    * interpolated percentiles (the q_a17/winsorize discipline) keep
    * it engine-portable. Zero-MAD groups (≥half the values identical)
    * yield null robust_z and flag only values strictly off the
    * median — the standard convention. Adds `robust_z` (6 dp) and
    * `is_outlier`.
    */
  def madFlag(df: DataFrame, keyCol: String, valueCol: String,
              cutoff: Double = 3.5): DataFrame = {
    require(cutoff > 0, s"cutoff must be positive, got $cutoff")
    val clash = df.columns.filter(Set("_med", "_mad").contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with madFlag's " +
        "working names (_med, _mad) — rename them first")
    val med = df.groupBy(bq(keyCol))
      .agg(expr(s"percentile(${bqSql(valueCol)}, 0.5D)").as("_med"))
    val withMed = df.as("_mf_t")
      .join(med.as("_mf_m"),
        bq("_mf_t", keyCol) <=> bq("_mf_m", keyCol))
      .select(col("_mf_t.*"), col("_mf_m._med").as("_med"))
    val mad = withMed.groupBy(bq(keyCol))
      .agg(expr(s"percentile(abs(${bqSql(valueCol)} - _med), 0.5D)").as("_mad"))
    withMed.as("_mf_w")
      .join(mad.as("_mf_s"),
        bq("_mf_w", keyCol) <=> bq("_mf_s", keyCol))
      .select(col("_mf_w.*"), col("_mf_s._mad").as("_mad"))
      .withColumn("robust_z",
        when(col("_mad") > 0,
          gridSnap(lit(0.6745) * (bq(valueCol) - col("_med")) / col("_mad"), 6)))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > cutoff,
          col("_mad") === 0 && bq(valueCol) =!= col("_med"), lit(false)))
      .drop("_med", "_mad")
  }

  /** Per-group winsorization: values clip to their group's
    * [loPct, hiPct] exact interpolated percentiles (percentile_cont
    * semantics — the same engine-portable form as `q_a17_quantiles`).
    * Clipping (not dropping) is the standard robust-cleaning move when
    * downstream wants every row but not the tail's leverage. The
    * percentile bounds are one aggregation into a |groups|-row
    * relation joined back (no broadcast hint — AQE sizes it, same
    * rationale as [[madFlag]]); the clip is a map-side
    * least/greatest — the data never shuffles. Adds
    * `<valueCol>_winsor` (double, 6 dp) and `was_clipped`; null
    * values pass through unclipped, and so do rows with a NULL group
    * key (the bounds join is LEFT, matching `imputeByGroupMean`'s
    * pass-through contract — clip, never drop).
    */
  def winsorize(df: DataFrame, keyCol: String, valueCol: String,
                loPct: Double = 0.01, hiPct: Double = 0.99): DataFrame = {
    require(loPct >= 0 && hiPct <= 1 && loPct < hiPct,
      s"need 0 <= loPct < hiPct <= 1, got ($loPct, $hiPct)")
    val bounds = df.groupBy(bq(keyCol)).agg(
      expr(s"percentile(${bqSql(valueCol)}, ${loPct}D)").as("_lo"),
      expr(s"percentile(${bqSql(valueCol)}, ${hiPct}D)").as("_hi"))
    df.join(bounds, Seq(keyCol), "left")
      .withColumn(s"${valueCol}_winsor",
        gridSnap(least(greatest(bq(valueCol).cast("double"), col("_lo")),
          col("_hi")), 6))
      .withColumn("was_clipped",
        bq(valueCol).isNotNull &&
          coalesce(bq(valueCol) < col("_lo") ||
            bq(valueCol) > col("_hi"), lit(false)))
      .drop("_lo", "_hi")
  }
}

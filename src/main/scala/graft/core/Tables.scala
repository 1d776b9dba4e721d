package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Parquet carries its own schema, so no `inferSchema` pass is ever run;
  * Catalyst pushes filters/projections into the vectorized parquet scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.parquet` has shipped with two `ts` encodings across
    * driver-generated data generations, so dispatch on the RESOLVED
    * type instead of assuming one:
    *  - INT64 TIMESTAMP(NANOS): Spark's vectorized reader rejects it —
    *    read nanos as long (legacy conf) and convert with *integer*
    *    division (`ts div 1000`; a double round-trip would lose
    *    precision, ns-since-epoch ≈ 1.7e18 > 2^53);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ: cast
    *    to session-TZ TimestampType. Engine sessions run UTC (Bench/
    *    Verify/specs all set it), so the cast preserves instants and
    *    downstream date/window functions behave identically.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a session-TZ timestamp
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view so the full SQL surface works
    * (`spark.sql("SELECT ... FROM lineitem ...")`) — together with the
    * `GraftExtensions`-registered functions this is the engine's
    * SQL-only entry point. Views are lazy: registering costs nothing
    * until a query reads one, and `events` keeps its nanos fix.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case t => load(spark, dir, t).createOrReplaceTempView(t)
    }
}

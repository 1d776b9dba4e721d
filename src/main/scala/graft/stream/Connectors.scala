package graft.stream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._
import java.util.Properties

/** Source/sink builders for the reference's external endpoints —
  * Kafka (S10/S11, `dl/src/big_data/streaming_processor.py:63-76,
  * 331-352`) and JDBC (S8/S9, `streaming_processor.py:131-169`,
  * `dl/src/etl/pipeline.py:161-203`).
  *
  * The payload encode/decode steps are pure `DataFrame => DataFrame`
  * transforms, so they are unit-tested in batch (ConnectorsSpec) even
  * though this environment has no Kafka broker; the stream builders
  * assemble the exact `format("kafka")` plans a deployment runs. The
  * JDBC seam is exercised for real against embedded Derby.
  */
object Connectors {

  /** JSON schema of the Kafka event payload — the T1 envelope aligned
    * with the events table.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Kafka wire → typed events: parse the JSON value with the declared
    * schema (no inference) and flatten. Works identically on a batch
    * frame and a `readStream` frame.
    */
  def decodeKafkaEvents(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), eventSchema).as("e"))
      .select("e.*")

  /** Typed events → Kafka wire: key by event_id (stable partitioning
    * by event identity on the topic), value as the full-row JSON —
    * the reference's `producer.send(key, json)` shape.
    */
  def encodeEventsForKafka(events: DataFrame): DataFrame =
    events.select(
      col("event_id").cast("string").as("key"),
      to_json(struct(events.columns.map(col): _*)).as("value"))

  /** Kafka consumer source (S11): subscribe → decode → typed event
    * stream. `startingOffsets=latest` mirrors the reference consumer's
    * `auto_offset_reset='latest'`.
    */
  def readEventStream(spark: SparkSession, bootstrapServers: String,
                      topic: String,
                      startingOffsets: String = "latest"): DataFrame =
    decodeKafkaEvents(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load())

  /** Kafka producer sink (S10): encode → `writeStream.format("kafka")`.
    * Caller `.start()`s it; the checkpoint gives exactly-once-per-batch
    * delivery into the topic.
    */
  def writeEventStream(events: DataFrame, bootstrapServers: String,
                       topic: String,
                       checkpointDir: String): DataStreamWriter[Row] =
    encodeEventsForKafka(events).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  /** JDBC incremental watermark poll (S9): rows strictly newer than the
    * last-seen watermark, oldest first, one bounded batch — the
    * reference's `WHERE created_at > :last ORDER BY created_at LIMIT
    * :batch` every 10 s. The comparison predicate is pushed down into
    * the database query (Catalyst JDBC filter pushdown), so each poll
    * reads only the increment, not the table.
    */
  def readIncremental(spark: SparkSession, url: String, table: String,
                      watermarkCol: String, lastSeen: java.sql.Timestamp,
                      batchSize: Int,
                      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)
      .filter(col(watermarkCol) > lit(lastSeen))
      .orderBy(col(watermarkCol).asc)
      .limit(batchSize)

  /** JDBC bulk append sink (S8): the staging-table bulk insert.
    * Each partition writes through its own connection in batched
    * statements — the distributed counterpart of the reference's
    * chunked `to_sql(..., method='multi')`.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: Properties = new Properties()): Unit =
    df.write.mode("append").jdbc(url, table, props)
}

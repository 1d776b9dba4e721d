package graft

import graft.stream.Connectors
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.util.Properties
import scala.jdk.CollectionConverters._

/** In-memory Redis stand-in — an object so executor closures reach it
  * statically in local mode.
  */
object CacheStore {
  val map = new scala.collection.concurrent.TrieMap[String, (String, Int)]
}

/** External-endpoint seams: the Kafka payload transforms (batch-mode —
  * no broker in this environment; the stream builders assemble the same
  * plans) and a REAL JDBC round-trip against embedded Derby.
  */
class ConnectorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 7L, "click", 10.5, """{"k":1}"""),
    (2L, ts("2024-01-01 10:05:00"), 8L, "purchase", 99.0, """{"k":2}"""),
    (3L, ts("2024-01-01 10:10:00"), 7L, "error", 0.0, """{"k":3}"""))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("Kafka encode/decode round-trips the event envelope") {
    val wire = Connectors.encodeEventsForKafka(events)
    assert(wire.columns.toSeq === Seq("key", "value"))
    assert(wire.select("key").as[String].collect().sorted === Array("1", "2", "3"))
    // Simulate the broker: value arrives as bytes.
    val raw = wire.withColumn("value", col("value").cast("binary"))
    val decoded = Connectors.decodeKafkaEvents(raw)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    // same names and types (nullability relaxes through from_json)
    assert(decoded.schema.map(f => (f.name, f.dataType)) ===
      events.schema.map(f => (f.name, f.dataType)))
    assert(decoded.orderBy("event_id").collect().toSeq ===
      events.orderBy("event_id").collect().toSeq)
  }

  test("decode tolerates malformed payloads as null rows (no crash)") {
    val raw = Seq("not json at all").toDF("value")
    val out = Connectors.decodeKafkaEvents(raw).collect()
    assert(out.length === 1 && out.head.isNullAt(0))
  }

  test("KV cache sink writes prefix+key -> row JSON through the partition connection") {
    CacheStore.map.clear()
    val sink = Connectors.cacheSink("event_id", "business_analytics:", 3600,
      () => (k, v, ttl) => CacheStore.map.put(k, (v, ttl)))
    sink(events, 0L)
    assert(CacheStore.map.size === 3)
    val (json, ttl) = CacheStore.map("business_analytics:2")
    assert(ttl === 3600)
    assert(json.contains("\"event_type\":\"purchase\"") && json.contains("\"value\":99.0"))
  }

  test("polling query fetches one page per tick into the sink") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ticks = MemoryStream[Long]
    val pages = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val ckpt = java.nio.file.Files.createTempDirectory("poll-ckpt").toString
    val q = Connectors.pollingQuery(ticks.toDF(), Trigger.ProcessingTime(0), ckpt,
      fetch = _ => spark.range(5).toDF(),
      sink = (page, id) => pages.add((id, page.count())))
    try {
      ticks.addData(1L)
      q.processAllAvailable()
      ticks.addData(2L)
      q.processAllAvailable()
      val got = pages.asScala.toSeq
      assert(got.nonEmpty && got.forall(_._2 === 5L))
      assert(got.map(_._1).distinct.size === got.size) // one fetch per batch id
    } finally q.stop()
  }

  test("JDBC sink writes and incremental poll reads only past the watermark") {
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    Connectors.writeJdbc(events, url, "events_stage")
    // appends accumulate (the staging-table contract)
    Connectors.writeJdbc(events.filter(col("event_id") === 1L)
      .withColumn("event_id", lit(4L))
      .withColumn("ts", lit(ts("2024-01-01 10:20:00"))), url, "events_stage")
    val all = spark.read.jdbc(url, "events_stage", new Properties())
    assert(all.count() === 4)

    val inc = Connectors.readIncremental(spark, url, "events_stage",
      "ts", ts("2024-01-01 10:05:00"), batchSize = 10)
    assert(inc.select("event_id").as[Long].collect().toSeq === Seq(3L, 4L))

    // bounded batch: oldest-first, limited
    val one = Connectors.readIncremental(spark, url, "events_stage",
      "ts", ts("2024-01-01 09:00:00"), batchSize = 2)
    assert(one.select("event_id").as[Long].collect().toSeq === Seq(1L, 2L))

    // tie safety: a second row at the batch-boundary timestamp must be
    // included past batchSize — advancing the cursor to max(ts) would
    // otherwise skip it forever under the strict '>' filter
    Connectors.writeJdbc(events.filter(col("event_id") === 2L)
      .withColumn("event_id", lit(5L)), url, "events_stage")
    val tied = Connectors.readIncremental(spark, url, "events_stage",
      "ts", ts("2024-01-01 09:00:00"), batchSize = 2)
    assert(tied.select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 5L))
  }

  test("incremental poll is one database statement with the boundary inside it") {
    val sql = Connectors.incrementalQuerySql("events_stage", "ts",
      ts("2024-01-01 09:00:00"), batchSize = 2)
    // a single statement: no separators, and the tie-safe boundary is a
    // scalar subquery the database evaluates — not a second round-trip
    assert(!sql.contains(";"))
    assert(sql.contains("FETCH FIRST 2 ROWS ONLY"))
    assert("SELECT MAX".r.findAllIn(sql).size === 1)
    // and the pushed form still returns exactly the tie-extended batch
    // when handed to Derby verbatim (same data as the previous test)
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val got = spark.read.format("jdbc").option("url", url)
      .option("query", sql).load()
      .select("event_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L, 5L))
  }

  test("exactly-once JDBC sink skips a re-delivered micro-batch wholesale") {
    val url = "jdbc:derby:memory:graftxo;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE xo_events (event_id BIGINT, value DOUBLE)")
    conn.close()
    val sink = Connectors.exactlyOnceJdbcSink(url, "xo_events", "q1")
    val batch = Seq((1L, 10.0), (2L, 20.0)).toDF("event_id", "value")
    def rows() = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "xo_events").load().count()
    sink(batch, 0L)
    assert(rows() === 2L)
    // crash-replay of the SAME batch id: claimed epoch blocks the append
    sink(batch, 0L)
    assert(rows() === 2L)
    // the next epoch appends normally
    sink(batch, 1L)
    assert(rows() === 4L)
    // a different query name has its own epoch space
    val sink2 = Connectors.exactlyOnceJdbcSink(url, "xo_events", "q2")
    sink2(batch, 0L)
    assert(rows() === 6L)
  }

  test("exactly-once sink survives a crash between staging and publish — no loss, no dupes") {
    val url = "jdbc:derby:memory:graftxo2;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE xo2_events (event_id BIGINT, value DOUBLE)")
    conn.close()
    val batch = Seq((1L, 10.0), (2L, 20.0)).toDF("event_id", "value")
    def rows() = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "xo2_events").load().count()

    // Simulate the crash window the old claim-first design lost data in:
    // a prior attempt staged its rows but died before the claim+publish
    // transaction. Its orphan rows sit in the stage table under a dead
    // attempt id; the epoch is still unclaimed.
    val sink = Connectors.exactlyOnceJdbcSink(url, "xo2_events", "q1")
    Connectors.writeJdbc(
      batch.withColumn("_query_name", lit("q1"))
        .withColumn("_batch_id", lit(7L))
        .withColumn("_attempt", lit("dead-attempt"))
        .withColumn("_part", lit(0)),
      url, "xo2_events_stage")
    assert(rows() === 0L) // nothing published by the dead attempt

    // The re-delivered batch must land EXACTLY once: the retry's fresh
    // attempt id publishes its own staged rows; the orphans never do.
    sink(batch, 7L)
    assert(rows() === 2L)
    sink(batch, 7L) // and a replay after success is still skipped
    assert(rows() === 2L)
    // stage hygiene: published/skipped batches leave no staged rows
    val staged = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "xo2_events_stage").load().count()
    assert(staged === 0L)
  }

  test("Kafka end-to-end blocker is real: the named artifacts are absent from this classpath") {
    // Executable form of the S10/S11 adjudication note (Connectors
    // scaladoc): an embedded-broker round-trip needs kafka-clients +
    // spark-sql-kafka-0-10 (+ the kafka_2.13 server artifact for the
    // broker itself), and NONE are resolvable in this offline
    // environment. If this test ever fails, the artifacts have
    // appeared — replace it with the real
    // writeEventStream -> readEventStream round-trip.
    intercept[ClassNotFoundException] {
      Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    }
    intercept[ClassNotFoundException] {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
    }
    intercept[ClassNotFoundException] {
      Class.forName("kafka.server.KafkaServer")
    }
  }

  test("staging is task-retry idempotent: re-staging the same attempt does not duplicate rows") {
    // A Spark task that committed its partition's staged rows and then
    // died is re-executed with the SAME attempt id. Emulate that by
    // running stageBatch twice with one attempt: the retry's leading
    // per-partition DELETE must erase the first pass's rows, leaving
    // exactly one copy for the publish SELECT.
    val url = "jdbc:derby:memory:graftxo4;create=true"
    val batch = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("event_id", "value")
    Connectors.stageBatch(batch, url, "xo4_stage", "q1", 0L, "attempt-a", new Properties())
    Connectors.stageBatch(batch, url, "xo4_stage", "q1", 0L, "attempt-a", new Properties())
    val staged = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "xo4_stage").load()
    assert(staged.count() === 3L)
    assert(staged.select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("exactly-once sink: two concurrent writers of the same epoch — exactly one commits") {
    val url = "jdbc:derby:memory:graftxo3;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE xo3_events (event_id BIGINT, value DOUBLE)")
    conn.close()
    val batch = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("event_id", "value")
    val sink = Connectors.exactlyOnceJdbcSink(url, "xo3_events", "q1")

    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val fs = (1 to 2).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            gate.await()
            try sink(batch, 42L)
            catch { case t: Throwable => errs.add(t) }
          }
        })
      }
      gate.countDown()
      fs.foreach(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(errs.isEmpty, s"racing sink threw: ${errs.asScala.toList}")
    val got = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "xo3_events").load()
    assert(got.count() === 3L) // one copy, not two
    assert(got.select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("duplicate-key detection matches SQLState class 23 across drivers") {
    // Derby signals via the dedicated subclass; Postgres/MySQL/SQLite
    // raise plain SQLExceptions carrying SQLState 23xxx — both must be
    // treated as 'already claimed', anything else must propagate.
    assert(Connectors.isDuplicateKey(
      new java.sql.SQLIntegrityConstraintViolationException("dup", "23505")))
    assert(Connectors.isDuplicateKey(new java.sql.SQLException("dup", "23505")))
    assert(Connectors.isDuplicateKey(new java.sql.SQLException("dup", "23000")))
    assert(!Connectors.isDuplicateKey(new java.sql.SQLException("io", "08006")))
    assert(!Connectors.isDuplicateKey(new java.sql.SQLException("boom", null: String)))
  }
}

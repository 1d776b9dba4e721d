package graft

import graft.operators.AsOf
import graft.stream.Streaming
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** As-of join and sessionization semantics. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before each left ts") {
    val left = Seq(
      (1L, 10, "e1"), (1L, 25, "e2"), (2L, 5, "e3"), (2L, 40, "e4"))
      .toDF("k", "lt", "ev")
    val right = Seq(
      (1L, 10, 100.0), (1L, 20, 200.0), (2L, 6, 300.0))
      .toDF("k", "rt", "snap")
    val out = AsOf.asofJoin(left, right, Seq("k"), "lt", "rt", Seq("snap"))
      .orderBy("k", "lt")
      .select("ev", "snap").as[(String, Option[Double])].collect()
    // e1: tie at ts=10 → the simultaneous snapshot IS visible (>= match).
    // e2: latest of {10, 20} ≤ 25 → 200. e3: nothing ≤ 5 → null (left
    // join). e4: 6 ≤ 40 → 300.
    assert(out === Seq(
      ("e1", Some(100.0)), ("e2", Some(200.0)),
      ("e3", None), ("e4", Some(300.0))))
  }

  test("asofJoinForward picks the earliest right row at or after each left ts") {
    val left = Seq(
      (1L, 10, "e1"), (1L, 25, "e2"), (2L, 5, "e3"), (2L, 40, "e4"))
      .toDF("k", "lt", "ev")
    val right = Seq(
      (1L, 10, 100.0), (1L, 20, 200.0), (2L, 6, 300.0))
      .toDF("k", "rt", "snap")
    val out = AsOf.asofJoinForward(left, right, Seq("k"), "lt", "rt", Seq("snap"))
      .orderBy("k", "lt")
      .select("ev", "snap").as[(String, Option[Double])].collect()
    // e1: tie at ts=10 matches (<= semantics). e2: nothing ≥ 25 → null.
    // e3: earliest of {6} ≥ 5 → 300. e4: nothing ≥ 40 → null.
    assert(out === Seq(
      ("e1", Some(100.0)), ("e2", None),
      ("e3", Some(300.0)), ("e4", None)))
  }

  test("asofJoin carries multiple payload columns and respects keys") {
    val left = Seq((1L, 10), (2L, 10)).toDF("k", "lt")
    val right = Seq((1L, 9, "a", 1.0), (2L, 8, "b", 2.0), (2L, 9, "c", 3.0))
      .toDF("k", "rt", "tag", "v")
    val out = AsOf.asofJoin(left, right, Seq("k"), "lt", "rt", Seq("tag", "v"))
      .orderBy("k").select("k", "tag", "v")
      .as[(Long, String, Double)].collect()
    // Key 2 must see its own latest (rt=9 → "c"), never key 1's rows.
    assert(out === Seq((1L, "a", 1.0), (2L, "c", 3.0)))
  }

  test("asofJoin never matches right rows with a null timestamp") {
    val left = Seq((1L, 10, "e1"), (1L, 3, "e0")).toDF("k", "lt", "ev")
    val right = Seq((1L, Option(5), 100.0), (1L, Option.empty[Int], 999.0))
      .toDF("k", "rt", "snap")
    val out = AsOf.asofJoin(left, right, Seq("k"), "lt", "rt", Seq("snap"))
      .orderBy("lt").select("ev", "snap").as[(String, Option[Double])].collect()
    // The null-ts row must neither match e1 (no spurious nulls-first
    // fill) nor e0 (nothing at or before ts=3 → left-join null).
    assert(out === Seq(("e0", None), ("e1", Some(100.0))))
  }

  test("asofJoin keeps payload rows intact when payload fields are null") {
    val left = Seq((1L, 30)).toDF("k", "lt")
    val right = Seq(
      (1L, 10, Option("a"), Option(1.0)),
      (1L, 20, Option.empty[String], Option(2.0)))
      .toDF("k", "rt", "tag", "v")
    val out = AsOf.asofJoin(left, right, Seq("k"), "lt", "rt", Seq("tag", "v"))
      .select("tag", "v").as[(Option[String], Option[Double])].collect()
    // The match is the rt=20 row whose tag is NULL — the output must be
    // (null, 2.0) as one tuple, never tag="a" stitched from the rt=10 row.
    assert(out === Seq((None, Some(2.0))))
  }

  test("sessionize merges gaps <= the session gap and splits above it") {
    val ev = Seq(
      (7L, ts("2024-01-01 10:00:00")),
      (7L, ts("2024-01-01 10:29:59")), // < 30 min after previous → merges
      (7L, ts("2024-01-01 10:59:59")), // exactly 30 min → still merges
      (7L, ts("2024-01-01 11:30:00")), // 30 min + 1 s → NEW session
      (8L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    val sess = Streaming.sessionize(ev, "user_id", "ts", "30 minutes")
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events", "span_s")
      .as[(Long, Long, Long)].collect()
    assert(sess === Seq((7L, 3L, 3599L), (7L, 1L, 0L), (8L, 1L, 0L)))
  }

  test("sessionSummary aggregates per user") {
    val ev = Seq(
      (7L, ts("2024-01-01 10:00:00")), (7L, ts("2024-01-01 10:10:00")),
      (7L, ts("2024-01-01 12:00:00")))
      .toDF("user_id", "ts")
    val row = Streaming.sessionSummary(ev, "user_id", "ts", "30 minutes")
      .select("n_sessions", "total_events", "max_span_s").as[(Long, Long, Long)]
      .collect().head
    assert(row === ((2L, 3L, 600L)))
  }
}

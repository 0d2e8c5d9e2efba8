package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import EventStreaming._

class EventStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming hourly agg over MemoryStream matches batch twin") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val rows = Seq(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:55:00"), 2, "click", 2.0),
      Event(3, ts("2024-01-01 11:05:00"), 1, "view", 4.0))
    mem.addData(rows: _*)
    val q = hourlyAgg(mem.toDF, withWm = true)
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hourly")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val batch = hourlyAgg(rows.toDF).orderBy("window_start", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == batch)
    assert(got == Seq(
      ("2024-01-01 10:00:00", "click", 2L),
      ("2024-01-01 11:00:00", "view", 1L)))
  }

  test("stateful sessionization: state survives across triggers, gap closes session") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionizeStream(spark, mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    // trigger 1: two events 10 min apart -> one open session, nothing emitted
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 7, "click", 2.0))
    q.processAllAvailable()
    assert(spark.table("sessions").count() == 0)
    // trigger 2: event 2h later closes the first session (state persisted)
    mem.addData(Event(3, ts("2024-01-01 12:10:00"), 7, "view", 4.0))
    q.processAllAvailable(); q.stop()
    val s = spark.table("sessions").as[SessionOut].collect()
    assert(s.length == 1)
    assert(s(0).user_id == 7L && s(0).n_events == 2L && s(0).total_value == 3.0)
    assert(s(0).session_start == ts("2024-01-01 10:00:00").getTime)
    assert(s(0).session_end == ts("2024-01-01 10:10:00").getTime)
  }

  test("batch sessionization: gaps-and-islands on a crafted timeline") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "c", 1.0),
      (2L, ts("2024-01-01 10:20:00"), 100L, "c", 2.0),
      (3L, ts("2024-01-01 11:30:00"), 100L, "c", 3.0),
      (4L, ts("2024-01-01 10:00:00"), 200L, "c", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val s = sessionizeBatch(df, 30).collect()
    assert(s.length == 3) // user 100: 2 sessions; user 200: 1
    val u100 = s.filter(_.getAs[Long]("user_id") == 100L)
    assert(u100.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L))
  }
}

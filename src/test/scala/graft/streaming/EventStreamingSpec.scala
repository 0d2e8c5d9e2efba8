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

  test("streaming sketch distinct-users matches batch COUNT(DISTINCT) across triggers") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = hourlyDistinctUsers(mem.toDF, withWm = true)
      .writeStream.format("memory").queryName("sk_users").outputMode("complete").start()
    // two triggers touching the same window: the per-window SKETCH state
    // must merge across micro-batches (user 1 repeats — not double-counted)
    mem.addData(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:15:00"), 2, "click", 2.0))
    q.processAllAvailable()
    mem.addData(
      Event(3, ts("2024-01-01 10:25:00"), 1, "view", 3.0),
      Event(4, ts("2024-01-01 10:35:00"), 3, "view", 4.0),
      Event(5, ts("2024-01-01 11:05:00"), 3, "view", 5.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sk_users").orderBy("window_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // exact regime: cardinalities far below the sketch threshold
    assert(got == Seq(
      ("2024-01-01 10:00:00", 3L, 4L),
      ("2024-01-01 11:00:00", 1L, 1L)))
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

  test("sessionization timeout closes an idle user's session via the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionizeStream(spark, mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_to").outputMode("append").start()
    // user 7 sends one event, then goes idle forever
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0))
    q.processAllAvailable()
    assert(spark.table("sessions_to").count() == 0)
    // OTHER users' traffic advances the watermark past 10:00 + gap; user 7
    // has no further data, so only the event-time timeout can close them
    mem.addData(Event(2, ts("2024-01-01 12:00:00"), 8, "view", 2.0))
    q.processAllAvailable()
    mem.addData(Event(3, ts("2024-01-01 12:05:00"), 8, "view", 3.0))
    q.processAllAvailable(); q.stop()
    val closed = spark.table("sessions_to").as[SessionOut].collect()
      .filter(_.user_id == 7L)
    assert(closed.length == 1,
      s"idle user's session must be emitted by timeout: ${closed.toSeq}")
    assert(closed(0).n_events == 1L && closed(0).total_value == 1.0)
  }

  test("streaming dedup drops re-delivered events across triggers") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = streamingDedup(mem.toDF)
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 1, "b", 2.0))
    q.processAllAvailable()
    // trigger 2 re-delivers event 1 and adds event 3
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      Event(3, ts("2024-01-01 10:02:00"), 1, "c", 3.0))
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("streaming merge sink upserts micro-batches into a managed table") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val table = new graft.table.ManagedTable(spark, tmpDir("stream-merge") + "/t")
    val ckpt = tmpDir("stream-merge-ckpt")
    val q = mergeSink(mem.toDF.select($"event_id", $"user_id", $"value"),
      table, Seq("event_id"), ckpt)
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 1, "b", 2.0))
    q.processAllAvailable()
    assert(table.read.count() == 2)
    // second batch: update event 1, insert event 3
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "a", 9.0),
      Event(3, ts("2024-01-01 10:02:00"), 2, "c", 3.0))
    q.processAllAvailable(); q.stop()
    val got = table.read.orderBy("event_id")
      .select("event_id", "value").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 9.0), (2L, 2.0), (3L, 3.0)))
  }

  test("merge sink on a DV table takes the vectored OCC path; same rows") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val table = new graft.table.ManagedTable(spark, tmpDir("stream-mor") + "/t")
    table.overwrite(Seq((1L, 1L, 0.5)).toDF("event_id", "user_id", "value"))
    table.setProperties(Map("graft.enableDeletionVectors" -> "true"))
    val ckpt = tmpDir("stream-mor-ckpt")
    val q = mergeSink(mem.toDF.select($"event_id", $"user_id", $"value"),
      table, Seq("event_id"), ckpt)
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "a", 9.0),
      Event(2, ts("2024-01-01 10:01:00"), 1, "b", 2.0))
    q.processAllAvailable(); q.stop()
    val got = table.read.orderBy("event_id")
      .select("event_id", "value").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 9.0), (2L, 2.0)))
    // the displaced row went through a bitmap, not a rewrite: the upsert
    // commit is a MERGE carrying deleted rows
    val hist = table.history().collect()
    assert(hist.exists(r => r.getAs[String]("operation") == "MERGE"), hist.toSeq)
  }

  test("exactly-once append sink: a replayed micro-batch lands only once") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val table = new graft.table.ManagedTable(spark, tmpDir("stream-eo") + "/t")
    val ckpt = tmpDir("stream-eo-ckpt")
    val df = mem.toDF.select($"event_id", $"user_id", $"value")
    val q = appendSinkExactlyOnce(df, table, "eo-sink", ckpt)
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 1, "b", 2.0))
    q.processAllAvailable(); q.stop()
    assert(table.read.count() == 2)
    // crash-and-restart shape: replay batch 0's data under the SAME batch
    // id directly against the sink — the idempotent append refuses it
    assert(!table.appendIdempotent(
      Seq((1L, 1L, 1.0), (2L, 1L, 2.0)).toDF("event_id", "user_id", "value"),
      "eo-sink", 0L))
    assert(table.read.count() == 2)
    // the NEXT batch id still applies
    assert(table.appendIdempotent(
      Seq((3L, 2L, 3.0)).toDF("event_id", "user_id", "value"), "eo-sink", 1L))
    assert(table.read.count() == 3)
  }

  test("stream-static join enriches events with a dimension") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = enrichWithDim(mem.toDF, dim, "user_id")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 9, "b", 2.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enriched").orderBy("event_id")
      .select("event_id", "tier").collect()
    assert(rows(0).getString(1) == "gold")
    assert(rows(1).isNullAt(1)) // user 9 not in dim -> left join null
  }

  test("stream-stream interval join matches the batch twin, state bounded by watermark") {
    implicit val sq = spark.sqlContext
    val lMem = MemoryStream[Event]; val rMem = MemoryStream[Event]
    val q = intervalJoin(lMem.toDF, rMem.toDF, "user_id",
        toleranceMinutes = 1, streaming = true)
      .select(col("l.event_id").as("l_id"), col("r.event_id").as("r_id"))
      .writeStream.format("memory").queryName("ivj").outputMode("append").start()
    val lRows = Seq(
      Event(10, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      Event(12, ts("2024-01-01 10:10:00"), 2, "a", 1.0))
    val rRows = Seq(
      Event(11, ts("2024-01-01 10:00:30"), 1, "b", 2.0), // within 1 min of 10
      Event(13, ts("2024-01-01 10:13:00"), 2, "b", 2.0), // 3 min after 12 -> out
      Event(15, ts("2024-01-01 09:59:00"), 1, "b", 2.0)) // before 10 -> out
    lMem.addData(lRows: _*); rMem.addData(rRows: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("ivj").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 11L)))
    val batch = intervalJoin(lRows.toDF, rRows.toDF, "user_id", 1)
      .select(col("l.event_id").as("l_id"), col("r.event_id").as("r_id"))
      .as[(Long, Long)].collect().toSet
    assert(got == batch)
  }

  test("backfillOnce drains files via AvailableNow; rerun picks up only new files") {
    val src = tmpDir("bf-src"); val ckpt = tmpDir("bf-ckpt")
    val table = new graft.table.ManagedTable(spark, tmpDir("bf-tbl") + "/t")
    val schema = Seq((1L, "a")).toDF("k", "v").schema
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.mode("append").parquet(src)
    backfillOnce(spark, src, schema, table, Seq("k"), ckpt)
    assert(table.read.count() == 2)
    // new file lands; rerun with the same checkpoint merges only the delta
    Seq((2L, "B"), (3L, "c")).toDF("k", "v").write.mode("append").parquet(src)
    backfillOnce(spark, src, schema, table, Seq("k"), ckpt)
    assert(table.read.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
    // two backfill runs -> bootstrap-free history: OVERWRITE then MERGE
    assert(table.history().collect().map(_.getAs[String]("operation")).toSeq
      == Seq("MERGE", "OVERWRITE"))
  }

  test("left-outer stream-stream join emits unmatched rows after watermark expiry") {
    implicit val sq = spark.sqlContext
    val lMem = MemoryStream[Event]; val rMem = MemoryStream[Event]
    val q = intervalJoin(lMem.toDF, rMem.toDF, "user_id",
        toleranceMinutes = 1, streaming = true, joinType = "left_outer")
      .select(col("l.event_id").as("l_id"), col("r.event_id").as("r_id"))
      .writeStream.format("memory").queryName("ivj_outer").outputMode("append").start()
    // batch 1: one matched pair, one left row with no match
    lMem.addData(
      Event(10, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      Event(12, ts("2024-01-01 10:00:00"), 2, "a", 1.0)) // never matched
    rMem.addData(Event(11, ts("2024-01-01 10:00:30"), 1, "b", 2.0))
    q.processAllAvailable()
    // batch 2: advance BOTH watermarks far past batch 1 so the unmatched
    // left row's join state expires and the null-padded result is emitted
    lMem.addData(Event(90, ts("2024-01-01 12:00:00"), 9, "a", 0.0))
    rMem.addData(Event(91, ts("2024-01-01 12:00:00"), 9, "b", 0.0))
    q.processAllAvailable()
    lMem.addData(Event(92, ts("2024-01-01 14:00:00"), 9, "a", 0.0))
    rMem.addData(Event(93, ts("2024-01-01 14:00:00"), 9, "b", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ivj_outer")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got.contains((10L, 11L)), got)   // matched pair
    assert(got.contains((12L, -1L)), got)   // unmatched left emitted with null
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

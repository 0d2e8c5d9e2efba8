package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Relational.dsum

/** Streaming-shaped event processing. The reference has no Structured
  * Streaming (SURVEY.md §2.9 — its incrementality is batch MERGE), but a
  * training-data pipeline at 100 TB ingests continuously, so the engine
  * provides both forms of every event operator:
  *
  *  - a **batch twin** (plain DataFrame over `events`) used by the DuckDB
  *    oracle queries — identical semantics, testable exactly;
  *  - a **streaming form** (`readStream`-compatible, watermarked) for the
  *    live path, tested via MemoryStream.
  *
  * Scale notes: windowed aggregation shuffles on (window, key) with
  * map-side partial agg; the watermark bounds state. Sessionization is
  * `flatMapGroupsWithState` keyed by user — state per active user only,
  * timeouts evict idle sessions.
  */
object EventStreaming {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(start: Long, end: Long, n: Long, total: Double)

  case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
                        n_events: Long, total_value: Double)

  /** Tumbling-window aggregate — streaming form (with watermark) and batch
    * form are the same expression; `window()` works in both.
    */
  def hourlyAgg(events: DataFrame, withWm: Boolean = false): DataFrame = {
    val in = if (withWm) events.withWatermark("ts", "2 hours") else events
    in.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("window_start"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Windowed approximate-distinct-user counts via a theta sketch — the
    * streaming cardinality shape that scales where COUNT(DISTINCT) can't:
    * per-window state is one bounded sketch (mergeable across partitions
    * AND across late-arriving micro-batches), never a per-user set. Works
    * identically in batch and streaming (`withWm` adds the watermark that
    * bounds state); estimates are exact below the sketch threshold
    * (spec'd against the batch COUNT(DISTINCT) twin).
    */
  def hourlyDistinctUsers(events: DataFrame, withWm: Boolean = false): DataFrame = {
    val in = if (withWm) events.withWatermark("ts", "2 hours") else events
    in.groupBy(window(col("ts"), "1 hour"))
      .agg(theta_sketch_estimate(theta_sketch_agg(col("user_id")))
        .cast("long").as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("window_start"),
        col("approx_users"), col("n_events"))
  }

  /** Batch sessionization twin: 30-min-gap sessions via lag + running sum —
    * the classic gaps-and-islands plan. Windows are partitioned by user, so
    * the shuffle is on user_id and each partition sorts locally (scales
    * linearly with users; no global window).
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapExpr = col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long")
    val marked = events
      .withColumn("new_s",
        when(gapExpr.isNull || gapExpr > gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy("user_id", "sid")
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .orderBy("user_id", "sid")
  }

  /** Sessionization via Spark's built-in `session_window` (works in batch
    * and streaming; in streaming pair with a watermark). Same islands as
    * [[sessionizeBatch]] — the built-in merges rows whose gaps are below
    * `gap` — exposed for users who want the declarative form.
    */
  def sessionWindowAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  /** Streaming exact dedup keyed by event id with a watermark bounding
    * the dedup state. `dropDuplicatesWithinWatermark` is the form whose
    * state Spark actually EVICTS: plain `dropDuplicates("event_id")`
    * under a watermark only ages state out when the event-time column is
    * part of the dedup key, so it would keep one state row per distinct
    * id forever and OOM a long-running query. Within the watermark,
    * re-deliveries drop exactly once; beyond it they age out.
    */
  def streamingDedup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static join: enrich a stream with a static dimension (broadcast
    * per micro-batch; the dimension is re-read each batch, so slowly-
    * changing dims pick up updates without restarting the query).
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: correlate two event streams on a shared
    * key where the right event lands within [0, tolerance] after the left
    * one. In streaming both sides carry watermarks and the time bound is
    * what lets Spark evict join state (state ≤ watermark + tolerance —
    * without the interval the state grows unboundedly); the batch twin is
    * the identical expression minus watermarks, so the semantics are
    * oracle-checkable (q81).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   toleranceMinutes: Int, streaming: Boolean = false,
                   joinType: String = "inner"): DataFrame = {
    val wm = s"${2 * toleranceMinutes} minutes"
    val l = (if (streaming) left.withWatermark("ts", wm) else left).alias("l")
    val r = (if (streaming) right.withWatermark("ts", wm) else right).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") >= col("l.ts") &&
        col("r.ts") <= col("l.ts") + expr(s"INTERVAL $toleranceMinutes MINUTES"),
      joinType)
  }

  /** Streaming MERGE sink: upsert every micro-batch into a ManagedTable
    * via foreachBatch — the streaming→lakehouse loop (continuous ingestion
    * with exactly-once-per-key table state, like Delta's merge sink).
    *
    * `latestBy` picks WHICH row wins when one micro-batch carries several
    * rows for a key (e.g. `Seq("ts")` keeps the newest by event time) —
    * deterministic, ties broken by the remaining columns. Empty (the
    * default) falls back to `dropDuplicates(keys)`, which keeps an
    * ARBITRARY row per key: fine for idempotent re-deliveries of one
    * payload, wrong when a batch can contain a stale and a corrected
    * version of the same key.
    */
  def mergeSink(stream: DataFrame, table: graft.table.ManagedTable,
                keys: Seq[String], checkpoint: String,
                latestBy: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // same dispatch as the SQL MERGE surface: a table that opted into
        // merge-on-read (graft.enableDeletionVectors) upserts via the
        // optimistic vectored path — per-batch cost tracks the BATCH, no
        // target files rewritten, no table-wide lock across the batch
        // write — while the default stays the partition-pruned rewrite.
        // A conflict (maintenance OPTIMIZE or another DML landing inside
        // the batch's stage window) must NOT kill the streaming query:
        // fall back to the fully-locked recompute, which queues on the
        // lease and is always correct.
        val dedup =
          if (latestBy.isEmpty) batch.dropDuplicates(keys)
          else {
            val order = latestBy.map(col(_).desc) ++
              batch.columns.filterNot(c => keys.contains(c) ||
                latestBy.contains(c)).sorted.map(col(_).desc)
            batch.withColumn("__rn", org.apache.spark.sql.functions.row_number()
                .over(org.apache.spark.sql.expressions.Window
                  .partitionBy(keys.map(col): _*).orderBy(order: _*)))
              .filter(col("__rn") === 1).drop("__rn")
          }
        if (table.properties.get("graft.enableDeletionVectors")
            .exists(_.equalsIgnoreCase("true")))
          try table.mergeVectoredOptimistic(dedup, keys)
          catch { case _: java.util.ConcurrentModificationException =>
            // call-scoped wait: queue THIS retry on the lease without
            // mutating the shared instance's fail-fast default
            table.mergeVectored(dedup, keys, waitMs = 60000L)
          }
        else table.merge(dedup, keys)
      }
      .start()

  /** Streaming APPEND sink with the exactly-once contract (Delta's
    * `txnAppId`/`txnVersion` pattern): each micro-batch lands via
    * [[graft.table.ManagedTable.appendIdempotent]] keyed by the sink's
    * `batchId`, so a batch replayed after a crash-and-restart (Structured
    * Streaming's at-least-once delivery to foreachBatch) is a no-op
    * instead of a duplicate. Use for append-only ingestion; key-based
    * dedup across batches is [[mergeSink]]'s job.
    *
    * Batches land through the OPTIMISTIC append path: each micro-batch's
    * Spark write stages with no table lock held, so several sinks (or a
    * sink plus a batch ingest job) feeding one table overlap their data
    * writes and serialize only the milliseconds-long rename+manifest
    * commit — the replay check runs inside that same critical section, so
    * racing replays of one batch still apply exactly once. (One caveat,
    * documented on [[graft.table.ManagedTable.appendIdempotentOptimistic]]:
    * a crash inside the publish-to-manifest window degrades that batch to
    * at-least-once.)
    */
  def appendSinkExactlyOnce(stream: DataFrame, table: graft.table.ManagedTable,
                            appId: String, checkpoint: String,
                            partitionCols: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        table.appendIdempotentOptimistic(batch, appId, batchId, partitionCols); ()
      }
      .start()

  /** One-shot backfill THROUGH the streaming path: a file-source stream
    * with `Trigger.AvailableNow` drains everything currently in `srcPath`
    * into the managed table via the merge sink, then stops. The checkpoint
    * makes it incremental — re-running after new files land processes ONLY
    * the new files (asserted in spec). This is how a 100 TB historical
    * load and the live stream share one code path and one exactly-once-
    * per-key contract.
    */
  def backfillOnce(spark: SparkSession, srcPath: String,
                   schema: org.apache.spark.sql.types.StructType,
                   table: graft.table.ManagedTable, keys: Seq[String],
                   checkpoint: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(srcPath)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        table.merge(batch.dropDuplicates(keys), keys)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming sessionization: per-user state machine in
    * `flatMapGroupsWithState` — closes a session when the gap is exceeded
    * (emitting it) and keeps the open session in state across triggers.
    *
    * Event-time TIMEOUT closes idle users' sessions: the state function
    * only runs for keys with data in a batch, so without a timeout a user
    * who stops sending never has their final session emitted and their
    * state lives forever (silent loss + unbounded state over the user
    * population). The watermark drives timeout firing; a late event
    * within the gap also EXTENDS the session backwards
    * (`min(start, t)`), matching the batch twin's global sort.
    */
  def sessionizeStream(spark: SparkSession, events: Dataset[Event],
                       gapMinutes: Int,
                       watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val cur = state.get
            state.remove()
            Iterator(SessionOut(userId, cur.start, cur.end, cur.n, cur.total))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption.orNull
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            for (e <- sorted) {
              val t = e.ts.getTime
              if (cur == null) cur = SessionState(t, t, 1L, e.value)
              else if (t - cur.end > gapMs) {
                closed += SessionOut(userId, cur.start, cur.end, cur.n, cur.total)
                cur = SessionState(t, t, 1L, e.value)
              } else cur = SessionState(math.min(cur.start, t),
                math.max(cur.end, t), cur.n + 1, cur.total + e.value)
            }
            if (cur != null) {
              state.update(cur)
              // fire once the watermark passes the gap after the session's
              // last event — the point where no in-gap event can still arrive
              state.setTimeoutTimestamp(cur.end + gapMs)
            }
            closed.iterator
          }
        })
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.table.ManagedTable

/** Structured Streaming SINK writing a [[ManagedTable]] — Delta's
  * `writeStream.format("delta")` role, the managed replacement for the
  * hand-rolled `foreachBatch { table.appendIdempotent(...) }` idiom:
  *
  * {{{
  * df.writeStream
  *   .format("graft.streaming.TableSinkProvider")     // or "graft-table"
  *   .option("path", "/data/events")
  *   .option("checkpointLocation", ckpt)
  *   .partitionBy("event_date")                        // optional
  *   .outputMode("append")                             // or "complete"
  *   .start()
  * }}}
  *
  * '''Append mode''' routes each micro-batch through
  * [[ManagedTable.appendIdempotentOptimistic]]: the (appId, batchId)
  * replay marker rides inside the commit manifest, so a restarted query
  * re-offering an already-committed batch is a no-op — exactly-once for
  * every batch whose commit completed (the publish-window caveat is
  * documented on the append itself). The OCC path stages with no lease
  * held, so concurrent batch writers and other streams interleave without
  * serializing their data writes. The `appId` defaults to the query's
  * `checkpointLocation` — the identity that actually defines "the same
  * stream" across restarts — and can be overridden with
  * `option("txnAppId", ...)` when two queries share a checkpoint lineage.
  *
  * '''Complete mode''' overwrites the table with each batch result — the
  * aggregate-refresh shape; overwrite is naturally idempotent, so replays
  * converge to the same content (one extra version, same rows).
  *
  * At 100 TB: each micro-batch costs one staged write of the batch's rows
  * plus a milliseconds-wide commit lease; table maintenance (auto-compact,
  * incremental clustering) runs independently through the same OCC door.
  */
class TableStreamSink(sqlContext: SQLContext, path: String, appId: String,
                      partitionCols: Seq[String], outputMode: OutputMode)
    extends Sink {

  private def table = new ManagedTable(sqlContext.sparkSession, path)

  /** Legacy founding watermark (the earlier overwrite+property protocol):
    * immutable for this sink's lifetime — the new protocol never writes
    * it in append mode — so ONE read at first use, not a per-micro-batch
    * metadata round-trip on the hot path.
    */
  private lazy val legacyWatermark: Option[Long] = {
    val t = table
    if (t.exists) t.properties.get(s"graft.sink.$appId").map(_.toLong)
    else None
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame carries a streaming-internal plan batch writers
    // reject; re-tag it (lazy, fully distributed)
    val batch = org.apache.spark.sql.GraftBridge.asBatch(data)
    if (outputMode == OutputMode.Complete()) {
      val t = table
      if (t.exists &&
          t.properties.get(s"graft.sink.$appId").exists(_.toLong >= batchId)) ()
      else {
        t.overwrite(batch, partitionCols)
        // overwrite carries no txn slot; record the high-water mark as a
        // property so a replayed complete batch skips the rewrite
        t.setProperties(Map(s"graft.sink.$appId" -> batchId.toString))
      }
    } else {
      // back-compat: a table founded by the earlier overwrite+property
      // protocol carries its replay watermark as a PROPERTY, not an
      // in-commit txn marker — honor it so those founding batches never
      // re-append
      if (legacyWatermark.exists(_ >= batchId)) ()
      else {
        // EVERY batch — the founding one included — lands through the
        // idempotent append: the (appId, batchId) marker rides inside the
        // data commit itself, so a crash anywhere replays safely (a
        // founding overwrite followed by a separate marker write would
        // duplicate the founding rows if the crash fell between the two;
        // appendIdempotentOptimistic routes !exists through the locked
        // founding path itself)
        table.appendIdempotentOptimistic(batch, appId, batchId, partitionCols)
        ()
      }
    }
  }

  override def toString: String = s"TableStreamSink[$path]"
}

/** `format("graft.streaming.TableSinkProvider")` registration. The source
  * provider half lives in [[TableSourceProvider]]; registering BOTH under
  * the `graft-table` short name is not possible with V1 provider traits,
  * so the sink keeps its own class-name format string.
  */
class TableSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-table-sink"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table sink needs option 'path'"))
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
      s"graft-table sink supports Append and Complete output modes, got $outputMode")
    // the checkpoint IS the stream's identity across restarts — the right
    // default idempotency key. A session-wide
    // spark.sql.streaming.checkpointLocation resolves to
    // <default>/<queryName> for a NAMED query (Spark's own layout), so
    // that stable identity is honored too; an unnamed query under the
    // session default gets a FRESH checkpoint dir per start (no replay
    // protocol to defend against), so a fresh key is correct there, as
    // it is with no checkpoint at all.
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .orElse(for {
        base <- Option(sqlContext.sparkSession.conf
          .get("spark.sql.streaming.checkpointLocation", null))
        qn <- parameters.get("queryName")
      } yield s"$base/$qn")
      .getOrElse("graft-sink-" + java.util.UUID.randomUUID())
    new TableStreamSink(sqlContext, path, appId, partitionColumns, outputMode)
  }
}

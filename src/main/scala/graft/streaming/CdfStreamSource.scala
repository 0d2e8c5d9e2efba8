package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructType}

import graft.table.ManagedTable

/** Streaming change-data-feed source over a [[ManagedTable]] — Delta's
  * `readStream.option("readChangeFeed", "true")` role (the streaming twin
  * of `table_changes`, deltalake.ipynb:8408's CDF surface): each
  * micro-batch emits the rows that changed between the last processed
  * table version and the current one, classified insert / update / delete
  * on the declared keys, with the commit version attached.
  *
  * {{{
  * spark.readStream
  *   .format("graft.streaming.CdfSourceProvider")
  *   .option("path", "/data/events")        // managed-table root
  *   .option("keys", "event_id")            // CDF classification keys
  *   .option("startingVersion", "0")        // optional; default = current
  *   .option("startingTimestamp", "2026-01-01T00:00:00Z") // alternative
  *   .option("maxVersionsPerTrigger", "10") // admission control
  *   .option("maxFilesPerTrigger", "1000")  // admission control
  *   .load()
  * }}}
  *
  * Offsets are table VERSIONS (checkpointable longs), so restarts resume
  * exactly where the checkpoint stopped. Each batch costs two manifest
  * reads plus one hash-compared key join of the two snapshots
  * ([[graft.table.Merge.snapshotDiff]]) — the documented
  * no-write-amplification CDF trade: nothing is captured at write time,
  * the feed derives from time travel. Versions between two triggers
  * coalesce into one diff (v_last → v_now), which is exactly the net
  * change. Snapshots the retention vacuum already dropped can't diff:
  * keep `startingVersion`/checkpoint inside the retention window.
  *
  * '''Admission control''' (Delta's `maxFilesPerTrigger` role): without
  * limits, a stream that was down through N commits — or one backfilling
  * from `startingVersion 0` on a large table — folds the entire backlog
  * into ONE batch, whose diff join must hold both end snapshots; at
  * 100 TB that first batch is the whole table. With
  * `maxVersionsPerTrigger` / `maxFilesPerTrigger` set, [[latestOffset]]
  * caps the end version each trigger offers, so the backlog drains as a
  * sequence of bounded batches. The source implements Spark's
  * [[SupportsTriggerAvailableNow]] (hence `SupportsAdmissionControl`) —
  * the engine hands `latestOffset` the last COMMITTED offset as the walk
  * base, so pacing needs no state of its own anywhere: not in memory,
  * not on disk, correct across restarts by construction. The atom is a
  * COMMIT: a version never splits across batches (each batch stays an
  * exact net-diff between two logged versions), and at least one commit
  * is always admitted even when it alone exceeds `maxFilesPerTrigger` —
  * Delta's same always-make-progress rule. Per-commit file counts come
  * from the history checkpoint's `filesAdded` metric (one driver-side
  * text read per trigger, no manifest folding); commits from before that
  * metric existed count as 0 — conservative toward larger batches, never
  * toward a stall.
  *
  * '''Trigger.AvailableNow''': [[prepareForTriggerAvailableNow]] latches
  * the current version as the drain target; `latestOffset` never offers
  * past it, and the engine keeps triggering capped batches until the
  * target is reached, then stops — a bounded-memory "process the backlog
  * and exit" run. (Without the interface the engine would wrap the
  * source and latch its FIRST capped offer, stopping a rate-limited
  * drain after one batch.)
  */
class CdfStreamSource(sqlContext: SQLContext, path: String,
                      keys: Seq[String], startingVersion: Long,
                      maxVersions: Option[Long], maxFiles: Option[Long],
                      maxBytes: Option[Long] = None,
                      initialSnapshot: Boolean = false)
    extends Source with SupportsTriggerAvailableNow with SnapshotPhase {

  private val spark = sqlContext.sparkSession
  private def table = new ManagedTable(spark, path)
  override protected def snapshotTable: ManagedTable = table

  override val schema: StructType = CdfSourceProvider.cdfSchema(spark, path)

  /** Trigger.AvailableNow drain target; None under other triggers. */
  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(table.version)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  private def toVersion(o: OffsetV2): Long = StreamCommon.toVersion(o)

  /** The END version this trigger offers: the current version (capped at
    * the AvailableNow target when latched), admission-capped relative to
    * the engine-provided `start` — the last committed offset, or null on
    * a stream's very first batch, where the resolved `startingVersion`
    * is the exact position. The engine compares the result against its
    * checkpointed offset, so nothing here can skip or replay a change;
    * the cap only bounds batch SIZE.
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val cur0 = table.version
    if (cur0 < 0) return null
    val cur = availableNowTarget.fold(cur0)(math.min(cur0, _))
    val parsed = Option(start).map(StreamCommon.parseOffset)
    parsed match {
      case None if initialSnapshot => snapAdvance(cur, 0L, maxFiles, maxBytes)
      case Some(Left(so)) =>
        snapAdvance(so.version, so.filesDelivered, maxFiles, maxBytes)
      case Some(Right(base)) =>
        LongOffset(StreamCommon.pacedEnd(table, base, cur, maxVersions,
          maxFiles, maxBytes))
      case None =>
        LongOffset(StreamCommon.pacedEnd(table, startingVersion, cur,
          maxVersions, maxFiles, maxBytes))
    }
  }

  override def reportLatestOffset(): OffsetV2 = {
    val v = table.version
    if (v < 0) null else LongOffset(v)
  }

  // legacy V1 path — the engine uses latestOffset for admission-control
  // sources; keep a sane uncapped answer should anything else call it
  override def getOffset: Option[Offset] = {
    val v = table.version
    if (v >= 0) Some(LongOffset(v)) else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val startParsed = start.map(o => StreamCommon.parseOffset(o: OffsetV2))
    val endParsed = StreamCommon.parseOffset(end: OffsetV2)
    // initial-snapshot mode: the first batches replay the pinned snapshot
    // as `insert` rows — sorted-manifest slices with the pinned version's
    // DVs applied — before the incremental diff phase (Delta's
    // readChangeFeed-with-snapshot shape; also the only CDF start on a
    // table whose early log was expired by retention)
    val inSnapshot = (initialSnapshot && start.isEmpty) ||
      startParsed.exists(_.isLeft)
    if (inSnapshot) {
      val (pin, slice) = snapshotSlice(startParsed, endParsed)
      val rows =
        if (slice.isEmpty)
          table.read.filter(org.apache.spark.sql.functions.lit(false))
        else table.readFileSubset(pin, slice)
      val out = rows
        .withColumn("change_type", org.apache.spark.sql.functions.lit("insert"))
        .withColumn("graft_commit_version",
          org.apache.spark.sql.functions.lit(pin))
        .withColumn("graft_commit_timestamp",
          org.apache.spark.sql.functions
            .lit(table.commitTimestamp(pin).orNull).cast("timestamp"))
      return org.apache.spark.sql.GraftBridge.asStreaming(
        out.select(schema.fieldNames.map(col).toSeq: _*))
    }
    val fromV = startParsed.flatMap(_.toOption).getOrElse(startingVersion)
    val toV = endParsed.fold(_.version, identity)
    val diff = table.changes(fromV, toV, keys)
      .filter(col("change_type") =!= "unchanged")
      .withColumn("graft_commit_version",
        org.apache.spark.sql.functions.lit(toV))
      .withColumn("graft_commit_timestamp",
        org.apache.spark.sql.functions
          .lit(table.commitTimestamp(toV).orNull).cast("timestamp"))
    // the engine swaps this plan in for the source: column ORDER must
    // match the declared schema (the diff's join moved the keys first),
    // and the frame must carry the streaming tag
    org.apache.spark.sql.GraftBridge.asStreaming(
      diff.select(schema.fieldNames.map(col).toSeq: _*))
  }

  override def stop(): Unit = ()
}

/** `format("graft.streaming.CdfSourceProvider")` registration. */
class CdfSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private case class Params(path: String, keys: Seq[String],
      startV: Option[Long], startTs: Option[String],
      maxVersions: Option[Long], maxFiles: Option[Long],
      maxBytes: Option[Long], initialSnapshot: Boolean)

  private def params(parameters: Map[String, String]): Params = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-cdf needs option 'path'"))
    val keys = parameters.getOrElse("keys",
      throw new IllegalArgumentException("graft-cdf needs option 'keys'"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    def posLong(name: String): Option[Long] = parameters.get(name).map { s =>
      val v = s.toLong
      require(v >= 1, s"$name must be >= 1, got $v")
      v
    }
    val startV = parameters.get("startingVersion").map(_.toLong)
    val startTs = parameters.get("startingTimestamp")
    require(startV.isEmpty || startTs.isEmpty,
      "startingVersion and startingTimestamp are mutually exclusive")
    val snap = parameters.get("initialSnapshot")
      .exists(_.trim.equalsIgnoreCase("true"))
    require(!snap || (startV.isEmpty && startTs.isEmpty),
      "initialSnapshot replaces startingVersion/startingTimestamp: the " +
        "first batches ARE the current snapshot (as inserts)")
    Params(path, keys, startV, startTs,
      posLong("maxVersionsPerTrigger"), posLong("maxFilesPerTrigger"),
      posLong("maxBytesPerTrigger"), snap)
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val p = params(parameters)
    (shortName(), CdfSourceProvider.cdfSchema(sqlContext.sparkSession, p.path))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val p = params(parameters)
    val t = new ManagedTable(sqlContext.sparkSession, p.path)
    require(t.exists, s"no managed table at ${p.path}")
    // startingTimestamp (Delta: "changes committed AT OR AFTER the
    // timestamp") resolves to the version just below the first qualifying
    // commit — the exclusive lower bound of the (fromV, toV] diff, with
    // -1 meaning the empty pre-founding state (full replay as inserts).
    // All commits predating ts ⇒ behave like the default latest start.
    // Default: only changes committed AFTER stream start (Delta's default
    // readChangeFeed position is "latest"), resolved once and pinned
    // ([[StreamCommon.resolveStart]]).
    val resolved = StreamCommon.resolveStart(sqlContext.sparkSession,
      metadataPath, "graft-cdf-start", t, p.startV, p.startTs)
    new CdfStreamSource(sqlContext, p.path, p.keys, resolved,
      p.maxVersions, p.maxFiles, p.maxBytes, p.initialSnapshot)
  }
}

object CdfSourceProvider {
  /** Table schema + CDF metadata columns (`change_type`,
    * `graft_commit_version`, `graft_commit_timestamp` — Delta's
    * `_change_type`/`_commit_version`/`_commit_timestamp` trio).
    * Migration note: `graft_commit_timestamp` was added in round 9 — a
    * query resuming into a SINK table created with the two-column
    * metadata schema needs one-time sink schema evolution (e.g.
    * `mergeSchema`); the source side resumes fine (offsets are plain
    * versions, independent of the schema).
    */
  def cdfSchema(spark: org.apache.spark.sql.SparkSession, path: String): StructType =
    new ManagedTable(spark, path).read.schema
      .add("change_type", StringType)
      .add("graft_commit_version", org.apache.spark.sql.types.LongType)
      .add("graft_commit_timestamp", org.apache.spark.sql.types.TimestampType)
}

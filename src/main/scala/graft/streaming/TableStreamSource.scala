package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.table.ManagedTable

/** Shared machinery of the managed-table streaming sources: offset
  * decoding, admission-control pacing and the pinned "latest" start
  * resolution — one implementation serving both [[CdfStreamSource]] and
  * [[TableStreamSource]].
  */
private[streaming] object StreamCommon {

  def toVersion(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json().trim.toLong
  }

  /** The END version a trigger offers: `cur`, admission-capped relative
    * to `base` by `maxVersionsPerTrigger` / `maxFilesPerTrigger`. The
    * atom is a COMMIT — a version never splits across batches — and at
    * least one commit is always admitted even when it alone exceeds the
    * file cap (Delta's always-make-progress rule). Per-commit file counts
    * come from the history checkpoint's `filesAdded` metric (one
    * driver-side text read per trigger, no manifest folding); commits
    * predating the metric count as 0 — conservative toward larger
    * batches, never toward a stall.
    */
  def pacedEnd(table: ManagedTable, base: Long, cur: Long,
               maxVersions: Option[Long], maxFiles: Option[Long],
               maxBytes: Option[Long] = None): Long = {
    if (maxVersions.isEmpty && maxFiles.isEmpty && maxBytes.isEmpty)
      return math.max(cur, base)
    var v = base; var admitted = 0L; var files = 0L; var bytes = 0L
    var stop = false
    table.commitPace(base).foreach { case (ver, fa, ba) =>
      if (!stop && ver <= cur) {
        val f = math.max(0L, fa)
        // bytesAdded = -1 means a commit from before the metric existed:
        // under a BYTE cap, unknown must ride ALONE (treat it as
        // cap-exceeding), not as 0 — a legacy multi-TB backlog would
        // otherwise drain in one unbounded batch, the exact blowup the
        // option exists to prevent. File counts keep the documented
        // conservative-toward-larger-batches -1→0 behavior (a stall-free
        // default with no size blowup: files cap count, not volume).
        val b = if (ba < 0) Long.MaxValue / 4 else ba
        val overV = maxVersions.exists(admitted >= _)
        val overF = maxFiles.exists(m => admitted > 0 && files + f > m)
        val overB = maxBytes.exists(m => admitted > 0 && bytes + b > m)
        if (overV || overF || overB) stop = true
        else { v = ver; admitted += 1; files += f; bytes += b }
      }
    }
    math.max(v, base)
  }

  /** Offset decode shared by the snapshot-capable sources:
    * `Right(version)` for a fully-delivered-through-version offset,
    * `Left(progress)` for an initial snapshot still being delivered.
    */
  def parseOffset(o: OffsetV2): Either[SnapshotOffset, Long] = o match {
    case s: SnapshotOffset => Left(s)
    case s: SerializedOffset =>
      SnapshotOffset.parse(s.json).toLeft(toVersion(s))
    case other => Right(toVersion(other))
  }

  /** Resolve the stream's exclusive lower-bound version. Explicit
    * `startingVersion` / `startingTimestamp` win; otherwise "latest" is
    * resolved ONCE and pinned in the stream's metadata dir — a restart
    * before the first offset commit must not re-resolve to a later
    * version and skip the changes in between. The pin write races safely:
    * create-if-absent decides a winner, losers (and starters that merely
    * observed fs.exists) retry the read until the winner's contents land.
    */
  def resolveStart(spark: SparkSession, metadataPath: String, pinName: String,
                   t: ManagedTable, startV: Option[Long],
                   startTs: Option[String]): Long = {
    val tsResolvedStart = startTs.map { ts =>
      t.versionAtOrAfter(ts).map(v => math.max(-1L, v - 1)).getOrElse(t.version)
    }
    startV.orElse(tsResolvedStart).getOrElse {
      val pin = new Path(metadataPath, pinName)
      val fs = pin.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def readPinRetrying(): Long = {
        def readPin(): String = {
          val in = fs.open(pin)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        }
        var s = readPin(); var waitedMs = 0L
        while (s.isEmpty && waitedMs < 10000L) {
          Thread.sleep(50L); waitedMs += 50L; s = readPin()
        }
        require(s.nonEmpty,
          s"stream start pin $pin still empty after ${waitedMs}ms — " +
            "winner crashed between create and write; delete the pin to recover")
        s.toLong
      }
      if (fs.exists(pin)) readPinRetrying()
      else {
        val v = t.version
        fs.mkdirs(pin.getParent)
        try {
          val out = fs.create(pin, false)
          try out.write(v.toString.getBytes("UTF-8")) finally out.close()
          v
        } catch { case _: java.io.IOException => readPinRetrying() }
      }
    }
  }
}

/** Offset of an initial snapshot still being delivered: the snapshot is
  * pinned at table `version` and the first `filesDelivered` files (of the
  * version's manifest in sorted order) have been emitted. Once the whole
  * snapshot is out, offsets become plain version longs and the stream is
  * incremental — exactly Delta's (reservoirVersion, index) shape.
  */
private[streaming] case class SnapshotOffset(version: Long, filesDelivered: Long)
    extends Offset {
  override val json: String =
    s"""{"snapshotVersion":$version,"filesDelivered":$filesDelivered}"""
}

private[streaming] object SnapshotOffset {
  private val Rx =
    """\{"snapshotVersion":(\d+),"filesDelivered":(\d+)\}""".r
  def parse(json: String): Option[SnapshotOffset] = json.trim match {
    case Rx(v, f) => Some(SnapshotOffset(v.toLong, f.toLong))
    case _ => None
  }
}

/** The initial-snapshot delivery machinery shared by both managed-table
  * stream sources: the pinned version's sorted manifest (memoized — the
  * pin never moves mid-snapshot), slice bounds from the offset pair, and
  * admission-capped slice advancement. Byte caps use the stats sidecar's
  * cached per-file lengths (exact even on size-skewed snapshots — an
  * average-size conversion would let one jumbo file blow past the cap),
  * with the commit's average size as the fallback for uncached paths.
  *
  * Above the distributed-planning cutover (the same
  * `graft.metadata.distributedPlanning` switch the readWhere family
  * uses), the sorted manifest is never materialized on the driver:
  * slices come from [[ManagedTable.snapshotIndexedDistributed]] — a Spark
  * job over the parquet-checkpoint rows that collects ONLY the slice —
  * and the total from the commit's O(1) `numFiles` record. Driver memory
  * per trigger is O(maxFilesPerTrigger + churn), retiring the
  * 1e7-file / GBs-of-driver-heap ceiling the readWhere family already
  * escaped. Both venues slice the SAME Java-string-sorted order, so a
  * restart that crosses the cutover resumes exactly.
  */
private[streaming] trait SnapshotPhase {
  protected def snapshotTable: ManagedTable

  private val snapFilesMemo = scala.collection.mutable.Map.empty[Long, Seq[String]]
  protected def snapshotFiles(v: Long): Seq[String] =
    snapFilesMemo.getOrElseUpdate(v, snapshotTable.manifestFiles(v).sorted)

  private var snapLengthsMemo: Option[Map[String, Long]] = None
  private def snapLengths: Map[String, Long] = snapLengthsMemo match {
    case Some(m) => m
    case None =>
      val m = snapshotTable.sidecarLengths; snapLengthsMemo = Some(m); m
  }

  /** The pinned version's sorted-indexed manifest RDD, memoized per pin —
    * one sort job per snapshot, every later slice/pacing probe a cheap
    * filter over its cached blocks. Released when the final slice is
    * delivered ([[snapshotSlice]]) or a new pin supersedes it — a stream
    * that turns incremental must not keep GBs of manifest blocks cached
    * for its remaining lifetime.
    */
  private var snapIdxMemo:
      Option[(Long, graft.table.SnapshotIndex)] = None
  private def releaseSnapIndex(): Unit = {
    snapIdxMemo.foreach(_._2.release())
    snapIdxMemo = None
  }
  private def snapIndexed(pin: Long): Option[graft.table.SnapshotIndex] =
    snapIdxMemo match {
      case Some((p, idx)) if p == pin => Some(idx)
      case _ =>
        val built = snapshotTable.snapshotIndexedDistributed(pin)
        built.foreach { idx =>
          releaseSnapIndex()
          snapIdxMemo = Some((pin, idx))
        }
        built
    }

  /** (path, len) rows for indices [fromIdx, toIdx) of the pinned sorted
    * manifest, collected from the memoized index's partition-pruned
    * slice — the driver holds only the slice. None when no parquet
    * checkpoint anchors the pin.
    */
  private def sliceDistributed(pin: Long, fromIdx: Long,
      toIdx: Long): Option[Seq[(String, Long)]] =
    if (toIdx <= fromIdx) Some(Nil)
    else snapIndexed(pin).map(_.slice(fromIdx, toIdx))

  /** (pin, slice) for a snapshot getBatch: files [fromIdx, toIdx) of the
    * pinned version's sorted manifest.
    */
  protected def snapshotSlice(
      startParsed: Option[Either[SnapshotOffset, Long]],
      end: Either[SnapshotOffset, Long]): (Long, Seq[String]) = {
    val fromIdx = startParsed.flatMap(_.left.toOption)
      .map(_.filesDelivered).getOrElse(0L)
    val pin = end.fold(_.version, identity)
    if (snapshotTable.snapshotPlanningDistributed) {
      val toIdx = end.fold(_.filesDelivered,
        _ => snapshotTable.commitSummary(pin).map(_._1).getOrElse(-1L))
      if (toIdx >= 0)
        sliceDistributed(pin, fromIdx, toIdx) match {
          case Some(rows) =>
            // a plain-version end means this slice COMPLETES the
            // snapshot: the cached manifest index has served its purpose
            if (end.isRight) releaseSnapIndex()
            return (pin, rows.map(_._1))
          case None => () // no parquet checkpoint: driver fold below
        }
    }
    val all = snapshotFiles(pin)
    val toIdx = end.fold(_.filesDelivered, _ => all.size.toLong)
    (pin, all.slice(fromIdx.toInt, toIdx.toInt))
  }

  /** Advance the snapshot by one admission-capped slice; the plain
    * version offset once it completes. At least one file always admits
    * (the always-make-progress rule).
    */
  protected def snapAdvance(pin: Long, delivered: Long,
      maxFiles: Option[Long], maxBytes: Option[Long]): OffsetV2 = {
    if (snapshotTable.snapshotPlanningDistributed)
      snapAdvanceDistributed(pin, delivered, maxFiles, maxBytes) match {
        case Some(o) => return o
        case None => () // no checkpoint / no history record: driver fold
      }
    val all = snapshotFiles(pin)
    val total = all.size.toLong
    val next =
      if (maxFiles.isEmpty && maxBytes.isEmpty) total
      else {
        val avg = avgFileSize(pin)
        val lens = if (maxBytes.isDefined) snapLengths else Map.empty[String, Long]
        var i = delivered; var nf = 0L; var bytes = 0L; var stop = false
        while (i < total && !stop) {
          val len = lens.getOrElse(all(i.toInt), avg)
          val overF = maxFiles.exists(m => nf + 1 > m)
          val overB = maxBytes.exists(m => nf > 0 && bytes + len > m)
          if (overF || overB) stop = true
          else { nf += 1; bytes += len; i += 1 }
        }
        math.max(i, delivered + 1)
      }
    if (next < total) SnapshotOffset(pin, next) else LongOffset(pin)
  }

  private def avgFileSize(pin: Long): Long =
    snapshotTable.commitSummary(pin).collect {
      case (nf, bytes) if nf > 0 && bytes > 0 =>
        math.max(1L, bytes / nf) }.getOrElse(1L)

  /** The distributed venue of [[snapAdvance]]: total from the commit's
    * `numFiles` record, lengths from bounded filter jobs over the
    * memoized sorted index — the driver holds one chunk (≤ 64k
    * (path, len) rows) at a time, never the manifest; with a file cap
    * the whole admission window fits one chunk, so pacing costs one job.
    * Same admission semantics as the driver loop.
    */
  private def snapAdvanceDistributed(pin: Long, delivered: Long,
      maxFiles: Option[Long], maxBytes: Option[Long]): Option[OffsetV2] = {
    val total = snapshotTable.commitSummary(pin).map(_._1).getOrElse(
      return None)
    val next =
      if (maxFiles.isEmpty && maxBytes.isEmpty) total
      else {
        val avg = avgFileSize(pin)
        // saturating: a Long.MaxValue "unbounded" cap must not wrap
        val chunk = maxFiles.map(m => math.min(m, 65535L) + 1).getOrElse(65536L)
        var i = delivered; var nf = 0L; var bytes = 0L; var stop = false
        while (i < total && !stop) {
          val rows = sliceDistributed(
            pin, i, math.min(total, i + chunk)).getOrElse(return None)
          if (rows.isEmpty) stop = true // defensive: never spin
          else {
            val it = rows.iterator
            while (it.hasNext && !stop) {
              val (_, len0) = it.next()
              val len = if (len0 >= 0) len0 else avg
              val overF = maxFiles.exists(m => nf + 1 > m)
              val overB = maxBytes.exists(m => nf > 0 && bytes + len > m)
              if (overF || overB) stop = true
              else { nf += 1; bytes += len; i += 1 }
            }
          }
        }
        math.max(i, delivered + 1)
      }
    Some(if (next < total) SnapshotOffset(pin, next) else LongOffset(pin))
  }
}

/** Streaming source over a [[ManagedTable]]'s APPENDS — Delta's plain
  * `spark.readStream.format("delta")` role (the CDF-less default): each
  * micro-batch emits the rows the commits in the batch window ADDED,
  * attributed per commit through its own manifest diff, so a later
  * OPTIMIZE's rewritten files are never re-emitted as new rows.
  *
  * {{{
  * spark.readStream
  *   .format("graft.streaming.TableSourceProvider")   // or "graft-table"
  *   .option("path", "/data/events")        // managed-table root
  *   .option("startingVersion", "0")        // optional; default = latest
  *   .option("maxVersionsPerTrigger", "10") // admission control
  *   .option("maxFilesPerTrigger", "1000")  // admission control
  *   .option("skipChangeCommits", "true")   // or ignoreDeletes / ignoreChanges
  *   .load()
  * }}}
  *
  * Commit classification (Delta's `DeltaSource` contract):
  *  - APPEND / COPY INTO / MERGE_INSERT_ONLY: emit the commit's added
  *    files — rows exactly as appended (the version's own DV state, so a
  *    LATER delete never retro-filters a replayed append);
  *  - OPTIMIZE / ZORDER / CLUSTER / PURGE / MATERIALIZE: row-neutral
  *    rewrites (dataChange=false in Delta terms), silently skipped;
  *  - row-changing commits (DELETE / UPDATE / MERGE / OVERWRITE /
  *    REPLACE_WHERE / RESTORE / RECOVER / schema rewrites): the stream
  *    FAILS by default — downstream consumers believing they hold an
  *    append-only feed must not silently miss removals. Opt-outs match
  *    Delta: `ignoreDeletes` skips DELETE commits, `skipChangeCommits`
  *    skips every row-changing commit, `ignoreChanges` (legacy) emits
  *    such commits' ADDED files (rewritten rows re-emitted: downstream
  *    sees at-least-once on updated rows, Delta's documented trade);
  *  - metadata-only commits (properties, identity, metadata-only schema
  *    adds): no file churn, skipped.
  *
  * The FOUNDING version (v0) counts all its files as adds whatever its
  * operation — a `startingVersion 0` replay begins from the table's
  * initial population, Delta's same convention. A commit whose
  * PREDECESSOR manifest has been expired by log retention refuses (its
  * incremental diff is unrecoverable); only genuine v0 emits a snapshot.
  *
  * Offsets are table VERSIONS (checkpointable longs): restarts resume
  * exactly, each batch is the union of whole commits, and admission
  * control ([[StreamCommon.pacedEnd]]) drains backlogs as bounded batches
  * under `Trigger.AvailableNow` exactly like the CDF source. Default
  * start is "latest", resolved once and pinned
  * ([[StreamCommon.resolveStart]]).
  *
  * `option("initialSnapshot", "true")` — Delta's actual `readStream`
  * default shape: the FIRST batches deliver the whole current snapshot
  * (served at a pinned version, so a mid-snapshot restart re-delivers the
  * remaining slices identically), every later batch incremental. This is
  * also the only way to stream a table whose early log was expired by
  * retention: those commits cannot replay, the snapshot can. With
  * `maxFilesPerTrigger = k` the snapshot is PACED — delivered as
  * ⌈files/k⌉ batches through [[SnapshotOffset]] progress offsets below
  * the pinned version (Delta's (reservoirVersion, index) shape), each
  * batch one sorted-manifest slice read by `readFileSubset` with the
  * pinned version's deletion vectors applied; without the option the
  * snapshot is one table-sized batch.
  *
  * At 100 TB: a batch costs one manifest diff per admitted commit plus a
  * scan of ONLY the added files — never the snapshot; the history
  * checkpoint supplies per-commit file counts without manifest folding.
  */
class TableStreamSource(sqlContext: SQLContext, path: String,
                        startingVersion: Long,
                        maxVersions: Option[Long], maxFiles: Option[Long],
                        ignoreDeletes: Boolean, ignoreChanges: Boolean,
                        skipChangeCommits: Boolean,
                        initialSnapshot: Boolean = false,
                        maxBytes: Option[Long] = None)
    extends Source with SupportsTriggerAvailableNow with SnapshotPhase {

  private val spark = sqlContext.sparkSession
  private def table = new ManagedTable(spark, path)
  override protected def snapshotTable: ManagedTable = table

  override val schema: StructType = TableSourceProvider.tableSchema(spark, path)

  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(table.version)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  private def parseOffset(o: OffsetV2): Either[SnapshotOffset, Long] =
    StreamCommon.parseOffset(o)

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val cur0 = table.version
    if (cur0 < 0) return null
    val cur = availableNowTarget.fold(cur0)(math.min(cur0, _))
    val parsed = Option(start).map(parseOffset)
    // snapshot phase: advance by admission-capped slices until the
    // pinned version's manifest is fully delivered, then switch to plain
    // version offsets (incremental phase)
    parsed match {
      case None if initialSnapshot => snapAdvance(cur, 0L, maxFiles, maxBytes)
      case Some(Left(snap)) =>
        snapAdvance(snap.version, snap.filesDelivered, maxFiles, maxBytes)
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

  override def getOffset: Option[Offset] = {
    val v = table.version
    if (v >= 0) Some(LongOffset(v)) else None
  }

  // the shared taxonomy ([[graft.table.CommitOps]]) keeps this classifier
  // and IncrementalAgg's in lockstep
  private val addBearing = graft.table.CommitOps.addBearing
  private def rowNeutral(op: String): Boolean =
    graft.table.CommitOps.rowNeutral(op)
  private val rowChanging = graft.table.CommitOps.rowChanging

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val t = table
    val startParsed = start.map(o => parseOffset(o: OffsetV2))
    val endParsed = parseOffset(end: OffsetV2)
    // initial-snapshot mode (Delta's actual readStream default): the first
    // batches deliver the pinned snapshot — sorted-manifest slices via
    // readFileSubset (the pinned version's DVs applied), so a mid-snapshot
    // restart re-delivers the remaining slices identically — and every
    // later batch is incremental. This is the only way to stream a table
    // whose early log was already expired by retention (replaying those
    // commits is impossible; the snapshot is not).
    val inSnapshot = (initialSnapshot && start.isEmpty) ||
      startParsed.exists(_.isLeft)
    if (inSnapshot) {
      val (pin, slice) = snapshotSlice(startParsed, endParsed)
      val out =
        if (slice.isEmpty) t.read.filter(org.apache.spark.sql.functions.lit(false))
        else t.readFileSubset(pin, slice)
      return org.apache.spark.sql.GraftBridge.asStreaming(
        out.select(
          schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*))
    }
    // past the snapshot branch, a Some(start) is always Right(version)
    val fromV = startParsed.flatMap(_.toOption).getOrElse(startingVersion)
    val toV = endParsed.fold(_.version, identity)
    val window = t.operationsBetween(fromV, toV)
    val firstLogged = t.earliestVersion
    // no upfront horizon check: whether an expired manifest is actually
    // NEEDED depends on the window's commits (a row-neutral commit at the
    // retention boundary emits nothing and needs no diff base) — the
    // files() accessor below refuses precisely when a diff truly requires
    // an expired manifest
    // adjacent versions share file lists through the memo: w commits cost
    // w+1 manifest reads, not 2w. v = −1 is the empty pre-founding state;
    // an EXPIRED manifest refuses — treating it as empty would re-emit
    // the whole snapshot at the boundary version as "adds" (silent
    // duplicate delivery after a log cleanup trims up to the stream's
    // next version)
    val memo = scala.collection.mutable.Map.empty[Long, Set[String]]
    def files(v: Long): Set[String] =
      memo.getOrElseUpdate(v,
        if (v < 0) Set.empty
        else if (v < firstLogged) throw new IllegalStateException(
          s"TableStreamSource at $path: manifest v$v was expired by log " +
            s"retention (earliest retained $firstLogged) — the incremental " +
            "diff for the next batch is unrecoverable; start a NEW query " +
            "(fresh checkpoint — a kept checkpoint overrides these " +
            s"options) with startingVersion >= ${firstLogged + 1} or " +
            "initialSnapshot=true")
        else t.manifestFiles(v).toSet)
    def adds(v: Long): Seq[String] = (files(v) -- files(v - 1)).toSeq.sorted
    val parts: Seq[DataFrame] = window.flatMap { case (v, op) =>
      def emit(): Seq[DataFrame] = {
        val a = adds(v)
        if (a.isEmpty) Nil else Seq(t.readFileSubset(v, a))
      }
      def refuse(): Nothing = throw new IllegalStateException(
        s"TableStreamSource at $path: version $v is a row-changing commit " +
          s"($op); an append-only stream cannot represent it. Set " +
          "skipChangeCommits=true to skip such commits, ignoreDeletes=true " +
          "for deletes only, or ignoreChanges=true to re-emit rewritten rows.")
      if (v == 0L) emit() // the founding commit: all its files are adds
      else if (addBearing(op)) emit()
      else if (rowNeutral(op)) Nil
      else if (skipChangeCommits) Nil
      else if (rowChanging(op)) {
        if (op == "DELETE" && ignoreDeletes) Nil
        else if (ignoreChanges) emit()
        else refuse()
      }
      // an op this build doesn't know: transparent only when it provably
      // moved no files; otherwise refuse rather than guess
      else if (adds(v).isEmpty && files(v - 1) == files(v)) Nil
      else if (ignoreChanges) emit()
      else refuse()
    }
    val out =
      if (parts.isEmpty)
        t.read.filter(org.apache.spark.sql.functions.lit(false))
      else parts.reduce(_ unionByName _)
    org.apache.spark.sql.GraftBridge.asStreaming(
      out.select(schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*))
  }

  override def stop(): Unit = ()
}

/** `format("graft.streaming.TableSourceProvider")` registration. */
class TableSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private case class Params(path: String, startV: Option[Long],
      startTs: Option[String], maxVersions: Option[Long],
      maxFiles: Option[Long], maxBytes: Option[Long],
      ignoreDeletes: Boolean,
      ignoreChanges: Boolean, skipChangeCommits: Boolean,
      initialSnapshot: Boolean)

  private def params(parameters: Map[String, String]): Params = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table needs option 'path'"))
    def posLong(name: String): Option[Long] = parameters.get(name).map { s =>
      val v = s.toLong
      require(v >= 1, s"$name must be >= 1, got $v")
      v
    }
    def bool(name: String): Boolean =
      parameters.get(name).exists(_.trim.equalsIgnoreCase("true"))
    val startV = parameters.get("startingVersion").map { s =>
      val v = scala.util.Try(s.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"startingVersion must be a non-negative integer, got '$s'"))
      require(v >= 0, s"startingVersion must be >= 0, got $v")
      v
    }
    val startTs = parameters.get("startingTimestamp")
    require(startV.isEmpty || startTs.isEmpty,
      "startingVersion and startingTimestamp are mutually exclusive")
    val snap = bool("initialSnapshot")
    require(!snap || (startV.isEmpty && startTs.isEmpty),
      "initialSnapshot replaces startingVersion/startingTimestamp: the " +
        "first batch IS the current snapshot")
    Params(path, startV, startTs,
      posLong("maxVersionsPerTrigger"), posLong("maxFilesPerTrigger"),
      posLong("maxBytesPerTrigger"),
      bool("ignoreDeletes"), bool("ignoreChanges"), bool("skipChangeCommits"),
      snap)
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val p = params(parameters)
    (shortName(), TableSourceProvider.tableSchema(sqlContext.sparkSession, p.path))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val p = params(parameters)
    val t = new ManagedTable(sqlContext.sparkSession, p.path)
    require(t.exists, s"no managed table at ${p.path}")
    // startingVersion semantics are INCLUSIVE (Delta's): the exclusive
    // lower bound is one below it
    val resolved = StreamCommon.resolveStart(sqlContext.sparkSession,
      metadataPath, "graft-table-start", t, p.startV.map(_ - 1), p.startTs)
    new TableStreamSource(sqlContext, p.path, resolved,
      p.maxVersions, p.maxFiles,
      p.ignoreDeletes, p.ignoreChanges, p.skipChangeCommits,
      p.initialSnapshot, p.maxBytes)
  }
}

object TableSourceProvider {
  /** The stream's schema: the table's read schema, pinned at start. */
  def tableSchema(spark: SparkSession, path: String): StructType =
    new ManagedTable(spark, path).read.schema
}

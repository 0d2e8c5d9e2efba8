package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
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
  */
class CdfStreamSource(sqlContext: SQLContext, path: String,
                      keys: Seq[String], startingVersion: Long)
    extends Source {

  private val spark = sqlContext.sparkSession
  private def table = new ManagedTable(spark, path)

  override val schema: StructType = CdfSourceProvider.cdfSchema(spark, path)

  private def toVersion(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json().trim.toLong
  }

  // ALWAYS the current version — the engine compares against its
  // checkpointed offset, so a restart resumes from the checkpoint even
  // though this instance's startingVersion re-resolved to "now"; gating on
  // startingVersion here would withhold changes committed while the stream
  // was down until some future commit bumped the version past it.
  // startingVersion only seeds fromV for the very first batch (start=None).
  override def getOffset: Option[Offset] = {
    val v = table.version
    if (v >= 0) Some(LongOffset(v)) else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(toVersion).getOrElse(startingVersion)
    val toV = toVersion(end)
    val diff = table.changes(fromV, toV, keys)
      .filter(col("change_type") =!= "unchanged")
      .withColumn("graft_commit_version",
        org.apache.spark.sql.functions.lit(toV))
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

  private def params(parameters: Map[String, String]): (String, Seq[String], Option[Long]) = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-cdf needs option 'path'"))
    val keys = parameters.getOrElse("keys",
      throw new IllegalArgumentException("graft-cdf needs option 'keys'"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    (path, keys, parameters.get("startingVersion").map(_.toLong))
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val (path, _, _) = params(parameters)
    (shortName(), CdfSourceProvider.cdfSchema(sqlContext.sparkSession, path))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (path, keys, startV) = params(parameters)
    val t = new ManagedTable(sqlContext.sparkSession, path)
    require(t.exists, s"no managed table at $path")
    // default: only changes committed AFTER stream start (Delta's default
    // readChangeFeed position is "latest") — but "latest" is resolved ONCE
    // and pinned in the stream's metadata dir: a restart before the first
    // offset commit must not re-resolve to a later version and skip the
    // changes in between
    val resolved = startV.getOrElse {
      val hadoop = sqlContext.sparkSession.sparkContext.hadoopConfiguration
      val pin = new org.apache.hadoop.fs.Path(metadataPath, "graft-cdf-start")
      val fs = pin.getFileSystem(hadoop)
      // a winner's exclusive create precedes its write+close, so ANY
      // reader (the create-race loser AND a starter that merely observed
      // fs.exists) can race into the gap and see an EMPTY pin — retry
      // briefly until the contents land instead of dying on ''.toLong
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
          s"CDF start pin $pin still empty after ${waitedMs}ms — " +
            "winner crashed between create and write; delete the pin to recover")
        s.toLong
      }
      if (fs.exists(pin)) readPinRetrying()
      else {
        val v = t.version
        fs.mkdirs(pin.getParent)
        // create-if-absent so racing starts agree — the LOSER of the race
        // must re-read the winner's pinned version, not die on the
        // FileAlreadyExists the exclusive create throws at it
        try {
          val out = fs.create(pin, false)
          try out.write(v.toString.getBytes("UTF-8")) finally out.close()
          v
        } catch { case _: java.io.IOException => readPinRetrying() }
      }
    }
    new CdfStreamSource(sqlContext, path, keys, resolved)
  }
}

object CdfSourceProvider {
  /** Table schema + CDF metadata columns (`change_type`,
    * `graft_commit_version`), the stable streaming schema.
    */
  def cdfSchema(spark: org.apache.spark.sql.SparkSession, path: String): StructType =
    new ManagedTable(spark, path).read.schema
      .add("change_type", StringType)
      .add("graft_commit_version", org.apache.spark.sql.types.LongType)
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * steps as distributed per-partition batch jobs.
  *
  * The container has no image/audio libraries, so the actual decode is a
  * clearly-marked deterministic STUB ([[StubCodec]]); everything around it —
  * schema, binary column handling, partitioning, batch iteration shape —
  * is real and tested. Swapping `StubCodec.decodeImage` for a JNI/av
  * library call is the only change needed for real media.
  *
  * Scale notes: payloads ride in parquet binary columns; feature extraction
  * is `mapPartitions` over a typed Dataset — no shuffle, executors stream
  * batches, and output is columnar features only (never re-emit the bytes
  * unless asked). At 100 TB you'd repartition by size so each task holds
  * O(100 MB) of payload, which `targetRecordsPerTask` models.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the multimodal schema). */
  case class MediaRow(media_id: Long, payload: Array[Byte], format: String,
                      n_bytes: Long)

  /** Extracted features (what a real image decode would produce). */
  case class MediaFeatures(media_id: Long, n_bytes: Long, format: String,
                           width: Int, height: Int, mean_intensity: Double,
                           checksum: Long)

  /** ===== STUB ===== deterministic fake decoders standing in for image /
    * audio libraries that are not installed in this container. Real
    * implementations would parse the payload; these derive plausible,
    * deterministic values from the bytes so the pipeline shape is testable.
    */
  object StubCodec {
    /** STUB for an image decode (e.g. libjpeg): infers fake dimensions and
      * mean pixel intensity from the raw bytes deterministically.
      */
    def decodeImage(payload: Array[Byte]): (Int, Int, Double) = {
      val n = payload.length
      val w = math.max(1, (n % 640).toInt)
      val h = math.max(1, (n % 480).toInt)
      val mean = if (n == 0) 0.0
        else payload.iterator.map(b => (b & 0xff).toDouble).sum / n
      (w, h, mean)
    }

    /** STUB frame sampler for video: returns byte offsets of sampled
      * "frames" (every `stride` bytes).
      */
    def sampleFrames(payload: Array[Byte], stride: Int): Seq[Long] =
      (0L until payload.length.toLong by stride.toLong).toSeq

    /** STUB image resize (e.g. libvips thumbnail): deterministically
      * down-samples the payload bytes to ~targetBytes, preserving a prefix
      * marker so provenance is checkable.
      */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] =
      if (payload.length <= targetBytes) payload
      else {
        val stride = math.max(1, payload.length / targetBytes)
        payload.indices.collect { case i if i % stride == 0 => payload(i) }
          .take(targetBytes).toArray
      }
  }

  case class Frame(media_id: Long, frame_offset: Long, frame_bytes: Long)

  /** Frame sampling as a distributed op: one output row per sampled frame
    * (flatMap — rows fan out, no shuffle). The stub strides bytes; a real
    * codec would stride timestamps.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { row =>
      val offs = StubCodec.sampleFrames(row.payload, stride)
      offs.zipWithIndex.map { case (off, i) =>
        val end = math.min(row.payload.length.toLong, off + stride)
        Frame(row.media_id, off, end - off)
      }
    }
  }

  /** Resize pass: payload → bounded thumbnail payload + new size metadata.
    * Columnar in/out; only the payload column is rewritten.
    */
  def resizeAll(spark: SparkSession, media: DataFrame, targetBytes: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.as[MediaRow].map { row =>
      val thumb = StubCodec.resize(row.payload, targetBytes)
      row.copy(payload = thumb, n_bytes = thumb.length.toLong)
    }
  }

  /** Wrap a text table as a media table: payload = utf-8 bytes (the stand-in
    * for real image bytes), with the typed metadata columns.
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      to_binary(col(textCol), lit("utf-8")).as("payload"),
      lit("txt").as("format"),
      octet_length(col(textCol)).cast("long").as("n_bytes"))

  /** The expression-only half of feature extraction, split out so it stays
    * oracle-checkable: byte length and content digests are pure codegen'd
    * built-ins over the binary payload — no stub codec, no typed boundary —
    * and hash-match any engine that digests the same bytes (q35a). The
    * decode-derived columns (width/height/mean) remain in
    * [[extractFeatures]] behind the honestly-stubbed codec.
    */
  def mediaDigests(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("md5_hex"),
      sha2(col("payload"), 256).as("sha256_hex"))

  /** [[MediaRow]] + the expression-computed checksum (public: Dataset
    * encoders codegen constructor access from generated classes).
    */
  case class MediaWithChecksum(media_id: Long, payload: Array[Byte],
                               format: String, n_bytes: Long,
                               checksum: Long)

  /** Distributed feature extraction: checksum and byte length are computed
    * as BUILT-IN codegen'd expressions (`crc32`, `octet_length` — Spark's
    * crc32 is the same java.util.zip.CRC32) before the typed boundary; the
    * `mapPartitions` batch iterator carries ONLY the codec work that has no
    * expression form — one JVM-side batch per partition, no per-row driver
    * involvement, no join to stitch results back.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("checksum", crc32(col("payload")))
      .as[MediaWithChecksum]
      .mapPartitions { it =>
        it.map { row =>
          val (w, h, mean) = StubCodec.decodeImage(row.payload)
          MediaFeatures(row.media_id, row.n_bytes, row.format, w, h, mean,
            row.checksum)
        }
      }
  }

  /** Size-aware repartition so each decode task holds a bounded payload
    * volume — the knob that matters at 100 TB, where one task OOMing on a
    * run of giant videos stalls the stage. Partition count = plan-estimated
    * rows ÷ `targetRecordsPerTask` (falling back to the slot count when the
    * plan carries no row estimate), floored at the slot count so small
    * inputs still use every core; range-partitioning on descending size
    * spreads the heavy payloads across tasks instead of clustering them.
    */
  def repartitionForDecode(media: DataFrame, targetRecordsPerTask: Long): DataFrame = {
    require(targetRecordsPerTask > 0)
    val slots = media.sparkSession.sparkContext.defaultParallelism
    val rows = media.queryExecution.optimizedPlan.stats.rowCount
    val n = rows match {
      case Some(r) =>
        math.max(slots.toLong, (r / BigInt(targetRecordsPerTask)).toLong + 1)
          .min(100000L).toInt
      case None => slots
    }
    media.repartitionByRange(n, col("n_bytes").desc, col("media_id"))
  }
}

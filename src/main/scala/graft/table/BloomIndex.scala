package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, input_file_name}
import org.apache.spark.util.sketch.BloomFilter

/** Per-file bloom-filter index for point-lookup data skipping — the
  * complement of the min/max sidecar stats, which can't prune
  * `client_id = X` scans on layouts not clustered by `client_id` (the
  * reference's Z-order demo query, deltalake.ipynb:8408, is exactly this
  * shape). Databricks Delta ships the same idea as one small index file
  * per data file; graft stores them under
  * `<table>._log/_bloom.d/<enc(col)>/<sha1(file)>.bf`.
  *
  * Contract:
  *  - Bloom keys are the column's SPARK STRING CAST (date → "2024-01-01",
  *    long → "42"), so build (executor-side cast) and probe (driver-side
  *    [[keyOf]]) agree for every type.
  *  - A file with no index entry is KEPT — conservative, never wrong; a
  *    bloom "maybe" keeps the file, only a definite "no" prunes it.
  *  - The build is one distributed pass over ONLY the files passed in
  *    (mutations index just their new files), one task group per file via
  *    `groupByKey(input_file_name)`; each file's filter is a few hundred
  *    KB and the driver writes them out — bounded by the write's file
  *    count, never the table's.
  */
private[table] object BloomIndex extends org.apache.spark.internal.Logging {

  private def sha1(s: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** file:///x and file:/x both normalize to file:/x — input_file_name
    * emits the URI form, manifests the makeQualified form.
    */
  private[table] def normalize(p: String): String = new Path(p).toString

  private[table] def bfPath(colDir: Path, dataFile: String): Path =
    new Path(colDir, sha1(normalize(dataFile)) + ".bf")

  // Probe keys are canonicalized by ManagedTable.bloomProbeKey to the
  // string Spark's cast produces for the column's type — a mismatched key
  // would read as a definite bloom miss and wrongly prune a file holding
  // the value. That is also why bloom indexes are restricted (enforced at
  // ManagedTable.addBloomIndex) to string / integral / date columns:
  // timestamp, float and decimal casts have formatting variants (fraction
  // trimming, scale, E-notation) that don't round-trip.

  private final class BloomAgg(items: Long, fpp: Double)
      extends Aggregator[(String, String), BloomFilter, Array[Byte]] {
    def zero: BloomFilter = BloomFilter.create(items, fpp)
    def reduce(b: BloomFilter, a: (String, String)): BloomFilter = {
      b.putString(a._2); b
    }
    def merge(x: BloomFilter, y: BloomFilter): BloomFilter = {
      x.mergeInPlace(y); x
    }
    def finish(b: BloomFilter): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      b.writeTo(out); out.toByteArray
    }
    def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** [[BloomAgg]] over LONG keys (`putLong`) — the derived-key index form:
    * each row contributes an ARRAY of 64-bit keys (e.g. its text's shingle
    * hashes) instead of one cast-string column value. Unlike the one-key-
    * per-row string form, the insert count per file is NOT bounded by the
    * row count, so the aggregator also reports how many keys it actually
    * inserted — the saturation signal [[buildLongKeys]]' adaptive rebuild
    * keys off.
    */
  private final class LongBloomAgg(items: Long, fpp: Double)
      extends Aggregator[(String, Long), (BloomFilter, Long),
        (Array[Byte], Long)] {
    def zero: (BloomFilter, Long) = (BloomFilter.create(items, fpp), 0L)
    def reduce(b: (BloomFilter, Long), a: (String, Long)): (BloomFilter, Long) = {
      b._1.putLong(a._2); (b._1, b._2 + 1)
    }
    def merge(x: (BloomFilter, Long), y: (BloomFilter, Long)): (BloomFilter, Long) = {
      x._1.mergeInPlace(y._1); (x._1, x._2 + y._2)
    }
    def finish(b: (BloomFilter, Long)): (Array[Byte], Long) = {
      val out = new java.io.ByteArrayOutputStream()
      b._1.writeTo(out); (out.toByteArray, b._2)
    }
    def bufferEncoder: Encoder[(BloomFilter, Long)] =
      Encoders.kryo[(BloomFilter, Long)]
    def outputEncoder: Encoder[(Array[Byte], Long)] =
      Encoders.tuple(Encoders.BINARY, Encoders.scalaLong)
  }

  /** One build pass: write a filter per scanned file, return each file's
    * actual insert count (an upper bound on its distinct keys — dups
    * count, and oversizing from dups is safe).
    */
  private def longKeyPass(spark: SparkSession, fs: FileSystem,
      dataFiles: Seq[String], keyArr: org.apache.spark.sql.Column,
      items: Long, fpp: Double, colDir: Path): Seq[(String, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.explode
    val perFile = spark.read.parquet(dataFiles: _*)
      .select(input_file_name().as("_1"), explode(keyArr).as("_2"))
      .filter(col("_2").isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(new LongBloomAgg(items, fpp).toColumn.name("bf"))
      .collect()
    perFile.foreach { case (f, (bytes, _)) => writeBf(fs, colDir, f, bytes) }
    perFile.map { case (f, (_, n)) => (f, n) }.toSeq
  }

  /** Build per-file filters over DERIVED LONG keys: `keyArr` is an
    * `array<bigint>` Column evaluated against each scanned row (e.g.
    * `xxhash64` over the row's text shingles — the contamination screen's
    * key space). Same contract as [[build]] otherwise: one distributed
    * pass over only `dataFiles`, null keys unindexed, empty files get a
    * definitively-empty filter.
    *
    * ADAPTIVE SIZING: `items` is a heuristic (per-file key counts are
    * unknowable before scanning); a file whose actual inserts exceed
    * 1.5× the sizing is saturated — its filter answers "maybe" far above
    * the declared fpp, which silently erodes skipping while staying
    * correct (the failure mode is invisible without this check). Those
    * files — typically none — get ONE more pass with filters sized to
    * the measured counts, so the rebuild cost is proportional to the
    * pathological files, not the table.
    */
  def buildLongKeys(spark: SparkSession, fs: FileSystem, dataFiles: Seq[String],
                    keyArr: org.apache.spark.sql.Column, items: Long,
                    fpp: Double, colDir: Path): Unit = {
    if (dataFiles.isEmpty) return
    fs.mkdirs(colDir)
    val counts = longKeyPass(spark, fs, dataFiles, keyArr, items, fpp, colDir)
    val saturated = counts.filter(_._2 > items + items / 2)
    if (saturated.nonEmpty) {
      val items2 = saturated.map(_._2).max * 5 / 4
      logWarning(s"bloom index build: ${saturated.size} of " +
        s"${counts.size} file(s) exceeded the $items-item sizing " +
        s"(max actual ${saturated.map(_._2).max}) — rebuilding those " +
        s"filters at $items2 items to keep skipping effective")
      longKeyPass(spark, fs, saturated.map(_._1), keyArr, items2, fpp, colDir)
    }
    val written = counts.map(f => normalize(f._1)).toSet
    dataFiles.filterNot(f => written(normalize(f))).foreach { f =>
      val empty = BloomFilter.create(1, fpp)
      val out = new java.io.ByteArrayOutputStream()
      empty.writeTo(out)
      writeBf(fs, colDir, f, out.toByteArray)
    }
  }

  /** Bloom verdict for one file against MANY long keys: false ONLY when
    * the filter answers a definite no for EVERY key — the any-hit form
    * file skipping needs (a file can be skipped only when no probe key
    * can possibly be in it). Missing/unreadable filter or an empty key
    * set keeps the file; the filter loads once and serves all probes.
    */
  def mightContainAnyLong(fs: FileSystem, colDir: Path, dataFile: String,
                          keys: Array[Long]): Boolean = {
    if (keys.isEmpty) return true
    val p = bfPath(colDir, dataFile)
    if (!fs.exists(p)) return true
    try {
      val in = fs.open(p)
      val bf = try BloomFilter.readFrom(in) finally in.close()
      keys.exists(bf.mightContainLong)
    } catch { case _: Exception => true }
  }

  /** Build (or rebuild) the per-file filters for `dataFiles`, writing one
    * `.bf` per file under `colDir`. Null column values are not indexed
    * (a null probe key never prunes — [[mightContain]] keeps on "").
    */
  def build(spark: SparkSession, fs: FileSystem, dataFiles: Seq[String],
            colName: String, items: Long, fpp: Double, colDir: Path): Unit = {
    if (dataFiles.isEmpty) return
    import spark.implicits._
    val perFile = spark.read.parquet(dataFiles: _*)
      .select(input_file_name().as("_1"), col(colName).cast("string").as("_2"))
      .filter(col("_2").isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .agg(new BloomAgg(items, fpp).toColumn.name("bf"))
      .collect()
    fs.mkdirs(colDir)
    perFile.foreach { case (f, bytes) => writeBf(fs, colDir, f, bytes) }
    // a file rewritten with zero non-null keys produces no group above;
    // it must still get a (definitively empty) filter, or probes would
    // keep it forever as "unindexed"
    val written = perFile.map(f => normalize(f._1)).toSet
    dataFiles.filterNot(f => written(normalize(f))).foreach { f =>
      val empty = BloomFilter.create(1, fpp)
      val out = new java.io.ByteArrayOutputStream()
      empty.writeTo(out)
      writeBf(fs, colDir, f, out.toByteArray)
    }
  }

  /** Atomic (tmp + rename) filter write: a crash mid-write must not leave
    * a torn `.bf` that [[unindexed]] would count as indexed forever.
    */
  private def writeBf(fs: FileSystem, colDir: Path, dataFile: String,
                      bytes: Array[Byte]): Unit = {
    val dst = bfPath(colDir, dataFile)
    val tmp = new Path(colDir, dst.getName + ".tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    fs.rename(tmp, dst)
  }

  /** Files among `dataFiles` lacking an index entry under `colDir`. */
  def unindexed(fs: FileSystem, colDir: Path, dataFiles: Seq[String]): Seq[String] =
    if (!fs.exists(colDir)) dataFiles
    else {
      val have = fs.listStatus(colDir).map(_.getPath.getName)
        .filter(_.endsWith(".bf")).toSet
      dataFiles.filterNot(f => have(sha1(normalize(f)) + ".bf"))
    }

  /** Drop index entries whose data file is no longer live (compaction of
    * the index dir; replaced/moved files leave dead `.bf`s behind).
    */
  def dropStale(fs: FileSystem, colDir: Path, liveFiles: Seq[String]): Unit = {
    if (!fs.exists(colDir)) return
    val live = liveFiles.map(f => sha1(normalize(f)) + ".bf").toSet
    fs.listStatus(colDir).map(_.getPath)
      .filter(p => (p.getName.endsWith(".bf") && !live(p.getName)) ||
        p.getName.contains(".tmp-")) // crash debris from torn writes
      .foreach(p => fs.delete(p, false))
  }

  /** Bloom verdict for one file: false ONLY on a definite miss. A missing
    * or unreadable filter, or an empty probe key, keeps the file. `key`
    * must already be canonical (ManagedTable.bloomProbeKey).
    */
  def mightContain(fs: FileSystem, colDir: Path, dataFile: String,
                   key: String): Boolean = {
    if (key == null || key.isEmpty) return true
    val p = bfPath(colDir, dataFile)
    if (!fs.exists(p)) return true
    try {
      val in = fs.open(p)
      try BloomFilter.readFrom(in).mightContainString(key) finally in.close()
    } catch { case _: Exception => true }
  }
}

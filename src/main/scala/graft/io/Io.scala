package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources / sinks (SURVEY.md §2.1): Parquet + CSV readers/writers with the
  * reference's option surface, single-file export, and catalog DDL helpers.
  */
object Io {

  /** S1/S2 — Parquet scan/write with the reference's tuning knobs
    * (deltalake.ipynb:124, 181 cell 1: snappy codec, 128 MB block size).
    * `codec`: snappy matches the reference and decodes fastest; zstd cuts
    * storage ~30-50% — the better default for a 100 TB archival tier where
    * scan is I/O-bound (both codecs ship with Spark 4).
    */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeParquet(df: DataFrame, path: String,
                   partitionCols: Seq[String] = Nil,
                   maxRecordsPerFile: Long = 0L,
                   blockSizeBytes: Long = 128L * 1024 * 1024,
                   codec: String = "snappy"): Unit = {
    var w = df.write.mode("overwrite")
      .option("compression", codec)
      .option("parquet.block.size", blockSizeBytes) // ref: deltalake.ipynb:124
    if (maxRecordsPerFile > 0) w = w.option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** S3 — CSV scan; explicit schema preferred (SURVEY.md §1.3: avoid the
    * reference's string-typed-rates inference quirk), header inference
    * supported for parity (deltalake.ipynb:534, 544 cell 5).
    */
  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None,
              header: Boolean = true, delimiter: String = ","): DataFrame = {
    val r = spark.read.option("header", header.toString).option("sep", delimiter)
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None    => r.option("inferSchema", "true").csv(path)
    }
  }

  /** S4 — CSV write with the reference's option set (deltalake.ipynb:
    * 4359–4363 cell 22: header, delimiter, quote, escape, dateFormat).
    */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               delimiter: String = ",", quote: String = "\"",
               escape: String = "\\", dateFormat: String = "yyyy-MM-dd"): Unit =
    df.write.mode("overwrite")
      .option("header", header.toString).option("sep", delimiter)
      .option("quote", quote).option("escape", escape)
      .option("dateFormat", dateFormat)
      .csv(path)

  /** ORC write (beyond-reference interchange format: Spark's built-in
    * columnar alternative, zlib like its default). Same snappy/zlib
    * predicate-pushdown + column-pruning properties as the parquet path —
    * an engine claiming lakehouse interchange should speak both.
    */
  def writeOrc(df: DataFrame, path: String, compression: String = "zlib"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write with a target per-file size — the knob that avoids both the
    * reference's small-files pathology (19,803 files / 363 MB,
    * deltalake.ipynb cell 29) and giant unsplittable files. File count =
    * plan-estimated bytes / target, from Catalyst's logical `sizeInBytes`
    * (an in-memory upper bound — parquet compresses below it, which errs
    * toward slightly smaller files; exact sizing needs a post-write
    * compaction pass like [[graft.table.ManagedTable.compact]]).
    */
  def writeSized(df: DataFrame, path: String,
                 targetFileBytes: Long = 256L * 1024 * 1024): Int = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = math.max(1L, math.min(100000L,
      (est / BigInt(targetFileBytes)).toLong + 1)).toInt
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }

  /** JSON-lines source/sink — the third standard file format an engine
    * user expects besides parquet/CSV. Explicit schema preferred (JSON
    * inference needs an extra pass and widens types); compression defaults
    * to gzip for the interchange-file use case.
    */
  def readJson(spark: SparkSession, path: String,
               schema: Option[StructType] = None): DataFrame =
    schema match {
      case Some(s) => spark.read.schema(s).json(path)
      case None    => spark.read.json(path)
    }

  def writeJson(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** S5 — single-file export: `coalesce(1)` then rename the part file
    * (deltalake.ipynb:312 + 324–329 cell 3). Driver-edge only by design —
    * a single output file is inherently non-parallel.
    */
  def exportSingleCsv(spark: SparkSession, df: DataFrame, file: String): Unit = {
    val tmp = file + ".tmpdir"
    writeCsv(df.coalesce(1), tmp)
    val fs = new Path(tmp).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(new Path(tmp + "/part-*.csv"))(0).getPath
    val dst = new Path(file)
    if (fs.exists(dst)) fs.delete(dst, false)
    fs.rename(part, dst)
    fs.delete(new Path(tmp), true)
  }

  /** S11 — warehouse bulk load (silver.py:14–73, load_currency.py:13–44:
    * the reference's Postgres `COPY` path). Spark-native form is the JDBC
    * sink with explicit batching; round-tripped in JdbcSpec against the
    * embedded Derby engine shipped with Spark (no external endpoint in this
    * environment — swap the url for Postgres in production).
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                user: String = "", password: String = "",
                batchSize: Int = 100000, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
      .save()

  /** JDBC source twin of [[writeJdbc]]. `partitionColumn`/bounds shard the
    * read across `numPartitions` parallel range queries — the knob that
    * makes a warehouse extract scale instead of serializing through one
    * connection.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               user: String = "", password: String = "",
               partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
    partitionColumn.fold(r) { case (c, lo, hi, n) =>
      r.option("partitionColumn", c).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n)
    }.load()
  }

  /** S8 — catalog DDL (deltalake.ipynb:1046–1063 cell 10: CREATE SCHEMA +
    * CREATE TABLE ... USING <fmt> LOCATION + COMMENT; SHOW/DESCRIBE).
    */
  def createSchema(spark: SparkSession, name: String): Unit =
    spark.sql(s"CREATE SCHEMA IF NOT EXISTS $name")

  /** Single-quoted SQL string literal with embedded quotes doubled — so a
    * comment or path containing `'` can't break out of the literal.
    */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  def registerExternalTable(spark: SparkSession, table: String, location: String,
                            comment: String = ""): Unit = {
    val c = if (comment.nonEmpty) s" COMMENT ${sqlLit(comment)}" else ""
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"CREATE TABLE $table USING PARQUET$c LOCATION ${sqlLit(location)}")
  }

  def showTables(spark: SparkSession, schema: String): DataFrame =
    spark.sql(s"SHOW TABLES IN $schema")

  def describeTable(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE $table")
}

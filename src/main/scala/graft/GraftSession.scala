package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point: one place that encodes the Spark
  * configuration this engine is designed around, so every main / notebook /
  * job starts from the same contract instead of re-deriving it.
  *
  * What the knobs mean at 100 TB (see SCALING.md for the per-operator
  * analysis):
  *  - `spark.sql.shuffle.partitions`: sized to the executor slot count
  *    locally; on a real cluster set ≈ 2-3× total cores (AQE coalesces
  *    down, it cannot split a too-coarse setting upward as cheaply).
  *  - AQE on (default in Spark 4): runtime re-planning, skew-join
  *    splitting, dynamic coalescing — the engine's plans assume it.
  *  - `nanosAsLong`: the event feed carries nanosecond parquet timestamps;
  *    without this flag Spark 4 refuses the file
  *    (PARQUET_TYPE_ILLEGAL). [[graft.model.Tables.events]] then floors
  *    them to the microsecond grid.
  *  - UTC session timezone: all date arithmetic in the engine (and its
  *    DuckDB oracle twin) is timezone-free by contract.
  */
object GraftSession {

  /** Builder with the engine's contract applied; caller may override or
    * add configs before `getOrCreate()`.
    */
  def builder(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val cores = Runtime.getRuntime.availableProcessors()
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // `file:` without process forks or `.crc` sidecars: Hadoop's default
      // local fs forks a `chmod` per file create/mkdir when libhadoop is
      // absent and doubles every small write with a checksum file —
      // measured ~10% of driver samples on commit-heavy operators (see
      // graft.io.FastLocalFileSystem). Remote schemes (hdfs/s3a/…) are
      // untouched; set graft.localFs.fast=false to restore the default.
      .config("spark.hadoop.fs.file.impl",
        if (sys.props.get("graft.localFs.fast").contains("false"))
          "org.apache.hadoop.fs.LocalFileSystem"
        else "graft.io.FastLocalFileSystem")
      // the engine's SQL surface rides the session entry point: the graft
      // statement parser (MERGE/DDL/maintenance — non-graft SQL delegates
      // untouched, GraftSqlSpec pins the fall-through) and the
      // table-valued functions (graft_version/_history/_table_changes/
      // _contamination/_quality_score) compose into plain `spark.sql`
      .withExtensions(new graft.sql.GraftSparkSessionExtension)
    master.fold(b)(m => b.master(m))
  }

  /** Local session at the machine's core count — what Bench/Verify and the
    * smoke tools run on (`SPARK_GRAFT_CPUS` overrides).
    */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    builder(appName, Some(s"local[$cpus]"), Some(cpus.toInt)).getOrCreate()
  }
}

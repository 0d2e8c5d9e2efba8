package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided deterministic testdata (TESTDATA.md).
  *
  * Role mapping onto the reference's data model (SURVEY.md §1.2 / FIXTURES.md):
  * `lineitem`+`orders` play the transactions fact, `customer`(+`nation`)
  * plays the clients dimension, a rates table derived from `o_orderdate`
  * plays currency_rates, `events` drives incremental/upsert + streaming,
  * `documents`/`embeddings` serve the LLM-pipeline extension operators.
  *
  * Reads are plain parquet scans (reference: deltalake.ipynb:525 cell 5 —
  * `spark.read.parquet`); Catalyst's vectorized reader, predicate pushdown
  * and column pruning apply automatically, which is what makes downstream
  * plans scale: only the referenced columns ever leave the scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")

  /** `events.ts` has shipped in two physical forms across testdata
    * generations: nanosecond-precision (which Spark's TimestampType (µs)
    * cannot hold natively — read as long via
    * `spark.sql.legacy.parquet.nanosAsLong=true` and truncate, matching
    * DuckDB's `CAST(ts AS TIMESTAMP)` floor semantics) and plain
    * microsecond timestamps (read natively; NTZ casts to session-tz
    * timestamp, an identity under the UTC sessions every entry point
    * builds). Dispatch on the loaded type so both generations read to the
    * same TimestampType column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // defensive: callers may hold a session without this conf; it is a
    // runtime SQL conf, so setting it here keeps any session working
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

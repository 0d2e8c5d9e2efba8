package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Relational, Skew}
import graft.table.{ManagedTable, Merge}

/** The reference's full medallion flow (deltalake.ipynb cells 5→7→11→15/17/
  * 19→20/21→25), re-expressed over the testdata star schema:
  *
  *   bronze  — raw ingestion of the source parquet (cell 5)
  *   silver  — typed, derived-column transactions table, date-partitioned
  *             (cell 7: transaction_date, is_suspicious)
  *   gold    — client_stats (MERGE upsert, cell 20), daily_metrics
  *             (anti-join incremental append, cell 20), fraud_analysis
  *             (overwrite, cell 11)
  *   incremental — high-water-mark detection + MERGE of new events
  *             (cells 15/17/19)
  *   maintain — compaction + clustering (cells 11/25)
  *
  * Partitioning: silver is partitioned by month (`ship_month`), not by day
  * as the reference does — the reference's daily partitioning at 11 M rows
  * produced 19,803 files / 363 MB (cell 29), i.e. pathological small files;
  * month-granularity keeps partition pruning for date-range queries while
  * writing ~80 well-sized files per year of data. At 100 TB you'd combine
  * date partitioning with `maxRecordsPerFile` and periodic compaction.
  */
final class Medallion(spark: SparkSession, warehouse: String, sfDir: String) {

  val bronzeLineitem = new ManagedTable(spark, s"$warehouse/bronze/lineitem")
  val bronzeOrders   = new ManagedTable(spark, s"$warehouse/bronze/orders")
  val bronzeCustomer = new ManagedTable(spark, s"$warehouse/bronze/customer")
  val silverTxn      = new ManagedTable(spark, s"$warehouse/silver/transactions")
  val goldClient     = new ManagedTable(spark, s"$warehouse/gold/client_stats")
  val goldDaily      = new ManagedTable(spark, s"$warehouse/gold/daily_metrics")
  val goldFraud      = new ManagedTable(spark, s"$warehouse/gold/fraud_analysis")

  /** Bronze: raw → managed tables (deltalake.ipynb:498–565 cell 5). */
  def runBronze(): Unit = {
    bronzeLineitem.overwrite(Tables.lineitem(spark, sfDir))
    bronzeOrders.overwrite(Tables.orders(spark, sfDir))
    bronzeCustomer.overwrite(Tables.customer(spark, sfDir))
  }

  /** Silver: the typed/derived transactions table (cell 7 semantics:
    * cast, derive date + suspicious flag, partition).
    */
  def silverTransactions(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"), "inner")
      .select(
        col("l_orderkey"), col("l_linenumber"), col("o_custkey").as("client_id"),
        col("l_extendedprice").cast("decimal(18,2)").as("amount"),
        to_date(col("o_orderdate")).as("transaction_date"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"),
        Relational.suspicious(col("l_extendedprice"), col("l_returnflag"))
          .as("is_suspicious"))

  def runSilver(): Unit =
    silverTxn.overwrite(
      silverTransactions(bronzeLineitem.read, bronzeOrders.read), Seq("ship_month"))

  /** Gold: the three marts with the reference's refresh strategies
    * (cell 20: MERGE client_stats, left-anti append daily_metrics).
    */
  def runGold(): Unit = {
    val li = bronzeLineitem.read
    val or = bronzeOrders.read
    val cu = bronzeCustomer.read
    goldClient.merge(Relational.clientStats(li, or, cu), Seq("c_custkey"))
    val daily = Relational.dailyMetrics(li, or)
    if (goldDaily.exists)
      goldDaily.append(Merge.newRowsOnly(daily, goldDaily.read.select("date"), Seq("date")))
    else goldDaily.overwrite(daily)
    goldFraud.overwrite(Relational.fraudAnalysis(li, or, cu))
  }

  /** Bucketed-layout gold variant: both facts are written bucketed on the
    * order key ([[Skew.writeBucketed]]), so the lineitem ⋈ orders fact-fact
    * join is a co-located sort-merge join with ZERO join-side exchanges —
    * at 100 TB the layout, not a broadcast, carries the join; only the
    * groupBy shuffles. Returns the three marts computed over the bucketed
    * layout (results identical to [[runGold]]'s inputs; asserted in spec).
    */
  def runGoldBucketed(buckets: Int = 32): Map[String, DataFrame] = {
    Skew.writeBucketed(bronzeLineitem.read, "graft_bkt_lineitem", "l_orderkey", buckets)
    Skew.writeBucketed(bronzeOrders.read, "graft_bkt_orders", "o_orderkey", buckets)
    val li = spark.table("graft_bkt_lineitem")
    val or = spark.table("graft_bkt_orders")
    val cu = bronzeCustomer.read
    Map(
      "client_stats"   -> Relational.clientStats(li, or, cu),
      "daily_metrics"  -> Relational.dailyMetrics(li, or),
      "fraud_analysis" -> Relational.fraudAnalysis(li, or, cu))
  }

  /** Incremental: MERGE a new batch into silver above the high-water mark
    * (cells 15/17/19: HWM detect → fetch-from-last → upsert).
    */
  def runIncremental(newLineitem: DataFrame, newOrders: DataFrame): Unit = {
    val batch = silverTransactions(newLineitem, newOrders)
    silverTxn.merge(batch, Seq("l_orderkey", "l_linenumber"), Seq("ship_month"))
  }

  /** Maintenance: compaction + clustering (cells 11/25; OPTIMIZE/ZORDER). */
  def runMaintain(): Unit = {
    silverTxn.compact(math.max(2, spark.sparkContext.defaultParallelism))
    goldDaily.cluster("date")
  }

  /** Count-reconciliation audit (SURVEY.md §5.4 — the reference's row-count
    * prints as an assertion surface). Re-scans each layer; prefer
    * [[observedSilver]]-style in-flight metrics when the table is large.
    */
  def audit(): Map[String, Long] = Map(
    "bronze_lineitem" -> bronzeLineitem.read.count(),
    "silver_transactions" -> silverTxn.read.count(),
    "gold_client_stats" -> goldClient.read.count(),
    "gold_daily_metrics" -> goldDaily.read.count(),
    "gold_fraud_analysis" -> goldFraud.read.count())

  /** Silver refresh with IN-FLIGHT audit metrics (`Dataset.observe`): row
    * count, suspicious count and total amount are accumulated DURING the
    * write — at 100 TB this replaces `audit()`'s second full scan with
    * zero extra work. Returns the observed metrics after the write action.
    */
  def runSilverObserved(): Map[String, Any] = {
    val obs = new org.apache.spark.sql.Observation("silver_audit")
    val df = silverTransactions(bronzeLineitem.read, bronzeOrders.read)
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when(col("is_suspicious"), 1L).otherwise(0L)).as("suspicious_rows"),
        sum(col("amount")).cast("double").as("total_amount"))
    silverTxn.overwrite(df, Seq("ship_month"))
    obs.get
  }
}

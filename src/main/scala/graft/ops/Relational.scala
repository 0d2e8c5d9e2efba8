package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operators mirroring the reference's capability surface
  * (SURVEY.md §2): derivations, the three gold marts, date-spine +
  * forward-fill + lag windows, filters, joins, top-k.
  *
  * Determinism convention (shared with the DuckDB oracle SQL in
  * [[graft.SparkEntry.oracleSql]]): every SUM over a double expression goes
  * through `CAST(... AS DECIMAL(18,6))` first — decimal addition is exact
  * and scale 6 covers every exact-decimal product in the data (price×disc×tax
  * has 6 decimal digits), so the cast never lands on a rounding tie where
  * Spark (HALF_UP) and DuckDB (binary-nearest) could disagree —
  * and therefore order-independent, so Spark (partial + final hash agg over
  * an arbitrary partitioning) and single-threaded DuckDB produce
  * bit-identical results; the final value is cast back to DOUBLE. Averages
  * are expressed as sum/count on those exact sums. This is also the right
  * call at 100 TB: decimal partial aggregation keeps map-side combine exact
  * regardless of partition count, so results don't drift when the cluster
  * re-plans.
  */
object Relational {

  /** Exact, order-independent sum of a double expression (see above). */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")

  /** Derived "suspicious" flag, the reference's silver derivation
    * re-expressed over lineitem (deltalake.ipynb:953–954, cell 7:
    * `amount > 5000 AND category IN ('withdrawal','transfer')`).
    */
  def suspicious(price: Column, flag: Column): Column =
    price > lit(5000.0) && flag.isin("A", "R")

  /** Deterministic per-date conversion rate standing in for the reference's
    * currency_rates (deltalake.ipynb:1285–1290, cell 11: amount * USD rate).
    * Pure date arithmetic so the DuckDB oracle reproduces it exactly.
    */
  def rateFor(date: Column): Column =
    lit(1.0) + dayofmonth(date).cast("double") * lit(0.01)

  /** Gold mart 1 — client_stats (deltalake.ipynb:1270–1332 cell 11; SQL twin
    * gold.py:15–41): fact ⋈ dims, 3-key hash agg with sum/avg/count.
    *
    * Join strategy at scale: only the true dimension (`customer`, the
    * reference's 50k-row `clients`, deltalake.ipynb:3154 cell 20 uses
    * `broadcast(clients)`) carries an explicit broadcast hint. The
    * lineitem ⋈ orders join is fact ⋈ fact — both sides are SF-proportional
    * (billions of rows at 100 TB) — so it is left unhinted: Catalyst/AQE
    * auto-broadcast it while orders fits the threshold locally and fall back
    * to a shuffle sort-merge join at scale. For a shuffle-free layout, write
    * both facts bucketed on the order key ([[Skew.writeBucketed]];
    * [[graft.pipeline.Medallion.runGoldBucketed]]) — co-located SMJ, zero
    * join exchanges; only the groupBy exchanges, with map-side partial agg.
    */
  def clientStats(lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame = {
    val txn = lineitem
      .select("l_orderkey", "l_extendedprice")
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"), "inner")
      .join(broadcast(customer.select("c_custkey", "c_name", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"), "inner")
    txn.groupBy("c_custkey", "c_name", "c_mktsegment")
      .agg(
        dsum(col("l_extendedprice")).as("total_amount"),
        (dsum(col("l_extendedprice")) / count(col("l_extendedprice"))).as("avg_amount"),
        count(lit(1)).as("transactions_count"))
      .orderBy("c_custkey")
  }

  /** Gold mart 2 — daily_metrics (deltalake.ipynb:1285–1299 cell 11; SQL twin
    * gold.py:60–95): per-date volume in converted currency, conditional
    * suspicious aggregates (`sum(when(...))`, deltalake.ipynb:1296–1297).
    * Single shuffle on the date key; all aggregates partial-agg friendly.
    * The fact ⋈ fact join is unhinted (see [[clientStats]] scale note).
    */
  def dailyMetrics(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val t = lineitem
      .select("l_orderkey", "l_extendedprice", "l_returnflag")
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"), "inner")
      .withColumn("date", to_date(col("o_orderdate")))
      .withColumn("amount_rub", col("l_extendedprice") * rateFor(col("date")))
      .withColumn("is_suspicious", suspicious(col("l_extendedprice"), col("l_returnflag")))
    t.groupBy("date")
      .agg(
        dsum(col("amount_rub")).as("daily_volume_rub"),
        (dsum(col("amount_rub")) / count(lit(1))).as("avg_transaction_rub"),
        count(lit(1)).as("transactions_count"),
        sum(when(col("is_suspicious"), 1L).otherwise(0L)).as("suspicious_count"),
        dsum(when(col("is_suspicious"), col("amount_rub")).otherwise(lit(0.0))).as("suspicious_volume_rub"))
      .orderBy("date")
  }

  /** Gold mart 3 — fraud_analysis (deltalake.ipynb:1303–1310 cell 11; SQL
    * twin gold.py:44–57): filter suspicious → join dim → 2-key agg.
    * The filter sits directly on the scan so Parquet row-group stats prune
    * before the join at scale.
    */
  def fraudAnalysis(lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame = {
    lineitem
      .select("l_orderkey", "l_extendedprice", "l_returnflag")
      .filter(suspicious(col("l_extendedprice"), col("l_returnflag")))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"), "inner")
      .join(broadcast(customer.select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"), "left")
      .groupBy("l_returnflag", "c_mktsegment")
      .agg(
        count(lit(1)).as("fraud_count"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_fraud_amount"),
        dsum(col("l_extendedprice")).as("total_fraud_amount"))
      .orderBy("l_returnflag", "c_mktsegment")
  }

  /** Dense daily date spine via `explode(sequence(min, max, interval 1 day))`
    * (deltalake.ipynb:1011–1014 cell 7 — the reference's only generator op).
    * min/max come from a global agg (A5, deltalake.ipynb:1005–1009).
    */
  def dateSpine(df: DataFrame, dateCol: String): DataFrame = {
    val mm = df.agg(min(to_date(col(dateCol))).as("lo"), max(to_date(col(dateCol))).as("hi"))
    mm.select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("date"))
  }

  /** Daily aggregate joined onto the dense spine, then forward-filled —
    * the reference's currency-rates densification (W1: `last(c, ignoreNulls)`
    * over rows-unbounded-preceding, deltalake.ipynb:1017–1025 cell 7).
    * The window is intentionally global (no partitionBy) exactly like the
    * reference (SURVEY.md §2.5 note): the spine is a few-thousand-row series,
    * so a single-partition window is acceptable and keeps one total ordering.
    */
  def spineForwardFill(orders: DataFrame): DataFrame = {
    // sparse daily series: only dates of URGENT orders have an observed value
    val sparse = orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .withColumn("date", to_date(col("o_orderdate")))
      .groupBy("date")
      .agg(dsum(col("o_totalprice")).as("urgent_volume"))
    val spine = dateSpine(orders, "o_orderdate")
    val w = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(sparse, Seq("date"), "left")
      .withColumn("urgent_volume_ff", last(col("urgent_volume"), ignoreNulls = true).over(w))
      .orderBy("date")
  }

  /** Day-over-day change via lag (W2, deltalake.ipynb:1028–1032 cell 7:
    * `c - lag(c, 1) over (order by date)`), on top of the daily volume.
    */
  def dailyChange(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val daily = lineitem
      .select("l_orderkey", "l_extendedprice")
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"), "inner")
      .withColumn("date", to_date(col("o_orderdate")))
      .groupBy("date")
      .agg(dsum(col("l_extendedprice")).as("daily_volume"))
    val w = Window.orderBy("date")
    daily
      .withColumn("volume_change", col("daily_volume") - lag(col("daily_volume"), 1).over(w))
      .orderBy("date")
  }

  /** Top-k by measure with a unique tie-break key (O3, deltalake.ipynb:
    * 1364–1366 cell 11: `orderBy(desc(total)).limit(5)`; determinism per
    * SURVEY.md §7.6.6). Plans as TakeOrderedAndProject — no global sort.
    */
  def topK(df: DataFrame, k: Int, measure: String, tieBreak: String): DataFrame =
    df.orderBy(desc(measure), col(tieBreak)).limit(k)

  /** Per-group top-k via row_number window — the scalable form of O3 when
    * the "k" is per key rather than global.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, k: Int, measure: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(desc(measure), col(tieBreak))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Global dense row rank over a total order WITHOUT a single-partition
    * window — the two-pass distributed prefix count (same shape as
    * [[Sampling.packByTokenBudgetDistributed]]):
    *
    *   1. range-partition by the order columns and row_number WITHIN each
    *      partition (parallel windows);
    *   2. collect one row count per partition (driver-tiny), convert to
    *      exclusive offsets, add back as a broadcast map literal.
    *
    * Returns (df + `__rank` long column, total row count). The rank equals
    * the global-window `row_number` for any partition count because range
    * partitioning preserves the total order across partition boundaries.
    * `orderCols` must be a total order (include a unique tie-break).
    */
  def globalRank(df: DataFrame, orderCols: Column*): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin partitioning: pass 2 must see pass 1's pids
    val pcounts = sorted.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L)((acc, p) => acc + pcounts.getOrElse(p, 0L))
    val offsetExpr =
      if (n == 1) lit(0L)
      else element_at(
        map((0 until n).flatMap(p => Seq(lit(p), lit(offsets(p)))): _*), col("__pid"))
    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
    (sorted.withColumn("__rank", row_number().over(w).cast("long") + offsetExpr)
       .drop("__pid"),
     pcounts.values.sum)
  }

  /** NTILE over an SF-proportional table without the global-window
    * scale-killer: bucket boundaries follow from the [[globalRank]] rank and
    * the exact SQL NTILE size rule — with N rows and b buckets the first
    * N mod b buckets hold ⌈N/b⌉ rows, the rest ⌊N/b⌋ — so the assignment is
    * bit-identical to `ntile(b) OVER (ORDER BY ...)` while every stage stays
    * partition-parallel (asserted in PlanSpec).
    */
  def ntileDistributed(df: DataFrame, buckets: Int, orderCols: Column*): DataFrame = {
    require(buckets >= 1)
    val (ranked, total) = globalRank(df, orderCols: _*)
    val q = total / buckets
    val rem = total % buckets
    val cut = rem * (q + 1) // rows living in the ⌈N/b⌉-sized buckets
    // q == 0 (fewer rows than buckets) degenerates correctly: cut = total,
    // every rank takes the first branch, bucket = rank.
    val rank = col("__rank")
    val bucket =
      when(rank <= cut, floor((rank - 1) / lit(q + 1)) + 1)
        .otherwise(lit(rem) + floor((rank - lit(cut) - 1) / lit(q)) + 1)
    ranked.withColumn("__ntile", bucket.cast("long")).drop("__rank")
  }

  /** Order-total reconciliation via typed `cogroup` — the Dataset API's
    * two-sided per-key processing: each order key sees BOTH its header row
    * and all its line rows in one function call (arbitrary per-key logic
    * that joins can't express in general; here the logic is deliberately
    * join-expressible so the DuckDB oracle can verify the operator, q87).
    *
    * Determinism: line amounts accumulate in BigDecimal (exact, therefore
    * iterator-order-independent — cogroup iterators have no defined order)
    * and convert to double once, matching the [[dsum]] contract. Scale:
    * cogroup shuffles both sides on the key exactly once (one Exchange
    * each) — same cost shape as a shuffle join, and bucketed layouts
    * co-locate it the same way.
    */
  def reconcileOrderTotals(spark: SparkSession, orders: DataFrame,
                           lineitem: DataFrame): DataFrame = {
    import spark.implicits._
    val o = orders
      .select(col("o_orderkey").cast("long"), col("o_totalprice").cast("double"))
      .as[(Long, Double)].groupByKey(_._1)
    val l = lineitem
      .select(col("l_orderkey").cast("long"), col("l_extendedprice").cast("double"))
      .as[(Long, Double)].groupByKey(_._1)
    o.cogroup(l) { (k, os, ls) =>
      val header = os.toSeq.headOption
      var n = 0L
      var sum = java.math.BigDecimal.ZERO
      ls.foreach { x =>
        n += 1
        sum = sum.add(new java.math.BigDecimal(x._2.toString))
      }
      header.map(h => (k, h._2, sum.doubleValue(), n)).iterator
    }.toDF("o_orderkey", "o_total", "line_sum", "n_lines")
  }
}

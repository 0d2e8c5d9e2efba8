package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic data generation — the reference's generation path
  * (deltalake.ipynb cell 1: 10 M transactions via `spark.range` + `rand` +
  * case-when ladders, deltalake.ipynb:127–173; cell 3: clients 263–296;
  * cell 4: daily rates 405–447) as a reusable, deterministic library.
  *
  * Determinism: every random column uses `rand(seed)`/`randn(seed)` over a
  * FIXED partitioning (`spark.range(n, n_partitions)`) — Spark's seeded
  * rand is a function of (seed, partition, row offset), so the same call
  * yields identical data on any cluster. Generation is embarrassingly
  * parallel: no shuffle, scales linearly to any row count.
  */
object Synthetic {

  /** Transactions (deltalake.ipynb:127–173 shape): id, client_id, amount,
    * currency, datetime in 2023, category.
    */
  def transactions(spark: SparkSession, n: Long, numClients: Long = 50000L,
                   seed: Long = 42L, partitions: Int = 32): DataFrame = {
    spark.range(0L, n, 1L, partitions)
      .withColumn("transaction_id", col("id"))
      .withColumn("client_id",
        floor(rand(seed + 1) * numClients).cast("long") + 100000L)
      .withColumn("amount", round(rand(seed + 2) * 9999.0 + 1.0, 2))
      .withColumn("currency",
        when(rand(seed + 3) < 0.6, "USD").when(rand(seed + 3) < 0.8, "EUR")
          .when(rand(seed + 3) < 0.9, "RUB").otherwise("CNY"))
      .withColumn("transaction_datetime",
        to_timestamp(from_unixtime(lit(1672531200L) + // 2023-01-01
          floor(rand(seed + 4) * 365.0 * 24 * 3600).cast("long"))))
      .withColumn("category",
        when(rand(seed + 5) < 0.4, "payment").when(rand(seed + 5) < 0.7, "transfer")
          .when(rand(seed + 5) < 0.9, "withdrawal").otherwise("deposit"))
  }

  /** Clients (deltalake.ipynb:263–296 shape): tier 30/70, 10 countries,
    * registration dates spread over ~5 years.
    */
  def clients(spark: SparkSession, n: Long, seed: Long = 42L,
              partitions: Int = 8): DataFrame = {
    val countries = Seq("RU", "US", "DE", "CN", "JP", "GB", "FR", "IN", "BR", "CA")
    spark.range(0L, n, 1L, partitions)
      .withColumn("client_id", col("id") + 100000L)
      .withColumn("name", concat(lit("Client#"), lpad(col("id").cast("string"), 9, "0")))
      .withColumn("tier", when(rand(seed + 10) < 0.3, "premium").otherwise("standard"))
      .withColumn("country",
        element_at(array(countries.map(lit): _*),
          (floor(rand(seed + 11) * countries.size) + 1).cast("int")))
      .withColumn("registration_date",
        date_add(lit("2020-01-01").cast("date"),
          floor(rand(seed + 12) * 1825.0).cast("int")))
      .drop("id")
  }

  /** Daily currency rates (deltalake.ipynb:405–447 shape, substituting the
    * yfinance fetch with a seeded random walk — SURVEY.md §7.6.3): dense
    * date spine, USD/EUR plus the CNY cross-rate.
    */
  def currencyRates(spark: SparkSession, start: String, end: String,
                    seed: Long = 42L): DataFrame = {
    val spine = spark.sql(
      s"SELECT explode(sequence(to_date('$start'), to_date('$end'), interval 1 day)) AS date")
    // random-walk-ish: base + bounded daily noise (deterministic per date)
    spine
      .withColumn("USD", round(lit(70.0) + randn(seed + 20) * 2.0 +
        dayofyear(col("date")).cast("double") * 0.01, 4))
      .withColumn("EUR", round(col("USD") * (lit(1.08) + randn(seed + 21) * 0.01), 4))
      .withColumn("USD_CNY", round(lit(7.2) + randn(seed + 22) * 0.05, 4))
      .withColumn("CNY", round(col("USD") / col("USD_CNY"), 4))
      .drop("USD_CNY")
  }
}

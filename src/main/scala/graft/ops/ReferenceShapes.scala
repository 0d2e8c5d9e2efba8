package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's *own* silver-layer derivations, on its own table shapes
  * (SURVEY.md §1.2, FIXTURES.md §A) — kept faithful down to the edge cases
  * so a user of the reference gets identical rows from identical inputs:
  *
  *  - transactions: `is_suspicious = amount > 5000 AND category IN
  *    ('withdrawal','transfer')` — strictly greater (amount == 5000 is
  *    false), null amount → null/false (deltalake.ipynb:953–954 cell 7)
  *  - clients: `age = floor(months_between(current_date, registration_date)
  *    / 12)`; `client_category` NOT NULL: null→new, <1→new, <3→regular,
  *    else vip (deltalake.ipynb:977–985)
  *  - currency_rates: dense daily spine → forward-fill (`last ignoreNulls`
  *    over unbounded-preceding) → day-over-day lag change, with the
  *    reference's string-typed rate columns cast on use
  *    (deltalake.ipynb:1005–1032; string quirk per SURVEY.md §7.6.1)
  */
object ReferenceShapes {

  /** Silver transactions typing (deltalake.ipynb:947–954). */
  def silverTransactions(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("amount", col("amount").cast("decimal(18,2)"))
      .withColumn("transaction_date", to_date(col("transaction_datetime")))
      .withColumn("is_suspicious",
        col("amount") > 5000 && col("category").isin("withdrawal", "transfer"))

  /** Silver clients typing + derived age/category (deltalake.ipynb:975–985).
    * `asOf` replaces `current_date()` for deterministic tests.
    */
  def silverClients(bronze: DataFrame, asOf: Column = current_date()): DataFrame = {
    val age = floor(months_between(asOf, col("registration_date")) / 12)
    bronze
      .withColumn("age", age)
      .withColumn("client_category",
        when(col("age").isNull, "new")
          .when(col("age") < 1, "new")
          .when(col("age") < 3, "regular")
          .otherwise("vip"))
  }

  /** Silver currency rates: densify to a daily spine, forward-fill each
    * rate, add day-over-day changes rounded to 4 (deltalake.ipynb:
    * 1005–1032). Accepts the reference's string-typed rate columns.
    */
  def silverRates(sparse: DataFrame, rateCols: Seq[String]): DataFrame = {
    val mm = sparse.agg(min(col("date")).as("lo"), max(col("date")).as("hi"))
    val spine = mm.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("date"))
    val wFill = Window.orderBy("date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.orderBy("date")
    val filled = rateCols.foldLeft(spine.join(sparse, Seq("date"), "left")) {
      (df, c) =>
        df.withColumn(c,
          last(col(c).cast("double"), ignoreNulls = true).over(wFill))
    }
    rateCols.foldLeft(filled) { (df, c) =>
      df.withColumn(s"${c}_change",
        round(col(c) - lag(col(c), 1).over(wLag), 4))
    }
  }

  /** The three gold marts as SQL text over registered views — the E2 entry
    * point (gold.py:15–96 is the reference's SQL twin of cell 11). Used by
    * q44 to prove the SQL surface produces the same rows as the DataFrame
    * surface.
    */
  val clientStatsSql: String =
    """SELECT c.c_custkey, c.c_name, c.c_mktsegment,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS total_amount,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l.l_extendedprice) AS avg_amount,
       COUNT(*) AS transactions_count
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY 1, 2, 3 ORDER BY c.c_custkey"""
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

/** FIXTURES.md §A edge rows, asserted against the reference's documented
  * semantics (deltalake.ipynb cells 7/11 lines cited in ReferenceShapes).
  */
class ReferenceShapesSpec extends SparkSpec {
  import spark.implicits._

  test("suspicious flag: boundary amount 5000 is NOT suspicious; category gate") {
    val bronze = Seq(
      (1L, Some(5000.00), "withdrawal", Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, Some(5000.01), "withdrawal", Timestamp.valueOf("2024-01-01 10:00:00")),
      (3L, Some(9000.00), "payment",    Timestamp.valueOf("2024-01-01 10:00:00")),
      (4L, Some(9000.00), "transfer",   Timestamp.valueOf("2024-01-01 10:00:00")),
      (5L, None,          "withdrawal", Timestamp.valueOf("2024-01-01 10:00:00"))
    ).toDF("transaction_id", "amount", "category", "transaction_datetime")
    val got = ReferenceShapes.silverTransactions(bronze)
      .select("transaction_id", "is_suspicious")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(got(1L) == false) // == 5000 -> false (strictly greater)
    assert(got(2L) == true)
    assert(got(3L) == false) // wrong category
    assert(got(4L) == true)
    assert(got(5L) == null)  // null amount -> null (reference's 3VL)
  }

  test("client_category: null/boundary ages map to new/regular/vip, never null") {
    val asOf = to_date(lit("2025-06-01"))
    val bronze = Seq(
      (1L, Some(Date.valueOf("2025-01-01"))), // ~0.4y -> new
      (2L, Some(Date.valueOf("2024-06-01"))), // exactly 1y -> regular
      (3L, Some(Date.valueOf("2022-06-01"))), // exactly 3y -> vip
      (4L, Some(Date.valueOf("2023-01-01"))), // ~2.4y -> regular
      (5L, None)                              // null -> new
    ).toDF("client_id", "registration_date")
    val got = ReferenceShapes.silverClients(bronze, asOf)
      .select("client_id", "client_category")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new", 2L -> "regular", 3L -> "vip",
      4L -> "regular", 5L -> "new"))
  }

  test("rates: dense spine, forward-fill propagates, leading nulls stay null") {
    val sparse = Seq(
      (Date.valueOf("2024-01-03"), Some("91.5"), None: Option[String]),
      (Date.valueOf("2024-01-06"), Some("92.0"), Some("10.0"))
    ).toDF("date", "USD", "CNY")
    val got = ReferenceShapes.silverRates(sparse, Seq("USD", "CNY"))
      .orderBy("date").collect()
    assert(got.length == 4) // dense 01-03..01-06
    val byDate = got.map(r => r.getDate(0).toString -> r).toMap
    assert(byDate("2024-01-04").getDouble(1) == 91.5)  // USD forward-filled
    assert(byDate("2024-01-05").getDouble(1) == 91.5)
    assert(byDate("2024-01-03").isNullAt(2))           // CNY leading null stays
    assert(byDate("2024-01-06").getDouble(2) == 10.0)
    // change: null until a previous filled value exists, then diff
    assert(byDate("2024-01-03").isNullAt(3))           // USD_change first row
    assert(byDate("2024-01-04").getDouble(3) == 0.0)   // filled - same = 0
    assert(byDate("2024-01-06").getDouble(3) == 0.5)
  }

  test("SQL entry produces identical rows to the DataFrame mart (E1 vs E2)") {
    val d = "/root/testdata/sf0.001"
    val sql = graft.SparkEntry.queries("q44_sql_entry")(spark, d).collect().toSeq
    val df = graft.SparkEntry.queries("q01_client_stats")(spark, d).collect().toSeq
    assert(sql == df)
  }
}

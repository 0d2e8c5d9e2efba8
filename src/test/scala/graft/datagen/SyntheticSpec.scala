package graft.datagen

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SyntheticSpec extends SparkSpec {
  import spark.implicits._

  test("transactions: deterministic for fixed seed+partitioning, right shape") {
    val a = Synthetic.transactions(spark, 10000, seed = 7, partitions = 4)
    val b = Synthetic.transactions(spark, 10000, seed = 7, partitions = 4)
    assert(a.agg(sum("amount")).head.getDouble(0) == b.agg(sum("amount")).head.getDouble(0))
    val mm = a.agg(min("amount"), max("amount"), countDistinct("category"),
      countDistinct("currency")).head
    assert(mm.getDouble(0) >= 1.0 && mm.getDouble(1) <= 10000.0)
    assert(mm.getLong(2) == 4L && mm.getLong(3) == 4L)
    // datetime within 2023
    val years = a.select(year(col("transaction_datetime"))).distinct()
      .as[Int].collect().toSet
    assert(years == Set(2023))
  }

  test("different seed gives different data") {
    val a = Synthetic.transactions(spark, 1000, seed = 1)
    val b = Synthetic.transactions(spark, 1000, seed = 2)
    assert(a.agg(sum("amount")).head.getDouble(0) != b.agg(sum("amount")).head.getDouble(0))
  }

  test("clients: tier split ~30/70, 10 countries, padded names") {
    val c = Synthetic.clients(spark, 10000, seed = 7)
    val premium = c.filter(col("tier") === "premium").count()
    assert(premium > 2500 && premium < 3500)
    assert(c.select("country").distinct().count() == 10)
    assert(c.select("name").as[String].head().startsWith("Client#"))
  }

  test("rates: dense daily spine with plausible cross-rate") {
    val r = Synthetic.currencyRates(spark, "2024-01-01", "2024-03-31")
    assert(r.count() == 91)
    val row = r.agg(min("USD"), max("USD"), min("CNY"), max("CNY")).head
    assert(row.getDouble(0) > 50 && row.getDouble(1) < 90)
    assert(row.getDouble(2) > 5 && row.getDouble(3) < 15)
  }

  test("generated data flows through the reference-shape silver derivations") {
    val silver = graft.ops.ReferenceShapes.silverTransactions(
      Synthetic.transactions(spark, 5000, seed = 7))
    assert(silver.filter(col("is_suspicious")).count() > 0)
    assert(silver.schema("amount").dataType.typeName == "decimal(18,2)")
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scalar datetime functions from SURVEY.md §2.8 that DuckDB cannot oracle
  * 1:1 (months_between semantics are Spark-specific), covered by unit
  * expectations instead.
  */
class DatetimeExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("months_between with day fractions (reference age derivation, cell 7)") {
    val df = Seq(("2024-03-15", "2023-03-15"), ("2024-03-31", "2024-02-29"))
      .toDF("d1", "d2")
    val got = df.select(
      months_between(to_date(col("d1")), to_date(col("d2"))).as("mb"))
      .as[Double].collect().toSeq
    assert(got(0) == 12.0)
    assert(got(1) == 1.0) // both last-day-of-month -> whole month
  }

  test("age-bucket derivation matches the reference's client_category logic") {
    // deltalake.ipynb:977-985: age = floor(months_between/12); null->new, <1->new, <3->regular, else vip
    val df = Seq(Some("2025-01-01"), Some("2024-01-01"), Some("2020-06-15"), None)
      .toDF("reg")
    val refDate = to_date(lit("2025-06-01"))
    val age = floor(months_between(refDate, to_date(col("reg"))) / 12)
    val cat = when(age.isNull, "new").when(age < 1, "new")
      .when(age < 3, "regular").otherwise("vip")
    val got = df.select(cat.as("c")).as[String].collect().toSeq
    assert(got == Seq("new", "regular", "vip", "new"))
  }

  test("to_timestamp/from_unixtime round-trip in UTC") {
    val df = Seq("2024-06-01 12:34:56").toDF("s")
    val rt = df.select(
      from_unixtime(unix_timestamp(to_timestamp(col("s")))).as("r"))
      .as[String].head()
    assert(rt == "2024-06-01 12:34:56")
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(10.0), "a"), (2L, None, "b"), (3L, Some(-5.0), "a")
  ).toDF("k", "v", "g")

  test("columnStats: nulls, min/max for numerics, null min/max for strings") {
    val stats = Quality.columnStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats("v").getAs[Long]("n_nulls") == 1L)
    assert(stats("v").getAs[Double]("min_val") == -5.0)
    assert(stats("v").getAs[Double]("max_val") == 10.0)
    assert(stats("g").isNullAt(4) && stats("g").isNullAt(5))
    assert(stats("k").getAs[Long]("n_rows") == 3L)
  }

  test("check counts violations; null predicate is a pass (SQL NOT-cond semantics)") {
    val out = Quality.check(df, Seq(
      "v_positive" -> (col("v") > 0.0),
      "v_present" -> col("v").isNotNull,
      "k_small" -> (col("k") < 10L)))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // v > 0: row2 null -> pass (NULL is not a definite violation), row3 -5 -> violation
    assert(out("v_positive") == ((1L, false)))
    // nulls are caught by an explicit isNotNull constraint instead
    assert(out("v_present") == ((1L, false)))
    assert(out("k_small") == ((0L, true)))
  }

  test("quarantine splits rows and tags violated constraint names in order") {
    val (good, bad) = Quality.quarantine(df, Seq(
      "v_positive" -> (col("v") > 0.0),
      "g_is_a" -> (col("g") === "a")))
    assert(good.select("k").as[Long].collect().toSet == Set(1L))
    // row2: v null -> v_positive passes; g=b -> g_is_a violated
    val badMap = bad.select("k", "violations").as[(Long, String)].collect().toMap
    assert(badMap == Map(2L -> "g_is_a", 3L -> "v_positive"))
  }
}

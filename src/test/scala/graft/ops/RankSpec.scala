package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Relational.globalRank]] / [[Relational.ntileDistributed]]: the
  * distributed two-pass forms must be bit-identical to the global-window
  * `row_number` / `ntile` for any row count (divisible, non-divisible,
  * fewer rows than buckets) and any shuffle-partition count — the property
  * that lets q62 drop its single-partition window.
  */
class RankSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int) =
    (0 until n).map(i => ((i * 7919) % 1000, i.toLong)).toDF("v", "id")

  private def windowNtile(df: org.apache.spark.sql.DataFrame, b: Int) =
    df.withColumn("nt",
      ntile(b).over(Window.orderBy(col("v"), col("id"))).cast("long"))

  test("globalRank equals global-window row_number for any partition count") {
    val df = fixture(997)
    val expected = df.withColumn("rk",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 5, 32)) {
      val (ranked, total) = Relational.globalRank(
        df.repartition(parts), col("v"), col("id"))
      assert(total == 997L)
      val got = ranked.select(col("id"), col("__rank")).as[(Long, Long)]
        .collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("ntileDistributed equals window ntile: divisible, ragged, n<buckets") {
    for ((n, b) <- Seq((1000, 4), (997, 4), (1003, 7), (3, 5), (1, 1))) {
      val df = fixture(n)
      val expected = windowNtile(df, b).select("id", "nt")
        .as[(Long, Long)].collect().toMap
      val got = Relational.ntileDistributed(df, b, col("v"), col("id"))
        .select(col("id"), col("__ntile")).as[(Long, Long)].collect().toMap
      assert(got == expected, s"n=$n b=$b")
    }
  }
}

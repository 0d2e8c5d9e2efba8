package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1L to 1000L).map(i => (i, s"g${i % 3}")).toDF("id", "g")

  test("hashSplit is stable under repartitioning") {
    val a = Sampling.hashSplit(df, "id", 80)
      .filter(col("is_train")).select("id").as[Long].collect().toSet
    val b = Sampling.hashSplit(df.repartition(7), "id", 80)
      .filter(col("is_train")).select("id").as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size - 800) < 60) // ~80% within tolerance
  }

  test("hashSplit train/test partition the data") {
    val s = Sampling.hashSplit(df, "id", 80)
    assert(s.filter(col("is_train")).count() + s.filter(!col("is_train")).count() == 1000)
  }

  test("stratifiedSampleExact takes exactly k per group (or all if fewer)") {
    val got = Sampling.stratifiedSampleExact(df, "g", "id", 50)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(got.values.forall(_ == 50L))
    val small = Sampling.stratifiedSampleExact(df.filter(col("id") <= 10), "g", "id", 50)
    assert(small.count() == 10) // groups smaller than k keep everything
  }

  test("stratified sample is deterministic across runs") {
    val a = Sampling.stratifiedSampleExact(df, "g", "id", 10).select("id").as[Long].collect().toSet
    val b = Sampling.stratifiedSampleExact(df.repartition(13), "g", "id", 10)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }
}

package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join equals the naive inequality join") {
    val points = Seq(("k1", 5L), ("k1", 100L), ("k1", 250L), ("k2", 100L))
      .toDF("k", "t")
    val intervals = Seq(
      ("k1", 0L, 50L, "i1"), ("k1", 90L, 260L, "i2"), ("k1", 240L, 300L, "i3"),
      ("k2", 0L, 99L, "i4"))
      .toDF("k", "s", "e", "name")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e", 64L)
      .select("k", "t", "name").as[(String, Long, String)].collect().toSet
    val naive = points.join(intervals, Seq("k"))
      .filter($"t" >= $"s" && $"t" < $"e")
      .select("k", "t", "name").as[(String, Long, String)].collect().toSet
    assert(got == naive)
    assert(got == Set(("k1", 5L, "i1"), ("k1", 100L, "i2"),
      ("k1", 250L, "i2"), ("k1", 250L, "i3")))
  }

  test("intervals spanning many buckets and boundary exclusivity") {
    val points = Seq(("k", 0L), ("k", 999L), ("k", 1000L)).toDF("k", "t")
    val intervals = Seq(("k", 0L, 1000L, "big")).toDF("k", "s", "e", "name")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e", 10L)
      .select("t").as[Long].collect().toSet
    assert(got == Set(0L, 999L)) // end-exclusive; t=1000 outside
  }
}

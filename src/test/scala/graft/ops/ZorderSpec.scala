package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def morton2(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { j =>
      (((x >> j) & 1L) << (2 * j)) + (((y >> j) & 1L) << (2 * j + 1))
    }.sum

  test("z-key is the exact Morton interleave on a uniform grid") {
    // 4×4 grid with 4 rows per distinct value per dim: ntile(4) assigns
    // bucket = value exactly, so the key must equal the textbook Morton
    // number of (x, y)
    val grid = (for (x <- 0L until 4L; y <- 0L until 4L) yield (x, y))
      .toDF("x", "y")
    val got = Zorder.withZKey(grid, Seq("x", "y"), bits = 2)
      .select("x", "y", "__z").as[(Long, Long, Long)].collect()
    assert(got.length == 16)
    got.foreach { case (x, y, z) =>
      assert(z == morton2(x, y, 2), s"($x,$y): z=$z != ${morton2(x, y, 2)}")
    }
  }

  test("z-order locality: z-adjacent rows are near in EVERY dimension") {
    // the property range+sort clustering lacks on the trailing column:
    // along the z-curve, consecutive 4-cell blocks are 2×2 squares — both
    // dims move by at most 1 bucket inside a block
    val grid = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
    val byZ = Zorder.withZKey(grid, Seq("x", "y"), bits = 3)
      .orderBy("__z").select("x", "y").as[(Long, Long)].collect()
    byZ.grouped(4).foreach { block =>
      assert(block.map(_._1).max - block.map(_._1).min <= 1, block.toSeq)
      assert(block.map(_._2).max - block.map(_._2).min <= 1, block.toSeq)
    }
  }

  test("quantile bucketing fills the z-space under heavy value skew") {
    // exponential-ish skew in v: equal-frequency rank buckets must still
    // spread rows across all 2^bits buckets per dim (value-range
    // quantization would collapse most rows into bucket 0)
    val skewed = (1L to 1024L).map(i => (i * i * i, i % 17)).toDF("v", "w")
    val z = Zorder.withZKey(skewed, Seq("v", "w"), bits = 3)
    val distinctZ = z.select("__z").distinct().count()
    assert(distinctZ >= 32, s"only $distinctZ distinct z-keys")
  }

  test("clusterZ rewrite preserves the multiset and commits ZORDER") {
    val t = new graft.table.ManagedTable(spark, tmpDir("zorder") + "/t")
    val df = graft.model.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_quantity")
    t.overwrite(df)
    t.clusterZ(Seq("l_orderkey", "l_partkey"), bits = 4)
    assert(t.history(1).collect().head.getAs[String]("operation") == "ZORDER")
    val after = t.read
    assert(after.count() == df.count())
    assert(after.exceptAll(df).isEmpty && df.exceptAll(after).isEmpty)
  }
}

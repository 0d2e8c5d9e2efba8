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

  test("boundary quantization is bit-identical to rank NTILE on distinct " +
      "values when the reservoir holds every row") {
    // 997 rows, distinct permuted values, 8 buckets (N mod b != 0 so the
    // NTILE size rule's two bucket sizes are both exercised): with one
    // column the z-key is bucket-1, so withZKey vs ntileDistributed is a
    // direct quantizer comparison
    val df = (1L to 997L).map(i => ((i * 7919L) % 997L, i)).toDF("v", "id")
    val viaBounds = Zorder.withZKey(df, Seq("v"), bits = 3)
      .select(col("id"), (col("__z") + 1).as("b"))
    val viaRank = Relational.ntileDistributed(df, 8, col("v"))
      .select(col("id"), col("__ntile").as("b"))
    assert(viaBounds.join(viaRank, "id")
      .filter(viaBounds("b") =!= viaRank("b")).isEmpty)
  }

  test("RankBucket: boundary ties take the lower bucket; nulls bucket 1; " +
      "dates and strings order correctly") {
    import org.apache.spark.sql.GraftBridge.{column => gcol, expression}
    def bucketed(df: org.apache.spark.sql.DataFrame, c: String,
                 bounds: Array[Any]) =
      df.withColumn("b", coalesce(
        gcol(graft.functions.RankBucket(expression(col(c)), bounds)), lit(1L)))
    // longs with a duplicate boundary: v == boundary stays below it
    val l = Seq[java.lang.Long](1L, 5L, 6L, 9L, null)
      .toDF("v")
    val lb = bucketed(l, "v", Array[Any](5L, 5L, 8L))
      .collect().map(r => (Option(r.get(0)), r.getLong(1))).toMap
    assert(lb(Some(1L)) == 1L)   // below every boundary
    assert(lb(Some(5L)) == 1L)   // tie with [5, 5] → lower bucket
    assert(lb(Some(6L)) == 3L)   // above both 5s, below 8
    assert(lb(Some(9L)) == 4L)   // above everything
    assert(lb(None) == 1L)       // null → bucket 1
    // dates: internal DateType is days-since-epoch ints
    val d = Seq("2024-01-01", "2024-06-01", "2024-12-31")
      .toDF("s").select(to_date(col("s")).as("v"))
    val dBounds = Array[Any](
      java.time.LocalDate.of(2024, 3, 1).toEpochDay.toInt)
    assert(bucketed(d, "v", dBounds).orderBy("v")
      .collect().map(_.getLong(1)).toSeq == Seq(1L, 2L, 2L))
    // strings: internal UTF8String ordering
    val s = Seq("apple", "mango", "zebra").toDF("v")
    val sBounds = Array[Any](
      org.apache.spark.unsafe.types.UTF8String.fromString("m"))
    assert(bucketed(s, "v", sBounds).orderBy("v")
      .collect().map(_.getLong(1)).toSeq == Seq(1L, 2L, 2L))
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

package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Optimized writes (`graft.optimizeWrite`, Delta's
  * `autoOptimize.optimizeWrite` role): user-level writes rebalance
  * through one AQE shuffle so file counts track data size, not incoming
  * task count.
  */
class OptimizeWriteSpec extends SparkSpec {
  import spark.implicits._

  private def lastFilesAdded(t: ManagedTable): Long =
    t.history(1).collect().head.getAs[Long]("filesAdded")

  test("rebalanced append collapses a many-partition tiny write to few files") {
    val dir = tmpDir("optwrite")
    val t = new ManagedTable(spark, dir + "/t")
    t.overwrite(Seq((0L, "seed")).toDF("id", "s"))
    // control: 16 incoming shuffle partitions → one file per non-empty task
    t.append(spark.range(1, 101).toDF("id").withColumn("s", col("id").cast("string"))
      .repartition(16))
    val controlFiles = lastFilesAdded(t)
    assert(controlFiles > 4, s"control append wrote only $controlFiles files")

    t.setProperties(Map("graft.optimizeWrite" -> "true"))
    t.append(spark.range(101, 201).toDF("id").withColumn("s", col("id").cast("string"))
      .repartition(16))
    val optFiles = lastFilesAdded(t)
    // AQE coalesces the 16 tiny shuffle partitions to ~1 advisory-sized one
    assert(optFiles < controlFiles && optFiles <= 2,
      s"optimizeWrite added $optFiles files (control $controlFiles)")
    assert(t.read.count() == 201)
  }

  test("partitioned append writes one file per partition dir, not per task") {
    val dir = tmpDir("optwrite-part")
    val t = new ManagedTable(spark, dir + "/t")
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi).toDF("id")
      .withColumn("p", (col("id") % 2).cast("string"))
    t.overwrite(mk(0, 10), partitionCols = Seq("p"))
    t.append(mk(10, 110).repartition(16), partitionCols = Seq("p"))
    val controlFiles = lastFilesAdded(t)
    assert(controlFiles > 4, s"control append wrote only $controlFiles files")

    t.setProperties(Map("graft.optimizeWrite" -> "true"))
    t.append(mk(110, 210).repartition(16), partitionCols = Seq("p"))
    val optFiles = lastFilesAdded(t)
    // shuffled on p: each of the 2 partition dirs is written by one task
    assert(optFiles <= 2, s"optimizeWrite added $optFiles files (control $controlFiles)")
    assert(t.read.count() == 210)
  }

  test("optimistic (leaseless) appends rebalance too") {
    val dir = tmpDir("optwrite-occ")
    val t = new ManagedTable(spark, dir + "/t")
    t.overwrite(Seq((0L, "seed")).toDF("id", "s"))
    t.setProperties(Map("graft.optimizeWrite" -> "true"))
    t.appendOptimistic(spark.range(1, 101).toDF("id")
      .withColumn("s", col("id").cast("string")).repartition(16))
    assert(lastFilesAdded(t) <= 2)
    assert(t.read.count() == 101)
  }
}

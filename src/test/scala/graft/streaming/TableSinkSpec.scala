package graft.streaming

import graft.SparkSpec
import graft.table.ManagedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Managed-table streaming sink (Delta's `writeStream.format("delta")`
  * role): idempotent append batches, complete-mode overwrite, restart
  * without duplication.
  */
class TableSinkSpec extends SparkSpec {
  import spark.implicits._

  test("append mode lands every micro-batch exactly once; restart does " +
      "not duplicate") {
    val dir = tmpDir("sink-append")
    val path = s"$dir/t"
    val ckpt = s"$dir/ckpt"
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    def start() = in.toDF().toDF("k", "v").writeStream
      .format("graft.streaming.TableSinkProvider")
      .option("path", path).option("checkpointLocation", ckpt)
      .start()

    in.addData((1L, "a"), (2L, "b"))
    val q1 = start()
    q1.processAllAvailable()
    in.addData((3L, "c"))
    q1.processAllAvailable()
    q1.stop()
    val t = new ManagedTable(spark, path)
    assert(t.read.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // restart from the same checkpoint: nothing replays, new data lands
    in.addData((4L, "d"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(t.read.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(t.read.count() == 4) // no duplicated batch
  }

  test("partitionBy flows through to the table layout") {
    val dir = tmpDir("sink-part")
    val path = s"$dir/t"
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("k", "part").writeStream
      .format("graft.streaming.TableSinkProvider")
      .option("path", path).option("checkpointLocation", s"$dir/ckpt")
      .partitionBy("part")
      .start()
    in.addData((1L, "x"), (2L, "y"))
    q.processAllAvailable()
    q.stop()
    val t = new ManagedTable(spark, path)
    assert(t.read.as[(Long, String)].collect().toSet ==
      Set((1L, "x"), (2L, "y")))
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs.contains("part=x") && dirs.contains("part=y"))
  }

  test("complete mode overwrites with each aggregate refresh") {
    val dir = tmpDir("sink-complete")
    val path = s"$dir/t"
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("k")
      .groupBy((col("k") % 2).as("g")).agg(count(lit(1)).as("cnt"))
      .writeStream
      .format("graft.streaming.TableSinkProvider")
      .option("path", path).option("checkpointLocation", s"$dir/ckpt")
      .outputMode("complete")
      .start()
    in.addData(1L, 2L, 3L)
    q.processAllAvailable()
    val t = new ManagedTable(spark, path)
    assert(t.read.as[(Long, Long)].collect().toSet == Set((0L, 1L), (1L, 2L)))
    in.addData(4L, 5L)
    q.processAllAvailable()
    q.stop()
    assert(t.read.as[(Long, Long)].collect().toSet == Set((0L, 2L), (1L, 3L)))
  }

  test("a replayed FOUNDING batch is a no-op: the marker rides inside " +
      "the founding data commit itself") {
    val path = tmpDir("sink-found") + "/t"
    val sink = new TableStreamSink(spark.sqlContext, path, "app-x", Nil,
      org.apache.spark.sql.streaming.OutputMode.Append())
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    sink.addBatch(0L, df)
    sink.addBatch(0L, df) // crash-replay of the founding batch
    val t = new ManagedTable(spark, path)
    assert(t.read.count() == 2)
    sink.addBatch(1L, Seq((3L, "c")).toDF("k", "v"))
    sink.addBatch(1L, Seq((3L, "c")).toDF("k", "v"))
    assert(t.read.count() == 3)
  }

  test("the managed source and sink compose into a table-to-table pipeline") {
    val dir = tmpDir("sink-pipe")
    val src = new ManagedTable(spark, s"$dir/src")
    src.overwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"))
    val q = src.readStreamAppends(startingVersion = 0)
      .withColumn("x2", col("x") * 2)
      .writeStream
      .format("graft.streaming.TableSinkProvider")
      .option("path", s"$dir/dst")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      src.append(Seq((3L, 30.0)).toDF("k", "x"))
      q.processAllAvailable()
      val dst = new ManagedTable(spark, s"$dir/dst")
      assert(dst.read.as[(Long, Double, Double)].collect().toSet ==
        Set((1L, 10.0, 20.0), (2L, 20.0, 40.0), (3L, 30.0, 60.0)))
    } finally q.stop()
  }
}

package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shallow clone: zero-copy snapshot semantics (Delta `SHALLOW CLONE`).
  * The clone's founding manifest references the SOURCE's files; no data
  * moves at clone time, reads/time-travel/skipping work, mutations demand
  * an explicit materialize(), and the lifecycle against source rewrites /
  * vacuums matches Delta's contract.
  */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._

  private def mk(name: String): (ManagedTable, String) = {
    val base = tmpDir(name)
    (new ManagedTable(spark, s"$base/src"), base)
  }

  private def dataFilesUnder(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    val d = new java.io.File(dir)
    if (d.exists()) walk(d) else Nil
  }

  test("shallow clone is zero-copy and reads the source snapshot") {
    val (src, base) = mk("sc-basic")
    src.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("k", "g", "v"))
    val c = src.shallowCloneTo(s"$base/clone")
    assert(c.isShallowClone)
    // ZERO data files under the clone root — the 100 TB clone is metadata
    assert(dataFilesUnder(s"$base/clone").isEmpty)
    assert(c.read.orderBy("k").as[(Long, String, Double)].collect().toSeq ==
      src.read.orderBy("k").as[(Long, String, Double)].collect().toSeq)
    assert(c.countFast() == 3)
    assert(c.detail().select("num_files").as[Long].head() > 0)
  }

  test("the clone is pinned: source appends/deletes after it are invisible") {
    val (src, base) = mk("sc-pinned")
    src.overwrite((0L until 10L).map(i => (i, i * 1.0)).toDF("k", "v"))
    val c = src.shallowCloneTo(s"$base/clone")
    src.append(Seq((100L, 100.0)).toDF("k", "v"))
    src.deleteVectored(col("k") < 3)
    assert(src.read.count() == 8)
    assert(c.read.count() == 10) // the founding snapshot, untouched
  }

  test("deletion vectors carry over: the clone hides DV-deleted rows") {
    val (src, base) = mk("sc-dv")
    src.overwrite((0L until 20L).map(i => (i, i * 1.0)).toDF("k", "v"))
    src.deleteVectored(col("k") % 4 === 0) // 5 rows marked, no rewrite
    val c = src.shallowCloneTo(s"$base/clone")
    assert(c.read.count() == 15)
    assert(c.countFast() == 15)
    assert(c.read.filter(col("k") % 4 === 0).count() == 0)
  }

  test("partitioned source: partition columns resolve through the foreign root") {
    val (src, base) = mk("sc-part")
    src.overwrite(Seq((1L, "d1", 1.0), (2L, "d2", 2.0), (3L, "d1", 3.0))
      .toDF("k", "day", "v"), Seq("day"))
    val c = src.shallowCloneTo(s"$base/clone")
    assert(c.read.columns.toSet == Set("k", "v", "day"))
    assert(c.read.filter(col("day") === "d1").select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("data skipping works on the clone via the carried-over sidecar") {
    val (src, base) = mk("sc-skip")
    val df = spark.range(0, 800).selectExpr("id as k", "cast(id as double) as v")
    src.overwrite(df.repartitionByRange(8, col("k")).sortWithinPartitions("k"))
    val c = src.shallowCloneTo(s"$base/clone")
    val (kept, all) = c.filesOverlapping("v", 100.0, 199.0)
    assert(all.size == 8 && kept.size < 8)
    assert(c.readWhere("v", 100.0, 199.0).count() == 100)
  }

  test("bloom point-lookup skipping carries over verbatim") {
    val (src, base) = mk("sc-bloom")
    src.overwrite(spark.range(0, 400)
      .selectExpr("id as k", "cast(id % 50 as string) as tag").repartition(4))
    src.addBloomIndex("k", expectedItemsPerFile = 1000)
    val c = src.shallowCloneTo(s"$base/clone")
    val (kept, all) = c.filesForPoint("k", 7L)
    assert(kept.size < all.size) // the copied filters prune
    assert(c.readPoint("k", 7L).count() == 1)
  }

  test("clone survives a source rewrite (follows retired files) until vacuum") {
    val (src, base) = mk("sc-rewrite")
    src.overwrite((0L until 100L).map(i => (i, i * 1.0)).toDF("k", "v")
      .repartition(4))
    val c = src.shallowCloneTo(s"$base/clone")
    src.compact(numFiles = 1)          // retires the referenced files
    src.delete(col("k") >= 50L)        // another rewrite on top
    // the clone resolves its references into the source's retained dirs
    assert(c.read.count() == 100)
    assert(c.read.agg(sum(col("k"))).as[Long].head() == 4950L)
    // source vacuum drops the snapshots → the clone fails POINTEDLY
    src.vacuumVersions()
    val e = intercept[IllegalStateException] { c.read.count() }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("time travel and history work on the clone") {
    val (src, base) = mk("sc-tt")
    src.overwrite(Seq((1L, "a")).toDF("k", "v"))
    val c = src.shallowCloneTo(s"$base/clone")
    assert(c.history().select("operation").as[String].collect()
      .contains("CLONE_SHALLOW"))
    assert(c.readVersion(c.version).count() == 1)
  }

  test("every mutation on an unmaterialized clone fails fast and changes nothing") {
    val (src, base) = mk("sc-mut")
    src.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "g", "v"))
    val c = src.shallowCloneTo(s"$base/clone")
    val before = c.read.orderBy("k").collect().toSeq
    val srcBefore = src.read.orderBy("k").collect().toSeq
    intercept[UnsupportedOperationException] {
      c.append(Seq((3L, "c", 3.0)).toDF("k", "g", "v")) }
    intercept[UnsupportedOperationException] {
      c.overwrite(Seq((3L, "c", 3.0)).toDF("k", "g", "v")) }
    intercept[UnsupportedOperationException] { c.delete(col("k") === 1L) }
    intercept[UnsupportedOperationException] { c.deleteVectored(col("k") === 1L) }
    intercept[UnsupportedOperationException] { c.compact(1) }
    intercept[UnsupportedOperationException] { c.cluster("k") }
    intercept[UnsupportedOperationException] {
      c.merge(Seq((1L, "z", 9.0)).toDF("k", "g", "v"), Seq("k")) }
    intercept[UnsupportedOperationException] { c.restore(c.version) }
    intercept[UnsupportedOperationException] { c.renameColumn("v", "w") }
    intercept[UnsupportedOperationException] { c.dropColumn("v") }
    intercept[UnsupportedOperationException] { c.cloneTo(s"$base/clone2") }
    intercept[UnsupportedOperationException] { c.shallowCloneTo(s"$base/clone3") }
    intercept[UnsupportedOperationException] {
      c.readStream.writeStream.format("noop").start() }
    // neither side changed
    assert(c.read.orderBy("k").collect().toSeq == before)
    assert(src.read.orderBy("k").collect().toSeq == srcBefore)
  }

  test("materialize copies the referenced files in and makes the clone independent") {
    val (src, base) = mk("sc-mat")
    src.overwrite(Seq((1L, "d1", 1.0), (2L, "d2", 2.0), (3L, "d1", 3.0))
      .toDF("k", "day", "v"), Seq("day"))
    src.deleteVectored(col("k") === 3L)
    val c = src.shallowCloneTo(s"$base/clone")
    c.materialize()
    assert(!c.isShallowClone)
    assert(dataFilesUnder(s"$base/clone").nonEmpty) // files are local now
    assert(c.read.orderBy("k").select("k").as[Long].collect().toSeq ==
      Seq(1L, 2L)) // DV survived the re-key
    // independence: the source can vacuum (or vanish) freely
    src.compact(numFiles = 1)
    src.vacuumVersions()
    assert(c.read.count() == 2)
    // and mutations now work, starting a normal history
    c.append(Seq((4L, "d2", 4.0)).toDF("k", "day", "v"), Seq("day"))
    assert(c.read.count() == 3)
    assert(c.history(1).select("operation").as[String].head() == "APPEND")
    // idempotent
    c.materialize()
    assert(c.read.count() == 3)
  }

  test("materialized clone keeps skipping: sidecar and blooms re-key to local paths") {
    val (src, base) = mk("sc-mat-skip")
    src.overwrite(spark.range(0, 800)
      .selectExpr("id as k", "cast(id as double) as v")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id"))
    src.addBloomIndex("k", expectedItemsPerFile = 1000)
    val c = src.shallowCloneTo(s"$base/clone")
    c.materialize()
    val (kept, all) = c.filesOverlapping("v", 100.0, 199.0)
    assert(all.size == 8 && kept.size < 8)
    assert(kept.forall(_.contains("/clone/"))) // stats serve LOCAL paths
    val (bkept, ball) = c.filesForPoint("k", 7L)
    assert(bkept.size < ball.size) // re-keyed blooms still prune
    assert(c.readPoint("k", 7L).count() == 1)
    assert(c.readWhere("v", 100.0, 199.0).count() == 100)
  }
}

package graft.table

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Symlink manifests (Delta's GENERATE symlink_format_manifest): external
  * engines read a consistent snapshot from per-partition file lists.
  */
class SymlinkManifestSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) = new Path(p).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("partitioned generate writes one manifest per partition dir and " +
      "lists exactly the live snapshot") {
    val p = tmpDir("sym-part") + "/t"
    val t = new ManagedTable(spark, p)
    t.overwrite((0L until 40L).map(i => (i, s"p${i % 2}")).toDF("k", "part"),
      Seq("part"))
    t.generateSymlinkManifest()
    val fs = fsOf(p)
    for (d <- Seq("part=p0", "part=p1"))
      assert(fs.exists(new Path(p, s"_symlink_format_manifest/$d/manifest")))
    val listed = t.symlinkManifestFiles()
    val live = fs.listStatus(new Path(p)).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("part="))
      .flatMap(d => fs.listStatus(d.getPath))
      .map(_.getPath.toString).filter(_.endsWith(".parquet")).sorted.toSeq
    assert(listed == live)
    // an external-style read of the listed files sees the whole table
    val ext = spark.read.option("basePath", p).parquet(listed: _*)
    assert(ext.count() == 40)
    assert(ext.select("k").as[Long].collect().toSet == (0L until 40L).toSet)
  }

  test("the autoManifest property regenerates on every commit; a manual " +
      "tree goes stale until regenerated") {
    val p = tmpDir("sym-auto") + "/t"
    val t = new ManagedTable(spark, p)
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    t.generateSymlinkManifest()
    val before = t.symlinkManifestFiles()
    t.append(Seq((2L, "b")).toDF("k", "v"))
    assert(t.symlinkManifestFiles() == before) // stale: no auto property
    t.setProperties(Map("graft.symlink.autoManifest" -> "true"))
    t.append(Seq((3L, "c")).toDF("k", "v"))
    val after = t.symlinkManifestFiles()
    assert(after.size > before.size)
    val ext = spark.read.parquet(after: _*)
    assert(ext.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("a DV-carrying snapshot refuses; purge unblocks; an auto-managed " +
      "DV commit drops the stale tree instead of publishing a wrong one") {
    val p = tmpDir("sym-dv") + "/t"
    val t = new ManagedTable(spark, p)
    t.setProperties(Map("graft.symlink.autoManifest" -> "true"))
    t.overwrite((0L until 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    assert(t.symlinkManifestFiles().nonEmpty)
    t.deleteVectored(col("k") < 5)
    // the DV commit must not leave a manifest claiming the deleted rows
    assert(t.symlinkManifestFiles().isEmpty)
    val e = intercept[IllegalArgumentException] { t.generateSymlinkManifest() }
    assert(e.getMessage.contains("deletion"))
    t.purgeDeletes() // auto property regenerates on the PURGE commit
    val listed = t.symlinkManifestFiles()
    assert(listed.nonEmpty)
    assert(spark.read.parquet(listed: _*).count() == 15)
  }

  test("the SQL form generates too") {
    val p = tmpDir("sym-sql") + "/t"
    val t = new ManagedTable(spark, p)
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    graft.sql.GraftSql.sql(spark,
      s"GENERATE symlink_format_manifest FOR TABLE '$p'")
    assert(t.symlinkManifestFiles().nonEmpty)
  }
}

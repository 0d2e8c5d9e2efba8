package graft.table

import graft.SparkSpec

/** Auto-compaction (`graft.autoCompact`): appends self-heal the
  * small-file problem instead of deferring it to a maintenance window.
  */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private def countFiles(t: ManagedTable): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(t.path))
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
  }

  test("appends past the threshold trigger an OPTIMIZE; data intact") {
    val t = new ManagedTable(spark, tmpDir("autocompact") + "/t")
    t.overwrite(Seq((0L, "seed")).toDF("id", "s"))
    t.setProperties(Map("graft.autoCompact" -> "true",
      "graft.autoCompact.minFiles" -> "4"))
    for (i <- 1 to 6)
      t.append(Seq((i.toLong, s"row$i")).toDF("id", "s").coalesce(1))
    // the 4th tiny append crossed minFiles=4 → compactSmall repacked
    assert(countFiles(t) < 6, s"never compacted: ${countFiles(t)} files")
    val ops = t.history().collect().map(_.getAs[String]("operation"))
    assert(ops.contains("OPTIMIZE"), ops.toSeq)
    // every row survives, exactly once
    assert(t.read.as[(Long, String)].collect().toSet ==
      (0 to 6).map(i => (i.toLong, if (i == 0) "seed" else s"row$i")).toSet)
  }

  test("without the property, appends never self-compact") {
    val t = new ManagedTable(spark, tmpDir("autocompact-off") + "/t")
    t.overwrite(Seq((0L, "seed")).toDF("id", "s"))
    for (i <- 1 to 6)
      t.append(Seq((i.toLong, s"row$i")).toDF("id", "s").coalesce(1))
    val ops = t.history().collect().map(_.getAs[String]("operation"))
    assert(!ops.contains("OPTIMIZE"), ops.toSeq)
    assert(t.read.count() == 7)
  }
}

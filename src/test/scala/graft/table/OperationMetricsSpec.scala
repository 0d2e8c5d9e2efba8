package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-commit operation metrics (Delta's operationMetrics role):
  * filesAdded / filesRemoved / rowDelta vs the previous commit, computed
  * from the O(1) previous-live-set sidecar — no data pass.
  */
class OperationMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("append / delete / compact report their file and row deltas") {
    val t = new ManagedTable(spark, tmpDir("opmetrics") + "/t")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(2))
    t.append(Seq((3L, "c")).toDF("id", "s").coalesce(1))
    t.delete(col("id") === 2L, Nil)
    t.compact(1)

    val h = t.history().orderBy("version")
      .select("operation", "filesAdded", "filesRemoved", "rowDelta")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(h.length == 4, h.toSeq)
    val Seq(ow, ap, del, opt) = h.toSeq
    assert(ow._1 == "OVERWRITE" && ow._2 >= 1 && ow._3 == 0 && ow._4 == 2, ow)
    assert(ap._1 == "APPEND" && ap._2 == 1 && ap._3 == 0 && ap._4 == 1, ap)
    assert(del._4 == -1, s"delete must report rowDelta -1: $del")
    assert(del._3 >= 1, s"delete rewrites at least one file: $del")
    assert(opt._1 == "OPTIMIZE" && opt._4 == 0, s"compact keeps rows: $opt")
    assert(opt._3 >= 2 && opt._2 == 1, s"compact 3 files -> 1: $opt")
  }

  test("pre-feature checkpoint lines read back with null metrics") {
    val t = new ManagedTable(spark, tmpDir("opmetrics-old") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("id", "s"))
    // strip the metrics field from the checkpoint, simulating a table
    // written by an older build (8-field lines); fold the segmented
    // checkpoint into one file first — this test edits it directly
    t.compactHistoryForTest()
    val hist = new java.io.File(t.path + "._log/_history.txt")
    val lines = scala.io.Source.fromFile(hist).getLines()
      .map(_.split('\t').take(8).mkString("\t")).toList
    val w = new java.io.PrintWriter(hist)
    try w.print(lines.mkString("\n")) finally w.close()
    // the raw rewrite invalidates the local-FS checksum shadow — drop it
    new java.io.File(hist.getParent, "." + hist.getName + ".crc").delete()
    HistoryCache.invalidate("file:" + hist.getAbsolutePath)
    HistoryCache.invalidate(hist.getAbsolutePath)
    val r = t.history().select("filesAdded", "rowDelta").head
    assert(r.isNullAt(0) && r.isNullAt(1), r)
    // and the next commit records metrics again
    t.append(Seq((2L, "b")).toDF("id", "s"))
    val latest = t.history(1).select("rowDelta").head
    assert(latest.getLong(0) == 1L, latest)
  }
}

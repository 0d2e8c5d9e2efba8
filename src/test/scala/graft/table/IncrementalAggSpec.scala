package graft.table

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range, grp: Long => String, v: Long => Double) =
    ids.map(i => (i.toLong, grp(i.toLong), v(i.toLong))).toDF("id", "g", "x")

  private def mk(name: String): (ManagedTable, IncrementalAgg) = {
    val base = tmpDir(name)
    val src = new ManagedTable(spark, s"$base/src")
    val mv = new IncrementalAgg(spark, s"$base/mv", src, Seq("g"), Seq("x"))
    (src, mv)
  }

  private def snapshot(mv: IncrementalAgg): Map[String, (Long, Double)] =
    mv.read.select("g", "cnt", "sum_x").as[(String, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def full(src: ManagedTable): Map[String, (Long, Double)] =
    src.read.groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        sum(col("x").cast("decimal(18,6)")).cast("double").as("sum_x"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("initial build, then append-only refreshes take the incremental path") {
    val (src, mv) = mk("mv-append")
    assert(mv.refresh() == "noop") // source doesn't exist yet
    src.overwrite(rows(0 until 100, i => s"g${i % 3}", _ * 0.5))
    assert(mv.refresh() == "initial")
    assert(snapshot(mv) == full(src))
    src.append(rows(100 until 180, i => s"g${i % 3}", _ * 0.25))
    src.append(rows(180 until 200, _ => "g9", _ => 7.0)) // brand-new group
    assert(mv.refresh() == "incremental") // two APPENDs folded in one go
    assert(snapshot(mv) == full(src))
    assert(mv.refresh() == "noop")
  }

  test("an OVERWRITE in the window forces full recompute") {
    val (src, mv) = mk("mv-full")
    src.overwrite(rows(0 until 100, i => s"g${i % 2}", _ * 1.0))
    mv.refresh()
    src.append(rows(100 until 120, i => s"g${i % 2}", _ * 1.0))
    src.overwrite(rows(0 until 80, i => s"g${i % 3}", _ * 2.0))
    assert(mv.refresh() == "full")
    assert(snapshot(mv) == full(src))
  }

  test("a vectored DELETE in the window refreshes by DV-diff subtraction") {
    val (src, mv) = mk("mv-mor-del")
    src.overwrite(rows(0 until 100, i => s"g${i % 2}", _ * 1.0))
    mv.refresh()
    src.append(rows(100 until 120, i => s"g${i % 2}", _ * 1.0))
    src.deleteVectored(col("id") % 10 === 3)
    assert(mv.refresh() == "incremental-mor")
    assert(snapshot(mv) == full(src))
    // a second DV commit re-marking MORE rows subtracts only the NEW marks
    src.deleteVectored(col("id") % 10 === 4)
    assert(mv.refresh() == "incremental-mor")
    assert(snapshot(mv) == full(src))
  }

  test("vectored UPDATE and MERGE stay incremental: marks subtract, " +
      "replacement files add") {
    val (src, mv) = mk("mv-mor-upd")
    src.overwrite(rows(0 until 90, i => s"g${i % 3}", _ * 0.5))
    mv.refresh()
    src.updateVectored(col("id") % 7 === 0, Map("x" -> (col("x") * 3.0)))
    assert(mv.refresh() == "incremental-mor")
    assert(snapshot(mv) == full(src))
    src.mergeVectored(rows(60 until 110, i => s"g${i % 3}", _ * 9.0), Seq("id"))
    assert(mv.refresh() == "incremental-mor")
    assert(snapshot(mv) == full(src))
  }

  test("an insert-only MERGE is add-bearing: the window stays incremental") {
    val (src, mv) = mk("mv-insonly")
    src.overwrite(rows(0 until 40, i => s"g${i % 2}", _ * 1.0))
    mv.refresh()
    src.mergeInsertOnly(rows(20 until 60, i => s"g${i % 2}", _ * 1.0),
      Seq("id"))
    assert(mv.refresh() == "incremental")
    assert(snapshot(mv) == full(src))
  }

  test("a copy-on-write DML (live files removed) falls back to full") {
    val (src, mv) = mk("mv-cow")
    src.overwrite(rows(0 until 60, i => s"g${i % 2}", _ * 1.0))
    mv.refresh()
    src.delete(col("id") % 5 === 0) // rewrite-style DELETE retires files
    assert(mv.refresh() == "full")
    assert(snapshot(mv) == full(src))
  }

  test("a group whose rows all DV-delete disappears from the view") {
    val (src, mv) = mk("mv-vanish")
    src.overwrite(rows(0 until 40, i => if (i < 10) "gone" else "kept", _ * 1.0))
    mv.refresh()
    assert(snapshot(mv).contains("gone"))
    src.deleteVectored(col("g") === "gone")
    assert(mv.refresh() == "incremental-mor")
    val s = snapshot(mv)
    assert(!s.contains("gone"))
    assert(s == full(src))
  }

  test("NULL finalization: a group left with only null values reads " +
      "sum/avg NULL, exactly as a recompute would") {
    val base = tmpDir("mv-nulls")
    val src = new ManagedTable(spark, s"$base/src")
    val mv = new IncrementalAgg(spark, s"$base/mv", src, Seq("g"), Seq("x"))
    val df = Seq(("a", Some(2.0)), ("a", None), ("b", Some(1.0)))
      .toDF("g", "x")
    src.overwrite(df)
    mv.refresh()
    src.deleteVectored(col("g") === "a" && col("x").isNotNull)
    assert(mv.refresh() == "incremental-mor")
    val out = mv.read.orderBy("g")
      .select("g", "cnt", "sum_x", "avg_x")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSeq
    // group a: one null row survives — cnt 1, sum/avg NULL (the running
    // total alone would say 0.0; the nnz count disambiguates)
    assert(out == Seq(("a", 1L, None, None),
      ("b", 1L, Some(1.0), Some(1.0))))
  }

  test("a pre-nnz state schema migrates via one full recompute") {
    val (src, mv) = mk("mv-migrate")
    src.overwrite(rows(0 until 30, i => s"g${i % 2}", _ * 1.0))
    mv.refresh()
    mv.state.dropColumn("nnz_x") // simulate a state written by the old schema
    src.append(rows(30 until 40, i => s"g${i % 2}", _ * 1.0))
    assert(mv.refresh() == "full")
    assert(snapshot(mv) == full(src))
  }

  test("per-commit refreshes are bit-identical to one-shot aggregation") {
    val (src, mvStep) = mk("mv-bitexact")
    // awkward fractions that would drift under double accumulation order
    src.overwrite(rows(0 until 50, i => s"g${i % 4}", i => 0.1 + i * 0.3))
    mvStep.refresh()
    for (b <- 1 to 5) {
      src.append(rows((b * 50) until (b * 50 + 50), i => s"g${i % 4}",
        i => 0.1 + i * 0.3))
      assert(mvStep.refresh() == "incremental")
    }
    // a second view built in ONE refresh over the final snapshot
    val oneShot = new IncrementalAgg(spark, tmpDir("mv-oneshot") + "/mv",
      src, Seq("g"), Seq("x"))
    assert(oneShot.refresh() == "initial")
    assert(snapshot(mvStep) == snapshot(oneShot)) // decimal adds: exact ==
    assert(snapshot(mvStep) == full(src))
  }

  test("refreshedVersion tracks the source; avg derives from sum/cnt") {
    val (src, mv) = mk("mv-meta")
    src.overwrite(rows(0 until 10, _ => "g", _ => 2.0))
    mv.refresh()
    assert(mv.refreshedVersion == src.version)
    val r = mv.read.select("cnt", "sum_x", "avg_x")
      .as[(Long, Double, Double)].head()
    assert(r == ((10L, 20.0, 2.0)))
  }

  test("OPTIMIZE in the window stays incremental: per-commit attribution " +
      "never mistakes compacted old rows for new ones") {
    val (src, mv) = mk("mv-optimize")
    src.overwrite(rows(0 until 40, i => s"g${i % 2}", _ * 1.5))
    mv.refresh()
    // APPEND then compaction: the appended files are attributed to the
    // APPEND commit's own manifest diff (readable from the retained
    // snapshot after the rewrite); the OPTIMIZE outputs — which re-contain
    // the appended rows — must NOT be double-counted
    src.append(rows(40 until 60, i => s"g${i % 2}", _ * 1.5))
    src.compact(numFiles = 2)
    assert(mv.refresh() == "incremental")
    assert(snapshot(mv) == full(src))
  }

  test("an OPTIMIZE-only window is a no-row change: state untouched, version bumps") {
    val (src, mv) = mk("mv-opt-only")
    src.overwrite(rows(0 until 30, i => s"g${i % 2}", _ * 2.0))
    mv.refresh()
    val before = snapshot(mv)
    src.compact(numFiles = 1)
    assert(mv.refresh() == "incremental")
    assert(mv.refreshedVersion == src.version)
    assert(snapshot(mv) == before)
    assert(snapshot(mv) == full(src))
  }

  test("ZORDER counts as row-neutral alongside appends") {
    val (src, mv) = mk("mv-zorder")
    src.overwrite(rows(0 until 40, i => s"g${i % 2}", _ * 0.5))
    mv.refresh()
    src.append(rows(40 until 70, i => s"g${i % 2}", _ * 0.5))
    src.cluster("id")
    src.append(rows(70 until 90, i => s"g${i % 2}", _ * 0.5))
    assert(mv.refresh() == "incremental")
    assert(snapshot(mv) == full(src))
  }
}

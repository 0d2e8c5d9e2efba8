package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/scan paths once so the first measured query
    // isn't charged for JIT + parquet footer caching (attribution only —
    // every query still runs cold-plan).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/documents.parquet").count()
    catch { case _: Throwable => () }
    // Host-load calibration: median-of-5 of a FIXED piece of work (a 100M
    // range sum — pure CPU, no IO, plan already warm). Two runs of the same
    // code on the same data can then be compared on calibrated totals: a
    // loaded host inflates `calib` and query times alike, so
    // total/calib-ratio is the cross-run signal (r5's apparent per-query
    // regressions were all host noise).
    val calib = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.range(100000000L).selectExpr("sum(id)").collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(2)
    }
    // Per-query median of N runs (default 3; upper median for even N): a
    // single-run bench on a shared host is noise-dominated — r4 showed a
    // 2.8× driver-vs-local gap on identical code — and the median is
    // robust to one slow outlier. Malformed/zero env values fall back to 3.
    val iters = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_ITERS").flatMap(_.toIntOption).getOrElse(3))
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.size / 2)
    }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Full fidelity (complete query names, full-precision seconds) goes to
    // the bench.json FILE; the stdout line is a compact variant. The driver
    // captures only the last ~2000 chars of process output, and the full
    // 106-query line is ~7 KB — r3/r4 both came back `parsed: null` because
    // the line's head fell outside the capture window. Short keys (the qNN
    // prefix, unique by construction; full name kept on the rare collision)
    // plus millisecond rounding keep the line ~1.4 KB.
    def jline(m: Map[String, Double], fmt: Double => String): String = {
      val qs = m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","calib":${fmt(calib)},"queries":$qs,"sf":"$sfDir"}"""
    }
    val full = jline(results, _.toString)
    val shortKeys = results.map { case (k, v) =>
      val s = k.takeWhile(_ != '_')
      (if (results.keys.count(_.takeWhile(_ != '_') == s) == 1) s else k) -> v
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")), full.getBytes("UTF-8"))
    spark.stop()
    // Last stdout line (after spark.stop() so no executor noise follows).
    // Written straight to FD 1: sbt's in-process `run` swaps System.out for
    // its logger and prefixes every println with "[info] ", which a strict
    // line parser rejects — the raw descriptor bypasses the swap and lands
    // the bare JSON on the real stdout.
    val out = new java.io.FileOutputStream(java.io.FileDescriptor.out)
    out.write((jline(shortKeys, v => f"$v%.3f") + "\n").getBytes("UTF-8"))
    out.flush()
  }
}

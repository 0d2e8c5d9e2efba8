package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.pipeline.Medallion
import graft.table.ManagedTable

/** A/B clustering benchmark mirroring the reference's Z-order demo
  * (deltalake.ipynb cell 26 / BASELINE.md: same 3 probe queries on a
  * clustered vs unclustered copy must return identical counts, with the
  * clustered copy scanning faster thanks to parquet row-group min/max
  * skipping). Usage: runMain graft.tools.ClusterBench [sfDir]
  */
object ClusterBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = java.nio.file.Files.createTempDirectory("cluster-bench").toString
    val m = new Medallion(spark, wh, sfDir)
    m.runBronze(); m.runSilver()

    // plain copy (16 unclustered files) vs clustered copy
    val plain = new ManagedTable(spark, s"$wh/plain")
    plain.overwrite(m.silverTxn.read.repartition(16))
    val clustered = new ManagedTable(spark, s"$wh/clustered")
    clustered.overwrite(m.silverTxn.read.repartition(16))
    clustered.cluster("transaction_date", "client_id", "is_suspicious")

    val probes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "point: date+client (ref q1)" ->
        (df => df.filter(col("transaction_date") === "1996-03-15" && col("client_id") === 123L)),
      "flag: is_suspicious (ref q2)" ->
        (df => df.filter(col("is_suspicious"))),
      "range: month+amount (ref q3)" ->
        (df => df.filter(col("transaction_date").between("1996-03-01", "1996-03-31") &&
          col("amount") > lit(1000))))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    for ((name, probe) <- probes) {
      // warm both, then measure second run (mirrors the reference's repeated scans)
      probe(plain.read).count(); probe(clustered.read).count()
      val (n1, t1) = time(probe(plain.read).count())
      val (n2, t2) = time(probe(clustered.read).count())
      val speedup = 100.0 * (t1 - t2) / t1
      println(f"[cluster-bench] $name: rows=$n1%d identical=${n1 == n2}%b " +
        f"plain=${t1}%.3fs clustered=${t2}%.3fs speedup=${speedup}%.1f%%")
    }
    spark.stop()
  }
}

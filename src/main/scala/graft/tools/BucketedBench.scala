package graft.tools

import org.apache.spark.sql.DataFrame

/** Measures what the bucketed gold layout buys once broadcasting is off the
  * table (the at-scale regime): client_stats over plain parquet (shuffle
  * sort-merge join) vs over order-key-bucketed tables (co-located join,
  * zero join-side exchanges). Prints per-run times + the exchange counts so
  * the claim in SCALING.md is a measurement, not an assertion.
  *
  * Usage: runMain graft.tools.BucketedBench [sfDir] [buckets]
  */
object BucketedBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val buckets = if (args.length > 1) args(1).toInt else 32
    val spark = graft.GraftSession.local("bucketed-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val wh = java.nio.file.Files.createTempDirectory("bucketed-bench").toString
    val m = new graft.pipeline.Medallion(spark, wh, sfDir)
    m.runBronze()
    spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")

    def time3(mk: () => DataFrame): (Seq[Double], String) = {
      var plan = ""
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = mk()
        df.count()
        plan = df.queryExecution.executedPlan.toString
        (System.nanoTime() - t0) / 1e9
      }
      (ts, plan)
    }
    def exchanges(plan: String): Int =
      "Exchange hashpartitioning".r.findAllIn(plan).length

    val (plainT, plainPlan) = time3(() =>
      graft.ops.Relational.clientStats(
        m.bronzeLineitem.read, m.bronzeOrders.read, m.bronzeCustomer.read))
    val marts = m.runGoldBucketed(buckets) // layout build (one-time cost)
    val (bktT, bktPlan) = time3(() =>
      graft.ops.Relational.clientStats(
        spark.table("graft_bkt_lineitem"), spark.table("graft_bkt_orders"),
        m.bronzeCustomer.read))

    println(f"[bucketed-bench] plain-SMJ   runs=${plainT.map(t => f"$t%.2f").mkString(",")}s" +
      f" joinExchanges=${exchanges(plainPlan) - 1}")
    println(f"[bucketed-bench] bucketed    runs=${bktT.map(t => f"$t%.2f").mkString(",")}s" +
      f" joinExchanges=${exchanges(bktPlan) - 1}")
    val same = marts("client_stats").exceptAll(
      graft.ops.Relational.clientStats(
        m.bronzeLineitem.read, m.bronzeOrders.read, m.bronzeCustomer.read)).isEmpty
    println(s"[bucketed-bench] results-identical=$same")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
    spark.stop()
  }
}

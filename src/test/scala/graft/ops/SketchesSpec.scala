package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DataSketches aggregates: estimates are engine-specific (rows-only driver
  * gates), so these specs pin what IS guaranteed — published error bounds
  * against exact answers, exactness below the sketch threshold, and the
  * merge identities the incremental sketch-store pattern relies on.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def lineitem = graft.model.Tables.lineitem(spark, dir)
  private def orders = graft.model.Tables.orders(spark, dir)

  test("KLL quantile estimates sit within the k=200 rank-error band") {
    // k=200 ⇒ normalized rank error ≈1.65%; assert each estimate lies
    // between the EXACT values at q∓3% (slack over the published bound)
    val est = Sketches.kllQuantiles(lineitem, "l_returnflag",
      "l_extendedprice", Seq(0.1, 0.5, 0.9))
      .select("l_returnflag", "q10", "q50", "q90")
      .as[(String, Double, Double, Double)].collect()
    assert(est.length == 3)
    est.foreach { case (flag, q10, q50, q90) =>
      val bounds = lineitem.filter(col("l_returnflag") === flag)
        .select(expr("percentile(l_extendedprice, array(0.07,0.13,0.47,0.53,0.87,0.93))"))
        .head.getSeq[Double](0)
      assert(q10 >= bounds(0) && q10 <= bounds(1), s"$flag q10=$q10 ∉ $bounds")
      assert(q50 >= bounds(2) && q50 <= bounds(3), s"$flag q50=$q50 ∉ $bounds")
      assert(q90 >= bounds(4) && q90 <= bounds(5), s"$flag q90=$q90 ∉ $bounds")
      assert(q10 < q50 && q50 < q90)
    }
  }

  test("theta distinct counts are exact below the sketch threshold") {
    // sf0.001 cardinalities (~hundreds) are far below the 4096-entry
    // nominal sketch size — estimates must equal exact COUNT(DISTINCT)
    val est = Sketches.thetaDistinct(orders, "o_orderstatus", "o_custkey")
      .as[(String, Double)].collect().toMap
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").cast("double").as("n"))
      .as[(String, Double)].collect().toMap
    assert(est == exact, s"est=$est exact=$exact")
  }

  test("theta overlap algebra matches exact set operations (exact regime)") {
    val a = orders.filter(col("o_orderstatus") === "F")
    val b = orders.filter(col("o_orderstatus") === "O")
    val r = Sketches.thetaOverlap(a, b, "o_custkey")
      .as[(Double, Double, Double, Double, Double)].head()
    val sa = a.select("o_custkey").distinct().as[Long].collect().toSet
    val sb = b.select("o_custkey").distinct().as[Long].collect().toSet
    assert(r._1 == sa.size.toDouble && r._2 == sb.size.toDouble)
    assert(r._3 == (sa union sb).size.toDouble, s"union ${r._3}")
    assert(r._4 == (sa intersect sb).size.toDouble, s"intersect ${r._4}")
    assert(r._5 == (sa diff sb).size.toDouble, s"a_only ${r._5}")
  }

  test("approx_top_k accumulate/combine/estimate equals the one-shot form") {
    // the mergeable form of q95: per-half sketch states combine into the
    // same heavy-hitter estimate as sketching everything at once — the
    // property that lets per-batch top-k states live in a sketch store
    val ev = graft.model.Tables.events(spark, dir).select("event_id", "event_type")
    ev.filter(col("event_id") % 2 === 0).createOrReplaceTempView("tk_h1")
    ev.filter(col("event_id") % 2 === 1).createOrReplaceTempView("tk_h2")
    ev.createOrReplaceTempView("tk_all")
    val merged = spark.sql(
      """SELECT approx_top_k_estimate(approx_top_k_combine(st, 20), 20) AS tk
         FROM (SELECT approx_top_k_accumulate(event_type, 20) AS st FROM tk_h1
               UNION ALL
               SELECT approx_top_k_accumulate(event_type, 20) FROM tk_h2)""")
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count")).as[(String, Long)].collect().toSet
    val oneShot = spark.sql(
      "SELECT approx_top_k(event_type, 20) AS tk FROM tk_all")
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count")).as[(String, Long)].collect().toSet
    assert(merged == oneShot && oneShot.nonEmpty, s"$merged vs $oneShot")
  }

  test("merging per-batch sketches equals sketching the union (sketch store)") {
    val h1 = orders.filter(col("o_orderkey") % 2 === 0)
    val h2 = orders.filter(col("o_orderkey") % 2 === 1)
    val store = Sketches.batchSketch(h1, "b1", "o_custkey", "o_totalprice")
      .unionByName(Sketches.batchSketch(h2, "b2", "o_custkey", "o_totalprice"))
    val merged = Sketches.mergeThetaSketches(store, "key_sketch")
      .as[Double].head()
    val exact = orders.select("o_custkey").distinct().count().toDouble
    assert(merged == exact, s"merged=$merged exact=$exact")
    // KLL sketches merge the same way (pairwise scalar merge — Spark 4.1
    // exposes no N-way KLL merge aggregate): median from merged halves
    // stays in the rank-error band of the full data's exact median
    val kllMerged = store.filter(col("batch_id") === "b1")
      .select(col("measure_sketch").as("m1"))
      .crossJoin(store.filter(col("batch_id") === "b2")
        .select(col("measure_sketch").as("m2")))
      .select(kll_sketch_get_quantile_double(
        kll_sketch_merge_double(col("m1"), col("m2")), lit(0.5)).as("p50"))
      .as[Double].head()
    val band = orders.select(
      expr("percentile(o_totalprice, array(0.47, 0.53))")).head.getSeq[Double](0)
    assert(kllMerged >= band(0) && kllMerged <= band(1), s"$kllMerged ∉ $band")
  }
}

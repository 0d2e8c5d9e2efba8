package graft.ops

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 35L, 102.0),
    ("B", 15L, 200.0), ("C", 5L, 300.0)
  ).toDF("sym", "t", "px")

  private val quotes = Seq(
    ("A", 8L, 99.5), ("A", 20L, 100.5), ("A", 30L, 101.5),
    ("B", 10L, 199.0), ("B", 16L, 201.0)
  ).toDF("sym", "t", "bid")

  test("as-of join picks most recent right row at-or-before each left time") {
    val got = AsOf.asofJoin(trades, quotes, "sym", "t")
      .select("sym", "t", "px", "bid")
      .as[(String, Long, Double, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got(("A", 10L)) == Some(99.5))   // quote at 8
    assert(got(("A", 20L)) == Some(100.5))  // quote at exactly 20 matches
    assert(got(("A", 35L)) == Some(101.5))  // quote at 30
    assert(got(("B", 15L)) == Some(199.0))  // 16 is in the future
    assert(got(("C", 5L)) == None)          // no quotes for C -> null
  }

  test("a NULL field in the latest right row stays NULL - rows never mix") {
    // the payload forward-fills as one struct: bid=15/ask=NULL at t=2 must
    // yield (15, NULL), never the fabricated (15, 20) a per-column fill
    // would invent from the older row
    val left = Seq(("A", 3L, 1.0)).toDF("sym", "t", "px")
    val right = Seq(
      ("A", 1L, Some(10.0), Some(20.0)),
      ("A", 2L, Some(15.0), Option.empty[Double])
    ).toDF("sym", "t", "bid", "ask")
    val got = AsOf.asofJoin(left, right, "sym", "t")
      .select("bid", "ask").as[(Option[Double], Option[Double])].head()
    assert(got == (Some(15.0), None), got)
  }

  test("as-of join keeps exactly the left rows") {
    val got = AsOf.asofJoin(trades, quotes, "sym", "t")
    assert(got.count() == trades.count())
    assert(got.columns.toSet == Set("sym", "t", "px", "bid"))
  }

  test("asofJoin equals the naive max-time-at-or-before join (seeded random)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val left = Seq.fill(40)((s"k${rnd.nextInt(4)}", rnd.nextInt(100).toLong,
        rnd.nextDouble())).distinctBy(r => (r._1, r._2)).toDF("k", "t", "lv")
      val right = Seq.fill(25)((s"k${rnd.nextInt(4)}", rnd.nextInt(100).toLong,
        rnd.nextDouble())).distinctBy(r => (r._1, r._2)).toDF("k", "t", "rv")
      val got = AsOf.asofJoin(left, right, "k", "t")
        .select("k", "t", "rv").as[(String, Long, Option[Double])]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      // naive: for each left row, the right row with max time <= t
      val rightRows = right.as[(String, Long, Double)].collect()
      val leftRows = left.as[(String, Long, Double)].collect()
      leftRows.foreach { case (k, t, _) =>
        val expect = rightRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        assert(got((k, t)) == expect, s"key=$k t=$t")
      }
    }
  }

  test("colliding payload names get the suffix") {
    val right = Seq(("A", 8L, 1.0)).toDF("sym", "t", "px")
    val got = AsOf.asofJoin(trades, right, "sym", "t")
    assert(got.columns.contains("px_asof"))
  }
}

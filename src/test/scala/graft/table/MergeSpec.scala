package graft.table

import graft.SparkSpec

/** Property-style invariants for the MERGE rewrites (SURVEY.md §5.3) using
  * seeded random key-value multisets (no scalatestplus bridge needed).
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randKv(): Seq[(Long, String)] =
    Seq.fill(rnd.nextInt(15))((rnd.nextInt(20).toLong, rnd.alphanumeric.take(4).mkString))
      .distinctBy(_._1)

  test("upsert: result keys = target ∪ source, source wins (20 seeded cases)") {
    for (_ <- 1 to 20) {
      val t = randKv(); val s = randKv()
      val got = Merge.upsert(t.toDF("k", "v"), s.toDF("k", "v"), Seq("k"))
        .as[(Long, String)].collect().toMap
      assert(got == t.toMap ++ s.toMap)
    }
  }

  test("insertOnly: target rows never change (20 seeded cases)") {
    for (_ <- 1 to 20) {
      val t = randKv(); val s = randKv()
      val got = Merge.insertOnly(t.toDF("k", "v"), s.toDF("k", "v"), Seq("k"))
        .as[(Long, String)].collect().toMap
      assert(got == s.toMap ++ t.toMap) // target wins
    }
  }

  test("newRowsOnly complements the matched set (20 seeded cases)") {
    for (_ <- 1 to 20) {
      val t = randKv(); val s = randKv()
      val got = Merge.newRowsOnly(s.toDF("k", "v"), t.toDF("k", "v"), Seq("k"))
        .as[(Long, String)].collect().toMap
      assert(got == s.toMap.view.filterKeys(k => !t.toMap.contains(k)).toMap)
    }
  }

  test("upsert is idempotent: upsert(upsert(t,s),s) == upsert(t,s)") {
    for (_ <- 1 to 10) {
      val t = randKv(); val s = randKv()
      val once = Merge.upsert(t.toDF("k", "v"), s.toDF("k", "v"), Seq("k"))
      val twice = Merge.upsert(once, s.toDF("k", "v"), Seq("k"))
      assert(twice.as[(Long, String)].collect().toMap ==
        once.as[(Long, String)].collect().toMap)
    }
  }

  test("scd2Apply closes current rows and opens new ones") {
    import org.apache.spark.sql.functions._
    val dim = Seq(
      (1L, "alice", "NY", 100L, null.asInstanceOf[java.lang.Long], true),
      (2L, "bob", "LA", 100L, null.asInstanceOf[java.lang.Long], true),
      (1L, "alice", "SF", 50L, java.lang.Long.valueOf(100L), false) // old history
    ).toDF("k", "name", "city", "valid_from", "valid_to", "is_current")
    val changes = Seq((1L, "alice", "TX", 200L)).toDF("k", "name", "city", "eff")
    val out = Merge.scd2Apply(dim, changes, Seq("k"), "eff")
      .orderBy("k", "valid_from").collect()
    assert(out.length == 4)
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.length == 3)
    // old history untouched
    assert(k1(0).getString(2) == "SF" && !k1(0).getBoolean(5))
    // previously-current row closed at eff=200
    assert(k1(1).getString(2) == "NY" && k1(1).getLong(4) == 200L && !k1(1).getBoolean(5))
    // new current row open-ended
    assert(k1(2).getString(2) == "TX" && k1(2).isNullAt(4) && k1(2).getBoolean(5))
    // untouched key passes through
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2(0).getBoolean(5))
  }

  test("snapshotDiff classifies insert/delete/update/unchanged") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val after = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val got = Merge.snapshotDiff(before, after, Seq("k"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "delete", 2L -> "unchanged", 3L -> "update", 4L -> "insert"))
  }

  test("aboveHighWaterMark keeps strictly-newer rows only") {
    val existing = Seq((1L, 10L), (2L, 20L)).toDF("k", "w")
    val incoming = Seq((3L, 20L), (4L, 21L), (5L, 35L)).toDF("k", "w")
    val got = Merge.aboveHighWaterMark(incoming, existing, "w")
      .select("k").as[Long].collect().toSet
    assert(got == Set(4L, 5L))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook DP Levenshtein — an independent oracle for the blocking. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Quadratic reference implementation — ground truth for the blocking. */
  private def bruteForce(df: DataFrame, k: Int): Set[(Long, Long, Int)] = {
    val rows = df.as[(Long, String)].collect()
    (for {
      (id1, s1) <- rows; (id2, s2) <- rows if id1 < id2
      d = lev(s1, s2) if d <= k
    } yield (id1, id2, d)).toSet
  }

  private def result(df: DataFrame, k: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.fuzzySelfJoin(df, "id", "s", k)
      .as[(Long, Long, Int)].collect().toSet

  test("matches brute force on mutated words, k = 1 and k = 2") {
    val vocab = Seq("chocolate", "lavender", "goldenrod", "spring", "lace",
      "midnight", "salmon", "turquoise", "plum", "beige")
    // originals + deterministic single-char deletions/substitutions
    val strs = vocab.zipWithIndex.flatMap { case (w, i) =>
      Seq(w, w.patch(i % w.length, "", 1), w.patch(i % w.length, "x", 1),
        w + "s")
    }
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val got = result(df, k)
      val want = bruteForce(df, k)
      assert(got === want, s"k=$k: missing=${want -- got} extra=${got -- want}")
      assert(want.nonEmpty) // the fixture actually exercises matches
    }
  }

  test("short strings (len <= k) and empty strings are paired exactly") {
    val df = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "xy"), (5L, "abc"),
      (6L, "abcd"), (7L, "b")).toDF("id", "s")
    for (k <- Seq(1, 2, 3)) {
      val got = result(df, k)
      val want = bruteForce(df, k)
      assert(got === want, s"k=$k: missing=${want -- got} extra=${got -- want}")
    }
  }

  test("identical strings under different ids pair at distance 0") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("id", "s")
    assert(result(df, 1).contains((1L, 2L, 0)))
  }

  test("no self pairs and orientation is id1 < id2") {
    val df = Seq((5L, "abc"), (3L, "abd"), (9L, "abc")).toDF("id", "s")
    val got = result(df, 1)
    assert(got.forall { case (a, b, _) => a < b })
    assert(got === bruteForce(df, 1))
  }

  test("plan contains no cartesian/broadcast-nested-loop join") {
    val df = Seq((1L, "abcdef"), (2L, "abcxef")).toDF("id", "s")
    val plan = FuzzyJoin.fuzzySelfJoin(df, "id", "s", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stupid-Backoff n-gram LM: counts and both scoring surfaces are
  * verified against an independent in-JVM recomputation (the quantized
  * surface's cross-engine anchor is the q153 DuckDB oracle); the
  * integer statistic is pinned partitioning-invariant; persistence
  * round-trips and the loader refuses drifted tables pointedly.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference (naive, sequential) ----
  private def words(s: String): Vector[String] =
    s.trim.toLowerCase.split("\\s+").toVector.filter(_.nonEmpty)

  private def refCounts(docs: Seq[(Long, String)], minCount: Long)
      : Map[(Int, String), Long] = {
    val m = scala.collection.mutable.Map[(Int, String), Long]()
    for ((_, t) <- docs; ws = words(t); n <- 1 to 3;
         i <- 0 to ws.length - n)
      m.updateWith((n, ws.slice(i, i + n).mkString(" ")))(
        c => Some(c.getOrElse(0L) + 1))
    m.filter(_._2 >= minCount).toMap
  }

  private def refQuantized(text: String, c: Map[(Int, String), Long],
      total: Long): (Long, Long, Long, Long, Long, Long) = {
    val ws = words(text)
    var (sb, h3, h2, h1, oov) = (0L, 0L, 0L, 0L, 0L)
    def g(n: Int, s: String) = c.get((n, s))
    for (i <- ws.indices) {
      val w3 = ws(i)
      val w2 = if (i >= 1) Some(ws(i - 1)) else None
      val w1 = if (i >= 2) Some(ws(i - 2)) else None
      val (q, lvl): (Long, Int) = (w1, w2) match {
        case (Some(a), Some(b)) =>
          g(3, s"$a $b $w3") match {
            case Some(c3) =>
              ((NgramLm.Q3 * c3) / c((2, s"$a $b")), 3)
            case None => g(2, s"$b $w3") match {
              case Some(c2) => ((NgramLm.Q2 * c2) / c((1, b)), 2)
              case None => g(1, w3) match {
                case Some(c1) => ((NgramLm.Q1 * c1) / total, 1)
                case None => (0L, 0)
              }
            }
          }
        case (None, Some(b)) =>
          g(2, s"$b $w3") match {
            case Some(c2) => ((NgramLm.Q3 * c2) / c((1, b)), 2)
            case None => g(1, w3) match {
              case Some(c1) => ((NgramLm.Q2 * c1) / total, 1)
              case None => (0L, 0)
            }
          }
        case _ => g(1, w3) match {
          case Some(c1) => ((NgramLm.Q3 * c1) / total, 1)
          case None => (0L, 0)
        }
      }
      sb += q
      lvl match {
        case 3 => h3 += 1
        case 2 => h2 += 1
        case 1 => h1 += 1
        case _ => oov += 1
      }
    }
    (ws.length.toLong, sb, h3, h2, h1, oov)
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the hat"),
    (3L, "a dog ran in the park"),
    (4L, "THE  cat   sat on a mat"), // normalization: case + whitespace
    (5L, "singleton"),
    (6L, "   ")) // token-less doc: zeros, not silence

  test("train matches the reference counts, pruning preserves " +
      "containment") {
    val docs = corpus.toDF("doc_id", "text")
    for (minCount <- Seq(1L, 2L)) {
      val got = NgramLm.train(docs, "doc_id", "text", minCount)
        .as[(Int, String, Long)].collect()
        .map { case (n, gr, c) => ((n, gr), c) }.toMap
      assert(got == refCounts(corpus, minCount), s"minCount=$minCount")
      // containment: every kept 2/3-gram's context + suffix unigram kept
      got.keys.filter(_._1 == 3).foreach { case (_, gr) =>
        val p = gr.split(" ")
        assert(got.contains((2, p.take(2).mkString(" "))), gr)
        assert(got.contains((2, p.drop(1).mkString(" "))), gr)
      }
      got.keys.filter(_._1 == 2).foreach { case (_, gr) =>
        gr.split(" ").foreach(w => assert(got.contains((1, w)), gr))
      }
    }
  }

  test("scoreQuantized matches the reference token-for-token, including " +
      "pruned-model backoff and OOV, and keeps token-less docs") {
    val docs = corpus.toDF("doc_id", "text")
    for (minCount <- Seq(1L, 2L)) {
      val cs = refCounts(corpus, minCount)
      val total = cs.collect { case ((1, _), c) => c }.sum
      val model = NgramLm.train(docs, "doc_id", "text", minCount)
      val got = NgramLm
        .scoreQuantized(docs, "doc_id", "text", model)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      val want = corpus.map { case (id, t) =>
        val (n, sb, h3, h2, h1, oov) = refQuantized(t, cs, total)
        (id, n, sb, h3, h2, h1, oov)
      }
      assert(got == want, s"minCount=$minCount")
      // the token-less doc surfaced with zeros
      assert(got.find(_._1 == 6L).get == ((6L, 0L, 0L, 0L, 0L, 0L, 0L)))
    }
  }

  test("the integer statistic is partitioning-invariant") {
    val docs = corpus.toDF("doc_id", "text")
    val model = NgramLm.train(docs, "doc_id", "text")
    def run(parts: Int) =
      NgramLm.scoreQuantized(docs.repartition(parts), "doc_id", "text",
          model.repartition(parts))
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(run(1) == run(7))
  }

  test("score (float) matches an in-JVM reference and ranks in-model " +
      "text above word salad") {
    val docs = corpus.toDF("doc_id", "text")
    val cs = refCounts(corpus, 1L)
    val total = cs.collect { case ((1, _), c) => c }.sum
    val model = NgramLm.train(docs, "doc_id", "text")
    val got = NgramLm.score(docs, "doc_id", "text", model)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "avg_logprob", "ppl")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    def refLog(t: String): Option[Double] = {
      val ws = words(t)
      if (ws.isEmpty) return None
      val floor = 1.0 / (total + 1.0)
      val lps = ws.indices.map { i =>
        val w3 = ws(i)
        def c(n: Int, s: String) = cs.get((n, s)).map(_.toDouble)
        val s: Double =
          if (i >= 2) {
            val (a, b) = (ws(i - 2), ws(i - 1))
            c(3, s"$a $b $w3").map(_ / cs((2, s"$a $b")))
              .orElse(c(2, s"$b $w3").map(0.4 * _ / cs((1, b))))
              .orElse(c(1, w3).map(0.4 * 0.4 * _ / total))
              .getOrElse(0.4 * 0.4 * 0.4 * floor)
          } else if (i == 1) {
            val b = ws(0)
            c(2, s"$b $w3").map(_ / cs((1, b)))
              .orElse(c(1, w3).map(0.4 * _ / total))
              .getOrElse(0.4 * 0.4 * floor)
          } else c(1, w3).map(_ / total).getOrElse(0.4 * floor)
        math.log(s)
      }
      Some(lps.sum / ws.length)
    }
    got.foreach { case (id, n, lp, ppl) =>
      val t = corpus.find(_._1 == id).get._2
      val want = refLog(t)
      assert(n == words(t).length)
      (lp, want) match {
        case (Some(g), Some(w)) =>
          assert(math.abs(g - w) < 1e-12, s"doc $id: $g vs $w")
          assert(math.abs(ppl.get - math.exp(-g)) < 1e-12)
        case (None, None) => // token-less
        case other => fail(s"doc $id: $other")
      }
    }
    // in-model fluency beats shuffled common words beats unseen words
    val probe = Seq((101L, "the cat sat on the mat"),
      (102L, "mat the on cat the sat"),
      (103L, "zyx wvu tsr qpo nml kji")).toDF("doc_id", "text")
    val p = NgramLm.score(probe, "doc_id", "text", model)
      .orderBy("doc_id").select("avg_logprob")
      .as[Double].collect().toSeq
    assert(p(0) > p(1) && p(1) > p(2), p.toString)
  }

  test("updateLm folds a batch into a persisted model ≡ retraining on " +
      "the union; pruned models are refused") {
    val b1 = corpus.take(3)
    val b2 = corpus.drop(3) ++ Seq((8L, "the cat sat again"),
      (9L, "a dog ran on the mat"))
    val path = tmpDir("lm-upd") + "/m"
    val t = NgramLm.saveLm(spark, path,
      NgramLm.train(b1.toDF("doc_id", "text"), "doc_id", "text"),
      minCount = 1L)
    NgramLm.updateLm(t, b2.toDF("doc_id", "text"), "doc_id", "text")
    val folded = NgramLm.loadLm(t)
      .as[(Int, String, Long)].collect().sorted.toSeq
    val union = NgramLm
      .train((b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Int, String, Long)].collect().sorted.toSeq
    assert(folded == union)
    // the grams drift check tracks the fold (loadLm above passed), and
    // scoring through the folded model equals the union-trained model
    val probe = Seq((1L, "the cat sat on a dog")).toDF("doc_id", "text")
    val a = NgramLm.scoreQuantized(probe, "doc_id", "text",
      NgramLm.loadLm(t)).collect().toSeq
    val b = NgramLm.scoreQuantized(probe, "doc_id", "text",
      (b1 ++ b2).toDF("doc_id", "text")
        .transform(d => NgramLm.train(d, "doc_id", "text"))).collect().toSeq
    assert(a == b)
    // every intermediate LM is a table version: v before the fold still
    // scores as the b1-only model (model versioning for free)
    val v0 = t.readVersion(0)
    val c = NgramLm.scoreQuantized(probe, "doc_id", "text", v0)
      .collect().toSeq
    val d = NgramLm.scoreQuantized(probe, "doc_id", "text",
      NgramLm.train(b1.toDF("doc_id", "text"), "doc_id", "text"))
      .collect().toSeq
    assert(c == d)
    // a pruned model refuses the fold pointedly
    val pruned = NgramLm.saveLm(spark, tmpDir("lm-upd") + "/p",
      NgramLm.train(b1.toDF("doc_id", "text"), "doc_id", "text", 2L),
      minCount = 2L)
    val e = intercept[IllegalArgumentException](
      NgramLm.updateLm(pruned, b2.toDF("doc_id", "text"), "doc_id", "text"))
    assert(e.getMessage.contains("minCount=2"))
  }

  test("saveLm/loadLm round-trips; the loader refuses non-LM and " +
      "drifted tables pointedly") {
    val docs = corpus.toDF("doc_id", "text")
    val model = NgramLm.train(docs, "doc_id", "text", 2L)
    val path = tmpDir("lm") + "/m"
    val t = NgramLm.saveLm(spark, path, model, minCount = 2L)
    val loaded = NgramLm.loadLm(t)
    assert(loaded.as[(Int, String, Long)].collect().sorted.toSeq ==
      model.as[(Int, String, Long)].collect().sorted.toSeq)
    // scoring through the loaded model is identical
    val a = NgramLm.scoreQuantized(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect().toSeq
    val b = NgramLm.scoreQuantized(docs, "doc_id", "text", loaded)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // not an LM table
    val plain = new graft.table.ManagedTable(spark, tmpDir("lm") + "/p")
    plain.overwrite(Seq((1, "x", 1L)).toDF("n", "gram", "c"))
    val e1 = intercept[IllegalArgumentException](NgramLm.loadLm(plain))
    assert(e1.getMessage.contains("not a persisted n-gram LM"))
    // drift: a row vanished behind the property's back
    val drifted = new graft.table.ManagedTable(spark, tmpDir("lm") + "/d")
    drifted.overwrite(t.read.limit(3))
    drifted.setProperties(
      Map("graft.lm.grams" -> t.properties("graft.lm.grams")))
    val e2 = intercept[IllegalArgumentException](NgramLm.loadLm(drifted))
    assert(e2.getMessage.contains("expected"))
    // malformed: a negative count
    val bad = new graft.table.ManagedTable(spark, tmpDir("lm") + "/b")
    bad.overwrite(Seq((1, "x", -5L), (2, "x y", 1L)).toDF("n", "gram", "c"))
    bad.setProperties(Map("graft.lm.grams" -> "2"))
    val e3 = intercept[IllegalArgumentException](NgramLm.loadLm(bad))
    assert(e3.getMessage.contains("malformed"))
    // a duplicated (n, gram) row with a compensating loss (row count
    // unchanged) would fan out the scoring joins — refused, not scored
    val dup = new graft.table.ManagedTable(spark, tmpDir("lm") + "/dup")
    dup.overwrite(Seq((1, "a", 2L), (1, "a", 3L), (1, "b", 1L))
      .toDF("n", "gram", "c"))
    dup.setProperties(Map("graft.lm.grams" -> "3"))
    val eDup = intercept[IllegalArgumentException](NgramLm.loadLm(dup))
    assert(eDup.getMessage.contains("duplicated"), eDup.getMessage)
    // containment hole: a kept trigram whose context bigram is gone —
    // scoring denominators rely on the invariant, so the loader refuses
    val holed = new graft.table.ManagedTable(spark, tmpDir("lm") + "/h")
    holed.overwrite(Seq((1, "a", 5L), (1, "b", 5L), (3, "a a b", 2L))
      .toDF("n", "gram", "c"))
    holed.setProperties(Map("graft.lm.grams" -> "3"))
    val e4 = intercept[IllegalArgumentException](NgramLm.loadLm(holed))
    assert(e4.getMessage.contains("context"), e4.getMessage)
  }
}

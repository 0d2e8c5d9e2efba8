package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashed-bag-of-words linear quality classifier: the fixed-weight scorer
  * is verified against an independent JVM recomputation (its cross-engine
  * anchor is the q145 DuckDB oracle); training is gated on the three
  * things that matter — the loss decreases, the model beats the majority
  * baseline on a separable corpus, and the DECIMAL-summed updates make
  * the trained weights bit-identical under any repartitioning.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def md5Bucket(token: String, buckets: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % buckets
  }
  private def fixedW(b: Long): Long = (b * 2654435761L) % 1001L - 500L

  test("scoreFixed matches an independent JVM recomputation, with " +
      "multiplicity, and drops token-less docs") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "Gamma  DELTA"),
      (3L, "   "), // token-less: no output row (SQL unnest semantics)
      (4L, "epsilon")).toDF("doc_id", "text")
    val got = QualityClassifier.scoreFixed(docs, "doc_id", "text", 4096)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    def logit(ts: Seq[String]) = ts.map(t => fixedW(md5Bucket(t, 4096))).sum
    val want = Seq(
      (1L, 3L, logit(Seq("alpha", "beta", "alpha"))),
      (2L, 2L, logit(Seq("gamma", "delta"))),
      (4L, 1L, logit(Seq("epsilon"))))
      .map { case (id, n, l) => (id, n, l, l > 0) }
    assert(got == want)
  }

  private lazy val separable = {
    val r = new scala.util.Random(7)
    val goodWords = Seq("insight", "rigor", "clarity", "method", "proof")
    val badWords = Seq("spam", "click", "winner", "casino", "pills")
    val rows = (0 until 120).map { i =>
      val pos = i % 2 == 0
      val vocab = if (pos) goodWords else badWords
      val text = Seq.fill(12)(vocab(r.nextInt(vocab.size))).mkString(" ")
      (i.toLong, text, if (pos) 1 else 0)
    }
    rows.toDF("doc_id", "text", "y")
  }

  test("train: loss decreases, the model separates a separable corpus, " +
      "and beats the majority baseline") {
    val m = QualityClassifier.train(separable, "doc_id", "text", "y",
      buckets = 256, epochs = 6, lr = 1.0)
    assert(m.losses.size == 6)
    assert(m.losses.last < m.losses.head * 0.5,
      s"loss should drop sharply on separable data: ${m.losses}")
    val scored = QualityClassifier.scoreModel(separable, "doc_id", "text", m)
      .join(separable.select("doc_id", "y"), "doc_id")
    val acc = scored.filter((col("p") >= 0.5) === (col("y") === 1))
      .count().toDouble / scored.count()
    assert(acc > 0.95, s"separable corpus should classify cleanly: $acc")
  }

  test("token-less docs stay in the full batch: nDocs, the loss, and the " +
      "bias gradient all see them (their gradient is bias-only)") {
    // one-epoch corpus where the JVM recompute is trivial: all weights
    // start 0, so every doc's p = σ(0) = 0.5 — including the EMPTY doc
    val docs = Seq(
      (1L, "alpha beta", 1),
      (2L, "spam spam", 0),
      (3L, "", 1) // token-less: no feature rows, bias-only gradient
    ).toDF("doc_id", "text", "y")
    val m = QualityClassifier.train(docs, "doc_id", "text", "y",
      buckets = 64, epochs = 1, lr = 1.0)
    // nDocs = 3 (not 2): bias update = −lr · Σ(p−y)/3 with the empty doc's
    // r = 0.5 − 1 included → Σr = (0.5−1)+(0.5−0)+(0.5−1) = −0.5
    assert(math.abs(m.bias - (-1.0 * (-0.5) / 3.0)) < 1e-12,
      s"bias must average the empty doc's residual over nDocs=3: ${m.bias}")
    // loss = 3·(−log 0.5)/3, averaged over ALL THREE docs
    assert(math.abs(m.losses.head - (-math.log(0.5))) < 1e-12,
      s"epoch-1 loss must include the empty doc: ${m.losses}")
    // and the model still trains identically when the empty doc is
    // repartitioned elsewhere (full-batch = partitioning-invariant)
    val m2 = QualityClassifier.train(docs.repartition(5), "doc_id", "text",
      "y", buckets = 64, epochs = 1, lr = 1.0)
    assert(m.bias == m2.bias && m.weights.toSeq == m2.weights.toSeq)
  }

  test("trainScoreAnchor's integer statistic IS the one-epoch model: " +
      "s2 = -(2n/lr)·logit₁ and the keep decisions coincide") {
    val docs = Seq(
      (1L, "good clean prose sentence with words", 1),
      (2L, "good clean text again with prose", 1),
      (3L, "zz xx qq junk junk zz", 0),
      (4L, "xx qq zz garbage tokens here", 0),
      (5L, "good prose zz xx mixed bag", 1),
      (6L, "   ", 0), // token-less: absent from both scored outputs
      (7L, "entirely novel vocabulary elsewhere", 0)
    ).toDF("doc_id", "text", "y")
    val buckets = 256
    val lr = 0.5
    val m = QualityClassifier.train(docs, "doc_id", "text", "y",
      buckets, epochs = 1, lr = lr)
    val real = QualityClassifier.scoreModel(docs, "doc_id", "text", m)
      .select("doc_id", "logit", "keep")
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    val anchor = QualityClassifier.trainScoreAnchor(docs, "doc_id", "text",
        "y", buckets)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(anchor.keySet == real.keySet &&
      !anchor.keySet.contains(6L), s"doc sets differ: $anchor vs $real")
    val n = 7L // nDocs counts the token-less doc too
    for ((id, (s2, keep)) <- anchor) {
      val want = -lr / (2.0 * n) * s2
      val (logit, keepReal) = real(id)
      assert(math.abs(logit - want) <= 1e-12 * math.max(1.0, math.abs(want)),
        s"doc $id: logit $logit != -(lr/2n)·s2 = $want (s2=$s2)")
      assert(keep == keepReal, s"doc $id: keep $keep vs trained $keepReal")
    }
  }

  test("the trained model is bit-identical under repartitioning " +
      "(DECIMAL-summed gradients)") {
    val a = QualityClassifier.train(separable, "doc_id", "text", "y",
      buckets = 128, epochs = 3, lr = 0.5)
    val b = QualityClassifier.train(separable.repartition(7), "doc_id",
      "text", "y", buckets = 128, epochs = 3, lr = 0.5)
    assert(a.bias == b.bias)
    assert(a.weights.toSeq == b.weights.toSeq,
      "partitioning must not change the model")
    assert(a.losses == b.losses)
  }

  test("contaminationBloom is exactly contamination (no false negatives; " +
      "the exact join verifies bloom survivors)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text about spark engines and data"),
      (4L, "benchmark sentence held out for the screen test"),
      (5L, "the screen test should find benchmark sentence held here"))
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") >= 4L)
    val exact = Dedup.contamination(docs, bench, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    val bloom = Dedup.contaminationBloom(docs, bench, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(bloom == exact)
    assert(exact(4L) == 1.0 && exact(3L) == 0.0)
    // the over-the-literal-gate venue (bloom ships as a TorrentBroadcast
    // probed by a UDF, not a plan literal): same exact answer
    val broadcastVenue = Dedup.contaminationBloom(docs, bench, "doc_id",
        "text", maxLiteralBytes = 0L)
      .as[(Long, Double)].collect().toMap
    assert(broadcastVenue == exact,
      "the broadcast probe venue must equal the literal venue exactly")
  }
}

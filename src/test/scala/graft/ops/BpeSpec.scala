package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained BPE tokenizer: the learned merge list is checked against an
  * independent in-test reference implementation (Sennrich et al. 2016,
  * Algorithm 1), the driver and distributed training venues must agree
  * bit-exactly, the model is invariant to input partitioning, and
  * encoding round-trips (concatenating a word's tokens reconstructs the
  * word + marker).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference BPE (no sharing with the production code
    * beyond the tie-break convention: count desc, then pair asc).
    */
  private def referenceTrain(vocab: Map[String, Long], numMerges: Int,
                             minCount: Long): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] = vocab.map { case (w, c) =>
      (w.map(_.toString).toVector :+ "</w>", c) }
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done && out.size < numMerges) {
      val pairs = words.toSeq.flatMap { case (s, c) =>
        s.sliding(2).filter(_.size == 2).map(p => ((p(0), p(1)), c)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }
      pairs.headOption.filter(_._2 >= minCount) match {
        case Some(((a, b), _)) =>
          out += ((a, b))
          words = words.map { case (s, c) =>
            val r = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                r += a + b; i += 2
              } else { r += s(i); i += 1 }
            }
            (r.toVector, c)
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        case None => done = true
      }
    }
    out.toSeq
  }

  // the paper's running example: low/lower/newest/widest
  private lazy val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")).toDF("doc_id", "text")
  private val paperVocab = Map[String, Long](
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("train matches the independent reference on the paper example, " +
      "both venues, invariant to partitioning") {
    val want = referenceTrain(paperVocab, numMerges = 10, minCount = 2)
    assert(want.take(4) == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o")), s"paper example sanity: $want")
    val driver = Bpe.train(corpus, "text", numMerges = 10)
    val distributed = Bpe.train(corpus, "text", numMerges = 10,
      maxDriverVocab = 0L)
    val resharded = Bpe.train(corpus.repartition(7), "text", numMerges = 10,
      maxDriverVocab = 0L)
    assert(driver == want, s"driver venue: $driver vs $want")
    assert(distributed == want, s"distributed venue: $distributed vs $want")
    assert(resharded == want, "model must not depend on partitioning")
  }

  test("incremental-stats trainDriver equals the naive full-recount loop " +
      "and the reference on randomized corpora (the 30k-merge scale path " +
      "must not change the model)") {
    val r = new scala.util.Random(1234)
    for (trial <- 1 to 8) {
      val letters = "abcde"
      val vocab = (1 to 30 + r.nextInt(40)).map { _ =>
        val w = (1 to 1 + r.nextInt(7))
          .map(_ => letters(r.nextInt(letters.length))).mkString
        w -> (1L + r.nextInt(9))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val n = 5 + r.nextInt(25)
      val inc = Bpe.trainDriver(vocab.toSeq, n, minCount = 2L)
      val naive = Bpe.trainDriverNaive(vocab.toSeq, n, minCount = 2L)
      val ref = referenceTrain(vocab, n, minCount = 2L)
      assert(inc == naive, s"trial $trial: incremental vs naive differ:\n" +
        s"$inc\n$naive\nvocab=$vocab")
      assert(inc == ref, s"trial $trial: incremental vs reference differ")
      // the BATCHED distributed venue must replay the same sequential
      // model exactly (selectMergeBatch's proof, exercised on shared-
      // letter corpora where batches must stop early and often)
      if (trial <= 3) {
        val docs = vocab.toSeq.flatMap { case (w, c) =>
          Seq.fill(c.toInt)(w) }.zipWithIndex
          .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
        val dist = Bpe.train(docs, "text", n, maxDriverVocab = 0L)
        assert(dist == ref,
          s"trial $trial: batched distributed vs reference differ:\n" +
            s"$dist\n$ref\nvocab=$vocab")
      }
    }
  }

  test("batched distributed venue equals the sequential reference on " +
      "collision-PRONE corpora (tiny alphabet, run-heavy words — merged " +
      "symbols routinely alias existing ones, the condition-3 regime)") {
    val r = new scala.util.Random(77)
    for (trial <- 1 to 4) {
      val letters = "ab"
      // run-length-biased words: "aaab", "abbb", "aaaa" … so early merges
      // create 'aa'/'bb'/'aab' and later candidate concats collide with
      // existing symbols constantly
      val vocab = (1 to 20 + r.nextInt(20)).map { _ =>
        val w = (1 to 2 + r.nextInt(3)).map { _ =>
          letters(r.nextInt(2)).toString * (1 + r.nextInt(3))
        }.mkString
        w -> (1L + r.nextInt(9))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val n = 8 + r.nextInt(12)
      val ref = referenceTrain(vocab, n, minCount = 2L)
      val docs = vocab.toSeq.flatMap { case (w, c) =>
        Seq.fill(c.toInt)(w) }.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val dist = Bpe.train(docs, "text", n, maxDriverVocab = 0L)
      assert(dist == ref,
        s"trial $trial: batched distributed vs reference differ on " +
          s"collision-prone corpus:\n$dist\n$ref\nvocab=$vocab")
    }
  }

  test("selectMergeBatch admits only provably non-interacting, dominant " +
      "candidates, and never skips") {
    // shared symbol stops the batch (second candidate uses 'h')
    assert(Bpe.selectMergeBatch(
      Seq(("t", "h", 10L), ("h", "e", 9L), ("x", "y", 8L)),
      Map.empty, Map.empty) == Seq(("t", "h")))
    // equal count to an interacting pair stops it (strict dominance):
    // maxSecond("a")=9 bounds what applying (a,b) can create/change, and
    // the 9-count candidate cannot be proven to stay the argmax
    assert(Bpe.selectMergeBatch(
      Seq(("a", "b", 10L), ("c", "d", 9L)),
      Map.empty, Map("a" -> 9L)) == Seq(("a", "b")))
    // disjoint + strictly dominant candidates batch together, in order
    assert(Bpe.selectMergeBatch(
      Seq(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 8L)),
      Map("b" -> 3L, "d" -> 2L), Map("a" -> 4L, "c" -> 2L)) ==
      Seq(("a", "b"), ("c", "d"), ("e", "f")))
    // rejection STOPS the batch — later disjoint candidates are NOT
    // taken past it (they might not be the sequential next-argmax)
    assert(Bpe.selectMergeBatch(
      Seq(("a", "b", 10L), ("a", "c", 9L), ("x", "y", 8L)),
      Map.empty, Map.empty) == Seq(("a", "b")))
    // condition 3: a member whose concatenation is an EXISTING pair-table
    // symbol is accepted (it is itself exact) but stops the batch — its
    // creations add to pre-existing counts that conditions 1–2 never
    // bounded (ADVICE r12: 'abc' via ('a','bc') vs member ('ab','c'))
    assert(Bpe.selectMergeBatch(
      Seq(("ab", "c", 10L), ("x", "y", 9L)),
      Map.empty, Map.empty, existingSyms = Set("abc")) == Seq(("ab", "c")))
    // ... even when the collision is on a LATER member, the prefix up to
    // and including it survives
    assert(Bpe.selectMergeBatch(
      Seq(("x", "y", 10L), ("ab", "c", 9L), ("p", "q", 8L)),
      Map.empty, Map.empty, existingSyms = Set("abc")) ==
      Seq(("x", "y"), ("ab", "c")))
    // condition 3b: two members sharing a concatenation ('ab'+'c' and
    // 'a'+'bc' both create 'abc') — each contribution is ≤ bound but the
    // SUM is not; the second same-concat member stops the batch
    assert(Bpe.selectMergeBatch(
      Seq(("ab", "c", 10L), ("a", "bc", 9L), ("p", "q", 8L)),
      Map.empty, Map.empty) == Seq(("ab", "c"), ("a", "bc")))
  }

  test("encode round-trips, respects merge ranks, and keeps word order; " +
      "token-less docs get an empty array") {
    val merges = Bpe.train(corpus, "text", numMerges = 10)
    val rank = merges.zipWithIndex.toMap
    // per-word apply agrees with sequential reference merging
    for (w <- paperVocab.keys) {
      val toks = Bpe.encodeWord(w, rank)
      assert(toks.mkString == w + "</w>", s"round-trip of $w: $toks")
    }
    assert(Bpe.encodeWord("newest", rank) == Seq("newest</w>"),
      "the most frequent word should merge to a single token")
    val docs = Seq((1L, "newest low"), (2L, "   "), (3L, "unseen"))
      .toDF("doc_id", "text")
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got(0)._2.mkString == "newest</w>" + "low</w>",
      s"document order preserved: ${got(0)._2}")
    assert(got(0)._2.head == "newest</w>")
    assert(got(1)._2.isEmpty, "whitespace-only doc: empty tokens")
    assert(got(2)._2.mkString == "unseen</w>",
      "OOV word still round-trips through partial merges")
  }
}

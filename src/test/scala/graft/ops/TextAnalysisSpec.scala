package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the profile with most stopword hits") {
    val docs = Seq(
      (1L, "the cat and the dog of a house in the garden"),
      (2L, "der hund und die katze ist von hier"),
      (3L, "el perro y la casa de los gatos"),
      (4L, "le chien et les chats des maisons est grand"),
      (5L, "的 是 在 了 和 天")
    ).toDF("id", "text")
    val got = docs.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "zh"))
  }

  test("langId ties break to the FIRST listed profile; null and empty " +
      "text keep the when-chain semantics") {
    // the argmax is one array_max over (score, -index, label) structs;
    // these cases pin the exact semantics of the when-chain it replaced
    val docs = Seq(
      (1L, "the der"),          // en=1, de=1 tie → first listed (en)
      (2L, "und die le les"),   // de=2, fr=2 tie → de (listed before fr)
      (3L, ""),                 // zero everywhere → en (first of the 0-tie)
      (4L, null.asInstanceOf[String]) // null text → null lang
    ).toDF("id", "text")
    val got = docs.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("en"), 2L -> Some("de"),
      3L -> Some("en"), 4L -> None))
  }

  test("quality metrics on a known sentence") {
    val df = Seq((1L, "  aa bb  aa cc!  ")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityMetrics(df, "text").collect()(0)
    assert(r.getAs[Long]("token_count") == 4L)      // aa bb aa cc!
    assert(r.getAs[Double]("unique_ratio") == 0.75) // aa bb cc!
    assert(r.getAs[Long]("punct_count") == 1L)
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq(Tuple1("a  B\tc"), Tuple1("A B C")).toDF("text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("rolling fingerprint: whitespace/case-insensitive, matches manual hash") {
    val df = Seq(Tuple1("a  B\tc"), Tuple1("A B C"), Tuple1("abc")).toDF("text")
    val fps = df.select(TextAnalysis.rollingFingerprint(col("text"))).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    // manual Rabin-Karp over "a b c"
    val expect = "a b c".getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    assert(fps(0) == expect)
  }

  test("token estimate splits punctuation like a word-piece tokenizer") {
    val df = Seq(Tuple1("hello, world! it's 42")).toDF("text")
    val n = df.select(TextAnalysis.tokenEstimate(col("text"))).as[Long].head()
    // hello , world ! it ' s 42
    assert(n == 8L, s"got $n")
  }

  test("scrubPii redacts emails, phones and urls, leaves clean text alone") {
    val out = Seq(
      "contact bob.smith+x@corp.example.org today",
      "call +1 (415) 555-0192 now",
      "see https://example.com/a?b=1 for details",
      "nothing sensitive here").toDF("text")
      .select(TextAnalysis.scrubPii(col("text")).as("t"))
      .as[String].collect().toSeq
    assert(out(0) == "contact <EMAIL> today")
    assert(out(1) == "call <PHONE> now")
    assert(out(2) == "see <URL> for details")
    assert(out(3) == "nothing sensitive here")
  }

  test("repetition metrics: duplicate bigrams and top-word share") {
    val m = TextAnalysis.repetitionMetrics(
      Seq((1L, "spam spam spam spam"),      // bigrams: 3x "spam spam" -> 2/3 dup
          (2L, "all words are different here"),
          (3L, "one")                        // no bigrams
      ).toDF("id", "text"), "text")
      .select("id", "dup_bigram_frac", "top_word_share")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(math.abs(m(0)._2 - 2.0 / 3.0) < 1e-12 && m(0)._3 == 1.0)
    assert(m(1)._2 == 0.0 && math.abs(m(1)._3 - 0.2) < 1e-12)
    assert(m(2)._2 == 0.0 && m(2)._3 == 1.0)
  }

  test("trigram fluency: hand-computed mean corpus frequency, short docs excluded") {
    val docs = Seq((1L, "AAAA"), (2L, "abab"), (3L, "ab")).toDF("doc_id", "text")
    val model = TextAnalysis.trigramModel(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    // lowercased: doc1 -> aaa,aaa; doc2 -> aba,bab; doc3 -> none
    assert(model == Map("aaa" -> 2L, "aba" -> 1L, "bab" -> 1L))
    val scores = TextAnalysis.fluencyScore(docs, "doc_id", "text",
        TextAnalysis.trigramModel(docs, "doc_id", "text"))
      .select("doc_id", "n_trigrams", "fluency")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(scores.toSeq == Seq((1L, 2L, 2.0), (2L, 2L, 1.0)))
    // the checkpointed self-score form is result-identical
    val self = TextAnalysis.fluencySelfScore(docs, "doc_id", "text")
      .select("doc_id", "n_trigrams", "fluency")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(self.toSeq == scores.toSeq)
  }

  test("fluency vs an external model: all-unknown docs score 0, not vanish") {
    // the gibberish doc the filter exists to catch must SURFACE with a low
    // score — an inner join would silently drop it from the output
    val docs = Seq((1L, "abab"), (2L, "zqxj")).toDF("doc_id", "text")
    val model = TextAnalysis.trigramModel(
      Seq((10L, "abab")).toDF("doc_id", "text"), "doc_id", "text")
    val scores = TextAnalysis.fluencyScore(docs, "doc_id", "text", model)
      .select("doc_id", "n_trigrams", "fluency")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(scores.toSeq == Seq((1L, 2L, 1.0), (2L, 2L, 0.0)))
  }

  test("gopher rules: each rule trips on its designed pathology") {
    // 55 words, mean word length 175/55 ≈ 3.18, six stopword kinds
    val good = ("the fox and the dog have fun with all of that " * 5).trim
    val docs = Seq(
      (1L, good),
      (2L, "too short to have fifty words"),          // word-count
      (3L, ("a b c d " * 15).trim + " " + good),      // mean word len < 3
      (4L, good + " " + ("#### " * 20).trim),         // symbol ratio
      (5L, (1 to 10).map(i => s"- bullet $i").mkString("\n")), // bullets
      (6L, (1 to 10).map(i => s"line $i...").mkString("\n")),  // ellipses
      (7L, good.split(" ").map(w => w + " 123456").mkString(" ")), // alpha
      (8L, "zig zag quux corge waldo fred plugh " * 10),         // stopwords
      (9L, good + " " + ("... " * 20).trim) // ASCII ellipses count as symbols
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "text")
      .select("doc_id", "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stopwords",
        "gopher_pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean,
           Boolean, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    assert(r(1L)._9, "the clean doc must pass every rule")
    assert(!r(2L)._2 && !r(2L)._9) // too few words
    assert(!r(3L)._3)              // mean word length below 3
    assert(!r(4L)._4)              // symbol-to-word ratio above 0.1
    assert(!r(5L)._5)              // all lines bulleted
    assert(!r(6L)._6)              // all lines ellipsis-terminated
    assert(!r(7L)._7)              // under 80% alphabetic words
    assert(!r(8L)._8 && !r(8L)._9) // no stopword hits
    assert(!r(9L)._4)              // "..." counts as a symbol (Rae §A1.1.2)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance resampling: weight semantics, distribution shift,
  * deterministic Gumbel-top-k.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 512

  test("identical target and raw corpora weigh every document exactly 0") {
    val docs = Seq((1L, "the cat sat"), (2L, "a dog ran fast"),
      (3L, "rain in spain")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(docs, "doc_id", "text", docs, "text", B)
      .select(col("doc_id"), col("log_w").cast("double"))
      .as[(Long, Double)].collect().toMap
    // p == q bucket-for-bucket, so every smoothed log-ratio is 0 exactly
    assert(w.size == 3 && w.values.forall(_ == 0.0))
  }

  test("documents matching the target's n-gram distribution outweigh " +
      "mismatched ones; the weight sum is order-exact (DECIMAL)") {
    val target = (0 until 20).map(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val raw = (
      (100 until 110).map(i => (i.toLong, "alpha beta gamma delta")) ++
      (200 until 210).map(i => (i.toLong, "zig zag quux corge waldo"))
    ).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, "doc_id", "text", target, "text", B)
      .select(col("doc_id"), col("log_w").cast("double"))
      .as[(Long, Double)].collect().toMap
    val likeTarget = (100L until 110L).map(w)
    val unlike = (200L until 210L).map(w)
    assert(likeTarget.min > unlike.max)
    // repartitioned input produces bit-identical weights (decimal sums)
    val w2 = Dsir.importanceWeights(raw.repartition(7), "doc_id", "text",
        target, "text", B)
      .select(col("doc_id"), col("log_w").cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(w2 == w)
  }

  test("empty and NULL documents weigh 0 and survive into the weight table") {
    val target = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val raw = Seq((10L, Some("alpha beta")), (11L, Some("   ")),
        (12L, Some("")), (13L, None: Option[String]))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, "doc_id", "text", target, "text", B)
      .select(col("doc_id"), col("log_w").cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(w.keySet == Set(10L, 11L, 12L, 13L))
    assert(w(11L) == 0.0 && w(12L) == 0.0 && w(13L) == 0.0)
  }

  test("resample is deterministic, returns k rows, and under extreme " +
      "weight separation selects the target-like population") {
    val target = (0 until 30).map(i => (i.toLong, "alpha beta gamma delta " * 5))
      .toDF("doc_id", "text")
    val raw = (
      (100 until 120).map(i => (i.toLong, "alpha beta gamma delta " * 5)) ++
      (200 until 280).map(i => (i.toLong, s"noise${i} junk${i * 7} filler"))
    ).toDF("doc_id", "text")
    val sel1 = Dsir.select(raw, "doc_id", "text", target, "text",
      k = 20, buckets = B)
    val sel2 = Dsir.select(raw, "doc_id", "text", target, "text",
      k = 20, buckets = B)
    val ids1 = sel1.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = sel2.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2 && ids1.size == 20)
    // weights differ by hundreds of nats here: Gumbel noise (stddev ~1.3)
    // cannot overcome the gap, so the selection is the target-like block
    assert(ids1.forall(id => id >= 100L && id < 120L))
  }

  test("shuffle-join ratio path (buckets above the broadcast bound) " +
      "produces bit-identical weights to the broadcast path") {
    val target = (0 until 20).map(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val raw = (
      (100 until 110).map(i => (i.toLong, "alpha beta gamma delta")) ++
      (200 until 210).map(i => (i.toLong, "zig zag quux corge waldo"))
    ).toDF("doc_id", "text")
    def weights(broadcastBuckets: Long) =
      Dsir.importanceWeights(raw, "doc_id", "text", target, "text", B,
          broadcastBuckets = broadcastBuckets)
        .select(col("doc_id"), col("log_w").cast("double"))
        .as[(Long, Double)].collect().toMap
    // bound below B forces the shuffle join; the default broadcasts
    assert(weights(broadcastBuckets = 1L) == weights(broadcastBuckets =
      4L * 1000 * 1000))
  }

  test("noise=false is plain top-k by weight with id tiebreak") {
    // target must repeat the pattern enough for the smoothed log-ratio of
    // its n-grams to go positive (a 1-doc target is dominated by +1
    // smoothing and can rank a short junk doc above a matching one)
    val target = (0 until 20).map(i => (i.toLong, "alpha beta"))
      .toDF("doc_id", "text")
    val raw = Seq((10L, "alpha beta"), (11L, "alpha beta"), (12L, "other"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, "doc_id", "text", target, "text", B)
    val sel = Dsir.resample(w, "doc_id", k = 2, noise = false)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(sel == Seq(10L, 11L))
  }
}

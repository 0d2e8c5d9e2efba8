package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Hashed-bag-of-words linear quality classifier — the fastText-shaped
  * filter the big web-corpus pipelines run after the rule batteries
  * (CCNet/LLaMA-style "looks like reference text" scoring; the reference's
  * quality gates are rule-based, this is the learned sibling alongside
  * [[Dsir]]'s importance sampling).
  *
  * Design for 100 TB:
  *  - features are HASHED buckets (`buckets`-bounded): no vocabulary
  *    build, no driver-side dictionary — the model is one double array.
  *  - scoring is explode → broadcast-joined weights → per-doc sum: one
  *    doc-keyed shuffle, the weight table ships once.
  *  - training is full-batch gradient descent where each epoch is TWO
  *    bucket/doc-keyed aggregates over a persisted feature table — the
  *    driver holds O(buckets) state, never rows; epochs are constant
  *    count, so the whole train is O(epochs) passes over (doc, bucket)
  *    pairs.
  *  - every aggregate that feeds the weights is summed in DECIMAL, so the
  *    trained model is bit-identical under any partitioning (the same
  *    partitioning-invariance discipline as [[Dsir]]'s weights) — re-run,
  *    re-shard, same model.
  *
  * The md5-derived bucket keeps the FIXED-weight scorer cross-engine
  * exact (the DuckDB oracle computes the identical bucket and integer
  * weight), anchoring the scoring plan bit-exactly; training quality is
  * spec-gated (loss decreases, beats the majority baseline, invariant to
  * repartitioning).
  */
object QualityClassifier {

  /** Feature bucket of a token: first 8 hex chars of md5 mod `buckets` —
    * reproducible in any engine with md5 (the [[Sampling.weightedSampleMd5]]
    * anchor idiom). 8 hex chars < 2^32, so the conv result fits a long
    * exactly.
    */
  def tokenBucket(token: Column, buckets: Int): Column =
    pmod(conv(substring(md5(token), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Deterministic integer weight in [-500, 500] for a bucket — the fixed
    * model of the oracle-anchored scorer: w(b) = (b·2654435761) mod 1001 −
    * 500 (Knuth's multiplicative constant; products stay ≪ 2^63 for any
    * realistic bucket count, no ANSI overflow).
    */
  def fixedWeight(bucket: Column): Column =
    (bucket * lit(2654435761L)) % lit(1001L) - lit(500L)

  /** Score every doc under the FIXED integer model: logit = Σ_tokens
    * w(bucket(token)) with multiplicity — integer sums, bit-exact in any
    * engine and under any partitioning. Token-less docs (empty/whitespace
    * text) have no rows, matching SQL `unnest` semantics.
    */
  def scoreFixed(docs: DataFrame, idCol: String, textCol: String,
                 buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.words(col(textCol))).as("t"))
      .select(col("doc_id"), fixedWeight(tokenBucket(col("t"), buckets)).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("logit"))
      .select(col("doc_id"), col("n_tokens"), col("logit"),
        (col("logit") > 0).as("keep"))

  /** The persisted feature table a training run iterates over:
    * (doc_id, y, b, cnt) — one row per (doc, bucket) with multiplicity.
    */
  private def features(docs: DataFrame, idCol: String, textCol: String,
                       labelCol: String, buckets: Int): DataFrame =
    Spread.toCores(docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("double").as("y"), col(textCol)))
      .select(col("doc_id"), col("y"),
        explode(TextAnalysis.words(col(textCol))).as("t"))
      .select(col("doc_id"), col("y"),
        tokenBucket(col("t"), buckets).as("b"))
      .groupBy("doc_id", "y", "b").agg(count(lit(1)).as("cnt"))

  /** Trained model: per-bucket weights + bias, with the per-epoch log
    * loss trace (specs assert it decreases).
    */
  final case class Model(weights: Array[Double], bias: Double,
                         losses: Seq[Double]) {
    /** logit column for a (b, cnt)-shaped feature frame via a broadcast
      * weight table — used by [[QualityClassifier.scoreModel]].
      */
    private[ops] def weightRows: Seq[(Long, Double)] =
      weights.zipWithIndex.map { case (w, b) => (b.toLong, w) }.toSeq
  }

  /** Full-batch logistic regression on hashed token counts. Each epoch:
    * one doc-keyed aggregate for the logits (features ⋈ broadcast
    * weights), one bucket-keyed aggregate for the gradient — both summed
    * in DECIMAL(38,15) so the update, and therefore the MODEL, is
    * bit-identical under any input partitioning. Driver state: the
    * O(buckets) weight array and one O(buckets) collect per epoch.
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: String, buckets: Int, epochs: Int = 5,
            lr: Double = 0.5): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    // persist the feature table PARTITIONED BY doc_id: every epoch runs a
    // doc-keyed aggregate (the logits) and a doc-keyed join (the
    // gradients) over it, and the build groupBy's (doc_id, y, b) hash
    // partitioning satisfies neither — each epoch re-shuffled the whole
    // table twice. One grouped-size exchange at build buys
    // exchange-free epochs (2 × epochs fewer feature-table shuffles; the
    // DECIMAL sums make the model bit-identical under any partitioning,
    // QualityClassifierSpec's invariance pin).
    val feats = features(docs, idCol, textCol, labelCol, buckets)
      .repartition(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // FULL-batch semantics anchors on the DOC table, not the feature
    // table: a token-less doc (empty/whitespace text) has no feature rows
    // but still counts in nDocs and still contributes its bias-only
    // gradient r = σ(bias) − y and its loss term — exactly what
    // full-batch logistic regression over the corpus means. (Its
    // per-bucket gradient contribution is genuinely zero: cnt = 0.)
    // distinct: duplicate (doc_id, y) rows collapse exactly like the
    // feature table's groupBy collapses their tokens, so nDocs and the
    // per-doc residuals keep the pre-existing one-row-per-doc semantics
    // (conflicting labels for one doc_id remain the caller's bug)
    val docLabels = docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("double").as("y")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = math.max(1L, docLabels.count())
    val w = new Array[Double](buckets)
    var bias = 0.0
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    val dec = "decimal(38,15)"
    for (_ <- 1 to epochs) {
      val wDf = broadcast(w.zipWithIndex
        .map { case (x, b) => (b.toLong, x) }.toSeq.toDF("b", "wb"))
      // per-doc logit: products quantized to DECIMAL before the sum so
      // the value never depends on partial-aggregation order; token-less
      // docs enter through the left join with dotw = 0
      val dots = feats.join(wDf, Seq("b"), "left")
        .groupBy("doc_id")
        .agg(sum((col("cnt") * coalesce(col("wb"), lit(0.0)))
          .cast(dec)).as("dotw"))
      val scored = docLabels.join(dots, Seq("doc_id"), "left")
        .select(col("doc_id"), col("y"),
          (coalesce(col("dotw").cast("double"), lit(0.0)) + lit(bias))
            .as("logit"))
        .withColumn("p",
          lit(1.0) / (lit(1.0) + exp(-col("logit"))))
        .withColumn("r", col("p") - col("y"))
      // ONE pass per epoch: the loss + bias-gradient aggregate rides the
      // gradient join as observed metrics (Dataset.observe) instead of a
      // separate action over a persisted `scored` — the epoch's logit
      // chain is computed once, consumed once, and the DECIMAL sums are
      // identical either way (partitioning/action-order invariant by
      // construction), so the MODEL is bit-identical to the two-action
      // form it replaces.
      val eps = 1e-12
      val obs = new org.apache.spark.sql.Observation()
      val scoredObs = scored.observe(obs,
        sum(-(col("y") * log(greatest(col("p"), lit(eps))) +
          (lit(1.0) - col("y")) *
            log(greatest(lit(1.0) - col("p"), lit(eps))))
          .cast(dec)).as("loss"),
        sum(col("r").cast(dec)).as("rsum"))
      // per-bucket gradient: Σ_docs r_d · cnt_{d,b}, DECIMAL-summed
      val grads = feats.join(scoredObs.select("doc_id", "r"), Seq("doc_id"))
        .groupBy("b")
        .agg(sum((col("cnt") * col("r")).cast(dec)).as("g"))
        .as[(Long, java.math.BigDecimal)].collect()
      val lossRow = obs.get
      // an empty doc table aggregates to NULLs: nothing to learn
      def metric(k: String): Option[Double] =
        Option(lossRow(k)).map(v => new java.math.BigDecimal(v.toString)
          .doubleValue())
      losses += metric("loss").map(_ / nDocs).getOrElse(0.0)
      val rsum = metric("rsum").getOrElse(0.0)
      grads.foreach { case (b, g) =>
        w(b.toInt) -= lr * g.doubleValue() / nDocs }
      bias -= lr * rsum / nDocs
    }
    feats.unpersist()
    docLabels.unpersist()
    Model(w, bias, losses.toSeq)
  }

  /** The TRAINED classifier's cross-engine anchor (q146a): the one-epoch
    * model's decision statistic in PURE INTEGER arithmetic. From the zero
    * model every doc's p is exactly 1/2, so epoch 1's residuals are exact
    * halves and the trained logit is
    *
    *   logit₁(d) = −(lr / 2n) · s2(d),
    *   s2(d) = Σ_b cnt_{d,b}·G_b + R,  G_b = Σ_d' (1−2y)·cnt_{d',b},
    *   R = Σ_docs (1−2y)  (distinct doc table, token-less docs included)
    *
    * — s2 is an integer fold over the SAME (doc, bucket, cnt) feature
    * table [[train]] iterates (md5 buckets, so any engine recomputes it
    * bit-exactly), and since lr/2n > 0 it carries the model's exact
    * decision (keep ⇔ logit ≥ 0 ⇔ s2 ≤ 0) and exact ranking. The
    * float-iterative generic path stays [[train]]; this is the
    * q131a/q73a anchor idiom — same semantics, exactness-first
    * arithmetic. Output docs are those with ≥1 token, matching
    * [[scoreModel]]'s explode semantics. (Integer headroom: |s2| ≤
    * tokens(d)·corpus_tokens — at 1e13 corpus tokens and 1e4-token docs
    * the fold peaks ~1e17, inside int64.)
    */
  def trainScoreAnchor(docs: DataFrame, idCol: String, textCol: String,
                       labelCol: String, buckets: Int): DataFrame = {
    val feats = features(docs, idCol, textCol, labelCol, buckets)
    val g = feats.groupBy("b")
      .agg(sum(col("cnt") * (lit(1L) - col("y").cast("long") * lit(2L)))
        .as("gb"))
    val rRow = docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("long").as("yl")).distinct()
      .agg(sum(lit(1L) - col("yl") * lit(2L))).head()
    val r = if (rRow.isNullAt(0)) 0L else rRow.getLong(0)
    feats.join(g, Seq("b"))
      .groupBy("doc_id")
      .agg((sum(col("cnt") * col("gb")) + lit(r)).as("s2"))
      .select(col("doc_id"), col("s2"), (col("s2") <= 0L).as("keep"))
  }

  /** Persist a trained [[Model]] to a managed table so train → persist →
    * score composes entirely in SQL (the `graft_quality_score_model` TVF
    * reads it back): one (b, w) row per NON-ZERO weight (scoring treats
    * absent buckets as weight 0, so the table is sparse), bias and bucket
    * count as table properties (`Double.toString` round-trips exactly).
    * A model is then a table like any other: history, time travel and
    * CLONE give model versioning for free.
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession, path: String,
                model: Model): graft.table.ManagedTable = {
    import spark.implicits._
    val t = new graft.table.ManagedTable(spark, path)
    t.overwrite(model.weightRows.filter(_._2 != 0.0).toDF("b", "w"))
    t.setProperties(Map(
      "graft.classifier.bias" -> model.bias.toString,
      // derived, never caller-supplied: a mismatched bucket count would
      // persist a model that loads truncated or crashes (review r13)
      "graft.classifier.buckets" -> model.weights.length.toString))
    t
  }

  /** Read a persisted model back: (model, buckets). Inverse of
    * [[saveModel]]; the loss trace is training-run metadata and is not
    * persisted (loads as empty).
    */
  def loadModel(t: graft.table.ManagedTable): (Model, Int) = {
    val spark = t.read.sparkSession
    import spark.implicits._
    val buckets = t.properties.getOrElse("graft.classifier.buckets",
      throw new IllegalArgumentException(
        s"${t.path} is not a persisted classifier model " +
          "(no graft.classifier.buckets property)")).toInt
    val bias = t.properties.getOrElse("graft.classifier.bias", "0.0").toDouble
    val w = new Array[Double](buckets)
    t.read.select(col("b").cast("long"), col("w").cast("double"))
      .as[(Long, Double)].collect()
      .foreach { case (b, x) =>
        // rows must agree with the table's own buckets property: a
        // hand-edited or partially-overwritten weight table would
        // otherwise throw a raw AIOOBE (or silently wrap via toInt) —
        // fail with the same pointed not-a-model shape as the property
        // probe above (review r13).
        if (b < 0 || b >= buckets) throw new IllegalArgumentException(
          s"${t.path} is not a persisted classifier model: weight row " +
            s"bucket $b outside [0, $buckets) declared by " +
            "graft.classifier.buckets")
        w(b.toInt) = x
      }
    (Model(w, bias, Nil), buckets)
  }

  /** Score docs under a trained [[Model]]: same plan as [[scoreFixed]]
    * with the broadcast learned weights; emits calibrated probability and
    * the keep decision at 0.5. The bucket count is the model's own
    * (`weights.length`, same derivation as [[saveModel]]) — a
    * caller-supplied count that disagreed with the weights was a latent
    * crash/truncation (review r13).
    */
  def scoreModel(docs: DataFrame, idCol: String, textCol: String,
                 model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val buckets = model.weights.length
    val wDf = broadcast(model.weightRows.toDF("b", "wb"))
    Spread.toCores(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"),
        explode(TextAnalysis.words(col(textCol))).as("t"))
      .select(col("doc_id"), tokenBucket(col("t"), buckets).as("b"))
      .join(wDf, Seq("b"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("wb"), lit(0.0)).cast("decimal(38,15)"))
        .as("dotw"))
      .select(col("doc_id"),
        (col("dotw").cast("double") + lit(model.bias)).as("logit"))
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("logit"))))
      .withColumn("keep", col("p") >= 0.5)
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Word n-gram language model with Stupid Backoff — the CCNet-style
  * "perplexity filter" (Wenzek et al., arXiv:1911.00359) built on the
  * smoothing that was DESIGNED for distributed batch corpora: Stupid
  * Backoff (Brants et al., "Large Language Models in Machine
  * Translation", EMNLP 2007) replaces normalized discounting with a
  * fixed backoff factor α=0.4 over raw counts, precisely so the model
  * is nothing but count tables — trainable as one groupBy per order,
  * servable as joins. [[TextAnalysis.fluencyScore]] is the unigram
  * proxy of this; here the score conditions on context (trigram →
  * bigram → unigram chain), which is what actually separates fluent
  * text from shuffled-word salad of common tokens.
  *
  * Design for 100 TB:
  *  - TRAIN is three map-side-combinable hash aggregates (one per
  *    order) over the exploded token stream — no driver state, no
  *    vocabulary build. `minCount` pruning bounds the model; pruning
  *    with one threshold preserves the containment invariant
  *    c1(w1) ≥ c2(w1 w2) ≥ c3(w1 w2 w3) (every higher-order occurrence
  *    contains its prefix), so a kept numerator always finds its kept
  *    denominator.
  *  - SCORE is the token stream + two `lag` windows (per-doc partitions,
  *    never global) + five LEFT joins against the count table, then one
  *    doc-keyed aggregate. The model is an ordinary DataFrame: pruned
  *    models broadcast via AQE's size estimate; planet-scale trigram
  *    tables shuffle-join — no collected driver copy anywhere, unlike a
  *    KenLM binary that must fit each executor.
  *  - the model persists as a managed table ([[saveLm]]/[[loadLm]]), so
  *    history/time-travel/CLONE give LM versioning for free (the same
  *    shape as the classifier's saveModel and the tokenizer's
  *    saveMerges).
  *
  * Two scoring surfaces, the q145/q146 discipline:
  *  - [[scoreQuantized]] — the cross-engine-exact integer anchor: each
  *    token's backoff ratio is floor-quantized to parts-per-1e9 with
  *    PURE integer arithmetic (multiply-then-integer-divide), so the
  *    per-doc sum is bit-identical in any engine and under any
  *    partitioning. α=0.4 becomes exact integer level weights
  *    (1e9, 4e8, 1.6e8).
  *  - [[score]] — the float log-prob/perplexity the filter thresholds
  *    on in production; spec-gated against an in-memory reference
  *    (ln() differs across engines at ulp level, so it cannot be a
  *    DuckDB oracle — the quantized twin is).
  */
object NgramLm {

  /** Quantization: level weight × ratio, floored — α = 0.4 exactly.
    * Top level (full available context) scales by Q3; each backoff
    * multiplies by 0.4: Q2 = 0.4·Q3, Q1 = 0.4²·Q3. All integer, so
    * `weight * num div den` is exact in any engine.
    */
  val Q3 = 1000000000L
  val Q2 = 400000000L
  val Q1 = 160000000L
  private val Alpha = 0.4

  /** Count tables for orders 1..3 over the corpus token stream
    * ([[TextAnalysis.words]] tokenization — the one every text operator
    * and every oracle twin in this repo shares): (n, gram, c) rows,
    * gram = space-joined words. n-grams never cross document
    * boundaries. `minCount` drops rows with c < minCount at EVERY
    * order — one threshold keeps containment (scaladoc above), which
    * [[scoreQuantized]]'s denominator lookups rely on.
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            minCount: Long = 1L): DataFrame = {
    val wnd = Window.partitionBy("doc_id").orderBy("i")
    val ctx = tokens(docs, idCol, textCol)
      .withColumn("w2", lag(col("w3"), 1).over(wnd))
      .withColumn("w1", lag(col("w3"), 2).over(wnd))
      .localCheckpoint(eager = false) // three counting consumers
    def level(n: Int, gram: org.apache.spark.sql.Column,
              guard: org.apache.spark.sql.Column) =
      ctx.filter(guard).groupBy(gram.as("gram"))
        .agg(count(lit(1)).as("c"))
        .select(lit(n).as("n"), col("gram"), col("c"))
    level(1, col("w3"), lit(true))
      .unionByName(level(2, concat_ws(" ", col("w2"), col("w3")),
        col("w2").isNotNull))
      .unionByName(level(3,
        concat_ws(" ", col("w1"), col("w2"), col("w3")),
        col("w1").isNotNull))
      .filter(col("c") >= minCount)
  }

  /** The integer anchor: per doc, `sb_q` = Σ over tokens of the
    * floor-quantized Stupid Backoff score (parts-per-1e9), plus the
    * per-level serving histogram. A token at position i (1-based) is
    * served by the LONGEST available context: with two context words
    * the chain is trigram-ratio → α·bigram-ratio → α²·unigram-ratio;
    * position 2 starts at the bigram, position 1 at the unigram. A
    * token whose chain exhausts (unigram pruned/unseen) contributes 0
    * and counts in `oov`. T (the unigram mass) is Σ c over n=1 rows of
    * THE MODEL — derivable by any engine from the persisted table, so
    * the statistic needs no side-channel total.
    */
  def scoreQuantized(docs: DataFrame, idCol: String, textCol: String,
                     model: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val (m1, m2, m3, total, maxC) = splitModel(model)
    // integer-headroom GUARANTEE, not comment: the quantized numerator
    // is weight·count with weight ≤ 1e9, so any count above
    // Long.Max/1e9 (≈9.2e9 — a single n-gram repeated nine billion
    // times) would wrap. Raise minCount (prune) or rescale Q if a
    // corpus ever trips this. (maxC rides splitModel's one aggregate
    // over the checkpointed model — review r14: a separate agg on the
    // caller's DataFrame re-executed the whole training lineage.)
    require(maxC <= Long.MaxValue / Q3,
      s"n-gram count $maxC overflows the 1e9 quantizer " +
        s"(max ${Long.MaxValue / Q3}); train with a higher minCount")
    val wnd = Window.partitionBy("doc_id").orderBy("i")
    val ctx = tokens(docs, idCol, textCol)
      .withColumn("w2", lag(col("w3"), 1).over(wnd))
      .withColumn("w1", lag(col("w3"), 2).over(wnd))
    val joined = lookups(ctx, m1, m2, m3)
    // the backoff chain, starting at the longest context the position
    // has: each branch is weight·num div den, pure int64. Denominators
    // are non-null whenever the numerator is (containment: the model
    // that kept the n-gram kept its prefix/suffix context).
    val q = expr(
      s"""CASE
          WHEN w1 IS NOT NULL THEN
            CASE WHEN c3 IS NOT NULL THEN ($Q3 * c3) div c2ctx
                 WHEN c2 IS NOT NULL THEN ($Q2 * c2) div c1ctx
                 WHEN c1 IS NOT NULL THEN ($Q1 * c1) div $total
                 ELSE 0 END
          WHEN w2 IS NOT NULL THEN
            CASE WHEN c2 IS NOT NULL THEN ($Q3 * c2) div c1ctx
                 WHEN c1 IS NOT NULL THEN ($Q2 * c1) div $total
                 ELSE 0 END
          ELSE CASE WHEN c1 IS NOT NULL THEN ($Q3 * c1) div $total
                    ELSE 0 END
        END""")
    val lvl =
      when(col("w1").isNotNull && col("c3").isNotNull, 3)
        .when(col("w2").isNotNull && col("w1").isNotNull &&
          col("c2").isNotNull, 2)
        .when(col("w1").isNull && col("w2").isNotNull &&
          col("c2").isNotNull, 2)
        .when(col("c1").isNotNull, 1)
        .otherwise(0)
    val perDoc = joined
      .select(col("doc_id"), q.as("q"), lvl.as("lvl"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("q")).as("sb_q"),
        count(when(col("lvl") === 3, 1)).as("hits3"),
        count(when(col("lvl") === 2, 1)).as("hits2"),
        count(when(col("lvl") === 1, 1)).as("hits1"),
        count(when(col("lvl") === 0, 1)).as("oov"))
    // totality: a token-less doc surfaces with zeros, not silence
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L,
        Seq("n_tokens", "sb_q", "hits3", "hits2", "hits1", "oov"))
  }

  /** The float filter statistic production thresholds on: per doc, the
    * mean natural-log Stupid Backoff score and the perplexity
    * exp(−mean). A token whose chain exhausts scores α^b / (T+1) (the
    * sub-unigram floor, b = levels backed off to reach it) so OOV text
    * ranks below everything in-model instead of vanishing. ln() is
    * engine-specific at ulp level — this surface is spec-gated against
    * an in-JVM reference; [[scoreQuantized]] is the oracle twin.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame): DataFrame = {
    val (m1, m2, m3, total, _) = splitModel(model)
    val wnd = Window.partitionBy("doc_id").orderBy("i")
    val ctx = tokens(docs, idCol, textCol)
      .withColumn("w2", lag(col("w3"), 1).over(wnd))
      .withColumn("w1", lag(col("w3"), 2).over(wnd))
    val joined = lookups(ctx, m1, m2, m3)
    val t = lit(total.toDouble)
    val floorP = lit(1.0) / (t + lit(1.0))
    val a = lit(Alpha)
    val logS = log(
      when(col("w1").isNotNull,
        when(col("c3").isNotNull, col("c3") / col("c2ctx"))
          .when(col("c2").isNotNull, a * col("c2") / col("c1ctx"))
          .when(col("c1").isNotNull, a * a * col("c1") / t)
          .otherwise(a * a * a * floorP))
        .when(col("w2").isNotNull,
          when(col("c2").isNotNull, col("c2") / col("c1ctx"))
            .when(col("c1").isNotNull, a * col("c1") / t)
            .otherwise(a * a * floorP))
        .otherwise(
          when(col("c1").isNotNull, col("c1") / t)
            .otherwise(a * floorP)))
    val perDoc = joined.select(col("doc_id"), logS.as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("lp")) / count(lit(1))).as("avg_logprob"))
      .withColumn("ppl", exp(-col("avg_logprob")))
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_tokens"))
  }

  /** Persist a trained model as a managed table: (n, gram, c) rows +
    * the derived row count as the loader's drift check (the saveModel/
    * saveMerges discipline — never caller-supplied). `minCount` must be
    * the value the model was TRAINED with — it is recorded so
    * [[updateLm]] can tell whether incremental folding is exact.
    * History/time travel/CLONE give LM versioning for free.
    */
  def saveLm(spark: SparkSession, path: String, model: DataFrame,
             minCount: Long): graft.table.ManagedTable = {
    val t = new graft.table.ManagedTable(spark, path)
    val rows = model.select(col("n").cast("int"),
      col("gram").cast("string"), col("c").cast("long"))
    t.overwrite(rows)
    t.setProperties(Map(
      "graft.lm.order" -> "3",
      "graft.lm.minCount" -> minCount.toString,
      "graft.lm.grams" -> t.read.count().toString))
    t
  }

  /** Fold a new batch's counts into a persisted model IN PLACE —
    * n-gram counts are additive, so this is EXACTLY equivalent to
    * retraining on the union, provided the stored model is unpruned
    * (minCount = 1, checked against the recorded property): a gram below
    * the threshold in both batches but not their union would silently
    * under-count under pruning, so pruned models are REFUSED — prune at
    * scoring time instead (score against `loadLm(t).filter(c >= θ)`),
    * or retrain. One clause-family MERGE on (n, gram): matched counts
    * add, new grams insert — cost ∝ the batch and the touched files,
    * never the corpus, and the model table's history gives every
    * intermediate LM back via time travel.
    */
  def updateLm(t: graft.table.ManagedTable, newDocs: DataFrame,
               idCol: String, textCol: String): Unit = {
    t.properties.getOrElse("graft.lm.grams",
      throw new IllegalArgumentException(
        s"${t.path} is not a persisted n-gram LM " +
          "(no graft.lm.grams property)"))
    val mc = t.properties.getOrElse("graft.lm.minCount", "1")
    require(mc == "1",
      s"${t.path} was trained with minCount=$mc — incremental count " +
        "folding is only exact on an unpruned model (a gram below the " +
        "threshold in each batch separately may clear it in the union); " +
        "retrain, or persist with minCount=1 and prune at scoring time")
    val delta = train(newDocs, idCol, textCol, minCount = 1L)
      .select(col("n").cast("int"), col("gram").cast("string"),
        col("c").cast("long"))
    t.mergeBuilder(delta, Seq("n", "gram"))
      .whenMatchedUpdate(Map("c" -> "t.c + s.c"))
      .whenNotMatchedInsertAll()
      .execute()
    t.setProperties(Map("graft.lm.grams" -> t.read.count().toString))
  }

  /** Read a persisted model back, validated: the property must exist
    * (else: not an LM table), the row count must match the declared
    * count, and every row must be a positive count at order 1..3 — a
    * hand-edited or partially-overwritten model table fails pointedly
    * instead of scoring wrong (the loadModel/loadMerges discipline).
    */
  def loadLm(t: graft.table.ManagedTable): DataFrame = {
    val declared = t.properties.getOrElse("graft.lm.grams",
      throw new IllegalArgumentException(
        s"${t.path} is not a persisted n-gram LM " +
          "(no graft.lm.grams property)")).toLong
    val m = t.read.select(col("n").cast("int"), col("gram").cast("string"),
      col("c").cast("long"))
    val bad = m.agg(
      count(lit(1)).as("rows"),
      count(when(col("n") < 1 || col("n") > 3 || col("c") <= 0 ||
        col("gram").isNull, 1)).as("malformed"),
      // a duplicated (n, gram) row would FAN OUT the scoring joins and
      // silently inflate every containing doc's statistic (review r14 —
      // the loadMerges duplicate-rank discipline)
      count_distinct(struct(col("n"), col("gram"))).as("uniq")).head
    if (bad.getLong(0) != declared || bad.getLong(1) != 0 ||
        bad.getLong(2) != bad.getLong(0))
      throw new IllegalArgumentException(
        s"${t.path} is not a persisted n-gram LM: expected $declared " +
          s"well-formed DISTINCT (n∈1..3, c>0) rows, found " +
          s"${bad.getLong(0)} row(s), ${bad.getLong(1)} malformed, " +
          s"${bad.getLong(0) - bad.getLong(2)} duplicated")
    // containment (train's one-threshold invariant, which the scoring
    // denominators RELY on — a violating hand-built model would null a
    // division and silently skip tokens from sb_q): every 3-gram's
    // context and trailing bigram kept; every 2-gram's words kept
    val m1g = m.filter(col("n") === 1).select(col("gram").as("g"))
    val m2g = m.filter(col("n") === 2).select(col("gram").as("g"))
    val holes =
      m.filter(col("n") === 3)
        .select(substring_index(col("gram"), " ", 2).as("g"))
        .join(m2g, Seq("g"), "left_anti")
      .unionByName(m.filter(col("n") === 3)
        .select(substring_index(col("gram"), " ", -2).as("g"))
        .join(m2g, Seq("g"), "left_anti"))
      .unionByName(m2g
        .select(substring_index(col("g"), " ", 1).as("g"))
        .join(m1g, Seq("g"), "left_anti"))
      .unionByName(m2g
        .select(substring_index(col("g"), " ", -1).as("g"))
        .join(m1g, Seq("g"), "left_anti"))
      .limit(1).collect()
    if (holes.nonEmpty)
      throw new IllegalArgumentException(
        s"${t.path} is not a consistent n-gram LM: kept n-gram's " +
          s"context '${holes.head.getString(0)}' is missing (the " +
          "one-threshold pruning invariant) — retrain rather than " +
          "hand-editing count rows")
    m
  }

  /** (doc_id, i, w3): the 1-based token stream every trainer/scorer
    * here shares — [[TextAnalysis.words]] tokenization, exploded.
    */
  private def tokens(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.words(col(textCol))).as(Seq("p0", "w3")))
      .select(col("doc_id"), (col("p0") + 1).as("i"), col("w3"))

  /** The five count lookups every scorer needs, as LEFT joins with
    * aliased right sides (no ambiguous `gram`): c3 on the full trigram,
    * c2ctx on the context bigram (trigram denominator), c2 on the
    * trailing bigram, c1ctx on w2 (bigram denominator), c1 on the
    * token. Null-guarded keys never match (SQL join semantics), so
    * short-context positions pass through with null counts.
    */
  private def lookups(ctx: DataFrame, m1: DataFrame, m2: DataFrame,
                      m3: DataFrame): DataFrame =
    ctx
      .join(m3.withColumnRenamed("c", "c3").as("mtri"),
        concat_ws(" ", col("w1"), col("w2"), col("w3")) ===
          col("mtri.gram") && col("w1").isNotNull, "left").drop("gram")
      .join(m2.withColumnRenamed("c", "c2ctx").as("mctx"),
        concat_ws(" ", col("w1"), col("w2")) === col("mctx.gram") &&
          col("w1").isNotNull, "left").drop("gram")
      .join(m2.withColumnRenamed("c", "c2").as("mbi"),
        concat_ws(" ", col("w2"), col("w3")) === col("mbi.gram") &&
          col("w2").isNotNull, "left").drop("gram")
      .join(m1.withColumnRenamed("c", "c1ctx").as("muc"),
        col("w2") === col("muc.gram"), "left").drop("gram")
      .join(m1.withColumnRenamed("c", "c1").as("mu"),
        col("w3") === col("mu.gram"), "left").drop("gram")

  /** Per-order views + the unigram mass T + the max count (the overflow
    * guard's input). ONE driver-side scalar job over the checkpointed
    * model (the model is the small side by construction).
    */
  private def splitModel(model: DataFrame)
      : (DataFrame, DataFrame, DataFrame, Long, Long) = {
    val m = model.select(col("n"), col("gram"), col("c"))
      .localCheckpoint(eager = false) // five join consumers + the totals
    val t = m.agg(
      coalesce(sum(when(col("n") === 1, col("c"))), lit(0L)),
      coalesce(max(col("c")), lit(0L))).head
    val total = t.getLong(0)
    require(total > 0, "the model has no unigram mass (empty corpus?)")
    (m.filter(col("n") === 1).select("gram", "c"),
      m.filter(col("n") === 2).select("gram", "c"),
      m.filter(col("n") === 3).select("gram", "c"),
      total, t.getLong(1))
  }
}

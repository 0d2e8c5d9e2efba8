package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
  * distribution matches a small TARGET corpus (the "train on data that
  * looks like your eval/domain" selection step of modern LM pipelines).
  *
  * Pipeline (the paper's, Spark-first):
  *  1. features: unigram+bigram word n-grams hashed into `buckets`
  *     (xxhash64, codegen'd) — a fixed-width bag-of-ngrams;
  *  2. two bucket histograms (one groupBy each over target and raw),
  *     Laplace-smoothed into log-ratios DISTRIBUTED (a histogram join;
  *     only the two scalar totals visit the driver) — the table is
  *     `buckets`-bounded, never corpus-bounded;
  *  3. per-document importance weight log w = Σ_tokens [log p̂_target(b) −
  *     log p̂_raw(b)] via a join against the ratio table (broadcast under
  *     `broadcastBuckets`, else a shuffle join on the 8-byte bucket key),
  *     then one groupBy(doc). The log-ratios are quantized
  *     to DECIMAL(20,12) before summing, so the per-doc weight is exact
  *     and independent of aggregation order — the engine's documents-
  *     pipeline determinism contract;
  *  4. Gumbel-top-k resampling: rank by log w + Gumbel(g), g derived from
  *     a seeded per-doc hash — the paper's sampling-without-replacement
  *     trick, deterministic here like every sampler in [[Sampling]].
  *
  * At 100 TB: histograms are two map-side-combined aggs to `buckets`
  * cells; scoring is explode → broadcast lookup → one re-agg by doc id
  * (the only shuffle, pre-aggregated map-side); selection is a TakeOrdered
  * top-k, never a global sort.
  */
object Dsir {

  /** Hashed unigram+bigram bucket ids for `text` (long array, values in
    * [0, buckets)). Empty/one-word docs degrade gracefully (no bigrams).
    */
  def ngramBuckets(text: Column, buckets: Int): Column = {
    val ws = TextAnalysis.words(text)
    val bis = when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    transform(concat(ws, bis), g => pmod(xxhash64(g), lit(buckets.toLong)))
  }

  /** (bucket, cnt) histogram of a corpus — `buckets`-bounded output. */
  def bucketHistogram(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    df.select(explode(ngramBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-document importance weights against `target`: (idCol, log_w)
    * with log_w an exact DECIMAL(28,12) sum of quantized per-ngram
    * log-ratios — higher means "more target-like". Documents with no
    * recognized n-gram (empty text) weigh 0.
    *
    * The ratio table is computed DISTRIBUTED (histogram left-join, the
    * log-ratio as a column) — the driver never materializes the observed
    * vocabulary; only the two scalar histogram totals come back. It is
    * broadcast into the scoring join only when `buckets` (an upper bound
    * on its row count) stays under `broadcastBuckets`; beyond that the
    * scoring join shuffles on the 8-byte bucket key — so `buckets` may be
    * huge (fewer hash collisions) without a driver-side cliff.
    */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
                        target: DataFrame, targetTextCol: String,
                        buckets: Int = 8192,
                        broadcastBuckets: Long = 4L * 1000 * 1000): DataFrame = {
    // the raw corpus is tokenized+hashed by BOTH the histogram and the
    // scoring join — cache the exploded (id, bucket) rows once
    // (spill-backed; ~16 bytes/token vs re-reading and re-splitting the
    // full text column on the second pass). persist, NOT localCheckpoint:
    // lineage stays, so a lost executor recomputes its blocks instead of
    // failing the job; blocks free when the frame falls out of reference
    val rawBuckets = raw.select(col(idCol),
        explode(ngramBuckets(col(textCol), buckets)).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pHist = bucketHistogram(target, targetTextCol, buckets)
    val qHist = rawBuckets.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    def total(h: DataFrame): Double =
      Option(h.agg(sum(col("cnt"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L).toDouble + buckets
    val totP = total(pHist)
    val totQ = total(qHist)
    // Laplace(+1)-smoothed log-ratio per OBSERVED raw bucket, quantized to
    // 12 decimal places — the table carries decimals, so the distributed
    // sum is exact whatever the aggregation order. Every scored n-gram
    // comes from `raw`, so its bucket is in the raw histogram by
    // construction: a LEFT join from qHist covers the whole scoring
    // domain (target-only buckets never match a scored row).
    // `cast(decimal)` rounds HALF_UP — same quantization the driver-side
    // BigDecimal.setScale gave, bit-identical weights.
    val ratioRaw = qHist.join(
        pHist.withColumnRenamed("cnt", "p_cnt"), Seq("bucket"), "left")
      .select(col("bucket"),
        (log((coalesce(col("p_cnt"), lit(0L)) + lit(1L)).cast("double") / totP)
          - log((col("cnt") + lit(1L)).cast("double") / totQ))
          .cast("decimal(20,12)").as("log_ratio"))
    val ratio =
      if (buckets.toLong <= broadcastBuckets) broadcast(ratioRaw) else ratioRaw
    rawBuckets
      .join(ratio, "bucket")
      .groupBy(idCol)
      .agg(sum(col("log_ratio")).cast("decimal(28,12)").as("log_w"))
      .unionByName( // empty AND null docs: no exploded rows, weight 0
        // (size() of a null array is null, never 0 — test null explicitly
        // or the doc would vanish from the weight table entirely)
        raw.filter(col(textCol).isNull ||
            size(TextAnalysis.words(col(textCol))) <= 0)
          .select(col(idCol), lit(BigDecimal(0).bigDecimal)
            .cast("decimal(28,12)").as("log_w")))
  }

  /** Gumbel-top-k selection over importance weights (the paper's
    * resampling): keep the `k` docs maximizing `log_w + Gumbel(seed, id)`
    * — deterministic via the seeded-hash uniform, like every sampler in
    * [[Sampling]]. With `noise = false` this is plain top-k by weight.
    */
  def resample(weighted: DataFrame, idCol: String, k: Int,
               seed: Long = 42L, noise: Boolean = true): DataFrame = {
    val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(1000000000L))
      .cast("double") + lit(0.5)) / lit(1e9)
    val gumbel = if (noise) -log(-log(u)) else lit(0.0)
    val keyed = weighted.withColumn("__g",
      col("log_w").cast("double") + gumbel)
    keyed.orderBy(col("__g").desc, col(idCol)).limit(k).drop("__g")
  }

  /** End-to-end DSIR: weights + resample, returning the selected raw rows
    * with their weights attached.
    */
  def select(raw: DataFrame, idCol: String, textCol: String,
             target: DataFrame, targetTextCol: String, k: Int,
             buckets: Int = 8192, seed: Long = 42L): DataFrame = {
    val w = importanceWeights(raw, idCol, textCol, target, targetTextCol, buckets)
    raw.join(resample(w, idCol, k, seed), Seq(idCol))
  }

  // ---- oracle twin (engine-independent everywhere) ----------------------

  /** [[ngramBuckets]] with ENGINE-INDEPENDENT bucket ids: the 52-bit
    * md5-prefix integer (the q73a trick) mod `buckets`, reproducible in
    * any engine with md5. Production keeps xxhash64 (one hash instruction
    * vs a full digest per n-gram); this variant exists so the DSIR
    * machinery has a bit-exact cross-engine anchor.
    */
  def ngramBucketsMd5(text: Column, buckets: Int): Column = {
    val ws = TextAnalysis.words(text)
    val bis = when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    transform(concat(ws, bis), g =>
      pmod(conv(substring(md5(g), 1, 13), 16, 10).cast("long"),
        lit(buckets.toLong)))
  }

  /** The oracle twin of [[importanceWeights]]: md5 bucket ids and a
    * LINEAR smoothed-probability difference per n-gram —
    * `(p_b+1)/totP − (q_b+1)/totQ`, each step an exactly-rounded IEEE op,
    * quantized to DECIMAL(20,12) and summed exactly — instead of the
    * paper's log-ratio, whose `ln()` is not guaranteed bit-identical
    * across engines' libm (a 1-ulp log difference at a HALF_UP rounding
    * boundary would flip a quantized digit). Same plumbing at the same
    * scale bounds: histograms → distributed ratio table → scoring join →
    * per-doc exact sum. Positive w = "more target-like", like log w.
    */
  def importanceWeightsMd5Linear(raw: DataFrame, idCol: String,
      textCol: String, target: DataFrame, targetTextCol: String,
      buckets: Int = 8192,
      broadcastBuckets: Long = 4L * 1000 * 1000): DataFrame = {
    // an md5 digest per n-gram costs ~2× xxhash64, and the raw corpus is
    // hashed by BOTH the histogram and the scoring join — cache the
    // exploded (id, bucket) rows so the digest pass runs once, not twice
    // (persist keeps lineage: recomputable on executor loss)
    val rawBuckets = raw.select(col(idCol),
        explode(ngramBucketsMd5(col(textCol), buckets)).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pHist = target
      .select(explode(ngramBucketsMd5(col(targetTextCol), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val qHist = rawBuckets.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    def total(h: DataFrame): Double =
      Option(h.agg(sum(col("cnt"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L).toDouble + buckets
    val totP = total(pHist)
    val totQ = total(qHist)
    val ratioRaw = qHist.join(
        pHist.withColumnRenamed("cnt", "p_cnt"), Seq("bucket"), "left")
      .select(col("bucket"),
        (((coalesce(col("p_cnt"), lit(0L)) + lit(1L)).cast("double") / totP)
          - ((col("cnt") + lit(1L)).cast("double") / totQ))
          .cast("decimal(20,12)").as("ratio_diff"))
    val ratio =
      if (buckets.toLong <= broadcastBuckets) broadcast(ratioRaw) else ratioRaw
    rawBuckets
      .join(ratio, "bucket")
      .groupBy(idCol)
      .agg(sum(col("ratio_diff")).cast("decimal(28,12)").as("w"))
      .unionByName(
        raw.filter(col(textCol).isNull ||
            size(TextAnalysis.words(col(textCol))) <= 0)
          .select(col(idCol), lit(BigDecimal(0).bigDecimal)
            .cast("decimal(28,12)").as("w")))
  }

  /** End-to-end oracle-twin DSIR: md5-linear weights + noise-free top-k
    * (exact-weight order, id tiebreak — the Gumbel path stays on
    * [[select]], whose `-ln(-ln(u))` is engine-seeded).
    */
  def selectMd5Linear(raw: DataFrame, idCol: String, textCol: String,
                      target: DataFrame, targetTextCol: String, k: Int,
                      buckets: Int = 8192): DataFrame = {
    val w = importanceWeightsMd5Linear(raw, idCol, textCol,
      target, targetTextCol, buckets)
    raw.join(w.orderBy(col("w").desc, col(idCol)).limit(k), Seq(idCol))
  }
}

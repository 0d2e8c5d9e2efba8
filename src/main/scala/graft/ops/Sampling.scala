package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling / splitting for training-data pipelines.
  * Everything is content-hash based (never `rand()`): reproducible across
  * runs, cluster sizes and partitionings — the property that matters when
  * a 100 TB corpus is re-split after a re-shard.
  */
object Sampling {

  /** Train/test split by 64-bit content hash: stable under repartitioning
    * and append-order changes. `pct` ∈ [0,100] is the train share.
    */
  def hashSplit(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.withColumn("is_train", pmod(xxhash64(col(idCol)), lit(100)) < pct)

  /** Modulo split — the reference's batch-splitting predicate
    * (`transaction_id % 5 == i`, deltalake.ipynb:2937–2938 cell 19) as a
    * split utility; weaker than hashSplit for skewed ids but exactly
    * reproducible in any SQL engine (used by the oracle).
    */
  def modSplit(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.withColumn("is_train", col(idCol) % 100 < pct)

  /** Exact per-group k-sample: deterministic "random" order via content
    * hash, row_number per group, keep ≤ k. One shuffle on the group key.
    */
  def stratifiedSampleExact(df: DataFrame, groupCol: String, idCol: String,
                            k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** Deterministic weighted k-sample without replacement
    * (Efraimidis–Spirakis): key = u^(1/w) with u a content-hash uniform in
    * (0,1); the k largest keys are the sample. Higher weight ⇒ higher
    * inclusion probability; fully reproducible (no rand()).
    */
  def weightedSampleExact(df: DataFrame, idCol: String, weightCol: String,
                          k: Int): DataFrame = {
    val u = (pmod(xxhash64(col(idCol)), lit(1000000007L)).cast("double") + 1.0) /
      1000000009.0
    val key = pow(u, lit(1.0) / col(weightCol))
    // top-k by key via orderBy+limit: plans as TakeOrderedAndProject
    // (per-partition heaps + driver merge), never a single-partition window
    df.withColumn("__key", key)
      .orderBy(desc("__key"), col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** [[weightedSampleExact]] with the uniform drawn from md5 instead of
    * xxhash64 — reproducible in ANY engine with md5 (the oracle anchor
    * for the E–S sampler, the role [[modSplit]] plays for [[hashSplit]]):
    * u = (int(first 13 hex of md5(id ":" seed), 16) + 0.5) / 2⁵², an
    * exact dyadic rational both engines compute identically. The E–S key
    * u^(1/w) is quantized to DECIMAL(12,9) before ranking so a ≤1-ulp
    * cross-engine `pow` difference cannot flip the selection (ties break
    * by id in both engines). Zero/negative weights are excluded — E–S is
    * defined for w > 0.
    */
  def weightedSampleMd5(df: DataFrame, idCol: String, weightCol: String,
                        k: Int, seed: Long = 42L): DataFrame = {
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":" + seed))), 1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52
    val key = pow(u, lit(1.0) / col(weightCol)).cast("decimal(12,9)")
    // NaN guard: Spark orders NaN above every number, so `w > 0` alone
    // would KEEP a NaN weight that SQL engines (NULL there) exclude
    df.filter(col(weightCol) > 0 && !isnan(col(weightCol).cast("double")))
      .withColumn("__key", key)
      .orderBy(desc("__key"), col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** Mix corpora to target fractions: keep each source's rows where the
    * id-modulo bucket falls under its fraction, then union — the
    * deterministic data-mixing step of a training pipeline (SQL-expressible,
    * so oracle-checkable; use hash buckets instead of modulo when ids are
    * not uniform).
    */
  def mix(sources: Seq[(DataFrame, Double)], idCol: String): DataFrame =
    sources.map { case (df, frac) =>
      require(frac >= 0.0 && frac <= 1.0, s"fraction out of [0,1]: $frac")
      // round, don't truncate: 0.29*100 is 28.999... under FP
      df.filter(col(idCol) % 100 < math.round(frac * 100).toInt)
    }.reduce(_ unionByName _)

  /** Temperature-based domain rebalancing — the multinomial α-sampling of
    * multilingual pretraining (XLM-R / mT5): sampling probability per
    * domain p_d ∝ n_d^α, realized as deterministic per-row keep rates
    * r_d = (n_min / n_d)^(1−α). The smallest domain keeps everything and
    * larger domains are downsampled toward it: α = 1 is the natural
    * distribution, α = 0 flattens to uniform domain sizes. Selection is
    * content-hash (reproducible under re-sharding, the [[hashSplit]]
    * discipline); `byHash = false` switches to the id-modulo selector
    * that any SQL engine reproduces exactly (the oracle anchor, like
    * [[modSplit]]). α = 0.5 routes through `sqrt` — correctly rounded
    * IEEE, so engines agree bit-exactly, where `pow` only promises
    * ≤ 1 ulp. `modulus` sets the keep-rate granularity (1/modulus); with
    * the modulo selector pick it ≲ the id range, or sequential ids all
    * land under the threshold. Adds `sample_rate`; costs one
    * metadata-sized aggregate broadcast back onto the data — no shuffle
    * of the rows themselves.
    */
  def temperatureSample(df: DataFrame, domainCol: String, idCol: String,
                        alpha: Double, byHash: Boolean = true,
                        modulus: Long = 1000000L): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha out of [0,1]: $alpha")
    require(modulus > 0, s"modulus must be positive: $modulus")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__nmin"))
    val ratio = col("__nmin").cast("double") / col("__n").cast("double")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - alpha))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(domainCol), rate.as("sample_rate"))
    val sel = pmod(if (byHash) xxhash64(col(idCol)) else col(idCol).cast("long"),
      lit(modulus))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(sel < floor(col("sample_rate") * modulus).cast("long"))
  }

  /** Token-budget shard packing: documents in a stable order are packed
    * greedily into shards of ≈`budget` tokens (shard id = exclusive running
    * token sum ÷ budget). One global window — fine up to millions of rows;
    * [[packByTokenBudgetDistributed]] is the identical-result scale form.
    */
  def packByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                        budget: Long): DataFrame = {
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("shard", floor((col("__cum") - col(tokenCol)) / budget).cast("long"))
      .drop("__cum")
  }

  /** [[packByTokenBudget]] without the single-partition global window — the
    * classic two-pass distributed prefix sum:
    *
    *   1. range-partition by id (the pack order) and cumsum WITHIN each
    *      partition (parallel windows);
    *   2. collect one total per partition (N partition sums, driver-tiny),
    *      turn them into exclusive per-partition offsets, and add the
    *      offset back as a broadcast map literal.
    *
    * The global running sum — and therefore every shard id — is identical
    * to the global-window form for any partition count (asserted in spec):
    * the prefix sum over a total order is independent of where the
    * partition boundaries fall.
    */
  def packByTokenBudgetDistributed(df: DataFrame, idCol: String, tokenCol: String,
                                   budget: Long, partitions: Int = 0): DataFrame =
    withRunningTokenSum(df, idCol, tokenCol, partitions)
      .withColumn("shard", floor((col("__cum") - col(tokenCol)) / budget).cast("long"))
      .drop("__cum")

  /** df + `__cum` = INCLUSIVE running sum of `tokenCol` in `idCol` order —
    * the classic two-pass distributed prefix sum:
    *
    *   1. range-partition by id (the pack order) and cumsum WITHIN each
    *      partition (parallel windows);
    *   2. collect one total per partition (N partition sums, driver-tiny),
    *      turn them into exclusive per-partition offsets, and add the
    *      offset back as a broadcast map literal.
    *
    * The global running sum is identical to a single global window for
    * any partition count (asserted in spec): the prefix sum over a total
    * order is independent of where the partition boundaries fall.
    */
  private def withRunningTokenSum(df: DataFrame, idCol: String,
                                  tokenCol: String, partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin partitioning: pass 2 must see pass 1's pids
    val ptotals = sorted.groupBy("__pid")
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L)((acc, p) => acc + ptotals.getOrElse(p, 0L))
    val offsetExpr =
      if (n == 1) lit(0L)
      else element_at(
        map((0 until n).flatMap(p => Seq(lit(p), lit(offsets(p)))): _*), col("__pid"))
    val w = Window.partitionBy("__pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted
      .withColumn("__cum", sum(col(tokenCol).cast("long")).over(w) + offsetExpr)
      .drop("__pid")
  }

  /** Concat-and-chunk SEQUENCE packing — how pretraining batches are
    * actually assembled (the GPT-style packer): documents concatenate in
    * `idCol` order into one token stream, chunked into fixed-`seqLen`
    * training sequences; a document SPANS sequences when it crosses a
    * boundary ([[packByTokenBudget]] assigns whole docs to shards — this
    * emits the per-sequence SLICES, the thing a sequence loader and a
    * boundary-aware attention mask need). One row per (doc × sequence it
    * touches):
    *
    *   seq_id     — 0-based training-sequence index
    *   doc_id     — the document
    *   seq_offset — where in the sequence this doc's slice begins
    *   doc_offset — where in the doc the slice begins
    *   slice_len  — tokens contributed (Σ over a doc = its token count;
    *                Σ over a sequence = seqLen except the final one)
    *
    * Distributed exactly like the shard packer: the two-pass prefix sum
    * places every doc at its global start token, then the per-doc
    * sequence range explodes as pure codegen'd expressions — no global
    * window, no shuffle beyond the range partition. Token-less docs
    * occupy no stream positions and emit no slice (matching SQL
    * generate_series over an empty range).
    */
  def concatChunkSlices(df: DataFrame, idCol: String, tokenCol: String,
                        seqLen: Long, partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val startC = (col("__cum") - col(tokenCol)).cast("long")
    val nC = col(tokenCol).cast("long")
    // bounds stay far under 2^53, so floor(double division) is exact
    val firstSeq = floor(startC / lit(seqLen.toDouble)).cast("long")
    val lastSeq = floor((startC + nC - 1) / lit(seqLen.toDouble)).cast("long")
    withRunningTokenSum(df, idCol, tokenCol, partitions)
      .filter(nC > 0)
      .select(col(idCol).as("doc_id"), startC.as("__start"), nC.as("__n"),
        explode(sequence(firstSeq, lastSeq)).as("seq_id"))
      .select(
        col("seq_id"),
        col("doc_id"),
        greatest(col("__start") - col("seq_id") * seqLen, lit(0L))
          .as("seq_offset"),
        greatest(col("seq_id") * seqLen - col("__start"), lit(0L))
          .as("doc_offset"),
        (least((col("seq_id") + 1) * seqLen - col("__start"), col("__n")) -
          greatest(col("seq_id") * seqLen - col("__start"), lit(0L)))
          .as("slice_len"))
  }

  /** Whole-document packing into fixed-capacity training sequences
    * WITHOUT splitting — the SFT/instruction-tuning packer
    * ([[concatChunkSlices]] lets documents span boundaries, the right
    * thing for pretraining and the wrong thing when an example must not
    * straddle sequences). Size-class assignment, the harmonic-fit family
    * of bin packing (Lee & Lee, "A simple on-line bin-packing
    * algorithm", JACM 32(3), 1985): a doc of n tokens lands in class
    * `fit` = ⌊seqLen / n⌋ — the per-bin doc count its size supports —
    * and bins within a class take exactly `fit` docs in doc-id order.
    * Guarantees (spec-pinned):
    *   - per-bin fill ≤ seqLen always (fit docs of size ≤ seqLen/fit);
    *   - every FULL bin is > seqLen·fit/(fit+1) ≥ 50% utilized (class
    *     members exceed seqLen/(fit+1)); only each class's last bin may
    *     be emptier.
    * Oversize docs (n > seqLen) flag fit = 0, one per bin — the caller
    * decides truncate/drop; token-less docs pack nothing and are
    * excluded. Output: (doc_id, n_tokens, fit, bin) — (fit, bin) is the
    * sequence key.
    *
    * Deterministic pure arithmetic + doc-id order ⇒ partitioning-
    * invariant and SQL-expressible (the q156 DuckDB oracle). Scale: the
    * only coordination is the per-class rank, computed like the shard
    * packer's prefix sum — partition-local row_number + driver-collected
    * (partition × class) counts turned into offsets (classes ≤ distinct
    * doc sizes ≤ seqLen, so the offset table is metadata-sized and
    * broadcast). No global or per-class single-partition window at any
    * size.
    */
  def packWholeDocs(df: DataFrame, idCol: String, tokenCol: String,
                    seqLen: Long, partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val docs = df
      .select(col(idCol).as("doc_id"),
        col(tokenCol).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1L)
      .withColumn("fit", when(col("n_tokens") > seqLen, lit(0L))
        .otherwise(expr(s"$seqLen div n_tokens")))
    val sorted = docs.repartitionByRange(n, col("fit"), col("doc_id"))
      .sortWithinPartitions("fit", "doc_id")
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin partitioning: pass 2 must see pass 1's pids
    val pcounts = sorted.groupBy("__pid", "fit")
      .agg(count(lit(1)).as("__c")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exclusive per-(pid, class) offsets: a class's ranks continue across
    // partitions in pid order
    val offsets = pcounts.keys.map(_._2).toSeq.distinct.flatMap { f =>
      (0 until n).scanLeft(0L)((acc, p) =>
          acc + pcounts.getOrElse((p, f), 0L))
        .zipWithIndex.take(n)
        .map { case (off, p) => (p, f, off) }
    }
    val offDf = broadcast(offsets.toDF("__pid", "fit", "__off"))
    val w = Window.partitionBy("__pid", "fit").orderBy("doc_id")
    sorted
      .withColumn("__rn", row_number().over(w).cast("long"))
      .join(offDf, Seq("__pid", "fit"))
      .select(col("doc_id"), col("n_tokens"), col("fit"),
        expr("(__rn + __off - 1) div greatest(fit, 1)").as("bin"))
  }
}

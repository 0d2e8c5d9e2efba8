package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sampling, TextAnalysis}
import graft.table.ManagedTable

/** The LLM training-data pipeline end-to-end (the BASELINE.json north-star
  * workload), composing the extension operators into the standard corpus
  * flow:
  *
  *   raw documents
  *     → text quality scoring (drop low-quality)
  *     → language ID
  *     → exact dedup (normalized fingerprint)
  *     → near-dedup (MinHash LSH → connected components → keeper)
  *     → token accounting
  *     → deterministic train/test split (content-hash)
  *     → managed table partitioned by (lang, split)
  *
  * Every stage is a pure DataFrame transform (no UDFs except none at all),
  * so the whole flow is one lazy plan until the final write; at 100 TB the
  * only shuffles are the dedup candidate joins and the final partitioned
  * write. All decisions are content-deterministic — rerunning on a
  * re-sharded corpus yields byte-identical output.
  */
final class CorpusPipeline(spark: SparkSession, warehouse: String) {

  val corpus = new ManagedTable(spark, s"$warehouse/corpus")

  /** MinHash signatures of every doc currently in the corpus — the state
    * that makes [[runIncremental]] scale with the batch instead of the
    * corpus (the corpus itself is never re-signed or rescanned).
    */
  val signatureStore = new ManagedTable(spark, s"$warehouse/signatures")

  /** Stage 1-2: quality + language annotation. The input is spread across
    * the core count first (guide §2.5 input skew): the annotation
    * expressions are the pipeline's CPU-front and must not inherit a
    * one-partition layout from a small scan; at scale the spread is a
    * no-op.
    */
  def annotate(docs: DataFrame, textCol: String): DataFrame =
    // one projected word split feeds the quality metrics AND the five
    // langId vocab probes (each a higher-order filter evaluated outside
    // codegen CSE — inlined words() would re-split the text per probe)
    TextAnalysis.qualityMetricsOf(
        graft.ops.Spread.toCores(docs)
          .withColumn("__an_w", TextAnalysis.words(col(textCol))),
        textCol, col("__an_w"))
      .withColumn("quality_score",
        least(col("token_count").cast("double") / lit(100.0), lit(1.0))
          * lit(0.5) + col("unique_ratio") * lit(0.5))
      .withColumn("lang_pred", TextAnalysis.langIdOf(col("__an_w")))
      .withColumn("token_estimate", TextAnalysis.tokenEstimate(col(textCol)))
      .drop("__an_w")

  /** Stage 3-4: exact dedup then near-dedup, keeping min-id per cluster.
    * `signatures`: optional precomputed minhash table (one signature pass
    * per corpus, shared across pipeline stages and ad-hoc dedup queries).
    */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
            minEstSim: Double,
            signatures: Option[DataFrame] = None): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val exactKeepers = docs
      .withColumn("fp", fp)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy(idCol)))
      .filter(col("rk") === 1).drop("fp", "rk")
    Dedup.dedupCorpus(exactKeepers, idCol, textCol, minEstSim = minEstSim,
      signatures = signatures)
  }

  /** Full run: annotate → filter → dedup → split → write. Returns the
    * final DataFrame (also persisted to the managed table).
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
          minQuality: Double = 0.5, minEstSim: Double = 0.9,
          trainPct: Int = 90, signatures: Option[DataFrame] = None): DataFrame =
    runObserved(docs, idCol, textCol, minQuality, minEstSim, trainPct,
      signatures)._1

  /** [[run]] with IN-FLIGHT audit metrics (`Dataset.observe`, same pattern
    * as `Medallion.runSilverObserved`): docs/tokens/train-share are
    * accumulated DURING the corpus write — at 100 TB this is the audit
    * that would otherwise cost a second full scan of the written table.
    * Observed on the final pre-write plan only (exactly one action
    * consumes it): mid-pipeline nodes are re-executed by dedup's internal
    * jobs, which would make observed values action-order-dependent.
    */
  def runObserved(docs: DataFrame, idCol: String, textCol: String,
                  minQuality: Double = 0.5, minEstSim: Double = 0.9,
                  trainPct: Int = 90, signatures: Option[DataFrame] = None)
      : (DataFrame, Map[String, Any]) = {
    val annotated = annotate(docs, textCol)
      .filter(col("quality_score") >= minQuality)
    // ONE signature pass feeds both dedup and the store seed below — the
    // explode+hash signing is the pipeline's dominant cost, and computing
    // it a second time over the raw docs would double it
    val sig = signatures.getOrElse(
      Dedup.minhashSignatures(docs, idCol, textCol, n = 3, numHashes = 32))
    val deduped = dedup(annotated, idCol, textCol, minEstSim, Some(sig))
    val obs = new org.apache.spark.sql.Observation("corpus_audit")
    val split = Sampling.hashSplit(deduped, idCol, trainPct)
      .withColumn("split", when(col("is_train"), "train").otherwise("test"))
      .drop("is_train")
      .observe(obs,
        count(lit(1)).as("docs_written"),
        sum(col("token_estimate")).as("tokens_written"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("train_docs"))
    corpus.overwrite(split, Seq("lang_pred", "split"))
    // seed the signature store with the kept docs' signatures so later
    // incremental batches dedup against this corpus without rescanning it
    signatureStore.overwrite(
      sig.join(corpus.read.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi"))
    (corpus.read, obs.get)
  }

  /** Continuous-ingest form: annotate + quality-filter the new batch,
    * near-dedup it against the signature store AND within itself
    * ([[Dedup.dedupIncremental]]), split, append to the corpus, and grow
    * the signature store with the kept docs. Cost scales with the batch —
    * the existing corpus contributes only its signatures to one
    * band-bucket join.
    */
  def runIncremental(newDocs: DataFrame, idCol: String, textCol: String,
                     minQuality: Double = 0.5, minEstSim: Double = 0.9,
                     trainPct: Int = 90,
                     batchId: Option[Long] = None): DataFrame = {
    val annotated = annotate(newDocs, textCol)
      .filter(col("quality_score") >= minQuality)
    val (kept, keptSig) = Dedup.dedupIncremental(
      annotated, idCol, textCol, signatureStore.read, minEstSim = minEstSim)
    val split = Sampling.hashSplit(kept, idCol, trainPct)
      .withColumn("split", when(col("is_train"), "train").otherwise("test"))
      .drop("is_train")
    // keptSig's plan anti-joins against signatureStore's own parquet path;
    // materialize BEFORE appending to that same path so the append job
    // never re-reads the files it is writing (and the dedup isn't
    // recomputed). With a batchId both appends are txn-marked
    // (appendIdempotent): a replay after a crash BETWEEN the two appends
    // re-applies exactly the missing one — without the marker, corpus-
    // then-crash duplicates the batch (its signatures were never stored)
    // and the reverse order would silently DROP it (the docs match their
    // own stored signatures and dedup away).
    val splitM = split.localCheckpoint()
    val sigM = keptSig.localCheckpoint()
    batchId match {
      case Some(id) =>
        corpus.appendIdempotent(splitM, "corpus-ingest", id,
          Seq("lang_pred", "split"))
        signatureStore.appendIdempotent(sigM, "corpus-ingest", id)
      case None =>
        corpus.append(splitM, Seq("lang_pred", "split"))
        signatureStore.append(sigM)
    }
    corpus.read
  }

  /** Continuous corpus ingestion: every micro-batch flows through
    * [[runIncremental]] (annotate → quality filter → dedup against the
    * signature store AND within the batch → split → append), so the live
    * stream and batch loads share one dedup contract. The first batch
    * bootstraps the corpus + signature store via [[run]].
    *
    * Delivery semantics: foreachBatch is at-least-once; both appends are
    * txn-marked with the micro-batch id (exactly-once — a replay after a
    * crash between the corpus and signature appends re-applies only the
    * missing one), and the signature store additionally dedups replayed
    * DOCUMENTS by content (asserted in spec). At 100 TB each trigger
    * costs one band-bucket join against signatures, never a corpus
    * rescan.
    */
  def ingestStream(stream: DataFrame, idCol: String, textCol: String,
                   checkpoint: String,
                   minQuality: Double = 0.5, minEstSim: Double = 0.9,
                   trainPct: Int = 90): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!corpus.exists)
          run(batch, idCol, textCol, minQuality, minEstSim, trainPct)
        else if (!signatureStore.exists)
          // overwriting an EXISTING corpus because its signature sidecar
          // went missing would destroy every previously ingested batch —
          // fail loudly; the operator re-seeds signatures via run() or
          // re-signs the corpus offline
          throw new IllegalStateException(
            s"corpus at ${corpus.path} exists but its signature store is " +
              "missing - refusing to bootstrap-overwrite; re-seed the " +
              "signature store first")
        else
          runIncremental(batch, idCol, textCol, minQuality, minEstSim,
            trainPct, batchId = Some(id))
        ()
      }
      .start()

  /** Corpus accounting: docs + tokens per (lang, split) — the numbers a
    * training run budget needs.
    */
  def stats(): DataFrame =
    corpus.read.groupBy("lang_pred", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("token_estimate")).as("n_tokens"))
      .orderBy("lang_pred", "split")
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for a training-data pipeline over `documents`:
  * exact (hash-groupBy), n-gram Jaccard (inverted-index join), MinHash+LSH
  * (shingle → minhash → band → bucket-join), and SimHash.
  *
  * Scale design (100 TB of documents):
  *  - exact dedup groups on a 128-bit fingerprint, never on the raw text —
  *    the shuffle carries 16 bytes + id per row.
  *  - jaccard/minhash shuffle on shingles/band-buckets, not on document
  *    pairs — candidate generation is the only quadratic-risk step and LSH
  *    bounds it to same-bucket collisions.
  *  - stop-shingle removal (`maxDocFreq`) caps inverted-index skew: a
  *    shingle appearing in half the corpus would otherwise create one hot
  *    reducer with O(n²) pairs.
  *  - everything is built-in expressions + joins: Catalyst keeps map-side
  *    partial aggregation, AQE handles residual skew.
  */
object Dedup {

  /** Exact dedup via whitespace-normalized md5 (SURVEY.md §7.5): one row per
    * distinct fingerprint with the keeper (min id) and multiplicity.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  /** Distinct word n-gram shingles of a text column as an array — the
    * one-pass native expression ([[graft.functions.ShingleArray]]); the
    * old `transform(sequence, i => slice(words, …))` lambda re-tokenized
    * the whole document per shingle (quadratic in doc length — DedupSpec
    * pins the expression twin, the q148 bytes spec carries the 200k-token
    * fixture that exposed it).
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.ShingleArray.shingle_array(text, n)

  /** Spread a narrow (id, text) projection over the full core count before
    * CPU-bound shingling: a small parquet file scans as ONE partition, and
    * inheriting that layout would serialize the per-doc n-gram work. The
    * shuffle moves only the projected columns, and only when the source has
    * fewer partitions than the cluster has slots.
    */
  private def spreadForCpu(df: DataFrame): DataFrame = Spread.toCores(df)

  /** Exploded (id, shingle) inverted index, optionally dropping
    * stop-shingles with document frequency > `maxDocFreq` (0 = keep all;
    * keep-all matches the DuckDB oracle, the cap is the at-scale setting).
    */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String, n: Int,
                   maxDocFreq: Long = 0L): DataFrame = {
    val idx = spreadForCpu(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"),
        explode(shingles(col(textCol), n)).as("s"))
    if (maxDocFreq <= 0) idx
    else {
      val df_ = idx.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDocFreq)
      idx.join(df_, Seq("s"), "left_semi")
    }
  }

  /** Exact n-gram Jaccard near-dup pairs ≥ `minJaccard`, computed with
    * **prefix filtering** (AllPairs/PPJoin family): results are identical
    * to the naive inverted-index self-join, but the candidate join only
    * indexes each document's ⌊(1−t)·n⌋+1 globally-rarest shingles — any
    * pair with J ≥ t must share a prefix shingle, and rare shingles have
    * tiny fanout, so the quadratic hot-shingle blowup of the naive join
    * never materializes. Candidates are then verified with an exact
    * intersection count restricted to the candidate pairs.
    *
    * Join keys are 64-bit shingle hashes (8-byte shuffle keys; corpus-level
    * collision probability ~2^-30 — negligible).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, minJaccard: Double,
                        maxDocFreq: Long = 0L,
                        reuseIndex: Boolean = true,
                        index: Option[DataFrame] = None): DataFrame = {
    // callers verifying several pipelines over one corpus pass the shared
    // pre-hashed [[hashedShingleIndex]] (only valid for the keep-all
    // df regime — a doc-frequency cap filters RAW shingles, which a
    // hashed index no longer has)
    val idx0 = index.filter(_ => maxDocFreq <= 0L).getOrElse(
      shingleIndex(docs, idCol, textCol, n, maxDocFreq)
        .select(col("doc_id"), xxhash64(col("s")).as("s")))
    // The hashed index feeds FOUR shuffle consumers (df, the ranked
    // window, and both verification joins); without materialization each one
    // re-runs the scan + CPU-bound shingling. A lazy local checkpoint
    // computes it once, spills via the block manager, and frees with the
    // RDD — no explicit unpersist in a lazy API. Trade-off: checkpoint
    // blocks are not lineage-recoverable, so on clusters with executor
    // churn pass reuseIndex=false (recompute, full fault tolerance).
    val idx =
      if (reuseIndex && index.isEmpty) idx0.localCheckpoint(eager = false)
      else idx0

    // global rarity order; prefix = the (1-t)n+1 rarest shingles per doc.
    // The per-doc size rides the SAME doc_id window partition the rarity
    // rank already shuffles by (count over an unordered frame adds no
    // exchange) — the former separate sizes aggregate + join re-shuffled
    // the whole index a third time for a number the window had in hand.
    val df_ = idx.groupBy("s").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("s"))
    val byDoc = Window.partitionBy("doc_id")
    val prefix = idx.join(df_, "s")
      .withColumn("rk", row_number().over(byRarity))
      .withColumn("n_sh", count(lit(1)).over(byDoc))
      .filter(col("rk") <= floor((lit(1.0) - minJaccard) * col("n_sh")) + 1)
      .select("doc_id", "s", "n_sh")

    // candidates: pairs whose PREFIXES share a shingle. Prefix filtering
    // (PPJoin Lemma 1): under one global token order, J(x,y) ≥ t implies
    // prefix(x) ∩ prefix(y) ≠ ∅ for prefix length |x| − ⌈t·|x|⌉ + 1, and
    // ⌊(1−t)·|x|⌋ + 1 ≥ that bound — so prefix ⋈ prefix loses no true
    // pair. Joining prefix against the FULL index would be correct too but
    // quadratic in the hot-shingle fanout it exists to avoid.
    // The PPJoin LENGTH filter rides the same join: J ≥ t bounds
    // J ≤ min(n1,n2)/max(n1,n2), so t·max ≤ min — pairs of very
    // different sizes never verify and must not reach the (dominant)
    // verification stage. The 1e-12 slack keeps an exactly-boundary
    // pair on the safe side of double rounding.
    val tSafe = lit(minJaccard - 1e-12)
    val cands = prefix.as("p").join(prefix.as("f"),
        col("p.s") === col("f.s") && col("p.doc_id") =!= col("f.doc_id") &&
          col("p.n_sh") * tSafe <= col("f.n_sh") &&
          col("f.n_sh") * tSafe <= col("p.n_sh"))
      .select(least(col("p.doc_id"), col("f.doc_id")).as("d1"),
        greatest(col("p.doc_id"), col("f.doc_id")).as("d2"))
      .distinct()

    // exact verification: full intersection count for candidate pairs only
    jaccardOverCandidates(idx, cands, minJaccard)
  }

  /** Exact intersection counts + Jaccard ≥ `minJaccard` for candidate
    * pairs against a hashed (doc_id, s) shingle index — the shared
    * verification tail of [[ngramJaccardPairs]] and
    * [[verifyJaccardPairs]]. The index is first SLICED to the documents
    * that actually appear in a candidate pair (one semi-join) and
    * materialized once: both sides of the pair-intersection join then
    * shuffle the slice, not the corpus index, and the per-doc sizes the
    * Jaccard denominator needs fold from the same slice (a doc's slice
    * rows are its complete shingle set). On a corpus where only a
    * fraction of documents have near-dup candidates this removes two
    * full-index shuffles and one full-index aggregate per verification.
    */
  private def jaccardOverCandidates(idx: DataFrame, cands0: DataFrame,
                                    minJaccard: Double): DataFrame = {
    // the candidate plan (a band-bucket or prefix join) feeds THREE
    // consumers here (candDocs twice, the intersection join once) — it
    // must not re-execute per consumer
    val cands = cands0.select("d1", "d2").distinct()
      .localCheckpoint(eager = false)
    val candDocs = cands.select(col("d1").as("doc_id"))
      .union(cands.select(col("d2").as("doc_id"))).distinct()
    // one COMPACT shingle-set row per candidate doc (rows are per-doc
    // distinct by the index contract, so the set size IS n_sh): the
    // pair join then moves |pairs| array rows and computes each
    // intersection with one codegen'd array_intersect — the previous
    // explode-to-(pair × shingle)-then-reaggregate shape shuffled
    // Σ_pairs n_sh rows through a groupBy, the verification tail's
    // dominant cost (465× candidate overgeneration at sf0.1).
    val docSets = idx.join(candDocs, Seq("doc_id"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("s"))).as("sh"))
      .withColumn("n", size(col("sh")).cast("long"))
      .localCheckpoint(eager = false) // both pair-join consumers
    cands
      .join(docSets.select(col("doc_id").as("d1"), col("sh").as("sh1"),
        col("n").as("n1")), "d1")
      .join(docSets.select(col("doc_id").as("d2"), col("sh").as("sh2"),
        col("n").as("n2")), "d2")
      .withColumn("inter",
        size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("d1", "d2", "inter", "jaccard")
  }

  /** Corpus-level duplicated-span removal (the CCNet "dedup lines across
    * shards" pass, re-expressed for word-stream documents): segment each
    * text into consecutive `chunkWords`-word chunks, drop every chunk
    * whose exact text occurs in MORE than one document, and reconstruct
    * the surviving text in original order. Boilerplate (headers, license
    * blocks, navigation) repeats verbatim across pages and is exactly
    * what this removes before training.
    *
    * Scale: explode to (doc, chunk) rows, one map-side-combinable
    * hash-aggregate keyed on the chunk text for the uniqueness flag, a
    * chunk-keyed join back, and one shuffle on doc id for ordered
    * reassembly. No pairwise join anywhere — linear in corpus size. The
    * explode is computed twice (frequency pass + reassembly pass):
    * re-running a columnar scan + split is cheaper at 100 TB than
    * materializing the exploded corpus to disk. At that scale key the
    * aggregation/join on `xxhash64(chunk)` instead of the raw string if
    * chunk payloads dominate the shuffle; semantics are identical modulo
    * 64-bit collisions.
    *
    * Every input doc keeps a row: a fully-boilerplate doc surfaces with
    * empty `clean_text` (so downstream length filters catch it) rather
    * than disappearing.
    */
  def dropDuplicateChunks(docs: DataFrame, idCol: String, textCol: String,
                          chunkWords: Int = 20): DataFrame = {
    // one-pass chunker ([[graft.functions.WordChunks]]) — the old
    // transform/slice lambda re-tokenized the document per chunk
    // (quadratic in doc length, the ShingleArray story at stride cw)
    val chunked = docs
      .select(col(idCol), posexplode(
        graft.functions.WordChunks.word_chunks(col(textCol), chunkWords))
        .as(Seq("chunk_idx", "chunk")))
    // "appears in >1 distinct doc" ⇔ min(doc) != max(doc): a single-phase
    // aggregate with map-side combine — a boilerplate chunk present in
    // millions of docs reduces locally before the shuffle, where
    // countDistinct's two-phase expand (or a window over the chunk) would
    // funnel every occurrence of the hot key to one reducer
    val docFreq = chunked.groupBy("chunk")
      .agg((min(col(idCol)) === max(col(idCol))).as("uniq"))
    val kept = chunked.join(docFreq, Seq("chunk"))
    docs.select(col(idCol))
      .join(
        kept.groupBy(idCol).agg(
          concat_ws(" ", transform(
            array_sort(collect_list(when(col("uniq"),
              struct(col("chunk_idx"), col("chunk"))))),
            s => s.getField("chunk"))).as("clean_text"),
          count(when(col("uniq"), 1)).as("chunks_kept"),
          count(when(!col("uniq"), 1)).as("chunks_dropped")),
        Seq(idCol), "left")
      .na.fill(0L, Seq("chunks_kept", "chunks_dropped"))
      .na.fill("", Seq("clean_text"))
  }

  /** Maximal duplicated-span detection — the token-level EXACT-SUBSTRING
    * pass of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" (arXiv:2107.06499), re-expressed relationally: their
    * suffix-array finds substrings of ≥ threshold tokens occurring more
    * than once in the corpus; HERE every length-`k` word window that
    * occurs more than once (across docs OR repeated within one) is an
    * anchor, and overlapping/touching anchors merge into maximal spans —
    * so any duplicated run of ≥ k tokens is found in full (a run of
    * length L ≥ k is covered by its L−k+1 anchors, which chain into one
    * span), at any alignment, which the boundary-aligned
    * [[dropDuplicateChunks]] cannot see. Emits (doc_id, span_start,
    * span_len), 1-based token positions.
    *
    * Scale: the token explode + `k−1` `lead`s over PER-DOC windows (no
    * global window at any size), one map-side-combinable frequency
    * aggregate on the window text, a semi-join back, and the classic
    * sorted-interval merge as a per-doc running max — linear in corpus
    * tokens, no pairwise anything. At 100 TB key the frequency pass and
    * semi-join on `xxhash64(gram)` instead of the raw string (identical
    * answers modulo 64-bit collisions — the [[dropDuplicateChunks]]
    * shuffle-payload note applies verbatim).
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 8): DataFrame =
    spanIslands(dupSpanInputs(docs, idCol, textCol, k)._2, k)

  /** Sorted-interval union of anchor intervals [p, p+k−1] into maximal
    * (doc_id, span_start, span_len) spans: a new span starts exactly
    * when p clears the furthest end seen so far by ≥ 2 (p > maxPrevP + k
    * ⇔ a ≥ 1-token gap in coverage). Per-doc windows only.
    */
  private def spanIslands(anchors: DataFrame, k: Int): DataFrame = {
    val wnd = Window.partitionBy("doc_id").orderBy("p")
    val maxPrev = max(col("p"))
      .over(wnd.rowsBetween(Window.unboundedPreceding, -1))
    val isl = anchors
      .withColumn("new_span",
        when(maxPrev.isNull || col("p") > maxPrev + k, 1).otherwise(0))
      .withColumn("span",
        sum(col("new_span")).over(
          wnd.rowsBetween(Window.unboundedPreceding, 0)))
    isl.groupBy(col("doc_id"), col("span"))
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + k - 1).as("span_end"))
      .select(col("doc_id"), col("span_start"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** [[duplicatedSpans]]' excision twin: drop every token covered by a
    * duplicated span and reassemble the survivors in order (Lee et al.'s
    * ExactSubstr-CUT). Every input doc keeps a row — a doc that is one
    * big duplicated span surfaces with empty `clean_text` and
    * tokens_kept 0, the [[dropDuplicateChunks]] totality contract. The
    * covered-position explode is bounded: k rows per anchor, k a small
    * constant.
    */
  def exciseDuplicatedSpans(docs: DataFrame, idCol: String,
                            textCol: String, k: Int = 8): DataFrame = {
    val (toks, anchors) = dupSpanInputs(docs, idCol, textCol, k)
    exciseFrom(docs, idCol, toks, anchors, k)
  }

  /** [[exciseDuplicatedSpans]] for a NEW batch against a persisted
    * corpus store — the [[duplicatedSpansIncremental]] exactness law
    * carries over verbatim (the excision is a pure function of the
    * anchors, which are union-exact for batch docs).
    */
  def exciseDuplicatedSpansIncremental(newDocs: DataFrame, idCol: String,
      textCol: String, store: graft.table.ManagedTable): DataFrame = {
    val k = gramStoreK(store)
    val (toks, anchors) =
      dupSpanInputs(newDocs, idCol, textCol, k, Some(store.read))
    exciseFrom(newDocs, idCol, toks, anchors, k)
  }

  private def exciseFrom(docs: DataFrame, idCol: String, toks: DataFrame,
      anchors: DataFrame, k: Int): DataFrame = {
    val covered = anchors.select(col("doc_id"),
        explode(sequence(col("p"), col("p") + k - 1)).as("p"))
      .distinct()
    val kept = toks.join(covered, Seq("doc_id", "p"), "left_anti")
    val totals = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    docs.select(col(idCol).as("doc_id"))
      .join(kept.groupBy("doc_id").agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("p"), col("w")))),
          s => s.getField("w"))).as("clean_text"),
        count(lit(1)).as("tokens_kept")), Seq("doc_id"), "left")
      .join(totals, Seq("doc_id"), "left")
      .na.fill(0L, Seq("tokens_kept", "n_tokens"))
      .na.fill("", Seq("clean_text"))
      .select(col("doc_id"), col("clean_text"), col("tokens_kept"),
        (col("n_tokens") - col("tokens_kept")).as("tokens_dropped"))
  }

  /** The 1-based token stream and the full k-window gram stream — both
    * lazily materialized (the token explode has two consumers in the
    * excision path; the gram stream feeds the frequency pass AND the
    * semi-join back).
    */
  private def gramStream(docs: DataFrame, idCol: String,
      textCol: String, k: Int): (DataFrame, DataFrame) = {
    require(k >= 2, s"span anchor length k must be >= 2, got $k")
    // spread BEFORE the explode: the per-doc window below re-shuffles by
    // doc_id anyway, so parallelizing the split+explode adds no exchange
    // to the plan shape — it only un-serializes the CPU on narrow scans
    val toks = Spread.toCores(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.words(col(textCol))).as(Seq("p0", "w")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("w"))
      .localCheckpoint(eager = false)
    val wnd = Window.partitionBy("doc_id").orderBy("p")
    val parts = col("w") +:
      (1 until k).map(j => lead(col("w"), j).over(wnd))
    val grams = toks
      .withColumn("gram", concat_ws(" ", parts: _*))
      .withColumn("wlast", lead(col("w"), k - 1).over(wnd))
      // only FULL k-windows anchor (concat_ws silently skips the nulls
      // of a trailing partial window — the explicit last-word guard is
      // the correctness line)
      .filter(col("wlast").isNotNull)
      .select(col("doc_id"), col("p"), col("gram"))
      .localCheckpoint(eager = false)
    (toks, grams)
  }

  /** The shared front half of the span pair: the token stream plus the
    * duplicate anchors — positions whose k-window text occurs > 1 time
    * counting THESE docs and, when `extraCounts` (gram, c) is supplied,
    * the occurrences an external store already holds (the incremental
    * screen: total = batch + corpus).
    */
  private def dupSpanInputs(docs: DataFrame, idCol: String,
      textCol: String, k: Int,
      extraCounts: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val (toks, grams) = gramStream(docs, idCol, textCol, k)
    val freq = grams.groupBy("gram").agg(count(lit(1)).as("__bc"))
    val dup = extraCounts match {
      case None => freq.filter(col("__bc") > 1).select("gram")
      case Some(store) =>
        freq.join(store.select(col("gram"), col("c").as("__sc")),
            Seq("gram"), "left")
          .filter(col("__bc") + coalesce(col("__sc"), lit(0L)) > 1)
          .select("gram")
    }
    val anchors = grams.join(dup, Seq("gram"), "left_semi")
      .select("doc_id", "p")
    (toks, anchors)
  }

  /** Persist a corpus's k-gram occurrence counts as a managed table —
    * the continuous-ingest side of [[duplicatedSpans]]. Occurrence
    * counts are additive (the same algebra [[NgramLm.updateLm]] rides),
    * so the store folds new batches in with one MERGE
    * ([[updateGramStore]]) and [[duplicatedSpansIncremental]] screens
    * each batch against the WHOLE corpus at cost ∝ batch + the touched
    * store partitions — never a rescan of the corpus. At 100 TB store
    * `xxhash64(gram)` instead of raw text if the store size dominates
    * (identical answers modulo 64-bit collisions).
    */
  def saveGramStore(spark: org.apache.spark.sql.SparkSession, path: String,
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): graft.table.ManagedTable = {
    val t = new graft.table.ManagedTable(spark, path)
    val counts = gramStream(docs, idCol, textCol, k)._2
      .groupBy("gram").agg(count(lit(1)).as("c"))
    t.overwrite(counts)
    t.setProperties(Map(
      "graft.spanstore.k" -> k.toString,
      // countFast: exact row count from file metadata (minus DVs) — the
      // read.count() it replaces re-scanned the store it just wrote
      "graft.spanstore.grams" -> t.countFast().toString))
    t
  }

  /** Fold a new batch's k-gram counts into a persisted store IN PLACE —
    * exactly equivalent to rebuilding over the union (counts are
    * additive and the store is never pruned). One MERGE on gram.
    */
  def updateGramStore(t: graft.table.ManagedTable, newDocs: DataFrame,
      idCol: String, textCol: String): Unit = {
    val k = gramStoreK(t)
    val delta = gramStream(newDocs, idCol, textCol, k)._2
      .groupBy("gram").agg(count(lit(1)).as("c"))
    t.mergeBuilder(delta, Seq("gram"))
      .whenMatchedUpdate(Map("c" -> "t.c + s.c"))
      .whenNotMatchedInsertAll()
      .execute()
    t.setProperties(Map(
      "graft.spanstore.grams" -> t.countFast().toString))
  }

  private def gramStoreK(t: graft.table.ManagedTable): Int =
    t.properties.getOrElse("graft.spanstore.k",
      throw new IllegalArgumentException(
        s"${t.path} is not a persisted k-gram store " +
          "(no graft.spanstore.k property)")).toInt

  /** [[duplicatedSpans]] for a NEW batch against a persisted corpus
    * store: a batch window is an anchor iff its occurrences in
    * batch + store exceed one — for batch documents this is EXACTLY the
    * spans [[duplicatedSpans]] over (corpus ∪ batch) would emit
    * (spec-pinned), at cost ∝ the batch. k comes from the store's
    * declaration (one k per store — mixed-k probes cannot be exact).
    */
  def duplicatedSpansIncremental(newDocs: DataFrame, idCol: String,
      textCol: String, store: graft.table.ManagedTable): DataFrame = {
    val k = gramStoreK(store)
    spanIslands(
      dupSpanInputs(newDocs, idCol, textCol, k, Some(store.read))._2, k)
  }

  /** Benchmark-contamination screen — the eval-leakage gate of a training
    * pipeline: for each corpus doc, the fraction of its n-gram shingles
    * that appear anywhere in the benchmark set. Join keys are 64-bit
    * shingle hashes (8-byte shuffle keys, like [[ngramJaccardPairs]]); the
    * benchmark side reduces to its distinct shingles — typically tiny, so
    * Catalyst broadcasts the semi-join at scale.
    */
  def contamination(docs: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    val di = shingleIndex(docs, idCol, textCol, n)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    val bi = shingleIndex(bench, idCol, textCol, n)
      .select(xxhash64(col("s")).as("s")).distinct()
    val sizes = di.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val hits = di.join(bi, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    sizes.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_sh"))
          .as("contamination"))
  }

  /** [[contamination]] with a BLOOM PRE-FILTER on the corpus side — the
    * same exact result (a bloom has no false negatives, and surviving
    * candidates still pass the exact semi-join), but the corpus→join
    * shuffle carries only shingles that MIGHT hit the benchmark instead
    * of every shingle in the corpus. The regime this buys: a benchmark
    * set too large for Catalyst to broadcast as a hash relation (where
    * [[contamination]]'s semi-join degrades to a full corpus shuffle)
    * whose bloom still broadcasts — ~10 bits/item at 1% fpp vs ~32+
    * bytes/key hashed, a ~25× reach extension. At 100 TB of docs vs a
    * 1e9-shingle benchmark: the bloom is ~1.2 GB broadcast once; the
    * shuffle shrinks from every corpus shingle to true hits + the fpp
    * share of misses.
    *
    * The probe has two venues, picked by the bloom's serialized size:
    * below `maxLiteralBytes` it is Spark's own codegen'd
    * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * over the already-64-bit shingle hashes, with the filter shipped as a
    * binary plan literal (Spark's injected runtime bloom joins ship
    * theirs through the same expression). A plan literal rides in the
    * logical/physical plan and in EVERY serialized task binary, though —
    * at the 1e9-shingle regime the bloom is ~1.2 GB, which a literal
    * would drag through the driver's plan copies and each task's
    * serialization instead of a once-per-executor fetch. Above the gate
    * the bloom therefore ships as a TorrentBroadcast (chunked,
    * fetched once per executor) probed by a deterministic UDF — the
    * probe loses whole-stage codegen, but one virtual call per row is
    * noise next to the shuffle it prevents, and the literal path's cost
    * profile at that size is not "slower", it is driver OOM.
    *
    * `expectedItems ≤ 0` sizes the bloom from a benchmark count — one
    * extra pass over the (small) benchmark side, never the corpus.
    */
  def contaminationBloom(docs: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int = 3,
                         expectedItems: Long = -1L,
                         fpp: Double = 0.01,
                         maxLiteralBytes: Long = 32L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val di = shingleIndex(docs, idCol, textCol, n)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    // the benchmark index has THREE consumers (count, bloom build, exact
    // semi-join): materialize it once (the jaccardOverCandidates
    // discipline) — it is the small side by contract. The corpus index
    // stays dual-pass (sizes + hits) like [[contamination]]: at 100 TB,
    // re-scanning beats materializing a corpus-sized intermediate.
    val bi = shingleIndex(bench, idCol, textCol, n)
      .select(xxhash64(col("s")).as("s")).distinct()
      .localCheckpoint(true)
    val items = if (expectedItems > 0) expectedItems
      else math.max(1L, bi.count())
    val bf = bi.stat.bloomFilter("s", items, fpp)
    val mightHit = if (bf.bitSize() / 8 <= maxLiteralBytes) {
      val bytes = {
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos); bos.toByteArray
      }
      column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.Literal(bytes,
            org.apache.spark.sql.types.BinaryType),
          expression(col("s"))))
    } else {
      val bfB = docs.sparkSession.sparkContext.broadcast(bf)
      udf((s: Long) => bfB.value.mightContainLong(s)).apply(col("s"))
    }
    val sizes = di.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val hits = di.filter(mightHit) // no false negatives: exact after verify
      .join(bi, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    sizes.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_sh"))
          .as("contamination"))
  }

  /** [[contamination]] over a MANAGED corpus with per-file SHINGLE-BLOOM
    * file skipping ([[graft.table.ManagedTable.addShingleBloomIndex]]) —
    * the same exact answer, but corpus files whose filter answers a
    * definite no for EVERY benchmark shingle are never opened for their
    * text at all: today's bloom prefilter ([[contaminationBloom]]) prunes
    * the SHUFFLE, this prunes the SCAN. Complementary regimes: this path
    * collects the benchmark's distinct shingle hashes to the driver (the
    * benchmark is the SMALL side by contract — q82's broadcast regime);
    * the too-big-to-collect benchmark stays with [[contaminationBloom]].
    *
    * Exactness: a skipped file provably shares no shingle with the
    * benchmark, so its docs score contamination 0 — they enter the result
    * through a doc_id-ONLY scan of the skipped files (column pruning
    * makes that the cheap column; the text column, which dominates a
    * document table's bytes, is read only for surviving files). At 100 TB
    * with a selective benchmark the scan reduction is the whole win; with
    * an unselective one every file survives and the plan degrades to
    * exactly [[contamination]].
    *
    * Consistency model: VERSION-PINNED. One version v is captured at
    * entry and every step — live-set resolution, bloom probe, the
    * kept/skipped scans, deletion-vector application — evaluates against
    * recon(v) through the manifest-pinned reader
    * ([[graft.table.ManagedTable.readFileSubset]]): a concurrent
    * OPTIMIZE/PURGE retires files by rename and the pinned paths resolve
    * through the retained snapshot dirs, a DV committed after entry
    * belongs to a later version and never applies, and v's own DVs DO
    * apply on both the kept and the skipped scans — so the screen needs
    * no settled-table caveat and no DV fallback. (Like any pinned read,
    * the returned plan resolves at build time: a VACUUM that drops v's
    * snapshot dirs mid-query still fails the scan, Delta's contract.)
    *
    * A doc_id whose ROWS straddle a kept and a skipped file (duplicate
    * ids across files) scores over the UNION of its shingles, exactly
    * like the plain screen: straddlers are detected with id-only scans
    * and re-scored from a targeted id-filtered pass; above
    * `maxStraddlers` (plan-literal safety bound) the whole call falls
    * back to the plain screen at v — exact either way.
    *
    * Column-mapped corpora take the SAME skipping path: the index is
    * built and declared on the stable PHYSICAL column name, the probe
    * translates the logical name at lookup, and the kept/skipped scans go
    * through the manifest-pinned reader, which maps physical→logical like
    * any managed read. Falls back to the plain screen over `corpus.read`
    * only when the corpus is a shallow clone (its files live outside the
    * clone root and the index keys the source paths) or has no matching
    * index declaration.
    */
  def contaminationIndexed(corpus: graft.table.ManagedTable, bench: DataFrame,
                           idCol: String, textCol: String, n: Int = 3,
                           maxStraddlers: Int = 10000)
      : DataFrame =
    contaminationIndexedHooked(corpus, bench, idCol, textCol, n,
      maxStraddlers, () => ())

  /** [[contaminationIndexed]] with a post-probe hook — the test seam the
    * concurrency spec uses to land a mutation between the bloom probe
    * and the scan construction (the window the version pinning closes).
    */
  private[graft] def contaminationIndexedHooked(
      corpus: graft.table.ManagedTable, bench: DataFrame,
      idCol: String, textCol: String, n: Int,
      maxStraddlers: Int, afterProbe: () => Unit): DataFrame = {
    val spark = bench.sparkSession
    import spark.implicits._
    // fallback check BEFORE the benchmark key collection — a clone corpus
    // must not pay a wasted bench-wide Spark job first
    if (corpus.isShallowClone)
      return contamination(corpus.read, bench, idCol, textCol, n)
    def empty0() = Seq.empty[(Long, Double)].toDF("doc_id", "contamination")
    // pin ONE version: every step below resolves against recon(v)
    val v = corpus.version
    if (v < 0) return empty0() // no commit yet: nothing to screen
    val files = corpus.manifestFiles(v)
    val keys = shingleIndex(bench, idCol, textCol, n)
      .select(xxhash64(col("s")).as("s")).distinct()
      .as[Long].collect()
    val (kept, all) = corpus.shingleFilesMightHit(textCol, n, keys, files)
    val skipped = all.filterNot(kept.toSet)
    afterProbe()
    def scan(fl: Seq[String]) = corpus.readFileSubset(v, fl)
    if (kept.isEmpty && skipped.isEmpty) return empty0()
    if (kept.isEmpty)
      // DISTINCT, not row-per-row: the plain screen emits one row per
      // doc_id (every row yields ≥1 shingle), duplicate rows collapse
      return scan(skipped).select(col(idCol).as("doc_id")).distinct()
        .select(col("doc_id"), lit(0.0).as("contamination"))
    if (skipped.isEmpty)
      return contamination(scan(kept).select(idCol, textCol), bench,
        idCol, textCol, n)
    // both sides present: ids straddling them must score over the UNION
    // of their shingles (the plain screen's one-group-per-doc semantics).
    // The skipped side is BY DESIGN the bulk of the corpus, and its
    // distinct id set has TWO consumers — the straddler semi-join at
    // build and the zeros plan the caller executes — so it is
    // materialized once with a lazy local checkpoint (the same idiom as
    // the shared shingle index above: computes on first use, spills via
    // the block manager, frees with the RDD). One id-column scan over
    // the skipped files serves both; the zeros the caller reads are
    // PINNED to this build-time scan — consistent by construction, since
    // every path here resolves against recon(v) anyway (verdict r13).
    // keptIds likewise feeds the null probe and the semi-join.
    val skippedIds = scan(skipped).select(col(idCol).as("doc_id")).distinct()
      .localCheckpoint(eager = false)
    val keptIds = scan(kept).select(col(idCol).as("doc_id")).distinct()
      .localCheckpoint(eager = false)
    // null ids are invisible to the equi-join/isin straddler machinery
    // (SQL null semantics) while the plain screen groups them — fall
    // back at the SAME pinned version, exactness over cleverness.
    // distinct() keeps a null id as a value, so probing the two id sets
    // covers the whole corpus without the corpus-wide extra id pass this
    // probe used to pay (advice r13 — the schema-nullable gate it
    // replaced was always-true on parquet file sources).
    if (skippedIds.filter(col("doc_id").isNull).limit(1).count() > 0 ||
        keptIds.filter(col("doc_id").isNull).limit(1).count() > 0)
      return contamination(scan(all).select(idCol, textCol), bench,
        idCol, textCol, n)
    val straddlers = skippedIds.join(keptIds, Seq("doc_id"), "left_semi")
      .limit(maxStraddlers + 1).collect().map(_.get(0)).toSeq
    if (straddlers.size > maxStraddlers)
      // more duplicate-id spill than an isin literal should carry — the
      // plain screen at the SAME pinned version stays exact
      return contamination(scan(all).select(idCol, textCol), bench,
        idCol, textCol, n)
    // zeros = skipped ids minus the (already collected, ≤ cap) straddler
    // set — an isin against the in-hand literals over the CHECKPOINTED
    // id set (the probes above already materialized it, so executing the
    // returned plan reads blocks, not the skipped files' id column a
    // second time), NOT an anti-join that would re-scan the KEPT side's
    // ids when the plan executes
    val zeros = (if (straddlers.isEmpty) skippedIds
      else skippedIds.filter(!col("doc_id").isin(straddlers: _*)))
      .select(col("doc_id"), lit(0.0).as("contamination"))
    val exactKept =
      if (straddlers.isEmpty)
        contamination(scan(kept).select(idCol, textCol), bench,
          idCol, textCol, n)
      else contamination(
        scan(kept).filter(!col(idCol).isin(straddlers: _*))
          .select(idCol, textCol), bench, idCol, textCol, n)
    val exactStraddlers =
      if (straddlers.isEmpty) None
      // id-filtered pass over BOTH sides: parquet row-group stats prune
      // the skipped files' text reads down to the straddler rows
      else Some(contamination(
        scan(all).filter(col(idCol).isin(straddlers: _*))
          .select(idCol, textCol), bench, idCol, textCol, n))
    exactStraddlers.foldLeft(exactKept.unionByName(zeros))(_ unionByName _)
  }

  /** Mersenne prime 2^31−1 for the minhash universal-hash family: products
    * stay ≤ (2^31)^2 < 2^63, so no 64-bit overflow under ANSI mode
    * (Spark 4 default).
    */
  private val MersenneP = 2147483647L

  /** Deterministic MinHash parameters (seeded; SURVEY.md §7.6.3 — all our
    * randomness is seeded). a ∈ [1, p−1], b ∈ [0, p−1].
    */
  private def hashParams(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(numHashes)((1L + r.nextLong(MersenneP - 1), r.nextLong(MersenneP)))
  }

  /** MinHash signature column: sig[i] = min over shingles of
    * (a_i * (xxhash64(shingle) mod p) + b_i) mod p — the classic universal
    * hash family, overflow-free. Pure expressions — codegen'd, no UDF.
    */
  def minhashSignature(text: Column, n: Int, numHashes: Int, seed: Long = 42L): Column = {
    val hashes = transform(shingles(text, n), s => pmod(xxhash64(s), lit(MersenneP)))
    array(hashParams(numHashes, seed).map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(MersenneP))))
    }: _*)
  }

  /** MinHash signatures as a table: explode shingles, hash once, then one
    * codegen'd hash aggregate with `numHashes` MIN columns. Values are
    * identical to [[minhashSignature]], but the plan is the scalable one:
    * higher-order array functions are CodegenFallback (interpreted, and the
    * shared shingle-hash subtree would be re-evaluated per hash function),
    * while explode + groupBy-MIN gets whole-stage codegen and map-side
    * partial aggregation — at 100 TB the shuffle carries one partially
    * minimized row per (doc × reducer), not the shingle set.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int, seed: Long = 42L): DataFrame = {
    val params = hashParams(numHashes, seed)
    val exploded = spreadForCpu(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), explode(shingles(col(textCol), n)).as("s"))
      .withColumn("h", pmod(xxhash64(col("s")), lit(MersenneP)))
    val mins = params.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MersenneP))).as(s"__m$i")
    }
    exploded.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: split the signature into `bands` bands, bucket by
    * (band index, band hash), pair up docs sharing a bucket, then estimate
    * similarity as the fraction of equal minhashes and keep ≥ `minEstSim`.
    * Shuffles on band buckets only — never materializes the full pair
    * space.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                      minEstSim: Double = 0.5, seed: Long = 42L): DataFrame =
    minhashLshPairsFromSignatures(
      minhashSignatures(docs, idCol, textCol, n, numHashes, seed),
      numHashes, bands, minEstSim)

  /** LSH banding over a PRECOMPUTED signature table (doc_id, sig) — lets one
    * signature pass feed q26-style pair mining, corpus dedup, and the full
    * pipeline without recomputing the explode-heavy signature subplan
    * (signatures are per-doc values, independent of corpus membership, so a
    * cached table semi-joined to any doc subset is exact).
    */
  /** Explode a signature table into (doc_id, sig, band, bh) band-bucket
    * rows — the LSH join key material shared by the self-join and the
    * across-corpora variants.
    */
  private def bandBuckets(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    sig.select(col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        bi => struct(bi.as("band"), xxhash64(slice(col("sig"), bi * r + 1, lit(r))).as("bh"))))
        .as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bh"))
  }

  def minhashLshPairsFromSignatures(sig: DataFrame, numHashes: Int = 32,
                                    bands: Int = 8,
                                    minEstSim: Double = 0.5): DataFrame = {
    val banded = bandBuckets(sig, numHashes, bands)
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
          eq => eq)).cast("double") / numHashes).as("est_sim"))
      // filter BEFORE the dedup shuffle: est_sim is a pure function of the
      // pair (identical whichever band emitted it), so pre-filtering
      // changes nothing semantically and the distinct only shuffles pairs
      // that can survive
      .filter(col("est_sim") >= minEstSim)
      .dropDuplicates("d1", "d2")
  }

  /** Exact-Jaccard verification of a CANDIDATE pair set — the second half
    * of every LSH dedup pipeline: for exactly the given (d1, d2) pairs,
    * compute the exact `n`-gram shingle intersection and Jaccard and keep
    * pairs at or above `minJaccard`. Same output contract as
    * [[ngramJaccardPairs]]'s verification tail, so when the candidate
    * generator provably loses no qualifying pair (e.g. one-row bands — a
    * J ≥ 0.8 pair misses only if all 32 minhashes differ, p ≈ 0.2³²),
    * the result EQUALS the exact all-pairs answer — which is what puts
    * the MinHash/SimHash pipelines under a SQL oracle while only the
    * signature values themselves stay engine-specific.
    *
    * Scale: two joins of the candidate set (small — only docs with a
    * near-dup) against the hashed shingle index; never all-pairs.
    */
  /** The hashed (doc_id, shingle-hash) index [[verifyJaccardPairs]]
    * verifies against — exposed so callers verifying SEVERAL candidate
    * sets over one corpus (minhash + simhash pipelines) build and
    * materialize it once.
    */
  def hashedShingleIndex(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame =
    shingleIndex(docs, idCol, textCol, n, 0L)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))

  def verifyJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                         cands: DataFrame, n: Int, minJaccard: Double,
                         index: Option[DataFrame] = None): DataFrame = {
    val idx = index.getOrElse(hashedShingleIndex(docs, idCol, textCol, n)
      .localCheckpoint(eager = false))
    jaccardOverCandidates(idx, cands, minJaccard)
  }

  /** Connected components over near-dup pairs: every doc's label converges
    * to the smallest doc_id in its component.
    *
    * Two regimes: the near-dup pair graph is tiny relative to the corpus
    * (it only contains documents with a duplicate), so up to
    * `maxDriverEdges` the component labels come from a driver-side
    * union-find over the collected edges — one job instead of two shuffles
    * per propagation iteration. Beyond that, distributed min-label
    * propagation takes over (iterations bounded by component diameter,
    * lineage truncated per step). Identical output either way.
    */
  def components(pairs: DataFrame, maxIter: Int = 25,
                 maxDriverEdges: Long = 1000000L): DataFrame = {
    // materialize once: the (possibly expensive) candidate-pair plan would
    // otherwise be re-executed by every iteration's jobs
    val edges = pairs.select(col("d1"), col("d2"))
      .union(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      .localCheckpoint()
    // Driver union-find only for bigint ids (collected as primitive pairs);
    // any other id type takes the type-generic distributed path.
    val idsAreLong = edges.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (idsAreLong && edges.count() <= maxDriverEdges)
      return componentsDriver(pairs.sparkSession, edges)
    var labels = edges.select(col("d1").as("id")).distinct()
      .withColumn("label", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges.join(labels, edges("d2") === labels("id"))
        .groupBy(col("d1").as("id2")).agg(min("label").as("nbr_label"))
      val updated = labels.join(nbrMin, labels("id") === nbrMin("id2"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint() // truncate lineage per iteration
      converged = updated.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).isEmpty
      labels = updated
      i += 1
    }
    // an unconverged result silently under-dedups (long duplicate chains
    // keep several copies per cluster) — min-label propagation needs one
    // iteration per component diameter, so fail loudly and name the knob
    require(converged, s"connected components did not converge within " +
      s"$maxIter iterations - a duplicate cluster's diameter exceeds the " +
      "cap; raise maxIter")
    labels
  }

  /** Driver-side union-find for small pair graphs (see [[components]]). */
  private def componentsDriver(spark: org.apache.spark.sql.SparkSession,
                               edges: DataFrame): DataFrame = {
    import spark.implicits._
    // collect as specialized (Long, Long) tuples, not boxed Rows
    val es = edges.toDF("_1", "_2").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-root union
    }
    val labels = parent.keys.toSeq.map(id => (id, find(id)))
    labels.toDF("id", "label")
  }

  /** New-batch doc ids that near-match ANY existing-corpus doc, via the
    * band-bucket join of the two signature tables — the existing corpus is
    * represented only by its (small) signature store, never rescanned.
    */
  def minhashMatchesAcross(newSig: DataFrame, existingSig: DataFrame,
                           numHashes: Int = 32, bands: Int = 8,
                           minEstSim: Double = 0.9): DataFrame = {
    val a = bandBuckets(newSig, numHashes, bands).as("a")
    val b = bandBuckets(existingSig, numHashes, bands).as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(col("a.doc_id").as("doc_id"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
          eq => eq)).cast("double") / numHashes).as("est_sim"))
      .filter(col("est_sim") >= minEstSim)
      .select("doc_id").distinct()
  }

  /** Incremental corpus dedup — the daily-ingest form: drop new docs that
    * near-match the EXISTING corpus (via its signature table), then
    * near-dedup WITHIN the surviving batch. Returns the kept new docs and
    * their signatures (append them to the signature store for the next
    * batch). Cost scales with the batch, not the corpus: the corpus
    * contributes only its signatures to one band-bucket join.
    */
  def dedupIncremental(newDocs: DataFrame, idCol: String, textCol: String,
                       existingSignatures: DataFrame,
                       n: Int = 3, minEstSim: Double = 0.9,
                       signatures: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val newSig = signatures.map(
        _.join(newDocs.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi"))
      .getOrElse(minhashSignatures(newDocs, idCol, textCol, n, numHashes = 32))
      .localCheckpoint() // used by the cross join, the batch dedup, and the return
    val dupOfExisting = minhashMatchesAcross(newSig, existingSignatures,
      minEstSim = minEstSim)
    val fresh = newDocs.join(dupOfExisting,
      newDocs(idCol) === dupOfExisting("doc_id"), "left_anti")
    val kept = dedupCorpus(fresh, idCol, textCol, n = n, minEstSim = minEstSim,
      signatures = Some(newSig))
    val keptSig = newSig.join(kept.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi")
    (kept, keptSig)
  }

  /** End-to-end corpus dedup: candidate pairs (MinHash LSH) → connected
    * components → keep the min-id doc per component. Returns the kept docs.
    * Pass `signatures` (a precomputed (doc_id, sig) table, e.g. persisted
    * once per corpus) to skip the signature pass; it is semi-joined to
    * `docs` so any subset is handled exactly.
    */
  def dedupCorpus(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, minEstSim: Double = 0.9,
                  signatures: Option[DataFrame] = None): DataFrame = {
    val pairs = signatures match {
      case Some(sig) =>
        val subset = sig.join(docs.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi")
        minhashLshPairsFromSignatures(subset, minEstSim = minEstSim)
      case None => minhashLshPairs(docs, idCol, textCol, n = n, minEstSim = minEstSim)
    }
    val comp = components(pairs)
    val losers = comp.filter(col("id") =!= col("label")).select(col("id"))
    docs.join(losers, docs(idCol) === losers("id"), "left_anti")
  }

  /** 64-bit SimHash from word-level xxhash64: per bit, sum +1/−1 over
    * tokens, set the bit if positive. Computed by the single-pass
    * [[graft.functions.SimHashAgg]] typed aggregate (one primitive buffer
    * per doc, element-wise-add partial merge).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    spreadForCpu(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), explode(TextAnalysis.words(col(textCol))).as("w"))
      .withColumn("h", xxhash64(col("w")))
      .groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhash_agg(col("h")).as("simhash"))

  /** The 64-conditional-SUM-columns formulation of [[simhash]] — kept as
    * the cross-check reference implementation (values proven identical in
    * spec).
    */
  def simhashViaColumns(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.words(col(textCol))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = exploded.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 64).foldLeft(lit(0L)) { (acc, i) =>
      acc + when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)
    }
    agg.select(col("doc_id"), sh.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxDist`, candidates
    * generated by matching any of `chunks` equal-width signature chunks
    * (pigeonhole: distance ≤ chunks−1 guarantees one equal chunk; the
    * shuffle is on chunk buckets). The default 4×16-bit split is the
    * production shape — 65k bucket values keep the per-bucket fanout
    * tiny at corpus scale; more/narrower chunks widen the guaranteed
    * radius (16 chunks ⇒ recall 1 through distance 15) at the cost of
    * hotter buckets — the oracle-anchor configuration (q27a), not the
    * 100 TB one.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, chunks: Int = 4): DataFrame = {
    require(64 % chunks == 0, s"chunks must divide 64, got $chunks")
    val width = 64 / chunks
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val sh = simhash(docs, idCol, textCol)
    val chunkCols = (0 until chunks).map { ci =>
      struct(lit(ci).as("chunk"),
        shiftright(col("simhash"), ci * width).bitwiseAND(lit(mask)).as("cv"))
    }
    val chunked = sh.select(col("doc_id"), col("simhash"),
      explode(array(chunkCols: _*)).as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk"), col("cc.cv"))
    val a = chunked.as("a"); val b = chunked.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** SimHash candidates by multi-index single-bit probing (the HmSearch
    * family): block on each 16-bit signature chunk exactly AND on every
    * single-bit flip of it. A pair within Hamming distance 7 has some
    * chunk differing in ≤ 1 bit (pigeonhole over 4 chunks: all-≥2 would
    * mean distance ≥ 8), and distance-≤1 chunks collide by construction —
    * recall 1 through distance 7 while bucket keys keep the full 16-bit
    * value space. This is the WIDE-radius scale path: relaxing
    * [[simhashPairs]] to narrower chunks widens its guarantee but
    * collapses the key space (8-bit chunks measured 5.1M candidate pairs
    * on 5k docs — hot common-byte buckets go quadratic); probing pays a
    * fixed 17× probe-row fanout instead, never a hot-value blowup.
    */
  def simhashPairsProbing(docs: DataFrame, idCol: String, textCol: String,
                          maxDist: Int = 7): DataFrame = {
    require(maxDist <= 7,
      "4×16-bit chunks with 1-bit probes guarantee recall only through " +
        s"Hamming distance 7, got $maxDist")
    val sh = simhash(docs, idCol, textCol)
    val exact = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(ci => struct(lit(ci).as("ci"),
        shiftright(col("simhash"), ci * 16).bitwiseAND(lit(0xFFFFL)).as("cv"))): _*))
        .as("e"))
      .select(col("doc_id"), col("simhash"), col("e.ci"), col("e.cv"))
    // probe rows: the exact chunk value plus its 16 single-bit flips; a
    // distance-1 chunk pair collides through EITHER side's flip, so the
    // one-directional d1 < d2 cut below loses no pair
    val probes = exact.select(col("doc_id").as("d1"),
        col("simhash").as("sig1"), col("ci"),
        explode(concat(array(col("cv")),
          expr("transform(sequence(0, 15), j -> cv ^ shiftleft(1L, j))")))
          .as("cv"))
    probes.join(exact, Seq("ci", "cv"))
      .filter(col("d1") < col("doc_id"))
      .select(col("d1"), col("doc_id").as("d2"),
        bit_count(col("sig1").bitwiseXOR(col("simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic dedup over
    * an embedding store: assign every vector to its nearest centroid,
    * compute pairwise cosine ONLY within each cluster, and drop a vector
    * when a lower-id same-cluster neighbor sits at cosine ≥ `minCos`
    * (whether or not that neighbor itself survives — the greedy rule that
    * keeps the semantics join-expressible instead of needing transitive
    * closure). Returns the kept (idCol, assigned_label) rows.
    *
    * Scale design: the clustering is what makes embedding dedup tractable
    * at 100 TB — the only join is an equi-join on `assigned_label`, so the
    * quadratic cost is bounded per cluster (pick k ≈ corpus/«a few
    * thousand»; the paper runs k = 11k on LAION). Assignment is a
    * broadcast of the metadata-sized codebook over a linear scan
    * ([[Embeddings.assignToCentroids]]); norms are precomputed per row,
    * never per pair. One pathologically hot cluster is the skew risk —
    * split it by re-clustering within, don't raise minCos.
    */
  def semDedup(embeddings: DataFrame, idCol: String, vecCol: String,
               cents: DataFrame, minCos: Double): DataFrame = {
    val assigned = Embeddings.assignToCentroids(embeddings, idCol, vecCol, cents)
      .select(col(idCol), col("assigned_label"))
    val e = embeddings.select(col(idCol), col(vecCol)).join(assigned, Seq(idCol))
    val a = e.select(col("assigned_label"), col(idCol).as("__id"),
      col(vecCol).as("__v"), Similarity.norm(col(vecCol)).as("__na"))
    val b = e.select(col("assigned_label"), col(idCol).as("__id2"),
      col(vecCol).as("__v2"), Similarity.norm(col(vecCol)).as("__nb"))
    val dominated = a.join(b, Seq("assigned_label"))
      .filter(col("__id2") < col("__id") &&
        Similarity.dot(col("__v"), col("__v2")) / (col("__na") * col("__nb")) >= minCos)
      .select(col("__id").as(idCol)).distinct()
    e.select(col(idCol), col("assigned_label"))
      .join(dominated, Seq(idCol), "left_anti")
  }

  /** [[semDedup]] for a corpus with no given clustering: fit the
    * deterministic k-means codebook first ([[Embeddings.kmeansFit]]) and
    * dedup within the learned clusters — the full SemDeDup recipe.
    */
  def semDedupAuto(embeddings: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int, minCos: Double): DataFrame =
    semDedup(embeddings, idCol, vecCol,
      Embeddings.kmeansFit(embeddings, idCol, vecCol, k, iters), minCos)

  /** Exact dedup with quality-aware keeper selection: group on the
    * normalized fingerprint and keep the highest-`scoreCol` copy (ties →
    * lowest id) instead of [[exact]]'s min-id convention — the dedup that
    * keeps the clean copy and discards the boilerplate-damaged one.
    * Returns the kept rows (all input columns) plus their `dup_count`.
    * The windows run per fingerprint group — duplicate sets, never the
    * corpus — so partitions stay balanced at any scale.
    */
  def exactKeepBest(docs: DataFrame, idCol: String, textCol: String,
                    scoreCol: String): DataFrame = {
    val grp = Window.partitionBy(col("__fp"))
    docs.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__rn",
        row_number().over(grp.orderBy(desc(scoreCol), col(idCol))))
      .withColumn("dup_count", count(lit(1)).over(grp))
      .filter(col("__rn") === 1)
      .drop("__rn", "__fp")
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, arXiv:1508.07909)
  * trained and applied AS DATAFLOW — the real-tokenizer upgrade over the
  * survey's "BPE-ish regex" token counter.
  *
  * Scale shape (100 TB of documents):
  *  - training never touches the corpus after ONE word-count aggregate:
  *    merges are learned on the (word, count) table, which is
  *    VOCAB-bounded (tens of millions of rows at web scale, not
  *    trillions). Two vocab-sized jobs per merge; lineage cut by
  *    localCheckpoint every few iterations (the connected-components
  *    discipline).
  *  - encoding runs the per-word merge loop ONCE PER DISTINCT WORD (a
  *    map over the vocab table), then reaches the corpus as a plain join
  *    on word — broadcast when the vocab fits, shuffle otherwise, AQE's
  *    call; per-doc token sequences reassemble order by word position.
  *  - everything that decides the model is an INTEGER sum with a
  *    lexicographic tie-break, so the learned merge list is bit-identical
  *    under any partitioning (spec-pinned), and the driver and
  *    distributed training venues agree exactly (spec-pinned A/B).
  *
  * The end-of-word marker `</w>` follows the paper, appended as a
  * SEPARATE symbol after the word's characters. Caveat (shared with the
  * paper's reference implementation, which uses the same literal): a word
  * whose TEXT contains the characters `<`, `/`, `w`, `>` adjacently can
  * merge them into a text-derived symbol EQUAL to the marker string.
  * Training and encoding treat such symbols identically on both venues,
  * so the model and token streams stay deterministic — but the
  * decode-side round-trip convention ("tokens concatenate to word +
  * marker") is ambiguous for exactly those adversarial words. Escaping
  * is deliberately NOT done: it would change every emitted token string
  * for `<`-containing text and break parity with standard BPE vocab
  * files.
  */
object Bpe {

  private val EndOfWord = "</w>"

  /** The vocab table: one corpus pass → (word, cnt). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** A word's initial segmentation: characters + the end-of-word marker. */
  private def initialSymbols(word: String): Seq[String] =
    word.map(_.toString) :+ EndOfWord

  /** Merge every non-overlapping left-to-right occurrence of (a, b) in a
    * segmentation — the paper's update rule.
    */
  private def mergeOnce(symbols: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < symbols.length) {
      if (i + 1 < symbols.length && symbols(i) == a && symbols(i + 1) == b) {
        out += a + b; i += 2
      } else { out += symbols(i); i += 1 }
    }
    out.toSeq
  }

  /** UTF-8 binary string order — Spark's native string sort, so the
    * driver venue tie-breaks exactly like the distributed one (Java's
    * UTF-16 `String` order disagrees for supplementary characters; the
    * same two-venue pitfall SnapshotIndex pins on the other side).
    */
  private def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Learn `numMerges` merges from a (word, cnt) vocab table, driver
    * venue — INCREMENTAL pair statistics (the subword-nmt algorithm the
    * paper's reference implementation uses): pair counts and a
    * pair→word-set index update only for the words a merge actually
    * touches, and the argmax comes from a lazy-deletion heap instead of
    * a full recount. Per-merge cost ∝ words containing the merged pair
    * (amortized O(corpus symbol count) over a whole training run), which
    * is what makes a REAL 30k-merge tokenizer train in minutes where the
    * naive full-recount loop ([[trainDriverNaive]], kept as the spec's
    * semantic reference) needs O(merges × vocab × word-length).
    * Tie-break on (count desc, pair asc in UTF-8 binary order) — fully
    * deterministic and identical to the naive loop's and the distributed
    * venue's.
    */
  private[ops] def trainDriver(vocab: Seq[(String, Long)], numMerges: Int,
                               minCount: Long): Seq[(String, String)] = {
    type Pair = (String, String)
    val segs = vocab.map { case (w, c) => (
      scala.collection.mutable.ArrayBuffer(initialSymbols(w): _*), c) }
      .toArray
    val stats = scala.collection.mutable.HashMap[Pair, Long]()
    // pair → indexes of words currently containing it (occurrence counts
    // live in `stats`; the index only says WHERE to apply a merge)
    val where = scala.collection.mutable.HashMap[Pair,
      scala.collection.mutable.HashSet[Int]]()
    def addPair(p: Pair, wi: Int, c: Long): Unit = {
      stats.updateWith(p) { v => Some(v.getOrElse(0L) + c) }
      where.getOrElseUpdate(p, scala.collection.mutable.HashSet.empty) += wi
    }
    def dropPair(p: Pair, wi: Int, c: Long): Unit = {
      stats.updateWith(p) {
        case Some(v) if v > c => Some(v - c)
        case _ => None
      }
      where.get(p).foreach { s => s -= wi; if (s.isEmpty) where.remove(p) }
    }
    segs.zipWithIndex.foreach { case ((s, c), wi) =>
      var i = 0
      while (i + 1 < s.length) { addPair((s(i), s(i + 1)), wi, c); i += 1 }
    }
    // lazy-deletion max-heap: entries go stale when a pair's count moves;
    // a popped entry is honored only if it still matches `stats` exactly.
    // Ordering = (count desc, pair asc UTF-8) — the paper's argmax.
    implicit val ord: Ordering[(Long, Pair)] = new Ordering[(Long, Pair)] {
      def compare(x: (Long, Pair), y: (Long, Pair)): Int = {
        if (x._1 != y._1) java.lang.Long.compare(x._1, y._1) // max-heap on count
        else {
          val da = utf8Compare(y._2._1, x._2._1) // asc pair = "greater" in heap
          if (da != 0) da else utf8Compare(y._2._2, x._2._2)
        }
      }
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Pair)]
    stats.foreach { case (p, c) => heap.enqueue((c, p)) }
    val merges = scala.collection.mutable.ArrayBuffer[Pair]()
    while (merges.size < numMerges && heap.nonEmpty) {
      val (c, p) = heap.dequeue()
      if (stats.get(p).contains(c)) { // fresh entry
        if (c < minCount) { heap.clear() } // nothing ≥ minCount remains
        else {
          merges += p
          val (a, b) = p
          val touched = scala.collection.mutable.HashSet[Pair]()
          // apply to exactly the words holding the pair; update stats by
          // subtracting the word's old adjacencies and adding the new
          val wis = where.get(p).map(_.toArray).getOrElse(Array.empty)
          java.util.Arrays.sort(wis) // deterministic iteration (paranoia —
          // stats arithmetic commutes, but determinism should not rest on
          // HashSet ordering)
          wis.foreach { wi =>
            val (s, wc) = segs(wi)
            var i = 0
            while (i + 1 < s.length) {
              val q = (s(i), s(i + 1)); dropPair(q, wi, wc); touched += q
              i += 1
            }
            val ns = mergeOnce(s.toSeq, a, b)
            s.clear(); s ++= ns
            i = 0
            while (i + 1 < s.length) {
              val q = (s(i), s(i + 1)); addPair(q, wi, wc); touched += q
              i += 1
            }
          }
          touched.foreach(q => stats.get(q).foreach(c2 => heap.enqueue((c2, q))))
        }
      }
    }
    merges.toSeq
  }

  /** Learn merges straight from a precomputed (word, count) vocab — the
    * classic entry point when word counts already exist (BPE's training
    * input IS this table); [[train]] builds the table from a corpus and
    * delegates here below `maxDriverVocab`.
    */
  def trainFromVocab(vocab: Seq[(String, Long)], numMerges: Int,
                     minCount: Long = 2L): Seq[(String, String)] =
    trainDriver(vocab, numMerges, minCount)

  /** The paper's loop verbatim — full pair recount per merge. Semantic
    * reference for [[trainDriver]] (BpeSpec pins equality on fixtures and
    * randomized corpora); never the production path.
    */
  private[graft] def trainDriverNaive(vocab: Seq[(String, Long)], numMerges: Int,
                                      minCount: Long): Seq[(String, String)] = {
    var segs = vocab.map { case (w, c) => (initialSymbols(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var continue = true
    while (continue && merges.size < numMerges) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      segs.foreach { case (s, c) =>
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      val best = counts.toSeq
        .sortWith { case (((a1, b1), c1), ((a2, b2), c2)) =>
          if (c1 != c2) c1 > c2
          else {
            val da = utf8Compare(a1, a2)
            if (da != 0) da < 0 else utf8Compare(b1, b2) < 0
          }
        }.headOption
        .filter(_._2 >= minCount)
      best match {
        case Some(((a, b), _)) =>
          merges += ((a, b))
          segs = segs.map { case (s, c) => (mergeOnce(s, a, b), c) }
        case None => continue = false
      }
    }
    merges.toSeq
  }

  /** Learn merges with the vocab staying DISTRIBUTED — the 100 TB venue:
    * per merge, one pair-count aggregate (integer sums, lexicographic
    * tie-break → partitioning-invariant argmax) and one vocab-sized map
    * applying it. Produces EXACTLY [[trainDriver]]'s merge list
    * (spec-pinned A/B).
    */
  /** How many top candidates one distributed round collects for the
    * provably-safe merge batch (see the selection proof in
    * [[trainDistributed]]); the batch itself is usually much smaller.
    */
  private val distBatchK = 64

  /** Select the longest PREFIX of `cand` (already in argmax order:
    * count desc, pair asc UTF-8) that provably replays the sequential
    * semantics when applied as one batch. A candidate m_i joins iff
    *
    *  1. its symbols are DISJOINT from every accepted member's — applying
    *     an accepted merge then provably leaves count(m_i) unchanged
    *     (destroyed pairs touch the member's symbols; created pairs
    *     contain the brand-new merged symbol), and
    *  2. count(m_i) is STRICTLY greater than every pair that interacts
    *     with an accepted member (x, a_j) / (b_j, y) — those are the only
    *     counts that can move (downward), and they bound the created
    *     pairs too (count(x, a_j·b_j) ≤ count(x, a_j)), so after applying
    *     m_1..m_{i-1} nothing can reach count(m_i); prefix order then
    *     makes m_i the exact sequential argmax. The interacting maxima
    *     come from the SAME pair table ([[trainDistributed]] ships them
    *     in `maxFirst`/`maxSecond`); a self-pair member (a == b) makes
    *     its own count the bound and stops the batch — conservative,
    *     never wrong.
    *
    * Conditions 1–2 assume every count a member changes touches the
    * member's own symbols or its BRAND-NEW merged symbol. That breaks
    * when the concatenation a·b is NOT brand-new: it can be string-equal
    * to a symbol already in the pair table (e.g. 'abc' created earlier
    * via ('a','bc') while the member is ('ab','c')), in which case the
    * member's creations ADD to pre-existing pairs' counts — amounts
    * conditions 1–2 never bounded — and can alias a later member's own
    * symbols, silently inflating its count. The same additive hazard
    * arises when TWO members share a concatenation (('ab','c') and
    * ('a','bc') both create 'abc'): each contribution is individually
    * ≤ bound but their sum is not. So condition
    *
    *  3. an accepted member whose concatenation collides — with a symbol
    *     in the pair table (`existingSyms`, shipped alongside
    *     maxFirst/maxSecond) or with an earlier accepted member's
    *     concatenation — STOPS the batch after itself. The member is
    *     still exact (every earlier member's concat was fresh and
    *     distinct, so all count movement it observed is bounded by
    *     conditions 1–2); only members AFTER the collision are suspect.
    *
    * The first candidate is always exact. Rejection STOPS the batch
    * (no skipping): a skipped candidate could be the true next argmax.
    */
  private[ops] def selectMergeBatch(cand: Seq[(String, String, Long)],
      maxFirst: Map[String, Long], maxSecond: Map[String, Long],
      existingSyms: String => Boolean = _ => false)
      : Seq[(String, String)] = {
    val batch = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val used = scala.collection.mutable.HashSet[String]()
    val concats = scala.collection.mutable.HashSet[String]()
    var bound = Long.MinValue
    var stop = false
    for ((a, b, c) <- cand if !stop) {
      if (batch.isEmpty || (!used(a) && !used(b) && c > bound)) {
        batch += ((a, b))
        used += a; used += b
        bound = math.max(bound, math.max(
          maxSecond.getOrElse(a, 0L), maxFirst.getOrElse(b, 0L)))
        val s = a + b
        if (existingSyms(s) || !concats.add(s)) stop = true
      } else stop = true
    }
    batch.toSeq
  }

  /** Learn merges with the vocab staying DISTRIBUTED — the
    * above-`maxDriverVocab` / crash-recovery venue. Per ROUND (not per
    * merge): one pair-count aggregate, reused for the top-K candidates
    * and the per-symbol interacting maxima, then a provably
    * sequential-equivalent BATCH of merges ([[selectMergeBatch]]) applies
    * in one vocab pass — the merge loop's inherent sequentiality costs
    * one round per batch instead of two jobs per merge. Produces EXACTLY
    * [[trainDriver]]'s merge list (spec-pinned A/B, incl. randomized
    * corpora).
    */
  private def trainDistributed(vocabDf: DataFrame, numMerges: Int,
                               minCount: Long): Seq[(String, String)] = {
    val spark = vocabDf.sparkSession
    import spark.implicits._
    var seg = vocabDf.as[(String, Long)]
      .map { case (w, c) => (initialSymbols(w), c) }
      .toDF("symbols", "cnt")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var continue = true
    while (continue && merges.size < numMerges) {
      val pairs = seg
        // fully-merged single-symbol words contribute no pairs (and
        // sequence(0, -1) would DESCEND, not empty out)
        .filter(size(col("symbols")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(0), size(col("symbols")) - 2),
          j => struct(element_at(col("symbols"), j + 1).as("a"),
            element_at(col("symbols"), j + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = pairs.filter(col("c") >= minCount)
        .orderBy(desc("c"), col("a"), col("b"))
        .limit(math.min(distBatchK, numMerges - merges.size))
        .as[(String, String, Long)].collect().toSeq
      if (cand.isEmpty) { pairs.unpersist(); continue = false }
      else {
        // cheap driver precheck: the batch is capped by the longest
        // pairwise-symbol-DISJOINT candidate prefix — when that is 1
        // (adjacent top pairs share a letter, the common case on natural
        // text), skip the interacting-maxima jobs entirely and the round
        // costs exactly what the unbatched loop did
        val disjointLen = {
          val used = scala.collection.mutable.HashSet[String]()
          cand.takeWhile { case (a, b, _) =>
            val ok = !used(a) && !used(b); used += a; used += b; ok
          }.size
        }
        val batch =
          if (disjointLen <= 1) { pairs.unpersist(); cand.take(1).map(x => (x._1, x._2)) }
          else {
            // interacting maxima over ALL pairs (not just candidates),
            // restricted to the symbols the batch could use — two small
            // aggregates on the cached pair table
            val candSyms = cand.take(disjointLen)
              .flatMap(x => Seq(x._1, x._2)).distinct
            val maxFirst = pairs.filter(col("a").isin(candSyms: _*))
              .groupBy("a").agg(max("c").as("m"))
              .as[(String, Long)].collect().toMap
            val maxSecond = pairs.filter(col("b").isin(candSyms: _*))
              .groupBy("b").agg(max("c").as("m"))
              .as[(String, Long)].collect().toMap
            // contains-symbol probe for selectMergeBatch's condition 3: of
            // the candidate concatenations, which are ALREADY symbols in
            // the pair table? (Symbols living only in fully-merged
            // single-symbol words contribute no pairs and cannot interact,
            // so probing the pair table is sufficient.)
            val candConcats = cand.take(disjointLen)
              .map(x => x._1 + x._2).distinct
            val existingSyms = pairs
              .filter(col("a").isin(candConcats: _*) ||
                col("b").isin(candConcats: _*))
              .select(explode(array(col("a"), col("b"))).as("s"))
              .filter(col("s").isin(candConcats: _*))
              .distinct().as[String].collect().toSet
            pairs.unpersist()
            selectMergeBatch(cand, maxFirst, maxSecond, existingSyms)
          }
        merges ++= batch
        // one vocab pass applies the whole batch in rank order (members
        // are symbol-disjoint, so per-word application order is immaterial
        // — rank order is kept anyway, byte-for-byte the sequential walk)
        val bm = batch
        val applyBatch = udf((s: Seq[String]) =>
          bm.foldLeft(s) { case (x, (a, b)) => mergeOnce(x, a, b) })
        val next = seg.withColumn("symbols", applyBatch(col("symbols")))
        // cut lineage + swap the persisted table every round: the UDF
        // chain would otherwise re-run all merges per pair count
        val mat = next.localCheckpoint(true)
        seg.unpersist()
        seg = mat
      }
    }
    seg.unpersist()
    merges.toSeq
  }

  /** Learn `numMerges` BPE merges from the corpus. One corpus pass for
    * the vocab; the merge loop runs on the driver when the vocab fits
    * (`maxDriverVocab`), distributed otherwise — same model either way.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L, maxDriverVocab: Long = 2000000L)
      : Seq[(String, String)] = {
    val vocab = wordCounts(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (vocab.count() <= maxDriverVocab) {
        import vocab.sparkSession.implicits._
        trainDriver(vocab.as[(String, Long)].collect().toSeq, numMerges,
          minCount)
      } else trainDistributed(vocab, numMerges, minCount)
    } finally vocab.unpersist()
  }

  /** Tokenize one word under a trained merge list: greedy
    * lowest-rank-first merging (the standard apply loop), bounded by the
    * word's length.
    */
  private[ops] def encodeWord(word: String,
                              rank: Map[(String, String), Int]): Seq[String] = {
    var s = initialSymbols(word)
    var continue = s.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var at = -1
      var i = 0
      while (i + 1 < s.length) {
        val r = rank.getOrElse((s(i), s(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; at = i }
        i += 1
      }
      if (at < 0) continue = false
      else s = mergeOnce(s, s(at), s(at + 1))
      if (s.length <= 1) continue = false
    }
    s
  }

  /** Persist a trained merge list to a managed table — one
    * (rank, a, b) row per merge, rank the 0-based merge order (the only
    * state [[encode]] needs) — so train → persist → encode composes
    * entirely in SQL via the `graft_bpe_encode` TVF. A tokenizer is then
    * a table like any other: history, time travel and CLONE give
    * tokenizer versioning for free (the same shape as the classifier's
    * saveModel/loadModel pair).
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession, path: String,
                 merges: Seq[(String, String)]): graft.table.ManagedTable = {
    import spark.implicits._
    val t = new graft.table.ManagedTable(spark, path)
    t.overwrite(merges.zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b) }.toDF("rank", "a", "b"))
    // derived, never caller-supplied (the saveModel discipline): the
    // count is the loader's drift check
    t.setProperties(Map("graft.bpe.merges" -> merges.size.toString))
    t
  }

  /** Read a persisted merge list back in rank order. Inverse of
    * [[saveMerges]]. Refuses pointedly both a table that is not a
    * persisted tokenizer (no property) and one whose ROWS drifted from
    * its declared count (partial overwrite, hand edit) — merge RANK is
    * semantics, so a gap or duplicate would encode wrong, not just fail.
    */
  def loadMerges(t: graft.table.ManagedTable): Seq[(String, String)] = {
    val spark = t.read.sparkSession
    import spark.implicits._
    val n = t.properties.getOrElse("graft.bpe.merges",
      throw new IllegalArgumentException(
        s"${t.path} is not a persisted BPE tokenizer " +
          "(no graft.bpe.merges property)")).toInt
    val rows = t.read.select(col("rank").cast("long"),
        col("a").cast("string"), col("b").cast("string"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    if (rows.length != n ||
        rows.iterator.zipWithIndex.exists { case ((r, _, _), i) => r != i })
      throw new IllegalArgumentException(
        s"${t.path} is not a persisted BPE tokenizer: expected ranks " +
          s"0..${n - 1} (graft.bpe.merges=$n), found ${rows.length} row(s)" +
          rows.iterator.zipWithIndex
            .collectFirst { case ((r, _, _), i) if r != i =>
              s", first mismatch rank $r at position $i" }.getOrElse(""))
    rows.map { case (_, a, b) => (a, b) }.toSeq
  }

  /** Encode every doc: (doc_id, tokens) with tokens in document order.
    * The per-word merge loop runs once per DISTINCT word (a vocab-sized
    * Dataset map); the corpus only pays a join on word + one doc-keyed
    * reassembly. Token-less docs keep an empty token array (left join).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    // two consumers (the distinct-word vocab and the join): lazily
    // materialize so the corpus scan + word explosion runs once — the
    // multi-consumer discipline Dedup's index joins follow
    val exploded = docs.select(col(idCol).as("doc_id"),
      posexplode(TextAnalysis.words(col(textCol))).as(Seq("pos", "word")))
      .localCheckpoint(false)
    val vocabToks = exploded.select("word").distinct().as[String]
      .map(w => (w, encodeWord(w, rank)))
      .toDF("word", "toks")
    exploded.join(vocabToks, Seq("word"))
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        s => s.getField("toks"))).as("tokens"))
      .join(docs.select(col(idCol).as("doc_id")), Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("tokens"), array().cast("array<string>")).as("tokens"))
  }
}

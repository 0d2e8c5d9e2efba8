package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded edit-distance (Levenshtein ≤ k) self-join with segment-based
  * candidate blocking — the string-similarity complement of the
  * shingle/minhash family in [[Dedup]], for near-duplicate *short* strings
  * (titles, names, URLs) where token shingles are too coarse.
  *
  * Algorithm (PassJoin's pigeonhole blocking — Li/Deng/Feng, PVLDB 2011;
  * public literature, re-expressed as Spark equi-joins): cut every string
  * into `k+1` contiguous segments. An edit script of ≤ k operations cannot
  * touch all `k+1` segments, so for any pair within distance k the *other*
  * string contains at least one segment verbatim, shifted by at most k
  * positions (each edit shifts downstream offsets by ≤ 1). Candidates are
  * therefore an EQUI-join: every string publishes its k+1 segments keyed
  * by (length, segment#, text); every string probes with the substrings
  * that could match a segment of a string whose length is within ±k of its
  * own. Exact `levenshtein(s1, s2, k)` (banded, O(k·n)) verifies
  * survivors.
  *
  * Scale design (the reason this is not a cross join): index size is
  * (k+1)·N rows of short substrings; probe size ≤ (2k+1)·(k+1)·(2k+1)·N —
  * both corpus-LINEAR with a small k-constant, shuffled on segment text
  * like any equi-join. The verification set is only colliding pairs; a
  * same-length cross product never appears anywhere. Hot segments (e.g. a
  * shared prefix) bound skew by construction: segments have length
  * ≥ ⌊len/(k+1)⌋, far more selective than characters or 2-grams; residual
  * skew is AQE skew-join territory.
  *
  * Exactness of the blocking: a pair where BOTH strings are shorter than
  * k+1 characters can only match through a zero-length segment (dropped
  * from the index) — but any two strings of length ≤ k are trivially
  * within distance k (substitute min(len) chars, insert/delete the rest),
  * so that population is paired directly ([[shortPairs]]); if at least one
  * side has length ≥ k+1, all of its k+1 segments are non-empty and the
  * pigeonhole argument applies with that side as the indexed one. The
  * final `distinct` removes any overlap between the two paths.
  */
object FuzzyJoin {

  /** Segment length of PassJoin's even partition of a length-`l` string:
    * `base = ⌊l/(k+1)⌋`; the LAST `l mod (k+1)` segments get one extra
    * character. Exact for every 32-bit length (the double division is
    * exact below 2^52).
    */
  private def segLen(l: Column, i: Column, k: Int): Column = {
    val base = floor(l.cast("double") / (k + 1)).cast("int")
    val rem = (l % (k + 1)).cast("int")
    (base + when(i >= lit(k + 1) - rem, lit(1)).otherwise(lit(0))).cast("int")
  }

  /** 0-based start offset of segment `i` under the same partition. */
  private def segStart(l: Column, i: Column, k: Int): Column = {
    val base = floor(l.cast("double") / (k + 1)).cast("int")
    val rem = (l % (k + 1)).cast("int")
    (i * base + greatest(lit(0), i - (lit(k + 1) - rem))).cast("int")
  }

  /** All (id1, id2, dist) pairs with `levenshtein(s1, s2) ≤ maxDist`,
    * oriented id1 < id2; `dist` is the exact distance (IntegerType).
    * `maxDist ≥ 1` — exact duplicates are [[Dedup.exact]]'s hash-join job.
    */
  def fuzzySelfJoin(df0: DataFrame, idCol: String, strCol: String,
                    maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1 (use Dedup.exact for 0)")
    val k = maxDist
    val base = df0.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))

    // ---- index: each string's k+1 segments, keyed (strlen, seg#, text)
    val idx = base
      .select(col("__id").as("__iid"), col("__s").as("__is"),
        col("__len").as("__l"),
        explode(sequence(lit(0), lit(k))).as("__segno"))
      .withColumn("__slen", segLen(col("__l"), col("__segno"), k))
      .withColumn("__sstart", segStart(col("__l"), col("__segno"), k))
      .filter(col("__slen") > 0)
      .select(col("__iid"), col("__is"), col("__l"), col("__segno"),
        col("__is").substr(col("__sstart") + 1, col("__slen")).as("__seg"))

    // ---- probe: for every candidate indexed length l ∈ [len−k, len+k]
    // and every segment of THAT partition, the substrings of this string
    // with the segment's length whose start is within ±k of the segment's
    // start. `sequence` descends when lo > hi, so empty windows must
    // become empty arrays BEFORE the explode, not backwards sequences.
    def seqIf(lo: Column, hi: Column): Column =
      when(lo <= hi, sequence(lo, hi))
        .otherwise(array().cast("array<int>"))
    val probe = base
      .select(col("__id").as("__pid"), col("__s").as("__ps"),
        col("__len").as("__rlen"),
        explode(seqIf(greatest(col("__len") - k, lit(1)),
          col("__len") + k)).as("__l"))
      .select(col("__pid"), col("__ps"), col("__rlen"), col("__l"),
        explode(sequence(lit(0), lit(k))).as("__segno"))
      .withColumn("__slen", segLen(col("__l"), col("__segno"), k))
      .withColumn("__sstart", segStart(col("__l"), col("__segno"), k))
      .filter(col("__slen") > 0)
      .select(col("__pid"), col("__ps"), col("__l"), col("__segno"),
        col("__slen"),
        explode(seqIf(greatest(col("__sstart") - k, lit(0)),
          least(col("__sstart") + k, col("__rlen") - col("__slen"))))
          .as("__pos"))
      .select(col("__pid"), col("__ps"), col("__l"), col("__segno"),
        col("__ps").substr(col("__pos") + 1, col("__slen")).as("__seg"))

    val candidates = probe.join(idx, Seq("__l", "__segno", "__seg"))
      .filter(col("__pid") =!= col("__iid"))
      .select(least(col("__pid"), col("__iid")).as("id1"),
        greatest(col("__pid"), col("__iid")).as("id2"),
        when(col("__pid") < col("__iid"), col("__ps")).otherwise(col("__is"))
          .as("__s1"),
        when(col("__pid") < col("__iid"), col("__is")).otherwise(col("__ps"))
          .as("__s2"))
      .distinct()
      .select(col("id1"), col("id2"),
        levenshtein(col("__s1"), col("__s2"), k).as("dist"))
      .filter(col("dist") >= 0)

    // ---- both-short pairs (len ≤ k on both sides): within distance k by
    // construction; the population is tiny and length-banded by definition
    val shorts = base.filter(col("__len") <= k)
    val shortPairs = shorts.select(col("__id").as("id1"), col("__s").as("__s1"))
      .join(shorts.select(col("__id").as("id2"), col("__s").as("__s2")),
        col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        levenshtein(col("__s1"), col("__s2")).as("dist"))

    candidates.unionByName(shortPairs).distinct()
  }
}

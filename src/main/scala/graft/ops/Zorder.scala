package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** True multi-dimensional Z-order (Morton) clustering key — the exact
  * layout behind Delta's `ZORDER BY` (reference: deltalake.ipynb cells
  * 25–26), upgrading [[graft.table.ManagedTable.cluster]]'s
  * range+sort approximation (locality on the leading column only) to
  * balanced locality on EVERY clustering column.
  *
  * Construction:
  *   1. each column is quantized to `2^bits` equal-frequency buckets from
  *      sampled quantile boundaries ([[quantileBoundaries]]) — rank-shaped
  *      buckets, not value ranges, so skewed value distributions still
  *      fill the z-space uniformly (Delta quantizes by range partition id
  *      the same way), and the whole quantization is ONE sample job plus
  *      pure expressions (no per-column shuffle or materialization);
  *   2. the bucket ids' bits are interleaved round-robin
  *      (z = …b2a2b1a1b0a0 for columns a,b) with pure codegen'd
  *      shift/mask expressions into one BIGINT key.
  *
  * Sorting/range-partitioning by the key gives every column row-group
  * min/max locality ∝ 2^(-bits/n), so parquet data skipping prunes on any
  * clustered column, not just the first. Supports any n·bits ≤ 63 (the
  * key is a signed BIGINT): e.g. 2 cols × 16 bits, 4 cols × 15, 7 × 9.
  *
  * Ties inside a quantile bucket are broken arbitrarily — file LAYOUT may
  * differ across runs, query RESULTS never do (spec'd).
  */
object Zorder {

  /** Equal-frequency quantile BOUNDARIES for every clustering column from
    * ONE deterministic reservoir-sketch pass over a pruned projection —
    * the quantizer behind [[quantized]].
    *
    * r14 rewrite (optimization guide §1.2 "the distributed algorithm"):
    * the previous form chained [[Relational.ntileDistributed]] per column —
    * each a full-data range shuffle + `localCheckpoint` MATERIALIZATION +
    * count collect + per-partition window. Clustering n columns therefore
    * materialized the whole table n times before the final layout shuffle;
    * at 100 TB that is n extra full passes for what is fundamentally a
    * statistics problem. Delta's OPTIMIZE ZORDER quantizes by range
    * partition id for the same reason: bucket boundaries come from a
    * SAMPLE, and only the final layout touches every byte.
    *
    * Boundary k (k = 1..buckets-1) is the sampled weighted order statistic
    * at rank-bucket k's last rank under the exact SQL NTILE size rule, so
    * on inputs small enough that the reservoir holds every row (all layout
    * specs) the bucket assignment below is bit-identical to the rank-NTILE
    * one wherever values are distinct. On sampled inputs the buckets are
    * equal-frequency up to sampling error; ties at a boundary land in the
    * lower bucket (rank NTILE splits them). File LAYOUT therefore may
    * differ from the rank form — query RESULTS never do (the class
    * contract above; spec'd).
    *
    * Determinism: the reservoir is seeded per partition id, so the same
    * input produces the same boundaries (and the same layout) every run.
    * Driver memory: ≤ perPart rows per input partition, cluster columns
    * only. Null values take bucket 1, matching the rank form's
    * asc-nulls-first ordering.
    */
  private[ops] def quantileBoundaries(df: DataFrame, cols: Seq[String],
                                      buckets: Int): Seq[Array[Any]] = {
    val narrow = df.select(cols.map(col): _*)
    val types = narrow.schema.fields.map(_.dataType)
    val nCols = cols.length
    val perPart = math.max(buckets * 16, 4096)
    // internal rows (no external conversion of the full pass); values are
    // extracted — and buffer-backed strings copied — only for KEPT rows
    val sketch = narrow.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      val rng = new java.util.Random(0x5eed0a7aL * (pid + 1))
      def extract(r: org.apache.spark.sql.catalyst.InternalRow): Array[Any] =
        Array.tabulate[Any](nCols) { j =>
          r.get(j, types(j)) match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
            case x => x
          }
        }
      val res = new Array[Array[Any]](perPart)
      var n = 0L
      it.foreach { r =>
        if (n < perPart) res(n.toInt) = extract(r)
        else {
          val j = (rng.nextDouble() * (n + 1)).toLong
          if (j < perPart) res(j.toInt) = extract(r)
        }
        n += 1
      }
      Iterator.single((n, res.take(math.min(n, perPart.toLong).toInt)))
    }.collect()
    cols.indices.map { i =>
      // weighted sample of column i: each kept row stands for count/kept
      // rows of its partition; nulls excluded (they take bucket 1)
      val vw = sketch.flatMap { case (cnt, rows) =>
        val w = if (rows.isEmpty) 0.0 else cnt.toDouble / rows.length
        rows.iterator.filter(_(i) != null).map(r => (r(i), w))
      }
      if (vw.isEmpty) Array.empty[Any]
      else {
        val sorted = vw.sortWith((a, b) =>
          a._1.asInstanceOf[Comparable[Any]].compareTo(b._1) < 0)
        val total = sorted.iterator.map(_._2).sum
        // cut k = the last rank of rank-bucket k under the exact SQL NTILE
        // size rule (first N mod b buckets hold ⌈N/b⌉ rows): when the
        // reservoir held every row the weights are all 1 and the boundary
        // IS the NTILE bucket's last element — bit-identical buckets on
        // distinct values (spec'd); sampled inputs approximate the same
        // cuts through the weights
        val q = math.floor(total / buckets)
        val rem = total - q * buckets
        def cut(k: Int): Double =
          math.min(k, rem) * (q + 1) + math.max(0.0, k - rem) * q
        val bounds = new Array[Any](buckets - 1)
        var k = 1
        var cum = 0.0
        var j = 0
        while (k < buckets && j < sorted.length) {
          cum += sorted(j)._2
          while (k < buckets && cum >= cut(k) - 1e-9) {
            bounds(k - 1) = sorted(j)._1
            k += 1
          }
          j += 1
        }
        // fewer samples than buckets: pad with the max so the tail
        // boundaries are inert (v > max is false)
        while (k < buckets) { bounds(k - 1) = sorted.last._1; k += 1 }
        bounds
      }
    }
  }

  /** Equal-frequency quantization of every clustering column to `2^bits`
    * buckets — shared by the Morton and Hilbert keys. Returns the frame
    * plus the 1-based bucket column names. One sketch job computes all
    * columns' boundaries (see [[quantileBoundaries]]); the bucket id is
    * then a pure expression — `1 + |{boundaries < v}|` over the sorted
    * boundary array — so quantization adds NO shuffle and NO
    * materialization to the layout pass.
    */
  private def quantized(df: DataFrame, cols: Seq[String],
                        bits: Int): (DataFrame, Seq[String]) = {
    // the boundary quantizer orders internal values via Comparable; the
    // types without one (binary, interval) take the legacy per-column
    // rank path — exotic for clustering keys and correct either way
    val comparable = df.select(cols.map(col): _*).schema.fields.forall(f =>
      graft.functions.RankBucket.comparableType(f.dataType))
    if (!comparable) {
      var cur = df
      val bcols = cols.zipWithIndex.map { case (c, i) =>
        cur = Relational.ntileDistributed(cur, 1 << bits, col(c))
          .withColumnRenamed("__ntile", s"__zb$i")
        s"__zb$i"
      }
      return (cur, bcols)
    }
    val allBounds = quantileBoundaries(df, cols, 1 << bits)
    import org.apache.spark.sql.GraftBridge.{column, expression}
    var cur = df
    val bcols = cols.zipWithIndex.map { case (c, i) =>
      val bounds = allBounds(i)
      val bucket =
        if (bounds.isEmpty) lit(1L)
        else coalesce(column(graft.functions.RankBucket(
          expression(col(c)), bounds)), lit(1L))
      cur = cur.withColumn(s"__zb$i", bucket)
      s"__zb$i"
    }
    (cur, bcols)
  }

  /** Append an interleaved z-key column `__z` built from `cols`. */
  def withZKey(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    val n = cols.length
    require(n >= 1 && n * bits <= 63, s"$n cols × $bits bits exceeds a BIGINT")
    val (cur, bcols) = quantized(df, cols, bits)
    // bit j of every column's 0-based bucket id lands at position j*n + i
    val z = (0 until bits).flatMap { j =>
      (0 until n).map { i =>
        shiftright(col(bcols(i)) - 1, j).bitwiseAND(lit(1L)) * lit(1L << (j * n + i))
      }
    }.reduce(_ + _)
    cur.withColumn("__z", z).drop(bcols: _*)
  }

  /** Append a Hilbert-curve key column `__h` built from `cols` — same
    * quantization as [[withZKey]], but the bucket coordinates feed the
    * Hilbert transform ([[graft.functions.Hilbert]]) instead of bit
    * interleaving. Consecutive key values are always grid NEIGHBORS (the
    * Morton curve jumps diagonally at every power-of-two boundary), so
    * equal-size file ranges cover tighter value blobs and range scans
    * prune more files; spec'd head-to-head in HilbertSpec.
    */
  def withHilbertKey(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    val n = cols.length
    require(n >= 1 && n * bits <= 62, s"$n cols × $bits bits exceeds a BIGINT")
    val (cur, bcols) = quantized(df, cols, bits)
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val coords = array(bcols.map(c => (col(c) - 1).cast("long")): _*)
    val h = column(graft.functions.HilbertIndex(expression(coords), bits))
    cur.withColumn("__h", h).drop(bcols: _*)
  }

  /** Cluster a frame by the z-key: range-partition (file-level locality) +
    * in-file sort (row-group min/max stats) on the interleaved key, then
    * drop it. The rewrite [[graft.table.ManagedTable.clusterZ]] commits.
    *
    * `numFiles` is EXPLICIT (default: the shuffle-partition count): an
    * unspecified-count range shuffle is AQE-coalescible, and on a small
    * table coalescing to one partition produces one file whose row-group
    * stats span everything — no locality survives. At 100 TB size files
    * so each holds a narrow z-range (≈128 MB each).
    */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 8,
              numFiles: Int = 0): DataFrame = {
    val n = if (numFiles > 0) numFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZKey(df, cols, bits)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** [[cluster]] with the Hilbert key — same layout mechanics (explicit
    * file count, range partition + in-file sort), tighter per-file value
    * bounds on every clustered column.
    */
  def clusterHilbert(df: DataFrame, cols: Seq[String], bits: Int = 8,
                     numFiles: Int = 0): DataFrame = {
    val n = if (numFiles > 0) numFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withHilbertKey(df, cols, bits)
      .repartitionByRange(n, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
  }
}

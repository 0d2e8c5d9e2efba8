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
  *   1. each column is quantized to `2^bits` equal-frequency rank buckets
  *      via [[Relational.ntileDistributed]] — rank buckets, not value
  *      ranges, so skewed value distributions still fill the z-space
  *      uniformly (Delta quantizes by range partition id the same way),
  *      and the quantile pass is the distributed two-pass form (no
  *      single-partition window);
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

  /** Equal-frequency rank quantization of every clustering column to
    * `2^bits` buckets — shared by the Morton and Hilbert keys. Returns the
    * frame plus the 1-based bucket column names.
    */
  private def quantized(df: DataFrame, cols: Seq[String],
                        bits: Int): (DataFrame, Seq[String]) = {
    var cur = df
    val bcols = cols.zipWithIndex.map { case (c, i) =>
      cur = Relational.ntileDistributed(cur, 1 << bits, col(c))
        .withColumnRenamed("__ntile", s"__zb$i")
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

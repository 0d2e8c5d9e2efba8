package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate view over a [[ManagedTable]] — the
  * materialized-gold-mart discipline (the reference's marts are full
  * recomputes per run, gold.py; Delta's DBSQL materialized views are the
  * managed form): `refresh()` brings the view to the source's current
  * version, and when every commit in the window is an APPEND or a
  * row-neutral rewrite (OPTIMIZE / ZORDER) it reads ONLY the files the
  * APPEND commits added — additions are attributed PER COMMIT (each
  * APPEND's own manifest diff), so a later compaction's rewritten files
  * are never mistaken for new rows, and routine maintenance on a
  * streaming-append table doesn't force recomputes. Any row-changing
  * commit (DELETE/UPDATE/MERGE/OVERWRITE/RESTORE/…) falls back to a full
  * recompute — the incrementalizability rule production MV engines
  * apply. If a needed pre-compaction file was vacuumed away before the
  * refresh, the incremental read fails cleanly and the refresh falls
  * back to full (refresh-then-vacuum is the happy ordering).
  *
  * Maintained aggregates: COUNT(*) plus SUM per listed column, held as
  * DECIMAL running totals. Decimal addition is exact and associative, so
  * ANY refresh schedule produces bit-identical state to a one-shot
  * aggregation over the final snapshot (spec + DuckDB-oracle anchored —
  * the DECIMAL determinism contract extended to incremental maintenance).
  * AVG derives as sum/cnt at read time; MIN/MAX are deliberately absent
  * (not incrementally maintainable under deletes).
  *
  * At 100 TB: view state is one row per group (mart-sized); an
  * append-only refresh costs one scan of the NEW files plus a
  * state-sized aggregation — the corpus-wide aggregation runs once at
  * bootstrap and never again on the append path.
  */
final class IncrementalAgg(spark: SparkSession, statePath: String,
                           source: ManagedTable, keys: Seq[String],
                           sumCols: Seq[String]) {
  require(keys.nonEmpty, "at least one group key")

  val state = new ManagedTable(spark, statePath)
  private val versionProp = "graft.mv.sourceVersion"

  /** Source version the state currently reflects (−1 = never refreshed). */
  def refreshedVersion: Long =
    if (!state.exists) -1L
    else state.properties.get(versionProp).map(_.toLong).getOrElse(-1L)

  /** One aggregation pass: (keys, cnt, sum_<c>…) with decimal sums. */
  private def aggregate(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c =>
          sum(col(c).cast("decimal(18,6)")).cast("decimal(28,6)").as(s"sum_$c")): _*)

  /** Fold a delta state into the current one (exact decimal adds). */
  private def combine(cur: DataFrame, delta: DataFrame): DataFrame =
    cur.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sumCols.map(c =>
          sum(col(s"sum_$c")).cast("decimal(28,6)").as(s"sum_$c")): _*)

  /** Bring the view up to the source's current version. Returns the
    * refresh mode actually taken: "noop" (already current), "initial"
    * (first build), "incremental" (append-only window, new files only) or
    * "full" (window contains a non-append commit).
    */
  /** Commits that rewrite files but not rows: their manifest churn is
    * invisible to the view as long as additions are attributed per-commit.
    */
  private val rowNeutral = Set("OPTIMIZE", "ZORDER")

  def refresh(): String = {
    val to = source.version
    val from = refreshedVersion
    if (to < 0 || to == from) return "noop"
    val window = source.operationsBetween(from, to)
    var mode =
      if (from < 0) "initial"
      else if (window.forall { case (_, op) =>
        op == "APPEND" || rowNeutral(op) }) "incremental"
      else "full"
    val next = mode match {
      case "incremental" =>
        // per-commit attribution: each APPEND's own manifest diff. The
        // file lists of adjacent versions are shared via the memo, so a
        // w-commit window costs w+1 manifest reads, not 2w.
        val memo = scala.collection.mutable.Map.empty[Long, Set[String]]
        def files(v: Long) = memo.getOrElseUpdate(v, source.manifestFiles(v).toSet)
        val added = window.collect { case (v, "APPEND") => files(v) -- files(v - 1) }
          .foldLeft(Set.empty[String])(_ ++ _).toSeq.sorted
        if (added.isEmpty) { // row-neutral-only window: state already current
          state.setProperties(Map(versionProp -> to.toString))
          return "incremental"
        }
        try combine(state.read, aggregate(source.readFileSubset(to, added)))
        catch { case _: IllegalStateException => // vacuumed mid-window
          mode = "full"; aggregate(source.read)
        }
      case _ => aggregate(source.read)
    }
    // overwrite routes through the self-read-safe materializing path, so
    // `next` reading the state it replaces is fine
    state.overwrite(next)
    state.setProperties(Map(versionProp -> to.toString))
    mode
  }

  /** The view for consumers: cnt plus per-column sum/avg as DOUBLE (the
    * oracle-facing DECIMAL→DOUBLE contract).
    */
  def read: DataFrame =
    state.read.select(
      keys.map(col) ++ Seq(col("cnt")) ++ sumCols.flatMap(c => Seq(
        col(s"sum_$c").cast("double").as(s"sum_$c"),
        (col(s"sum_$c").cast("double") / col("cnt")).as(s"avg_$c"))): _*)
}

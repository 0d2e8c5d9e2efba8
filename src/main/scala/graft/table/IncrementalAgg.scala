package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate view over a [[ManagedTable]] — the
  * materialized-gold-mart discipline (the reference's marts are full
  * recomputes per run, gold.py; Delta's DBSQL materialized views are the
  * managed form): `refresh()` brings the view to the source's current
  * version reading only what each commit in the window actually changed:
  *
  *  - APPEND / COPY INTO: only the files the commit added (its own
  *    manifest diff, attributed PER COMMIT so a later compaction's
  *    rewritten files are never mistaken for new rows);
  *  - OPTIMIZE / ZORDER / CLUSTER / PURGE / MATERIALIZE: row-neutral
  *    (they rewrite files, not rows — reads were already DV-filtered),
  *    skipped;
  *  - merge-on-read DELETE / UPDATE / MERGE (no live file removed): the
  *    commit's deletion-vector diff is SUBTRACTED (the newly-marked rows
  *    read back from just the marked files) and its appended replacement/
  *    insert files are added — the window stays incremental through DML,
  *    which is what a continuously-merged silver table needs;
  *  - anything else (OVERWRITE, RESTORE, a copy-on-write rewrite, schema
  *    changes): full recompute — the incrementalizability rule production
  *    MV engines apply.
  *
  * If a needed pre-compaction file was vacuumed away before the refresh,
  * the incremental read fails cleanly and the refresh falls back to full
  * (refresh-then-vacuum is the happy ordering).
  *
  * Maintained aggregates: COUNT(*) plus SUM and non-null count per listed
  * column, held as DECIMAL/LONG running totals. Decimal addition and
  * subtraction are exact, associative and commutative, so ANY refresh
  * schedule — including one interleaving DV-diff subtractions — produces
  * bit-identical state to a one-shot aggregation over the final snapshot
  * (spec + DuckDB-oracle anchored). Groups whose row count reaches zero
  * are dropped, exactly as a recompute would never produce them; the
  * per-column non-null count finalizes a no-non-null-values SUM back to
  * NULL (an all-cancelling 0 is distinguishable only through it) and
  * makes AVG = sum/nnz the exact SQL `avg` under NULLs. MIN/MAX are
  * deliberately absent (not incrementally maintainable under deletes).
  *
  * At 100 TB: view state is one row per group (mart-sized); an
  * append-only refresh costs one scan of the NEW files, a DML refresh one
  * scan of the marked + appended files, each plus a state-sized
  * aggregation — the corpus-wide aggregation runs once at bootstrap and
  * never again outside OVERWRITE/RESTORE.
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

  /** One aggregation pass: (keys, cnt, [sum_<c>, nnz_<c>]…) with decimal
    * sums and per-column non-null counts.
    */
  private def aggregate(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.flatMap(c => Seq(
          sum(col(c).cast("decimal(18,6)")).cast("decimal(28,6)").as(s"sum_$c"),
          count(col(c)).as(s"nnz_$c"))): _*)

  /** Negate a partial state — the subtraction feed for rows a DV commit
    * removed. Exact: decimal negation plus long negation.
    */
  private def negate(partial: DataFrame): DataFrame =
    partial.select(
      keys.map(col) ++ Seq((-col("cnt")).as("cnt")) ++ sumCols.flatMap(c => Seq(
        (-col(s"sum_$c")).cast("decimal(28,6)").as(s"sum_$c"),
        (-col(s"nnz_$c")).as(s"nnz_$c"))): _*)

  /** Fold signed delta states into the current one (exact decimal adds);
    * groups whose running row count hits zero disappear, as a recompute
    * would never produce them.
    */
  private def combine(cur: DataFrame, deltas: Seq[DataFrame]): DataFrame =
    deltas.foldLeft(cur)(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sumCols.flatMap(c => Seq(
          sum(col(s"sum_$c")).cast("decimal(28,6)").as(s"sum_$c"),
          sum(col(s"nnz_$c")).as(s"nnz_$c"))): _*)
      .filter(col("cnt") > 0)

  // the shared taxonomy ([[CommitOps]]) keeps this classifier and the
  // streaming source's in lockstep
  private val addBearing = CommitOps.addBearing
  private def rowNeutral(op: String): Boolean = CommitOps.rowNeutral(op)
  private val morDml = CommitOps.morDml

  private case class CopyOnWriteRewrite() extends Exception

  /** Bring the view up to the source's current version. Returns the
    * refresh mode actually taken: "noop" (already current), "initial"
    * (first build), "incremental" (append/row-neutral window, new files
    * only), "incremental-mor" (window also carried merge-on-read DML,
    * processed by DV-diff subtraction) or "full" (a non-incrementalizable
    * commit, a copy-on-write rewrite, or a vacuumed-away window file).
    */
  def refresh(): String = {
    val to = source.version
    val from = refreshedVersion
    if (to < 0 || to == from) {
      // still record the definition: a state from before definitions were
      // persisted (or a CREATE against an already-current source) must
      // become reopenable by path alone, exactly what open()'s error
      // message prescribes
      if (state.exists && !state.properties.contains("graft.mv.source"))
        state.setProperties(definition)
      return "noop"
    }
    val window = source.operationsBetween(from, to)
    // a state written by the pre-nnz schema can't be folded into — one
    // full recompute migrates it
    def stateCurrentSchema: Boolean = {
      val cols = state.read.columns.toSet
      sumCols.forall(c => cols.contains(s"nnz_$c"))
    }
    var mode =
      if (from < 0) "initial"
      else if (!stateCurrentSchema) "full"
      else if (window.forall { case (_, op) =>
        addBearing(op) || rowNeutral(op) || morDml(op) }) {
        if (window.exists { case (_, op) => morDml(op) }) "incremental-mor"
        else "incremental"
      }
      else "full"
    val next = mode match {
      case "incremental" | "incremental-mor" =>
        // per-commit attribution: each commit's own manifest diff. The
        // file lists of adjacent versions are shared via the memo, so a
        // w-commit window costs w+1 manifest reads, not 2w.
        val memo = scala.collection.mutable.Map.empty[Long, Set[String]]
        def files(v: Long) = memo.getOrElseUpdate(v, source.manifestFiles(v).toSet)
        try {
          val deltas = window.flatMap { case (v, op) =>
            if (rowNeutral(op)) Nil
            else {
              // a DML commit that removed live files rewrote rows in
              // place (copy-on-write): its manifest diff is not a row
              // diff — recompute
              if (morDml(op) && (files(v - 1) -- files(v)).nonEmpty)
                throw CopyOnWriteRewrite()
              val added = (files(v) -- files(v - 1)).toSeq.sorted
              val add =
                if (added.isEmpty) Nil
                else Seq(aggregate(source.readFileSubset(v, added)))
              val sub =
                if (!morDml(op)) Nil
                else source.dvNewlyMarkedRows(v).map(df => negate(aggregate(df))).toSeq
              add ++ sub
            }
          }
          if (deltas.isEmpty) { // row-neutral-only window: state already current
            state.setProperties(Map(versionProp -> to.toString) ++ definition)
            return mode
          }
          combine(state.read, deltas)
        } catch {
          case _: CopyOnWriteRewrite => mode = "full"; aggregate(source.read)
          case _: IllegalStateException => // vacuumed mid-window
            mode = "full"; aggregate(source.read)
        }
      case _ => aggregate(source.read)
    }
    // overwrite routes through the self-read-safe materializing path, so
    // `next` reading the state it replaces is fine
    state.overwrite(next)
    state.setProperties(Map(versionProp -> to.toString) ++ definition)
    mode
  }

  /** The view's definition, persisted on the state table so a later
    * session — or the SQL `REFRESH MATERIALIZED VIEW` statement — can
    * reopen it from the state path alone ([[IncrementalAgg.open]]).
    */
  private def definition: Map[String, String] = Map(
    "graft.mv.source" -> source.path,
    "graft.mv.keys" -> keys.mkString(","),
    "graft.mv.sums" -> sumCols.mkString(","))

  /** The view for consumers: cnt plus per-column sum/avg as DOUBLE (the
    * oracle-facing DECIMAL→DOUBLE contract). The non-null count finalizes
    * sum to NULL when no non-null value remains (an all-cancelling 0 is
    * indistinguishable from it in the running total alone) and makes avg
    * the exact SQL `avg(c)` = sum/nnz.
    */
  def read: DataFrame =
    state.read.select(
      keys.map(col) ++ Seq(col("cnt")) ++ sumCols.flatMap(c => Seq(
        when(col(s"nnz_$c") === 0, lit(null).cast("double"))
          .otherwise(col(s"sum_$c").cast("double")).as(s"sum_$c"),
        when(col(s"nnz_$c") === 0, lit(null).cast("double"))
          .otherwise(col(s"sum_$c").cast("double") / col(s"nnz_$c"))
          .as(s"avg_$c"))): _*)
}

object IncrementalAgg {
  /** Reopen a materialized view from its state path alone — the
    * definition (source path, keys, sum columns) is read from the state
    * table's properties, recorded by every `refresh()`. The SQL
    * `REFRESH MATERIALIZED VIEW` entry point.
    */
  def open(spark: SparkSession, statePath: String): IncrementalAgg = {
    val st = new ManagedTable(spark, statePath)
    require(st.exists, s"no materialized view state at $statePath")
    val ps = st.properties
    val src = ps.getOrElse("graft.mv.source",
      throw new IllegalArgumentException(s"$statePath records no " +
        "graft.mv.source property — not a graft materialized view (or " +
        "built before definitions were persisted; refresh once via the API)"))
    def list(k: String) =
      ps.get(k).map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    new IncrementalAgg(spark, statePath, new ManagedTable(spark, src),
      list("graft.mv.keys"), list("graft.mv.sums"))
  }
}

package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure MERGE plan rewrites — the reference's DeltaTable MERGE surface
  * (SURVEY.md §2.9, §7.4) re-expressed as deterministic join+union plans.
  * These are the *logical* halves; [[ManagedTable]] adds the transactional
  * write.
  *
  * Scale notes: the anti-join shuffles both sides on the merge key — at
  * 100 TB the source is normally a small delta batch, so Spark's AQE (or an
  * explicit `broadcast(source)`) turns the anti-join into a broadcast join
  * and the target never shuffles. `unionByName` is a zero-cost plan union.
  */
object Merge {

  /** MERGE upsert — `whenMatchedUpdateAll().whenNotMatchedInsertAll()`
    * (deltalake.ipynb:2939–2945 cell 19): source-wins union, i.e. keep
    * target rows whose key has no source match, then all source rows.
    * Precondition (same as the reference's merge): source has at most one
    * row per key.
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    target.join(source, keys, "left_anti").unionByName(source)

  /** MERGE insert-only — `whenNotMatchedInsertAll()` (deltalake.ipynb:
    * 1786–1791 cell 17): target plus source rows whose key is new.
    */
  def insertOnly(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(source.join(target, keys, "left_anti"))

  /** Incremental append with dedup on key (deltalake.ipynb:3227–3238
    * cell 20: existing-dates left-anti then append) — just the new rows.
    */
  def newRowsOnly(source: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame =
    source.join(target, keys, "left_anti")

  /** SCD Type-2 apply: maintain a dimension with (valid_from, valid_to,
    * is_current) history columns. `changes` carries the new attribute
    * values with an effective timestamp column (same name as `effCol`):
    *  - keys present in `changes` close their current row
    *    (valid_to = effective ts, is_current = false) and gain a new
    *    current row;
    *  - unchanged keys pass through.
    * Precondition: one change row per key per batch (dedupe upstream).
    */
  def scd2Apply(dim: DataFrame, changes: DataFrame, keys: Seq[String],
                effCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val changedKeys = changes.select(keys.map(col): _*).distinct()
    val untouched = dim.join(changedKeys, keys, "left_anti")
    val closed = dim.join(changes.select((keys.map(col) :+ col(effCol).as("__eff")): _*), keys)
      .filter(col("is_current"))
      .withColumn("valid_to", col("__eff"))
      .withColumn("is_current", lit(false))
      .drop("__eff")
    val stillHistoric = dim.join(changedKeys, keys, "left_semi")
      .filter(!col("is_current"))
    val opened = changes
      .withColumn("valid_from", col(effCol))
      .withColumn("valid_to", lit(null).cast(dim.schema("valid_to").dataType))
      .withColumn("is_current", lit(true))
      .drop(effCol)
      .select(dim.columns.map(col): _*)
    untouched.unionByName(stillHistoric).unionByName(closed).unionByName(opened)
  }

  /** CDC-style snapshot diff: classify rows of `after` vs `before` on
    * `keys` as inserted / deleted / updated / unchanged. One full-outer
    * join on the keys; value comparison via a hash over the non-key
    * columns (so wide rows don't shuffle twice).
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val valCols = after.columns.filterNot(keys.contains).toSeq
    def hashed(df: DataFrame, h: String) =
      df.withColumn(h, xxhash64(valCols.map(col): _*))
    val b = hashed(before, "__hb").select((keys.map(col) :+ col("__hb")): _*)
    val a = hashed(after, "__ha")
    a.join(b, keys, "full_outer")
      .withColumn("change_type",
        when(col("__hb").isNull, "insert")
          .when(col("__ha").isNull, "delete")
          .when(col("__ha") === col("__hb"), "unchanged")
          .otherwise("update"))
      .drop("__ha", "__hb")
  }

  /** One WHEN clause of a general MERGE (Delta's full clause family —
    * the engine under the reference notebook supports all of these even
    * though the notebook itself uses only UpdateAll+InsertAll).
    * Conditions and assignment expressions reference the two sides
    * through the aliases given to [[applyClauses]] (default `t`/`s`).
    */
  sealed trait MergeClause { def condition: Option[Column] }
  object MergeClause {
    /** UPDATE action — `set = None` means `UPDATE SET *` (every target
      * column takes the same-named source column; columns the source
      * lacks keep their target value). Legal in WHEN MATCHED and WHEN
      * NOT MATCHED BY SOURCE (where source-side references are null —
      * write by-source assignments over target columns only).
      */
    case class Update(condition: Option[Column],
                      set: Option[Map[String, Column]]) extends MergeClause
    /** DELETE action — legal in WHEN MATCHED and WHEN NOT MATCHED BY
      * SOURCE.
      */
    case class Delete(condition: Option[Column]) extends MergeClause
    /** INSERT action — `values = None` means `INSERT *`; with an explicit
      * list, unassigned target columns insert null. WHEN NOT MATCHED
      * [BY TARGET] only.
      */
    case class Insert(condition: Option[Column],
                      values: Option[Map[String, Column]]) extends MergeClause
  }

  /** The general-MERGE plan with a per-row verdict attached: one join,
    * then a first-true-wins `when` cascade per output column — standard
    * SQL MERGE semantics (within each clause group, the first clause
    * whose condition holds acts; rows no clause claims pass through
    * target-side, and unclaimed source-only rows drop).
    *
    * Output: the target's data columns carrying post-clause values,
    * `extraCols` passed through target-side (MOR callers thread
    * `__dv_file`/`__dv_idx` for bitmap marking), and `__merge_action` ∈
    * update / delete / insert / keep / drop.
    *
    * Scale shape: ONE join — full-outer only when an insert clause needs
    * source-only rows, left-outer otherwise (broadcastable small source);
    * everything after is a codegen'd projection. Precondition as for
    * [[upsert]]: at most one source row per key.
    */
  def applyClausesAnnotated(target: DataFrame, source: DataFrame,
      keys: Seq[String],
      matched: Seq[MergeClause], notMatched: Seq[MergeClause],
      bySource: Seq[MergeClause],
      targetAlias: String = "t", sourceAlias: String = "s",
      extraCols: Seq[String] = Nil): DataFrame = {
    import MergeClause._
    require(targetAlias != sourceAlias,
      s"MERGE aliases must differ, got '$targetAlias' for both sides")
    require(matched.forall(!_.isInstanceOf[Insert]),
      "WHEN MATCHED supports UPDATE and DELETE, not INSERT")
    require(bySource.forall(!_.isInstanceOf[Insert]),
      "WHEN NOT MATCHED BY SOURCE supports UPDATE and DELETE, not INSERT")
    require(notMatched.forall(_.isInstanceOf[Insert]),
      "WHEN NOT MATCHED supports INSERT only")
    val t = target.withColumn("__t_present", lit(true)).alias(targetAlias)
    val s = source.withColumn("__s_present", lit(true)).alias(sourceAlias)
    def tc(c: String) = col(s"$targetAlias.$c")
    def sc(c: String) = col(s"$sourceAlias.$c")
    val keyCond = keys.map(k => tc(k) === sc(k)).reduce(_ && _)
    // source-only rows exist in the output only when an insert clause can
    // claim them — without one, a left join keeps the source broadcastable
    val joinType = if (notMatched.nonEmpty) "full_outer" else "left_outer"
    val joined = t.join(s, keyCond, joinType)
    val isM = col("__t_present").isNotNull && col("__s_present").isNotNull
    val tOnly = col("__t_present").isNotNull && col("__s_present").isNull
    val sOnly = col("__t_present").isNull && col("__s_present").isNotNull
    val dataCols = target.columns.filterNot(extraCols.contains).toSeq
    // a typo'd assignment key would otherwise fall through to the
    // keep-target-value default — a silent no-op update (or a null-filled
    // insert); fail at plan time like Delta's resolution error
    def checkAssigned(m: Option[Map[String, Column]], what: String): Unit =
      m.foreach(_.keys.foreach(k =>
        require(dataCols.exists(_.equalsIgnoreCase(k)),
          s"$what names unknown target column '$k' " +
            s"(columns: ${dataCols.mkString(", ")})")))
    (matched ++ bySource).foreach {
      case MergeClause.Update(_, set) => checkAssigned(set, "UPDATE SET")
      case _ => ()
    }
    notMatched.foreach {
      case MergeClause.Insert(_, values) => checkAssigned(values, "INSERT")
      case _ => ()
    }
    val tgtType = target.schema.map(f => f.name -> f.dataType).toMap
    val srcCols = source.columns.toSeq
    def srcCol(c: String): Option[String] =
      srcCols.find(_.equalsIgnoreCase(c))
    def assigned(m: Map[String, Column], c: String): Option[Column] =
      m.collectFirst { case (k, v) if k.equalsIgnoreCase(c) => v }
    def updateValue(set: Option[Map[String, Column]])(c: String): Column =
      set match {
        case None => srcCol(c).map(n => sc(n).cast(tgtType(c))).getOrElse(tc(c))
        case Some(m) =>
          assigned(m, c).map(_.cast(tgtType(c))).getOrElse(tc(c))
      }
    def insertValue(values: Option[Map[String, Column]])(c: String): Column =
      values match {
        case None => srcCol(c).map(n => sc(n).cast(tgtType(c)))
          .getOrElse(lit(null).cast(tgtType(c)))
        case Some(m) => assigned(m, c).map(_.cast(tgtType(c)))
          .getOrElse(lit(null).cast(tgtType(c)))
      }
    def guard(base: Column, cond: Option[Column]) =
      cond.map(base && _).getOrElse(base)
    case class Branch(g: Column, value: String => Column, action: String)
    val branches =
      matched.map {
        case Update(cond, set) => Branch(guard(isM, cond), updateValue(set), "update")
        case Delete(cond) => Branch(guard(isM, cond), tc, "delete")
        case c => throw new IllegalArgumentException(s"bad matched clause $c")
      } ++ bySource.map {
        case Update(cond, set) => Branch(guard(tOnly, cond), updateValue(set), "update")
        case Delete(cond) => Branch(guard(tOnly, cond), tc, "delete")
        case c => throw new IllegalArgumentException(s"bad by-source clause $c")
      } ++ notMatched.map {
        case Insert(cond, values) => Branch(guard(sOnly, cond), insertValue(values), "insert")
        case c => throw new IllegalArgumentException(s"bad not-matched clause $c")
      }
    def cascade(f: Branch => Column, default: Column): Column =
      branches match {
        case Nil => default
        case b +: rest =>
          rest.foldLeft(when(b.g, f(b)))((w, x) => w.when(x.g, f(x)))
            .otherwise(default)
      }
    val action = cascade(b => lit(b.action),
      when(sOnly, lit("drop")).otherwise(lit("keep")))
    joined.select(
      dataCols.map(c => cascade(_.value(c), tc(c)).as(c)) ++
        extraCols.map(c => tc(c).as(c)) :+ action.as("__merge_action"): _*)
  }

  /** General MERGE as a copy-on-write plan: the post-merge table content
    * ([[applyClausesAnnotated]] minus deleted / unclaimed-source rows).
    */
  def applyClauses(target: DataFrame, source: DataFrame, keys: Seq[String],
      matched: Seq[MergeClause], notMatched: Seq[MergeClause],
      bySource: Seq[MergeClause],
      targetAlias: String = "t", sourceAlias: String = "s"): DataFrame =
    applyClausesAnnotated(target, source, keys, matched, notMatched,
      bySource, targetAlias, sourceAlias)
      .filter(col("__merge_action").isin("update", "insert", "keep"))
      .drop("__merge_action")

  /** High-water-mark detection (M4, deltalake.ipynb:1497–1502 cell 15):
    * rows of `df` strictly above the max of `watermarkCol` in `existing`.
    * Expressed as a plan (cross join with the 1-row max, auto-broadcast)
    * rather than a driver-side collect, so it composes lazily.
    */
  def aboveHighWaterMark(df: DataFrame, existing: DataFrame, watermarkCol: String): DataFrame = {
    val hwm = existing.agg(max(col(watermarkCol)).as("__hwm"))
    // null high-water mark (empty `existing`) means everything is new
    df.join(broadcast(hwm),
      col(watermarkCol) > col("__hwm") || col("__hwm").isNull).drop("__hwm")
  }
}

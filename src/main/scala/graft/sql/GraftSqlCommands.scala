package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.table.{IncrementalAgg, ManagedTable}

/** SQL command surface for [[graft.table.ManagedTable]] — the managed-table
  * maintenance/DML statements Delta exposes through its injected parser
  * (deltalake.ipynb's `MERGE INTO` semantics at 2939–2945, `DESCRIBE
  * DETAIL` at 8593–8613, `history()` at 8760), re-expressed as Spark
  * `LeafRunnableCommand`s so they plan and run through the engine's normal
  * eager-command path (`ExecutedCommandExec`) with zero custom physical
  * operators.
  *
  * Grammar (case-insensitive; `<tbl>` is ``graft.`/path` ``, `'/path'` or
  * `"/path"`):
  *
  * {{{
  * DESCRIBE HISTORY <tbl> [LIMIT n]
  * DESCRIBE DETAIL <tbl>
  * ALTER TABLE <tbl> ADD COLUMNS (name type, ...)
  * ALTER TABLE <tbl> ALTER COLUMN name TYPE type
  * SHOW TBLPROPERTIES <tbl>
  * SHOW PARTITIONS <tbl>
  * OPTIMIZE <tbl> [ZORDER BY (c1, c2, ...)] [WHERE <partition pred>]
  * VACUUM <tbl> [RETAIN n HOURS] [DRY RUN]
  * COPY INTO <tbl> FROM '<dir>' FILEFORMAT = PARQUET|CSV
  *   [PATTERN = '<glob>'] [FORMAT_OPTIONS('k' = 'v', ...)] [FORCE]
  * RESTORE [TABLE] <tbl> TO VERSION AS OF v | TIMESTAMP AS OF 'ts'
  * GENERATE symlink_format_manifest FOR TABLE <tbl>
  * ALTER TABLE <tbl> DROP FEATURE '<name>'
  * MERGE INTO <tbl> [AS] t USING <table|view|(subquery)> [AS] s
  *   ON t.k1 = s.k1 [AND t.k2 = s.k2 ...]
  *   [WHEN MATCHED THEN UPDATE SET *]
  *   [WHEN NOT MATCHED THEN INSERT *]
  * }}}
  *
  * MERGE supports exactly the reference's two shapes: UPDATE-ALL +
  * INSERT-ALL (upsert, [[ManagedTable.merge]]) and INSERT-ALL only
  * ([[ManagedTable.mergeInsertOnly]]); the ON clause must be a conjunction
  * of same-named column equalities, which is what keyed MERGE means here.
  * Partition columns for the partition-pruned rewrite come from the
  * table's own commit log, so SQL callers get file pruning for free.
  *
  * Anything not matching the grammar above falls through to the delegate
  * Spark parser untouched (see [[GraftSqlParser]]).
  */
object GraftSqlCommands {

  private def attrs(fields: (String, DataType)*): Seq[Attribute] =
    fields.map { case (n, t) => AttributeReference(n, t, nullable = true)() }

  /** Output schema of DESCRIBE HISTORY — mirrors [[ManagedTable.history]]. */
  private[sql] val historyAttrs: Seq[Attribute] = attrs(
    "version" -> LongType, "timestamp" -> StringType,
    "operation" -> StringType,
    "partitionColumns" -> ArrayType(StringType),
    "numFiles" -> LongType, "sizeInBytes" -> LongType,
    "rowCount" -> LongType, "filesAdded" -> LongType,
    "filesRemoved" -> LongType, "rowDelta" -> LongType,
    "bytesAdded" -> LongType)

  /** Output schema of DESCRIBE DETAIL — mirrors [[ManagedTable.detail]]. */
  private[sql] val detailAttrs: Seq[Attribute] = attrs(
    "format" -> StringType, "name" -> StringType, "location" -> StringType,
    "partition_columns" -> ArrayType(StringType),
    "clustering_columns" -> ArrayType(StringType),
    "num_files" -> LongType, "size_in_bytes" -> LongType,
    "version" -> LongType, "created_at" -> StringType,
    "last_modified" -> StringType, "properties" -> ArrayType(StringType))

  case class DescribeHistoryCommand(path: String, limit: Option[Int])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = historyAttrs
    override def run(spark: SparkSession): Seq[Row] =
      new ManagedTable(spark, path)
        .history(limit.getOrElse(Int.MaxValue)).collect().toSeq
  }

  case class ShowTblPropertiesCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(
      "key" -> StringType, "value" -> StringType)
    override def run(spark: SparkSession): Seq[Row] =
      new ManagedTable(spark, path).properties.toSeq.sorted
        .map { case (k, v) => Row(k, v) }
  }

  case class DescribeDetailCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = detailAttrs
    override def run(spark: SparkSession): Seq[Row] =
      new ManagedTable(spark, path).detail().collect().toSeq
  }

  /** SHOW PARTITIONS in Spark's one-string-per-partition shape
    * (`day=d1/hour=3`), plus the metadata-fold inventory columns — all
    * served from listing + sidecar, zero data files opened.
    */
  case class ShowPartitionsCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(
      "partition" -> StringType, "num_files" -> LongType,
      "size_bytes" -> LongType, "row_count" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val df = new ManagedTable(spark, path).partitions()
      val n = df.schema.fields.length - 3
      df.collect().toSeq.map { r =>
        // re-escape values into the on-disk dir form (Spark's own SHOW
        // PARTITIONS shape): an unescaped value containing '/' or '='
        // would render ambiguously against the segment separators
        val part = (0 until n).map(i =>
          df.schema.fields(i).name + "=" +
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .escapePathName(String.valueOf(r.get(i))))
          .mkString("/")
        Row(part, r.getLong(n), r.getLong(n + 1), r.getLong(n + 2))
      }
    }
  }

  /** OPTIMIZE: plain form compacts to ceil(bytes / targetFileBytes) files
    * (Delta's size-targeted bin-packing, 128 MB default); ZORDER BY runs
    * the true Morton-key clustering ([[ManagedTable.clusterZ]]); CLUSTER
    * BY runs the Hilbert-curve layout ([[ManagedTable.clusterHilbert]] —
    * liquid clustering's curve, tighter per-file bounds than Morton).
    */
  case class OptimizeCommand(path: String, zorderBy: Seq[String],
      whereText: Option[String] = None,
      targetFileBytes: Long = 128L * 1024 * 1024,
      hilbert: Boolean = false)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(
      "path" -> StringType, "files_before" -> LongType,
      "files_after" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.expr
      val t = new ManagedTable(spark, path)
      val before = t.detail().select("num_files").head.getLong(0)
      if (whereText.nonEmpty) {
        // partition-scoped compaction: the predicate must cover partition
        // columns only (compactWhere enforces a partitioned table); one
        // compacted file lands per matched partition dir
        require(zorderBy.isEmpty, "OPTIMIZE ... WHERE does not take ZORDER/CLUSTER BY")
        t.compactWhere(expr(whereText.get))
      }
      else if (zorderBy.nonEmpty) {
        if (hilbert) t.clusterHilbert(zorderBy) else t.clusterZ(zorderBy)
      }
      else {
        // liquid semantics: a table with declared clustering keys
        // (graft.clusterBy) treats plain OPTIMIZE as INCREMENTAL
        // clustering — only files appended since the last pass move
        val declared = t.properties.get("graft.clusterBy")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .filter(_.nonEmpty)
        declared match {
          case Some(cols) =>
            val curve = t.properties.getOrElse("graft.clusterCurve", "hilbert")
            t.clusterIncremental(cols, curve = curve,
              targetFileBytes = targetFileBytes)
          case None =>
            val bytes = t.detail().select("size_in_bytes").head.getLong(0)
            t.compact(math.max(1L,
              (bytes + targetFileBytes - 1) / targetFileBytes).toInt)
        }
      }
      val after = t.detail().select("num_files").head.getLong(0)
      Seq(Row(path, before, after))
    }
  }

  /** VACUUM with Delta's default 168 h retention; DRY RUN lists the
    * retained snapshot dirs that would be dropped without touching them.
    */
  case class VacuumCommand(path: String, retainHours: Option[Double],
      dryRun: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("path" -> StringType)
    override def run(spark: SparkSession): Seq[Row] = {
      val t = new ManagedTable(spark, path)
      val cutoff = java.time.Instant.now().minusMillis(
        (retainHours.getOrElse(168.0) * 3600 * 1000).toLong)
      val dropped = t.vacuumDryRun(cutoff)
      if (!dryRun) t.vacuumVersions(cutoff)
      dropped.map(Row(_))
    }
  }

  case class RestoreCommand(path: String, version: Option[Long],
      timestamp: Option[String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(
      "path" -> StringType, "new_version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val t = new ManagedTable(spark, path)
      version match {
        case Some(v) => t.restore(v)
        case None => t.restoreAsOf(timestamp.get)
      }
      Seq(Row(path, t.version))
    }
  }

  /** `CREATE MATERIALIZED VIEW '<state>' ON '<source>' GROUP BY (keys)
    * [SUM (cols)]` — build (or rebuild) an incrementally-maintained
    * aggregate view ([[graft.table.IncrementalAgg]]) and run its first
    * refresh; the definition persists on the state table so later
    * REFRESH statements need only the state path.
    */
  case class CreateMvCommand(statePath: String, sourcePath: String,
      keys: Seq[String], sums: Seq[String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("path" -> StringType,
      "mode" -> StringType, "source_version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val src = new ManagedTable(spark, sourcePath)
      require(src.exists, s"CREATE MATERIALIZED VIEW: source $sourcePath " +
        "does not exist — write it first (a view over an empty source has " +
        "no state to build)")
      val mv = new IncrementalAgg(spark, statePath, src, keys, sums)
      val mode = mv.refresh()
      Seq(Row(statePath, mode, mv.refreshedVersion))
    }
  }

  /** `REFRESH MATERIALIZED VIEW '<state>'` — bring a persisted view to
    * its source's current version (incremental when the commit window
    * allows, [[graft.table.IncrementalAgg.refresh]]).
    */
  case class RefreshMvCommand(statePath: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("path" -> StringType,
      "mode" -> StringType, "source_version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val mv = IncrementalAgg.open(spark, statePath)
      val mode = mv.refresh()
      Seq(Row(statePath, mode, mv.refreshedVersion))
    }
  }

  /** One parsed WHEN clause of a general MERGE, still in text form (the
    * command re-parses expressions at run time against the session).
    * `group` ∈ matched / not_matched / by_source; `kind` ∈ update_all /
    * update / delete / insert_all / insert.
    */
  case class MergeWhen(group: String, kind: String,
      condition: Option[String], assignments: Seq[(String, String)] = Nil)

  /** Keyed MERGE: `sourceText` is re-parsed by the session (so views,
    * tables and subqueries all work); partition columns for the pruned
    * rewrite are read from the target's latest commit. The classic
    * UpdateAll+InsertAll / insert-only shapes keep the specialized
    * anti-join plans (`clauses` empty); everything else — conditional
    * clauses, matched DELETE, explicit SET/VALUES, NOT MATCHED BY SOURCE —
    * runs through the clause-family builder, merge-on-read when the
    * table enables deletion vectors.
    */
  case class MergeIntoGraftCommand(path: String, sourceText: String,
      keys: Seq[String], insertOnly: Boolean,
      schemaEvolution: Boolean = false,
      clauses: Seq[MergeWhen] = Nil,
      targetAlias: String = "t", sourceAlias: String = "s")
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("num_source_rows" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val src = sourceText.trim
      val source =
        (if (src.startsWith("(")) spark.sql(src.stripPrefix("(").stripSuffix(")"))
         else spark.table(src)).persist()
      // count from the cached snapshot BEFORE the merge — re-running the
      // source query after the mutation would double its cost and report
      // the post-merge state for a self-referential source. The count is
      // INSIDE the try: a failing source must still unpersist.
      try {
      val nSource = source.count()
      val t = new ManagedTable(spark, path)
      val partCols = latestPartitionCols(t)
      val useDv = t.properties.get("graft.enableDeletionVectors")
        .exists(_.equalsIgnoreCase("true"))
      if (clauses.nonEmpty) {
        val b = t.mergeBuilder(source, keys, partCols, targetAlias, sourceAlias)
        clauses.foreach { c =>
          val cond = c.condition.orNull
          (c.group, c.kind) match {
            case ("matched", "update_all") => b.whenMatchedUpdateAll(cond)
            case ("matched", "update") =>
              b.whenMatchedUpdate(c.assignments.toMap, cond)
            case ("matched", "delete") => b.whenMatchedDelete(cond)
            case ("not_matched", "insert_all") => b.whenNotMatchedInsertAll(cond)
            case ("not_matched", "insert") =>
              b.whenNotMatchedInsert(c.assignments.toMap, cond)
            case ("by_source", "update") =>
              b.whenNotMatchedBySourceUpdate(c.assignments.toMap, cond)
            case ("by_source", "delete") => b.whenNotMatchedBySourceDelete(cond)
            case other => throw new IllegalStateException(s"bad clause $other")
          }
        }
        if (schemaEvolution) b.withSchemaEvolution()
        // the DV (merge-on-read) path appends only replacement copies, so
        // a widened schema would leave old files unreadable without
        // mergeSchema — an evolving MERGE takes the rewriting path instead
        if (useDv && !schemaEvolution) b.executeVectored() else b.execute()
      }
      else if (insertOnly)
        t.mergeInsertOnly(source, keys, partCols, allowEvolution = schemaEvolution)
      else if (useDv && !schemaEvolution) t.mergeVectored(source, keys, partCols)
      else t.merge(source, keys, partCols, allowEvolution = schemaEvolution)
      Seq(Row(nSource))
      } finally source.unpersist()
    }
  }

  /** SYNC — one-statement snapshot mirror ([[ManagedTable.syncFrom]], the
    * `WHEN NOT MATCHED BY SOURCE` pattern packaged): make the target
    * exactly mirror the source snapshot — matched keys update, new keys
    * insert, keys the source no longer carries delete. The CDC-less way
    * to track an externally-refreshed table from SQL.
    */
  case class SyncGraftCommand(path: String, sourcePath: Option[String],
      sourceQuery: Option[String], keys: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("num_source_rows" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val source = (sourceQuery match {
        case Some(q) => spark.sql(q)
        case None => new ManagedTable(spark, sourcePath.get).read
      }).persist()
      // count BEFORE the merge and from the cached snapshot: re-running
      // the query after the mutation would double the source cost and,
      // for a self-referential source, report the post-sync state
      try {
        val n = source.count()
        val t = new ManagedTable(spark, path)
        t.syncFrom(source, keys, latestPartitionCols(t))
        Seq(Row(n))
      } finally source.unpersist()
    }
  }

  /** Partition columns recorded in the target's latest commit — what the
    * DML/MERGE commands pass so the partition-pruned rewrite paths engage
    * without the SQL caller naming them.
    */
  private def latestPartitionCols(t: ManagedTable): Seq[String] =
    if (!t.exists) Nil
    else {
      val h = t.history(1).select("partitionColumns").collect()
      if (h.isEmpty) Nil else h.head.getSeq[String](0)
    }

  /** Column names a SQL expression references (unresolved attribute names,
    * lowercased) — used to detect partition-only predicates.
    */
  private def referencedCols(sqlExpr: String): Set[String] = {
    import org.apache.spark.sql.functions.expr
    org.apache.spark.sql.GraftBridge.expression(expr(sqlExpr))
      .references.map(_.name.toLowerCase).toSet
  }

  /** DELETE FROM: rows matching the predicate are removed. A predicate
    * over partition columns only takes [[ManagedTable.deleteScoped]] —
    * the pruned rewrite that touches matching partitions alone (the 100 TB
    * path); anything else rewrites the table via the atomic swap.
    */
  case class DeleteFromGraftCommand(path: String, whereText: Option[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.{expr, lit}
      val t = new ManagedTable(spark, path)
      val pcs = latestPartitionCols(t)
      val cond = whereText.map(expr).getOrElse(lit(true))
      val partitionOnly = whereText.exists(w =>
        pcs.nonEmpty && referencedCols(w).subsetOf(pcs.map(_.toLowerCase).toSet))
      // graft.enableDeletionVectors=true (Delta's table feature of the same
      // role) switches non-partition deletes to merge-on-read bitmaps; a
      // partition-only predicate stays on the pruned dir swap, which beats
      // marking every row of a dropped partition
      val useDv = t.properties.get("graft.enableDeletionVectors")
        .exists(_.equalsIgnoreCase("true"))
      if (partitionOnly) t.deleteScoped(cond, cond, pcs)
      // a predicate-free (full-table) delete must DROP the files, not
      // bitmap every row of every file — the degenerate DV case
      else if (useDv && whereText.nonEmpty) t.deleteVectored(cond, pcs)
      else t.delete(cond, pcs)
      Nil
    }
  }

  /** UPDATE … SET: assignments applied to rows matching the predicate;
    * a partition-only predicate takes the pruned
    * [[ManagedTable.updateScoped]] rewrite.
    */
  case class UpdateGraftCommand(path: String, setText: Seq[(String, String)],
      whereText: Option[String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.{expr, lit}
      val t = new ManagedTable(spark, path)
      val pcs = latestPartitionCols(t)
      val cond = whereText.map(expr).getOrElse(lit(true))
      val set = setText.map { case (c, e) => c -> expr(e) }.toMap
      val partitionOnly = whereText.exists(w =>
        pcs.nonEmpty && referencedCols(w).subsetOf(pcs.map(_.toLowerCase).toSet))
      // a predicate-free UPDATE touches every row: bitmapping the whole
      // table and appending a full replacement copy (the DV path) doubles
      // storage and taxes every later read for zero write saving — same
      // guard the DELETE command applies
      val useDv = whereText.nonEmpty &&
        t.properties.get("graft.enableDeletionVectors")
          .exists(_.equalsIgnoreCase("true"))
      if (partitionOnly) t.updateScoped(cond, cond, set, pcs)
      else if (useDv) t.updateVectored(cond, set, pcs)
      else t.update(cond, set, pcs)
      Nil
    }
  }

  /** INSERT INTO (append) / INSERT OVERWRITE (replace) from any query the
    * session can run; CREATE OR REPLACE TABLE … AS SELECT materializes a
    * new table, with optional PARTITIONED BY.
    */
  case class InsertGraftCommand(path: String, queryText: String,
      overwrite: Boolean, partitionBy: Seq[String],
      isCtas: Boolean = false,
      tblProperties: Map[String, String] = Map.empty)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      val t = new ManagedTable(spark, path)
      val df = spark.sql(queryText)
      // CREATE OR REPLACE defines a NEW table: with no PARTITIONED BY the
      // new table is UNPARTITIONED — inheriting the replaced table's
      // layout would fail when the new query lacks the old partition
      // column, or silently keep a layout the statement never asked for.
      // Plain INSERTs conform to the existing table's layout as before.
      val pcs =
        if (partitionBy.nonEmpty) partitionBy
        else if (isCtas) Nil
        else latestPartitionCols(t)
      // INSERT INTO is a blind append — route it through the optimistic
      // commit (leaseless staging, short rename+manifest critical section)
      // like Delta, where every transactional write is OCC; identity-column
      // and founding writes fall back to the locked path inside
      if (overwrite) t.overwrite(df, pcs) else t.appendOptimistic(df, pcs)
      // CREATE OR REPLACE defines a NEW table: the property set is replaced
      // wholesale (an inherited enableDeletionVectors must not survive),
      // and only AFTER the data write, so a failed query changes nothing
      if (isCtas) {
        val stale = t.properties.keys.toSeq.filterNot(tblProperties.contains)
        if (stale.nonEmpty) t.unsetProperties(stale)
        if (tblProperties.nonEmpty) t.setProperties(tblProperties)
      }
      Nil
    }
  }

  /** INSERT INTO … REPLACE WHERE (Delta's replaceWhere SQL form): the
    * predicate-scoped overwrite [[ManagedTable.overwriteWhere]] — one
    * atomic commit that deletes the matching rows and inserts the query's
    * result, with the incoming-rows-must-match check. Partition columns
    * come from the latest commit so a partition-only predicate engages
    * the pruned swap without the caller naming them.
    */
  case class InsertReplaceWhereCommand(path: String, condText: String,
      queryText: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.expr
      val t = new ManagedTable(spark, path)
      t.overwriteWhere(spark.sql(queryText), expr(condText), latestPartitionCols(t))
      Nil
    }
  }

  /** CREATE TABLE … [SHALLOW|DEEP] CLONE … (Delta's CLONE SQL): DEEP (the
    * default, matching Delta) byte-copies the data distributed; SHALLOW
    * writes a founding commit referencing the source's files — zero data
    * movement at any size.
    */
  case class CloneTableCommand(sourcePath: String, targetPath: String,
      shallow: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(
      "path" -> StringType, "version" -> LongType,
      "shallow" -> org.apache.spark.sql.types.BooleanType)
    override def run(spark: SparkSession): Seq[Row] = {
      val s = new ManagedTable(spark, sourcePath)
      val t = if (shallow) s.shallowCloneTo(targetPath) else s.cloneTo(targetPath)
      Seq(Row(targetPath, t.version, shallow))
    }
  }

  /** COPY INTO — idempotent file ingestion ([[ManagedTable.copyInto]]):
    * loads only source files no previous COPY INTO committed, so the
    * statement is safe to re-run on a schedule over a landing zone.
    */
  case class CopyIntoCommand(path: String, srcDir: String, format: String,
      pattern: Option[String], options: Map[String, String], force: Boolean)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(
      "path" -> StringType, "files_loaded" -> LongType,
      "rows_loaded" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val (f, r) = new ManagedTable(spark, path)
        .copyInto(srcDir, format, options, pattern, force)
      Seq(Row(path, f, r))
    }
  }

  /** CONVERT TO GRAFT — adopt an existing plain-parquet dir into the
    * commit log ([[ManagedTable.bootstrap]]); Delta's `CONVERT TO DELTA`.
    */
  case class ConvertToGraftCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(
      "path" -> StringType, "version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val t = new ManagedTable(spark, path)
      t.bootstrap()
      Seq(Row(path, t.version))
    }
  }

  /** The ALTER TABLE surface graft supports: CHECK constraints and column
    * rename/drop (each a logged operation on the managed table). DDL
    * returns no rows, matching Spark/Delta ALTER semantics.
    */
  case class AlterTableGraftCommand(path: String,
      alter: ManagedTable => Unit) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      alter(new ManagedTable(spark, path))
      Nil
    }
    // `alter` is a closure: print by path only
    override def simpleString(maxFields: Int): String = s"AlterTableGraftCommand $path"
  }

  // ---- the grammar ------------------------------------------------------

  // graft.`/path`  |  '/path'  |  "/path"
  private val Tbl = """(?:graft\.`([^`]+)`|'([^']+)'|"([^"]+)")"""
  private def tbl(m: java.util.regex.Matcher, g: Int): String =
    Seq(m.group(g), m.group(g + 1), m.group(g + 2)).find(_ != null).get

  private def rx(pattern: String) = java.util.regex.Pattern.compile(
    pattern, java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.DOTALL)

  private val DescHistory =
    rx(s"""^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Tbl\\s*(?:LIMIT\\s+(\\d+))?\\s*;?\\s*$$""")
  private val DescDetail =
    rx(s"""^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Tbl\\s*;?\\s*$$""")
  private val Optimize =
    rx(s"""^\\s*OPTIMIZE\\s+$Tbl\\s*(?:(ZORDER|CLUSTER)\\s+BY\\s*\\(([^)]+)\\))?(?:\\s*WHERE\\s+(.+?))?\\s*;?\\s*$$""")
  private val Vacuum =
    rx(s"""^\\s*VACUUM\\s+$Tbl\\s*(?:RETAIN\\s+([0-9.]+)\\s+HOURS?)?(\\s+DRY\\s+RUN)?\\s*;?\\s*$$""")
  private val Restore =
    rx(s"""^\\s*RESTORE\\s+(?:TABLE\\s+)?$Tbl\\s+TO\\s+(?:VERSION\\s+AS\\s+OF\\s+(\\d+)|TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')\\s*;?\\s*$$""")
  private val Convert =
    rx(s"""^\\s*CONVERT\\s+TO\\s+GRAFT\\s+$Tbl\\s*;?\\s*$$""")
  private val CopyInto =
    rx(s"""^\\s*COPY\\s+INTO\\s+$Tbl\\s+FROM\\s+'([^']+)'\\s+FILEFORMAT\\s*=\\s*(\\w+)(?:\\s+PATTERN\\s*=\\s*'([^']+)')?(?:\\s+FORMAT_OPTIONS\\s*\\((.+?)\\))?(\\s+FORCE)?\\s*;?\\s*$$""")
  private val Clone =
    rx(s"""^\\s*CREATE\\s+TABLE\\s+$Tbl\\s+(SHALLOW\\s+|DEEP\\s+)?CLONE\\s+$Tbl\\s*;?\\s*$$""")
  private val Delete =
    rx(s"""^\\s*DELETE\\s+FROM\\s+$Tbl\\s*(?:WHERE\\s+(.+?))?\\s*;?\\s*$$""")
  private val Update =
    rx(s"""^\\s*UPDATE\\s+$Tbl\\s+SET\\s+(.+?)\\s*;?\\s*$$""")
  private val Insert =
    rx(s"""^\\s*INSERT\\s+(INTO|OVERWRITE)\\s+$Tbl\\s+((?:SELECT|VALUES|TABLE|WITH|FROM)\\b.+?)\\s*;?\\s*$$""")
  private val InsertReplaceWhere =
    rx(s"""^\\s*INSERT\\s+INTO\\s+$Tbl\\s+REPLACE\\s+WHERE\\s+(.+?)\\s*;?\\s*$$""")
  private val Ctas =
    rx(s"""^\\s*CREATE\\s+OR\\s+REPLACE\\s+TABLE\\s+$Tbl\\s*(?:PARTITIONED\\s+BY\\s*\\(([^)]+)\\)\\s*)?(?:TBLPROPERTIES\\s*\\((.+?)\\)\\s*)?AS\\s+(.+?)\\s*;?\\s*$$""")
  private val AlterAddConstraint =
    rx(s"""^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*$$""")
  private val AlterDropConstraint =
    rx(s"""^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*;?\\s*$$""")
  private val AlterAddColumns =
    rx(s"""^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+ADD\\s+COLUMNS?\\s*\\((.+)\\)\\s*;?\\s*$$""")
  private val AlterColumnType =
    rx(s"""^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+TYPE\\s+(.+?)\\s*;?\\s*$$""")
  private val AlterRenameColumn =
    rx(s"""^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+RENAME\\s+COLUMN\\s+(\\w+)\\s+TO\\s+(\\w+)\\s*;?\\s*$$""")
  private val AlterDropColumn =
    rx(s"""^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+DROP\\s+COLUMN\\s+(\\w+)\\s*;?\\s*$$""")
  private val ShowProps =
    rx(s"""^\\s*SHOW\\s+TBLPROPERTIES\\s+$Tbl\\s*;?\\s*$$""")
  private val ShowParts =
    rx(s"""^\\s*SHOW\\s+PARTITIONS\\s+$Tbl\\s*;?\\s*$$""")
  private val AlterSetProps =
    rx(s"""^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*$$""")
  private val AlterUnsetProps =
    rx(s"""^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+UNSET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*$$""")
  private val AlterAddIdentity =
    rx(s"""^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+ADD\\s+IDENTITY\\s+COLUMN\\s+(\\w+)(?:\\s+START\\s+WITH\\s+(-?\\d+))?(?:\\s+INCREMENT\\s+BY\\s+(-?\\d+))?\\s*;?\\s*$$""")
  private val CreateMv =
    rx(s"""^\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+$Tbl\\s+ON\\s+$Tbl\\s+GROUP\\s+BY\\s*\\(([^)]*)\\)(?:\\s+SUM\\s*\\(([^)]*)\\))?\\s*;?\\s*$$""")
  private val RefreshMv =
    rx(s"""^\\s*REFRESH\\s+MATERIALIZED\\s+VIEW\\s+$Tbl\\s*;?\\s*$$""")
  private val Reorg =
    rx(s"""^\\s*REORG\\s+TABLE\\s+$Tbl\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*$$""")
  private val GenerateManifest =
    rx(s"""^\\s*GENERATE\\s+symlink_format_manifest\\s+FOR\\s+TABLE\\s+$Tbl\\s*;?\\s*$$""")
  private val DropFeature =
    rx(s"""^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+DROP\\s+FEATURE\\s+'?([\\w-]+)'?\\s*;?\\s*$$""")
  private val Sync =
    rx(s"""^\\s*SYNC\\s+$Tbl\\s+FROM\\s+(?:$Tbl|(\\(.+\\)))\\s+ON\\s*\\(([^)]+)\\)\\s*;?\\s*$$""")
  private val MergePrefix = rx(s"""^\\s*MERGE\\s+(WITH\\s+SCHEMA\\s+EVOLUTION\\s+)?INTO\\s+$Tbl\\s*(?:AS\\s+)?(\\w+)?\\s+USING\\s+""")
  /** First index where one of `words` appears as a whole word OUTSIDE
    * single-quoted literals (doubled '' quotes toggle twice and stay
    * closed), outside `CASE … END` expressions (whose internal WHEN/THEN
    * must never split a MERGE clause), and, with `trackParens`, outside
    * any parentheses — the SQL splitter a reluctant regex cannot be.
    * Backtick-quoted identifiers are opaque (so columns named `case` /
    * `end` / `when` parse when quoted, Spark's own escape hatch); a BARE
    * column literally named case or end would mis-balance the CASE
    * tracking — backquote it.
    */
  private def indexOfTopLevel(s: String, words: Seq[String],
                              trackParens: Boolean = false): Int = {
    var i = 0; var inQ = false; var inBt = false
    var depth = 0; var caseDepth = 0
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    def wordAt(i: Int, w: String): Boolean =
      s.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isWordChar(s.charAt(i - 1))) &&
        (i + w.length == s.length || !isWordChar(s.charAt(i + w.length)))
    while (i < s.length) {
      val c = s.charAt(i)
      // Spark's default (non-ANSI) parser also accepts backslash-escaped
      // quotes ('don\'t'); skip the escaped char while in a literal so the
      // quote state doesn't invert and swallow a real top-level keyword
      if (inQ && c == '\\' && i + 1 < s.length) i += 1
      else if (!inBt && c == '\'') inQ = !inQ
      else if (!inQ && c == '`') inBt = !inBt
      else if (inQ || inBt) ()
      else if (trackParens && c == '(') depth += 1
      else if (trackParens && c == ')') depth -= 1
      else if (wordAt(i, "CASE")) { caseDepth += 1; i += 3 }
      else if (caseDepth > 0 && wordAt(i, "END")) { caseDepth -= 1; i += 2 }
      else if (depth == 0 && caseDepth == 0)
        words.foreach { w => if (wordAt(i, w)) return i }
      i += 1
    }
    -1
  }

  private val KeyEquality =
    rx("""^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$""")

  /** Parse a graft SQL statement; `None` means "not ours — delegate".
    * A statement that starts like a graft command but is malformed throws
    * with a pointed message instead of falling through to a delegate that
    * can only produce a generic syntax error.
    */
  def parse(sqlText: String): Option[LeafRunnableCommand] = {
    val dh = DescHistory.matcher(sqlText)
    if (dh.matches())
      return Some(DescribeHistoryCommand(tbl(dh, 1), Option(dh.group(4)).map(_.toInt)))
    val dd = DescDetail.matcher(sqlText)
    if (dd.matches()) return Some(DescribeDetailCommand(tbl(dd, 1)))
    val op = Optimize.matcher(sqlText)
    if (op.matches()) {
      val cols = Option(op.group(5)).map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)
      val hilbert = Option(op.group(4)).exists(_.equalsIgnoreCase("CLUSTER"))
      return Some(OptimizeCommand(tbl(op, 1), cols, Option(op.group(6)),
        hilbert = hilbert))
    }
    val va = Vacuum.matcher(sqlText)
    if (va.matches())
      return Some(VacuumCommand(tbl(va, 1),
        Option(va.group(4)).map(_.toDouble), va.group(5) != null))
    val re = Restore.matcher(sqlText)
    if (re.matches())
      return Some(RestoreCommand(tbl(re, 1),
        Option(re.group(4)).map(_.toLong), Option(re.group(5))))
    val cv = Convert.matcher(sqlText)
    if (cv.matches()) return Some(ConvertToGraftCommand(tbl(cv, 1)))
    val ci = CopyInto.matcher(sqlText)
    if (ci.matches())
      return Some(CopyIntoCommand(tbl(ci, 1), ci.group(4), ci.group(5),
        Option(ci.group(6)),
        Option(ci.group(7)).map(parsePropertyPairs).getOrElse(Map.empty),
        force = ci.group(8) != null))
    val cl = Clone.matcher(sqlText)
    if (cl.matches())
      return Some(CloneTableCommand(tbl(cl, 5), tbl(cl, 1),
        shallow = Option(cl.group(4)).exists(_.trim.equalsIgnoreCase("SHALLOW"))))
    val del = Delete.matcher(sqlText)
    if (del.matches())
      return Some(DeleteFromGraftCommand(tbl(del, 1), Option(del.group(4))))
    val up = Update.matcher(sqlText)
    if (up.matches()) {
      // quote/paren-aware SET|WHERE split: a 'where' inside a string
      // literal or a scalar-subquery paren must not start the predicate
      val tail = up.group(4)
      val wIdx = indexOfTopLevel(tail, Seq("WHERE"), trackParens = true)
      val (setT, whereT) =
        if (wIdx < 0) (tail, None)
        else (tail.substring(0, wIdx).trim,
          Some(tail.substring(wIdx + "WHERE".length).trim))
      return Some(UpdateGraftCommand(tbl(up, 1),
        parseAssignments(setT), whereT))
    }
    val irw = InsertReplaceWhere.matcher(sqlText)
    if (irw.matches()) {
      // the predicate|query split walks to the first TOP-LEVEL query
      // keyword — one inside the predicate's quotes or subquery parens
      // (dt IN (SELECT ...)) must not cut the statement in half
      val tail = irw.group(4)
      val qIdx = indexOfTopLevel(tail,
        Seq("SELECT", "VALUES", "TABLE", "WITH", "FROM"), trackParens = true)
      if (qIdx <= 0) throw new IllegalArgumentException(
        "INSERT INTO ... REPLACE WHERE needs <predicate> followed by a query")
      return Some(InsertReplaceWhereCommand(tbl(irw, 1),
        tail.substring(0, qIdx).trim, tail.substring(qIdx)))
    }
    val ins = Insert.matcher(sqlText)
    if (ins.matches())
      return Some(InsertGraftCommand(tbl(ins, 2), ins.group(5),
        overwrite = ins.group(1).equalsIgnoreCase("OVERWRITE"), Nil))
    val ct = Ctas.matcher(sqlText)
    if (ct.matches()) {
      val pby = Option(ct.group(4)).map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)
      val props = Option(ct.group(5))
        .map(parsePropertyPairs).getOrElse(Map.empty[String, String])
      return Some(InsertGraftCommand(tbl(ct, 1), ct.group(6),
        overwrite = true, pby, isCtas = true, tblProperties = props))
    }
    val ac = AlterAddConstraint.matcher(sqlText)
    if (ac.matches()) {
      val (name, expr) = (ac.group(4), ac.group(5))
      return Some(AlterTableGraftCommand(tbl(ac, 1), _.addConstraint(name, expr)))
    }
    val dc = AlterDropConstraint.matcher(sqlText)
    if (dc.matches()) {
      val name = dc.group(4)
      return Some(AlterTableGraftCommand(tbl(dc, 1), _.dropConstraint(name)))
    }
    val acs = AlterAddColumns.matcher(sqlText)
    if (acs.matches()) {
      val ddl = acs.group(4)
      return Some(AlterTableGraftCommand(tbl(acs, 1), _.addColumns(ddl)))
    }
    val act = AlterColumnType.matcher(sqlText)
    if (act.matches()) {
      val (colName, typeDdl) = (act.group(4), act.group(5))
      return Some(AlterTableGraftCommand(tbl(act, 1),
        _.alterColumnType(colName, typeDdl)))
    }
    val rc = AlterRenameColumn.matcher(sqlText)
    if (rc.matches()) {
      val (from, to) = (rc.group(4), rc.group(5))
      return Some(AlterTableGraftCommand(tbl(rc, 1), _.renameColumn(from, to)))
    }
    val xc = AlterDropColumn.matcher(sqlText)
    if (xc.matches()) {
      val colName = xc.group(4)
      return Some(AlterTableGraftCommand(tbl(xc, 1), _.dropColumn(colName)))
    }
    val shp = ShowProps.matcher(sqlText)
    if (shp.matches()) return Some(ShowTblPropertiesCommand(tbl(shp, 1)))
    val shpa = ShowParts.matcher(sqlText)
    if (shpa.matches()) return Some(ShowPartitionsCommand(tbl(shpa, 1)))
    val sp = AlterSetProps.matcher(sqlText)
    if (sp.matches()) {
      val pairs = parsePropertyPairs(sp.group(4))
      return Some(AlterTableGraftCommand(tbl(sp, 1), { t =>
        // enabling row tracking is MORE than a property write: current
        // files need their id bases assigned (Delta's same dispatch for
        // delta.enableRowTracking) — route through the real enable
        val (rowTracking, rest) =
          pairs.partition { case (k, v) =>
            k.equalsIgnoreCase("graft.rowTracking") &&
              v.equalsIgnoreCase("true") }
        // column mapping likewise: the enable records the reader feature
        // gate, not just the property; 'none' routes through the DISABLE
        // path (one locked rewrite to logical names + mapping clear) — a
        // bare property write would leave files physical and reads wrong
        val (colMapping, rest2) =
          rest.partition { case (k, v) =>
            k.equalsIgnoreCase("graft.columnMapping") &&
              v.equalsIgnoreCase("name") }
        val (colMappingOff, plain) =
          rest2.partition { case (k, v) =>
            k.equalsIgnoreCase("graft.columnMapping") &&
              v.equalsIgnoreCase("none") }
        if (plain.nonEmpty) t.setProperties(plain)
        if (rowTracking.nonEmpty) t.enableRowTracking()
        if (colMapping.nonEmpty) t.enableColumnMapping()
        if (colMappingOff.nonEmpty) t.disableColumnMapping()
      }))
    }
    val upr = AlterUnsetProps.matcher(sqlText)
    if (upr.matches()) {
      val keys = parsePropertyKeys(upr.group(4))
      return Some(AlterTableGraftCommand(tbl(upr, 1), _.unsetProperties(keys)))
    }
    val ai = AlterAddIdentity.matcher(sqlText)
    if (ai.matches()) {
      val (name, st, inc) = (ai.group(4),
        Option(ai.group(5)).map(_.toLong).getOrElse(1L),
        Option(ai.group(6)).map(_.toLong).getOrElse(1L))
      return Some(AlterTableGraftCommand(tbl(ai, 1),
        _.addIdentityColumn(name, st, inc)))
    }
    val rg = Reorg.matcher(sqlText)
    if (rg.matches())
      return Some(AlterTableGraftCommand(tbl(rg, 1), _.purgeDeletes()))
    val gm = GenerateManifest.matcher(sqlText)
    if (gm.matches())
      return Some(AlterTableGraftCommand(tbl(gm, 1),
        _.generateSymlinkManifest()))
    val dft = DropFeature.matcher(sqlText)
    if (dft.matches()) {
      val feature = dft.group(4)
      return Some(AlterTableGraftCommand(tbl(dft, 1),
        _.dropTableFeature(feature)))
    }
    val cmv = CreateMv.matcher(sqlText)
    if (cmv.matches()) {
      def names(g: String) = Option(g).toSeq.flatMap(_.split(","))
        .map(_.trim).filter(_.nonEmpty)
      return Some(CreateMvCommand(tbl(cmv, 1), tbl(cmv, 4),
        names(cmv.group(7)), names(cmv.group(8))))
    }
    val rmv = RefreshMv.matcher(sqlText)
    if (rmv.matches()) return Some(RefreshMvCommand(tbl(rmv, 1)))
    val sy = Sync.matcher(sqlText)
    if (sy.matches()) {
      val keys = sy.group(8).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(keys.nonEmpty, "SYNC needs at least one key column in ON (...)")
      val query = Option(sy.group(7))
        .map(q => q.trim.stripPrefix("(").stripSuffix(")"))
      val srcPath = if (query.isDefined) None else Some(tbl(sy, 4))
      return Some(SyncGraftCommand(tbl(sy, 1), srcPath, query, keys))
    }
    val mp = MergePrefix.matcher(sqlText)
    if (mp.find() && mp.start() == 0) return Some(parseMerge(sqlText, mp))
    None
  }

  /** `'k' = 'v', "k2" = "v2"` → pairs (TBLPROPERTIES value list). Quotes
    * must MATCH per token, and values may contain the other quote char or
    * parens.
    */
  private def parsePropertyPairs(text: String): Map[String, String] = {
    val m = rx("""'([^']+)'\s*=\s*'([^']*)'|"([^"]+)"\s*=\s*"([^"]*)"""").matcher(text)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    while (m.find())
      if (m.group(1) != null) out += (m.group(1) -> m.group(2))
      else out += (m.group(3) -> m.group(4))
    if (out.isEmpty) throw new IllegalArgumentException(
      s"graft SET TBLPROPERTIES expects 'key' = 'value' pairs, got '$text'")
    out.toMap
  }

  private def parsePropertyKeys(text: String): Seq[String] = {
    val m = rx("""['"]([^'"]+)['"]""").matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group(1)
    if (out.isEmpty) throw new IllegalArgumentException(
      s"graft UNSET TBLPROPERTIES expects quoted keys, got '$text'")
    out.toSeq
  }

  /** Split `SET a = f(x, y), b = 2` into (column, expression) pairs:
    * commas inside parentheses or single-quoted strings don't split.
    */
  private def parseAssignments(setText: String): Seq[(String, String)] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var start = 0
    for (i <- 0 until setText.length) setText.charAt(i) match {
      case '\'' => inStr = !inStr
      case '(' if !inStr => depth += 1
      case ')' if !inStr => depth -= 1
      case ',' if !inStr && depth == 0 =>
        parts += setText.substring(start, i); start = i + 1
      case _ =>
    }
    parts += setText.substring(start)
    parts.toSeq.map { a =>
      val m = rx("""^\s*(\w+)\s*=\s*(.+?)\s*$""").matcher(a)
      if (!m.matches()) throw new IllegalArgumentException(
        s"graft UPDATE: SET expects col = expr assignments, got '${a.trim}'")
      (m.group(1), m.group(2))
    }
  }

  /** MERGE needs more than a regex: the USING source may be a
    * parenthesized subquery containing ON / AND / WHEN of its own, so the
    * source is delimited by paren matching and the keyword scan only runs
    * at paren depth 0.
    */
  private def parseMerge(sqlText: String,
      mp: java.util.regex.Matcher): MergeIntoGraftCommand = {
    val evolve = mp.group(1) != null // WITH SCHEMA EVOLUTION
    val target = tbl(mp, 2)
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"graft MERGE INTO: $msg; supported shape is MERGE INTO <tbl> [AS] t " +
        "USING <src> [AS] s ON t.k = s.k [AND ...] followed by WHEN " +
        "clauses: WHEN MATCHED [AND c] THEN UPDATE SET */SET a=e,…/DELETE, " +
        "WHEN NOT MATCHED [AND c] THEN INSERT */(cols) VALUES (exprs), " +
        "WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET …/DELETE")
    val rest = sqlText.substring(mp.end())
    // source: balanced-paren subquery or a bare identifier chain
    val (sourceText, afterSource) =
      if (rest.startsWith("(")) {
        var depth = 0; var i = 0; var end = -1
        while (i < rest.length && end < 0) {
          rest.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        if (end < 0) fail("unbalanced parentheses in USING source")
        (rest.substring(0, end + 1), rest.substring(end + 1))
      } else {
        val m = rx("""^\s*([\w.]+)""").matcher(rest)
        if (!m.find()) fail("missing USING source")
        (m.group(1), rest.substring(m.end()))
      }
    // optional [AS] alias, then ON
    val onM = rx("""^\s*(?:AS\s+)?(\w+)?\s*\bON\b""").matcher(afterSource)
    if (!onM.find()) fail("missing ON clause")
    val afterOn = afterSource.substring(onM.end())
    // quote/CASE-aware like the clause splitter below: an ON condition is
    // currently key equalities only, but a string literal containing
    // 'WHEN' must never split the statement mid-literal
    val whenIdx = indexOfTopLevel(afterOn, Seq("WHEN"), trackParens = true)
    if (whenIdx < 0) fail("missing WHEN clause")
    val condText = afterOn.substring(0, whenIdx)
    val whenText = afterOn.substring(whenIdx)
    val keys = condText.split("(?i)\\bAND\\b").toSeq.map { eq =>
      val km = KeyEquality.matcher(eq)
      if (!km.matches())
        fail(s"ON must be a conjunction of t.col = s.col equalities, got '${eq.trim}'")
      if (km.group(2).toLowerCase != km.group(4).toLowerCase)
        fail(s"ON equality must join the same column on both sides, got '${eq.trim}'")
      km.group(2)
    }
    val targetAlias = Option(mp.group(5)).getOrElse("t")
    // an unaliased bare-identifier source is referenced by its own name
    // (SQL resolution); subqueries without an alias fall back to "s"
    val sourceAlias = Option(onM.group(1)).getOrElse(
      if (sourceText.startsWith("(")) "s"
      else sourceText.split('.').last.trim)
    val clauses = parseWhenClauses(whenText, fail)
    // the two classic shapes keep the specialized anti-join plans (and the
    // command's historical field shape): unconditional UpdateAll+InsertAll
    // and unconditional insert-only
    def classic(k: String) = clauses.forall(c => c.condition.isEmpty) &&
      (clauses.map(c => (c.group, c.kind)).toSet == (k match {
        case "upsert" => Set("matched" -> "update_all", "not_matched" -> "insert_all")
        case _ => Set("not_matched" -> "insert_all")
      }))
    if (classic("upsert")) MergeIntoGraftCommand(target, sourceText,
      keys, insertOnly = false, schemaEvolution = evolve)
    else if (classic("insert_only")) MergeIntoGraftCommand(target, sourceText,
      keys, insertOnly = true, schemaEvolution = evolve)
    else MergeIntoGraftCommand(target, sourceText, keys, insertOnly = false,
      schemaEvolution = evolve, clauses = clauses,
      targetAlias = targetAlias, sourceAlias = sourceAlias)
  }

  private val ClauseMatched = rx("""^MATCHED(?:\s+AND\s+(.+))?$""")
  private val ClauseBySource =
    rx("""^NOT\s+MATCHED\s+BY\s+SOURCE(?:\s+AND\s+(.+))?$""")
  private val ClauseNotMatched =
    rx("""^NOT\s+MATCHED(?:\s+BY\s+TARGET)?(?:\s+AND\s+(.+))?$""")
  private val ActionUpdateAll = rx("""^UPDATE\s+SET\s+\*$""")
  private val ActionUpdate = rx("""^UPDATE\s+SET\s+(.+)$""")
  private val ActionDelete = rx("""^DELETE$""")
  private val ActionInsertAll = rx("""^INSERT\s*\*$""")
  private val ActionInsert =
    rx("""^INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)$""")

  /** Split `s` on top-level (outside quotes/parens) commas. */
  private def splitTopLevelCommas(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0; var start = 0; var inQ = false; var inBt = false; var depth = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ && c == '\\' && i + 1 < s.length) i += 1
      else if (!inBt && c == '\'') inQ = !inQ
      else if (!inQ && c == '`') inBt = !inBt
      else if (inQ || inBt) ()
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && c == ',') { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Parse the WHEN-clause tail of a MERGE into [[MergeWhen]]s — the full
    * clause family: WHEN MATCHED [AND c] THEN UPDATE SET star | SET a=e,…
    * | DELETE; WHEN NOT MATCHED [BY TARGET] [AND c] THEN INSERT star |
    * (cols) VALUES (exprs); WHEN NOT MATCHED BY SOURCE [AND c] THEN
    * UPDATE SET … | DELETE.
    */
  private def parseWhenClauses(whenText: String,
      fail: String => Nothing): Seq[MergeWhen] = {
    // split at top-level WHEN keywords (quote- and paren-aware)
    val starts = scala.collection.mutable.ArrayBuffer[Int]()
    var from = 0
    while (from < whenText.length) {
      val i = indexOfTopLevel(whenText.substring(from), Seq("WHEN"),
        trackParens = true)
      if (i < 0) from = whenText.length
      else { starts += from + i; from = from + i + 4 }
    }
    if (starts.isEmpty) fail("missing WHEN clause")
    val texts = starts.zipAll(starts.drop(1), -1, whenText.length)
      .map { case (a, b) => whenText.substring(a + 4, b).trim }
    def stripQualifier(c: String): String = {
      val t = c.trim
      val dot = t.lastIndexOf('.')
      val bare = (if (dot >= 0) t.substring(dot + 1) else t).trim
      // assignment TARGETS are plain column names: unwrap backquoting
      // (used to shield names like `case` from the CASE tracker)
      if (bare.length >= 2 && bare.head == '`' && bare.last == '`')
        bare.substring(1, bare.length - 1)
      else bare
    }
    def parseAssignments(txt: String): Seq[(String, String)] =
      splitTopLevelCommas(txt).map { a =>
        val eq = a.indexOf('=')
        if (eq <= 0 || (eq + 1 < a.length && a.charAt(eq + 1) == '='))
          fail(s"bad assignment '${a.trim}' (expected col = expr)")
        (stripQualifier(a.substring(0, eq)), a.substring(eq + 1).trim)
      }
    texts.toSeq.map { ct =>
      val thenIdx = indexOfTopLevel(ct, Seq("THEN"), trackParens = true)
      if (thenIdx < 0) fail(s"missing THEN in WHEN clause '${ct.take(80)}'")
      val head = ct.substring(0, thenIdx).trim
      val action = ct.substring(thenIdx + 4).trim.stripSuffix(";").trim
      val (group, cond) = {
        val bs = ClauseBySource.matcher(head)
        val m = ClauseMatched.matcher(head)
        val nm = ClauseNotMatched.matcher(head)
        if (bs.matches()) ("by_source", Option(bs.group(1)))
        else if (m.matches()) ("matched", Option(m.group(1)))
        else if (nm.matches()) ("not_matched", Option(nm.group(1)))
        else fail(s"unsupported WHEN clause head '${head.take(80)}'")
      }
      val (kind, assigns) = {
        val upd = ActionUpdate.matcher(action)
        val ins = ActionInsert.matcher(action)
        if (ActionUpdateAll.matcher(action).matches()) ("update_all", Nil)
        else if (ActionDelete.matcher(action).matches()) ("delete", Nil)
        else if (ActionInsertAll.matcher(action).matches()) ("insert_all", Nil)
        else if (upd.matches()) ("update", parseAssignments(upd.group(1)))
        else if (ins.matches()) {
          val cols = ins.group(1).split(",").toSeq.map(stripQualifier)
          val vals = splitTopLevelCommas(ins.group(2)).map(_.trim)
          if (cols.length != vals.length)
            fail(s"INSERT column/value count mismatch (${cols.length} vs ${vals.length})")
          ("insert", cols.zip(vals))
        }
        else fail(s"unsupported MERGE action '${action.take(80)}'")
      }
      (group, kind) match {
        case ("matched", "insert_all" | "insert") =>
          fail("WHEN MATCHED supports UPDATE and DELETE, not INSERT")
        case ("by_source", "insert_all" | "insert" | "update_all") =>
          fail("WHEN NOT MATCHED BY SOURCE supports UPDATE SET col=expr " +
            "and DELETE (source columns are all null there, so UPDATE SET " +
            "* cannot apply)")
        case ("not_matched", "update_all" | "update" | "delete") =>
          fail("WHEN NOT MATCHED supports INSERT only")
        case _ => ()
      }
      MergeWhen(group, kind, cond.map(_.trim), assigns)
    }
  }
}

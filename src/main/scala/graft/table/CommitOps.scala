package graft.table

/** The commit-operation taxonomy every incremental consumer dispatches on
  * — ONE definition shared by [[IncrementalAgg]] and
  * [[graft.streaming.TableStreamSource]], so a new operation string can
  * never be classified by one consumer and silently missed by the other
  * (the hazard that already had "MERGE_INSERT_ONLY" added to two
  * duplicated sets in lockstep).
  */
private[graft] object CommitOps {

  /** Commits that add rows exclusively through their added files —
    * insert-only merges included (their anti-joined rows land as plain
    * appended files).
    */
  val addBearing: Set[String] = Set("APPEND", "COPY INTO", "MERGE_INSERT_ONLY")

  /** Commits that rewrite files but never rows (Delta's dataChange=false
    * shape): reads were already DV-filtered, so their manifest churn is
    * invisible to any consumer that attributes additions per commit.
    * MATERIALIZE (a shallow clone localizing its files) copies rows
    * byte-identically and belongs here too.
    */
  def rowNeutral(op: String): Boolean =
    op == "OPTIMIZE" || op == "ZORDER" || op == "PURGE" ||
      op == "MATERIALIZE" || op.startsWith("CLUSTER(")

  /** DML ops that are incrementally consumable WHEN merge-on-read (no
    * live file removed): the deletion-vector diff subtracts, added files
    * add.
    */
  val morDml: Set[String] = Set("DELETE", "UPDATE", "MERGE")

  /** Ops that remove or rewrite rows — classified by OPERATION, never by
    * file churn (a DV-only DELETE moves no files yet removes rows).
    */
  val rowChanging: Set[String] = Set("DELETE", "UPDATE", "MERGE", "OVERWRITE",
    "OVERWRITE_DYNAMIC", "REPLACE_WHERE", "RESTORE", "RECOVER",
    "RENAME COLUMN", "DROP COLUMN")
}

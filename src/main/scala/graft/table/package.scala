package graft

package object table {
  /** Per-file skipping stats: col -> (kind, min, max, nullCount). Lives
    * at package level (with [[FileMeta]]) so the process-wide
    * [[SidecarCache]] can hold parsed maps shared across handles.
    */
  private[table] type FileStats = Map[String, (String, String, String, Long)]
}

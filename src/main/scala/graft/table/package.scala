package graft

package object table {
  /** Per-file skipping stats: col -> (kind, min, max, nullCount) — kind
    * "i"/"d" (numeric), "s" (UTF-8 string), "D" (epoch days), "T"/"t"
    * (epoch micros), or "n" (no usable bounds); nullCount −1 = unknown
    * (pre-nullcount v1 sidecar line). Lives at package level (with
    * [[FileMeta]]) so the process-wide [[SidecarCache]] can hold parsed
    * maps shared across handles.
    */
  private[table] type FileStats = Map[String, (String, String, String, Long)]
}

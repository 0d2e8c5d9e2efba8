package graft.table

import graft.SparkSpec

/** Direct coverage for the process-wide sidecar parse cache (r9's `weak`
  * item): signature-exact hits, rewrite invalidation (what
  * `writeAtomic` calls — the guard for equal-(len, mtime) rewrites the
  * signature alone cannot distinguish), byte-budget eviction accounting,
  * per-entry bound, cross-handle sharing through a real compaction, and
  * a measured bound on the parsed-map heap multiplier the budget sizing
  * (282686d: 128 MB text ≈ ~600 MB parsed heap) relies on.
  */
class SidecarCacheSpec extends SparkSpec {
  import spark.implicits._

  private def meta(rows: Long) = FileMeta(rows, Map.empty)
  private def entries(n: Int, tag: String): Map[String, (Long, FileMeta)] =
    (0 until n).map(i => s"/data/$tag/part-$i%05d.parquet" ->
      ((1000L, meta(100L)))).toMap

  test("hit only on exact (len, mtime) signature; mismatch is a miss, not an eviction") {
    val c = new SidecarCacheBudgeted(1024 * 1024, 1024 * 1024)
    val m = entries(3, "sig")
    c.put("k", 100L, 5000L, m)
    assert(c.get("k", 100L, 5000L).contains(m))
    assert(c.get("k", 101L, 5000L).isEmpty, "length moved: stale content")
    assert(c.get("k", 100L, 5001L).isEmpty, "mtime moved: stale content")
    // the mismatch must NOT have evicted the entry — a reader probing a
    // half-written rewrite later sees the still-valid old signature
    assert(c.get("k", 100L, 5000L).contains(m))
  }

  test("invalidate drops the entry and its accounted bytes (the writeAtomic contract)") {
    val c = new SidecarCacheBudgeted(1024 * 1024, 1024 * 1024)
    c.put("k", 100L, 5000L, entries(3, "inv"))
    assert(c.totalBytes == 100L && c.entryCount == 1)
    c.invalidate("k")
    assert(c.get("k", 100L, 5000L).isEmpty,
      "a same-process rewrite to EQUAL (len, mtime) must never serve " +
        "stale entries — writeAtomic invalidates outright")
    assert(c.totalBytes == 0L && c.entryCount == 0)
    c.invalidate("k") // double-invalidate: no accounting underflow
    assert(c.totalBytes == 0L)
  }

  test("budget eviction: eldest-by-access goes first, totalBytes stays consistent") {
    val c = new SidecarCacheBudgeted(maxTotalBytes = 100L, maxEntryBytes = 100L)
    c.put("a", 40L, 1L, entries(1, "a"))
    c.put("b", 40L, 1L, entries(1, "b"))
    // touch "a": it becomes most-recently-used, so "b" is the eviction victim
    assert(c.get("a", 40L, 1L).isDefined)
    c.put("c", 40L, 1L, entries(1, "c"))
    assert(c.get("b", 40L, 1L).isEmpty, "eldest-by-access evicted")
    assert(c.get("a", 40L, 1L).isDefined && c.get("c", 40L, 1L).isDefined)
    assert(c.totalBytes == 80L && c.entryCount == 2)
    // re-put of an existing key replaces, never double-counts: a(40)
    // leaves, a(60) enters — 100 B exactly, both entries retained
    c.put("a", 60L, 2L, entries(2, "a2"))
    assert(c.totalBytes == 100L && c.entryCount == 2)
    assert(c.get("a", 60L, 2L).isDefined && c.get("c", 40L, 1L).isDefined)
    assert(c.get("a", 40L, 1L).isEmpty, "replaced signature must not serve")
  }

  test("per-entry bound: oversized files skip the cache entirely") {
    val c = new SidecarCacheBudgeted(maxTotalBytes = 1000L, maxEntryBytes = 50L)
    assert(!c.cacheable(51L))
    c.put("big", 51L, 1L, entries(1, "big"))
    assert(c.get("big", 51L, 1L).isEmpty && c.totalBytes == 0L,
      "an over-bound put must be a no-op (its regime re-parses per read)")
    c.put("ok", 50L, 1L, entries(1, "ok"))
    assert(c.get("ok", 50L, 1L).isDefined && c.totalBytes == 50L)
  }

  test("cross-handle sharing survives a real base compaction (fresh signature, fresh parse)") {
    val dir = tmpDir("sc-handles") + "/t"
    val a = new ManagedTable(spark, dir)
    val b = new ManagedTable(spark, dir)
    a.overwrite(Seq((0L, "seed")).toDF("k", "v"))
    // warm b's view of the stats sidecar (parses through the shared cache)
    val before = b.sidecarLengths.size
    assert(before >= 1)
    // drive a past the compaction threshold: fast-path commits append one
    // segment each; the v20 checkpoint's listing-path fileMeta fold sees
    // ≥16 segments and rewrites the base whole (writeAtomic → invalidate)
    for (i <- 1L to 25L) a.append(Seq((i, s"x$i")).toDF("k", "v"))
    // count real segments only (.txt): the local FS adds a .crc sibling
    // per segment, and the r11 fast-path compaction (which fires at 16
    // SEGMENTS, mid-interval) leaves a tail of post-compaction segments
    // whose crc-inclusive count can exceed the old raw-list bound
    assert(!new java.io.File(a.path + "._log/_file_rows.d").exists() ||
      new java.io.File(a.path + "._log/_file_rows.d").list()
        .count(_.endsWith(".txt")) < 16,
      "compaction should have folded the segments into the base")
    // b re-reads through the same process-wide cache: it must see the
    // compacted base's FULL entry set, never the stale pre-compaction parse
    val after = b.sidecarLengths
    assert(after.size == a.read.inputFiles.length,
      s"stale sidecar parse served cross-handle: ${after.size} entries " +
        s"vs ${a.read.inputFiles.length} live files")
  }

  test("parsed-map heap stays within the budget multiplier the sizing assumes") {
    // the budget counts TEXT bytes; the sizing comment claims the parsed
    // map costs ~4-5x that in heap (so 128 MB text ~ 600 MB pinned).
    // Measure a real parse with Spark's retained-size walker
    // (SizeEstimator — deterministic, no GC-timing dependence in a
    // shared JVM) and bound the multiplier: a representation regression
    // (say, an accidental per-entry String duplication pushing 50x)
    // would silently blow the cache's heap budget.
    val n = 20000
    def line(i: Int): String = MetadataPlane.sidecarLine(MetadataPlane.Entry(
      f"/data/heap/day=2024-01-01/part-$i%09d-abcdef.parquet", 1000L, 100L,
      Map("k" -> (("i", (i * 100).toString, (i * 100 + 99).toString, 0L)))))
    val text = (0 until n).map(line).mkString("\n")
    val textBytes = text.getBytes("UTF-8").length.toLong
    val parsed: Map[String, (Long, FileMeta)] = text.linesIterator
      .flatMap(MetadataPlane.parseLine(_).map(e =>
        e.path -> ((e.len, FileMeta(e.rows, e.stats))))).toMap
    assert(parsed.size == n)
    val heap = org.apache.spark.util.SizeEstimator.estimate(parsed)
    val mult = heap.toDouble / textBytes
    info(f"parsed-map heap: $heap%,d B over $textBytes%,d B text = $mult%.1fx")
    assert(mult < 20.0,
      f"parsed sidecar map costs $mult%.1fx its text — the 128 MB budget " +
        "no longer bounds pinned heap near the documented ~600 MB")
  }
}

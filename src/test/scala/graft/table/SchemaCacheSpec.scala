package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The process-wide logical-schema cache (r11): `tableSchemaOpt` must
  * never rebuild a root file index per append (the O(live files) cost
  * stack-sampling found), and must never serve a STALE schema across
  * the two events that change schema without the other key moving —
  * a metadata-only property edit (same version) and a schema-evolving
  * commit (no property edit).
  */
class SchemaCacheSpec extends SparkSpec {
  import spark.implicits._

  test("appends hit the cache; a metadata-only ADD COLUMNS misses by signature") {
    val t = new ManagedTable(spark, tmpDir("sc-cache") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    t.append(Seq((2L, "b")).toDF("k", "v")) // fills + carries the cache
    // metadata-only schema edit: no commit, version unchanged — only the
    // properties signature moves. The NEXT append must conform to the
    // WIDE schema (a stale cache hit would silently drop the new column)
    t.addColumns("score DOUBLE")
    t.append(Seq((3L, "c", 1.5)).toDF("k", "v", "score"))
    val rows = t.read.orderBy("k").collect()
    assert(rows.map(_.length).toSet == Set(3), "appended schema lost a column")
    assert(rows.last.getDouble(2) == 1.5)
    assert(t.read.filter(col("k") === 1L).head().isNullAt(2),
      "pre-ADD rows read the added column as null")
  }

  test("a schema-evolving append is not carried forward; later narrow appends " +
      "and evolved reads stay coherent") {
    val t = new ManagedTable(spark, tmpDir("sc-evolve") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    t.append(Seq((2L, "b")).toDF("k", "v")) // cache filled + carried
    t.append(Seq((3L, "c", 9L)).toDF("k", "v", "extra"),
      allowEvolution = true)
    // evolution did NOT carry the pre-evolution entry: whichever schema
    // the fresh derivation samples, a narrow append conforms cleanly
    // (a stale narrow carry would also pass here — the pinned invariant
    // is no crash and no row loss through the mixed-schema sequence)
    t.append(Seq((4L, "d")).toDF("k", "v"))
    assert(t.read.count() == 4L)
    // the evolved read (mergeSchema, the documented read for
    // evolution-written columns) surfaces every row and the new column
    val ev = t.readEvolved.orderBy("k").collect()
    assert(ev.map(_.length).toSet == Set(3))
    assert(ev.count(!_.isNullAt(ev.head.fieldIndex("extra"))) == 1)
  }

  // ---- PhysicalSchemaCache (r14): the footer-schema twin ------------------
  // `parquetScan` replays the physical footer schema via `rd.schema(...)`
  // instead of re-running parquet schema inference (a footer-reading Spark
  // job per managed read). Same (version, propsSig) key as the logical
  // cache, so the staleness hazards are the same two events.

  test("physical cache: a cross-handle overwrite with a wider footer schema " +
      "is not served stale (version component)") {
    val path = tmpDir("psc-xhandle") + "/t"
    val a = new ManagedTable(spark, path)
    a.overwrite(Seq((1L, "a")).toDF("k", "v"))
    assert(a.read.count() == 1L) // fills the physical cache for this root
    val b = new ManagedTable(spark, path)
    b.overwrite(Seq((2L, "b", 3.5)).toDF("k", "v", "score")) // version bump
    // a stale physical-schema hit would read the new files through the old
    // 2-column footer schema (dropping `score`) — the version key must miss
    val rows = a.read.orderBy("k").collect()
    assert(rows.map(_.length).toSet == Set(3), "stale physical schema served")
    assert(rows.head.getDouble(2) == 3.5)
  }

  test("physical cache: RENAME under column mapping misses by properties " +
      "signature (logical projection moves, version does not)") {
    val path = tmpDir("psc-rename") + "/t"
    val t = new ManagedTable(spark, path)
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.enableColumnMapping()
    assert(t.read.count() == 2L) // fills the cache post-mapping
    t.renameColumn("v", "label") // property edit only — no commit
    val got = t.read.orderBy("k")
    assert(got.columns.toSeq == Seq("k", "label"),
      "rename not visible through the cached scan")
    assert(got.collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("physical cache: the DV scan path stays exact across a delete and a " +
      "subsequent append (both commits move the version key)") {
    val path = tmpDir("psc-dv") + "/t"
    val t = new ManagedTable(spark, path)
    t.overwrite((1L to 10L).map(i => (i, s"r$i")).toDF("k", "v"))
    assert(t.read.count() == 10L)
    t.delete(col("k") <= 3L)
    assert(t.read.count() == 7L, "delete not visible through the cached scan")
    t.append(Seq((11L, "r11")).toDF("k", "v"))
    assert(t.read.count() == 8L)
    assert(t.read.agg(min(col("k"))).head().getLong(0) == 4L)
  }

  test("cross-handle: another handle's metadata-only ADD COLUMNS misses this " +
      "handle's cache by properties signature") {
    val path = tmpDir("sc-xhandle") + "/t"
    val a = new ManagedTable(spark, path)
    a.overwrite(Seq((1L, "a")).toDF("k", "v"))
    a.append(Seq((2L, "b")).toDF("k", "v")) // a's cache filled + carried
    val b = new ManagedTable(spark, path)
    b.addColumns("extra BIGINT") // property edit only — no version bump
    // a's next append conforms against the WIDE schema: the version is
    // unchanged, so only the _props.txt signature in the cache key can
    // catch this — a version-only key would serve a stale narrow schema
    // and silently drop the column
    a.append(Seq((3L, "c", 7L)).toDF("k", "v", "extra"))
    val got = new ManagedTable(spark, path).read.orderBy("k").collect()
    assert(got.map(_.length).toSet == Set(3))
    assert(got.map(r => if (r.isNullAt(2)) -1L else r.getLong(2)).toSeq ==
      Seq(-1L, -1L, 7L))
  }
}

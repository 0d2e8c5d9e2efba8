package graft.table

import graft.SparkSpec

/** COPY INTO (idempotent file ingestion): only never-loaded source files
  * are ingested, replays are no-ops, crashes between the load-marker and
  * the commit neither lose nor duplicate a batch.
  */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def writeSrc(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("id", "s").coalesce(1)
      .write.mode("append").parquet(dir)

  test("loads new files only; replay is a no-op") {
    val base = tmpDir("copyinto")
    val src = s"$base/landing"
    val t = new ManagedTable(spark, s"$base/t")

    writeSrc(src, Seq((1L, "a"), (2L, "b")))
    val (f1, r1) = t.copyInto(src)
    assert(f1 == 1 && r1 == 2, s"first copy: $f1 files / $r1 rows")

    // replay with nothing new: no files, no rows, no commit
    val vBefore = t.version
    assert(t.copyInto(src) == ((0L, 0L)))
    assert(t.version == vBefore, "no-op replay must not commit")

    // a new file lands; only IT loads
    writeSrc(src, Seq((3L, "c")))
    val (f2, r2) = t.copyInto(src)
    assert(f2 == 1 && r2 == 1, s"incremental copy: $f2 files / $r2 rows")
    assert(t.read.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("force reloads already-loaded files") {
    val base = tmpDir("copyinto-force")
    val src = s"$base/landing"
    val t = new ManagedTable(spark, s"$base/t")
    writeSrc(src, Seq((1L, "a")))
    t.copyInto(src)
    val (f, r) = t.copyInto(src, force = true)
    assert(f == 1 && r == 1)
    assert(t.read.count() == 2) // duplicate by design under force
  }

  test("orphan load-marker from a crashed copy is ignored and retried") {
    val base = tmpDir("copyinto-crash")
    val src = s"$base/landing"
    val t = new ManagedTable(spark, s"$base/t")
    writeSrc(src, Seq((1L, "a")))
    t.copyInto(src)
    writeSrc(src, Seq((2L, "b")))
    // simulate the crash window: the marker for the NEXT version exists
    // but its commit never happened
    val logDir = new java.io.File(s"$base/t._log/_copy_loaded.d")
    val orphan = new java.io.File(logDir, f"v${t.version + 1}%05d.txt")
    val w = new java.io.PrintWriter(orphan)
    try w.print(java.net.URLEncoder.encode("bogus-marker", "UTF-8"))
    finally w.close()
    // the retry must ignore the orphan (it names an uncommitted version),
    // load the pending file, and overwrite the marker
    val (f, r) = t.copyInto(src)
    assert(f == 1 && r == 1, s"retry after crash: $f files / $r rows")
    assert(t.read.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("csv ingestion takes the table schema; pattern filters") {
    val base = tmpDir("copyinto-csv")
    val src = s"$base/landing"
    new java.io.File(src).mkdirs()
    def put(name: String, text: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(src, name))
      try w.print(text) finally w.close()
    }
    put("one.csv", "id,s\n1,a\n2,b\n")
    put("skip.txt", "not,csv\n")
    val t = new ManagedTable(spark, s"$base/t")
    val (f1, r1) = t.copyInto(src, format = "csv",
      options = Map("header" -> "true", "inferSchema" -> "true"))
    assert(f1 == 1 && r1 == 2, s"$f1 files / $r1 rows")
    // second file arrives; table schema (not inference) shapes the read
    put("two.csv", "id,s\n3,c\n")
    val (f2, r2) = t.copyInto(src, format = "csv",
      options = Map("header" -> "true"))
    assert(f2 == 1 && r2 == 1)
    assert(t.read.as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("SQL COPY INTO statement round-trip") {
    val base = tmpDir("copyinto-sql")
    val src = s"$base/landing"
    writeSrc(src, Seq((1L, "a"), (2L, "b")))
    val tbl = s"$base/t"
    val out = graft.sql.GraftSql.sql(spark,
      s"COPY INTO '$tbl' FROM '$src' FILEFORMAT = PARQUET").collect()
    assert(out.head.getLong(1) == 1 && out.head.getLong(2) == 2, out.toSeq)
    // replay through SQL: zero loaded
    val again = graft.sql.GraftSql.sql(spark,
      s"COPY INTO '$tbl' FROM '$src' FILEFORMAT = PARQUET").collect()
    assert(again.head.getLong(1) == 0 && again.head.getLong(2) == 0)
    assert(new ManagedTable(spark, tbl).read.count() == 2)
  }
}

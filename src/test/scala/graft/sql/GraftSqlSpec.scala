package graft.sql

import graft.SparkSpec
import graft.table.ManagedTable
import org.apache.spark.sql.SparkSession

class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): (ManagedTable, String) = {
    val p = tmpDir(name) + "/t"
    (new ManagedTable(spark, p), p)
  }

  // ---- parser ----------------------------------------------------------

  test("non-graft statements are not claimed") {
    assert(GraftSqlCommands.parse("SELECT 1").isEmpty)
    assert(GraftSqlCommands.parse("DESCRIBE TABLE foo").isEmpty)
    assert(GraftSqlCommands.parse("MERGE data FROM x").isEmpty)
    // Spark's own MERGE INTO over a catalog identifier target stays Spark's
    assert(GraftSqlCommands.parse(
      "MERGE INTO cat.db.t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *").isEmpty)
    // same for DML over catalog identifiers
    assert(GraftSqlCommands.parse("DELETE FROM db.t WHERE x = 1").isEmpty)
    assert(GraftSqlCommands.parse("UPDATE db.t SET x = 1").isEmpty)
    assert(GraftSqlCommands.parse("INSERT INTO db.t SELECT 1").isEmpty)
    assert(GraftSqlCommands.parse("CREATE OR REPLACE TABLE db.t AS SELECT 1").isEmpty)
  }

  test("command statements parse with all table-ref spellings") {
    import GraftSqlCommands._
    assert(parse("DESCRIBE HISTORY graft.`/w/t`").contains(
      DescribeHistoryCommand("/w/t", None)))
    assert(parse("describe history '/w/t' limit 3").contains(
      DescribeHistoryCommand("/w/t", Some(3))))
    assert(parse("""DESC DETAIL "/w/t"""").contains(DescribeDetailCommand("/w/t")))
    assert(parse("OPTIMIZE '/w/t'").contains(OptimizeCommand("/w/t", Nil)))
    assert(parse("OPTIMIZE '/w/t' ZORDER BY (a, b)").contains(
      OptimizeCommand("/w/t", Seq("a", "b"))))
    assert(parse("OPTIMIZE '/w/t' CLUSTER BY (a, b)").contains(
      OptimizeCommand("/w/t", Seq("a", "b"), hilbert = true)))
    assert(parse("VACUUM '/w/t'").contains(VacuumCommand("/w/t", None, dryRun = false)))
    assert(parse("VACUUM '/w/t' RETAIN 0 HOURS DRY RUN").contains(
      VacuumCommand("/w/t", Some(0.0), dryRun = true)))
    assert(parse("RESTORE TABLE '/w/t' TO VERSION AS OF 2").contains(
      RestoreCommand("/w/t", Some(2), None)))
    assert(parse("RESTORE '/w/t' TO TIMESTAMP AS OF '2026-01-01T00:00:00Z'")
      .contains(RestoreCommand("/w/t", None, Some("2026-01-01T00:00:00Z"))))
  }

  test("MERGE INTO parses upsert, insert-only, and subquery sources") {
    import GraftSqlCommands._
    val up = parse(
      """MERGE INTO graft.`/w/t` AS t USING src AS s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(up.contains(MergeIntoGraftCommand("/w/t", "src", Seq("k"), insertOnly = false)))
    val ins = parse(
      """MERGE INTO '/w/t' t USING src s ON t.k1 = s.k1 AND t.k2 = s.k2
         WHEN NOT MATCHED THEN INSERT *""")
    assert(ins.contains(MergeIntoGraftCommand("/w/t", "src", Seq("k1", "k2"), insertOnly = true)))
    // subquery source with its own ON/WHEN-bearing text inside parens
    val sub = parse(
      """MERGE INTO '/w/t' AS t
         USING (SELECT a.k, a.v FROM a JOIN b ON a.k = b.k WHERE b.v > 0) AS s
         ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(sub.exists { case m: MergeIntoGraftCommand =>
      m.sourceText.trim.startsWith("(SELECT") && m.keys == Seq("k") && !m.insertOnly
    })
  }

  test("malformed graft MERGE fails with a pointed error, not a delegate fallthrough") {
    import GraftSqlCommands._
    // non-equi ON
    val e1 = intercept[IllegalArgumentException](parse(
      "MERGE INTO '/w/t' t USING s ON t.k > s.k WHEN NOT MATCHED THEN INSERT *"))
    assert(e1.getMessage.contains("conjunction"))
    // different columns on the two sides
    val e2 = intercept[IllegalArgumentException](parse(
      "MERGE INTO '/w/t' t USING s ON t.a = s.b WHEN NOT MATCHED THEN INSERT *"))
    assert(e2.getMessage.contains("same column"))
    // an INSERT action under WHEN MATCHED is still refused loudly
    val e3 = intercept[IllegalArgumentException](parse(
      "MERGE INTO '/w/t' t USING s ON t.k = s.k WHEN MATCHED THEN INSERT *"))
    assert(e3.getMessage.contains("UPDATE and DELETE"))
    // and a DELETE under WHEN NOT MATCHED
    val e4 = intercept[IllegalArgumentException](parse(
      "MERGE INTO '/w/t' t USING s ON t.k = s.k WHEN NOT MATCHED THEN DELETE"))
    assert(e4.getMessage.contains("INSERT only"))
  }

  test("MERGE parses the full clause family into MergeWhen clauses") {
    import GraftSqlCommands._
    val cdc = parse(
      "MERGE INTO graft.`/t` t USING s ON t.k = s.k " +
        "WHEN MATCHED AND s.op = 'D' THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *")
    assert(cdc.exists { case m: MergeIntoGraftCommand =>
      m.clauses == Seq(
        MergeWhen("matched", "delete", Some("s.op = 'D'")),
        MergeWhen("matched", "update_all", None),
        MergeWhen("not_matched", "insert_all", Some("s.op <> 'D'")))
    }, cdc)
    // conditional UPDATE SET with expressions, explicit INSERT list, and
    // NOT MATCHED BY SOURCE — commas inside calls stay inside assignments
    val full = parse(
      "MERGE INTO '/w/t' tgt USING src ON tgt.k = src.k " +
        "WHEN MATCHED AND tgt.v < src.v THEN " +
        "UPDATE SET v = greatest(tgt.v, src.v), note = 'bumped' " +
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v * 2) " +
        "WHEN NOT MATCHED BY SOURCE AND tgt.v > 100 THEN DELETE")
    assert(full.exists { case m: MergeIntoGraftCommand =>
      m.targetAlias == "tgt" && m.sourceAlias == "src" &&
        m.clauses == Seq(
          MergeWhen("matched", "update",
            Some("tgt.v < src.v"),
            Seq("v" -> "greatest(tgt.v, src.v)", "note" -> "'bumped'")),
          MergeWhen("not_matched", "insert", None,
            Seq("k" -> "src.k", "v" -> "src.v * 2")),
          MergeWhen("by_source", "delete", Some("tgt.v > 100")))
    }, full)
    // update-only merge is legal now and routes through the clause path
    val upd = parse(
      "MERGE INTO '/w/t' t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *")
    assert(upd.exists { case m: MergeIntoGraftCommand =>
      m.clauses == Seq(MergeWhen("matched", "update_all", None)) })
    // a column named `case` parses when backquoted (the CASE tracker
    // treats backtick-quoted identifiers as opaque); the assignment
    // target unwraps to the bare name
    val bq = parse(
      "MERGE INTO '/w/t' t USING s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET `case` = s.`case`")
    assert(bq.exists { case m: MergeIntoGraftCommand =>
      m.clauses == Seq(MergeWhen("matched", "update", None,
        Seq("case" -> "s.`case`"))) }, bq)
  }

  test("SQL MERGE clause family end-to-end: CDC apply in one statement") {
    val (t, p) = freshTable("sql-mcdc")
    t.overwrite(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"))
    Seq((2L, 21.0, "U"), (3L, 0.0, "D"), (4L, 40.0, "I"))
      .toDF("k", "v", "op").createOrReplaceTempView("cdc_batch")
    GraftSql.sql(spark,
      s"MERGE INTO '$p' t USING cdc_batch s ON t.k = s.k " +
        "WHEN MATCHED AND s.op = 'D' THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *")
    assert(t.read.select("k", "v").as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 21.0), (4L, 40.0)))
  }

  test("CREATE/REFRESH MATERIALIZED VIEW builds and incrementally " +
      "refreshes an IncrementalAgg from SQL alone") {
    val (src, sp) = freshTable("sql-mv-src")
    src.overwrite(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"))
    val mvPath = tmpDir("sql-mv") + "/state"
    val created = GraftSql.sql(spark,
      s"CREATE MATERIALIZED VIEW '$mvPath' ON '$sp' GROUP BY (k) SUM (v)")
      .select("mode").as[String].head()
    assert(created == "initial")
    src.append(Seq(("a", 10.0)).toDF("k", "v"))
    val refreshed = GraftSql.sql(spark,
      s"REFRESH MATERIALIZED VIEW '$mvPath'")
      .select("mode").as[String].head()
    assert(refreshed == "incremental")
    val mv = graft.table.IncrementalAgg.open(spark, mvPath)
    assert(mv.read.select("k", "sum_v").as[(String, Double)].collect().toSet
      == Set(("a", 11.0), ("b", 2.0)))
  }

  test("UPDATE with 'where' inside a string literal updates everything") {
    val (t, p) = freshTable("sql-qupd")
    t.overwrite(Seq((1L, "x"), (2L, "y")).toDF("id", "note"))
    GraftSql.sql(spark, s"UPDATE '$p' SET note = 'fixed where it broke'")
    val notes = t.read.select("note").as[String].collect().toSeq
    assert(notes == Seq.fill(2)("fixed where it broke"), notes)
  }

  test("REPLACE WHERE predicate may contain a subquery") {
    val (t, p) = freshTable("sql-rws")
    t.overwrite(Seq((1L, "old1"), (2L, "old2")).toDF("id", "s"))
    GraftSql.sql(spark,
      s"INSERT INTO '$p' REPLACE WHERE id IN (SELECT 1 AS id) " +
        "SELECT 1 AS id, 'new1' AS s")
    assert(t.read.as[(Long, String)].collect().toSet ==
      Set((1L, "new1"), (2L, "old2")))
  }

  test("CREATE OR REPLACE without PARTITIONED BY yields an unpartitioned table") {
    val (t, p) = freshTable("sql-ctasp")
    t.overwrite(Seq((1L, "p0", "a")).toDF("id", "part", "s"), Seq("part"))
    // the new query lacks the old partition column entirely
    GraftSql.sql(spark,
      s"CREATE OR REPLACE TABLE graft.`$p` AS SELECT 7 AS x")
    val after = new ManagedTable(spark, p)
    assert(after.read.columns.toSeq == Seq("x"))
    assert(after.read.as[Long].collect().toSeq == Seq(7L))
  }

  // ---- execution through GraftSql.sql (no extensions needed) ------------

  test("SQL MERGE INTO upserts a managed table end to end") {
    val (t, p) = freshTable("sql-merge")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    Seq((2L, "B"), (3L, "C")).toDF("k", "v").createOrReplaceTempView("sql_merge_src")
    val metrics = GraftSql.sql(spark,
      s"""MERGE INTO graft.`$p` AS t USING sql_merge_src AS s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(metrics.select("num_source_rows").as[Long].head() == 2L)
    assert(t.read.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "C")))
  }

  test("SQL MERGE with a partitioned target takes the partition-pruned path") {
    val (t, p) = freshTable("sql-merge-part")
    t.overwrite(Seq((1L, "p1", "a"), (2L, "p2", "b")).toDF("k", "part", "v"),
      Seq("part"))
    Seq((2L, "p2", "B"), (3L, "p3", "C")).toDF("k", "part", "v")
      .createOrReplaceTempView("sql_merge_part_src")
    GraftSql.sql(spark,
      s"""MERGE INTO '$p' AS t USING sql_merge_part_src AS s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(t.read.select("k", "part", "v").orderBy("k")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "p1", "a"), (2L, "p2", "B"), (3L, "p3", "C")))
    // the pruned rewrite logs MERGE against the partitioned layout
    assert(t.history(1).select("operation").as[String].head() == "MERGE")
  }

  test("SQL insert-only MERGE never updates matched rows") {
    val (t, p) = freshTable("sql-merge-ins")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    Seq((1L, "A"), (2L, "B")).toDF("k", "v")
      .createOrReplaceTempView("sql_merge_ins_src")
    GraftSql.sql(spark,
      s"MERGE INTO '$p' t USING sql_merge_ins_src s ON t.k = s.k " +
        "WHEN NOT MATCHED THEN INSERT *")
    assert(t.read.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B")))
  }

  test("DESCRIBE HISTORY / DETAIL / OPTIMIZE / RESTORE / VACUUM round-trip") {
    val (t, p) = freshTable("sql-cmds")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.append(Seq((3L, "c")).toDF("k", "v"))

    val hist = GraftSql.sql(spark, s"DESCRIBE HISTORY graft.`$p`")
    assert(hist.select("operation").as[String].collect().toSeq ==
      Seq("APPEND", "OVERWRITE"))
    assert(GraftSql.sql(spark, s"DESCRIBE HISTORY '$p' LIMIT 1").count() == 1)

    val detail = GraftSql.sql(spark, s"DESCRIBE DETAIL '$p'")
    assert(detail.select("version").as[Long].head() == 1L)

    val opt = GraftSql.sql(spark, s"OPTIMIZE '$p'").collect().head
    assert(opt.getLong(2) == 1L) // 3 tiny rows -> 1 file
    assert(t.read.count() == 3)

    // restore to pre-append, then confirm the restore is itself a commit
    GraftSql.sql(spark, s"RESTORE TABLE '$p' TO VERSION AS OF 0")
    // timestamp-pinned restore: "now" resolves to the latest version
    GraftSql.sql(spark,
      s"RESTORE TABLE '$p' TO TIMESTAMP AS OF '${java.time.Instant.now()}'")
    assert(t.read.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))

    // dry run lists but keeps; real vacuum at zero retention drops
    val dry = GraftSql.sql(spark, s"VACUUM '$p' RETAIN 0 HOURS DRY RUN")
    assert(dry.count() > 0)
    assert(t.readVersion(1).count() == 3) // still readable after dry run
    GraftSql.sql(spark, s"VACUUM '$p' RETAIN 0 HOURS")
    intercept[Exception](t.readVersion(1).count())
  }

  test("SQL DELETE / UPDATE / INSERT round-trip on an unpartitioned table") {
    val (t, p) = freshTable("sql-dml")
    t.overwrite(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"))
    GraftSql.sql(spark, s"DELETE FROM graft.`$p` WHERE k = 2")
    assert(t.read.orderBy("k").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0), (3L, 30.0)))
    GraftSql.sql(spark, s"UPDATE '$p' SET v = v * 2, k = k + 10 WHERE k > 1")
    assert(t.read.orderBy("k").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0), (13L, 60.0)))
    GraftSql.sql(spark,
      s"INSERT INTO '$p' SELECT CAST(99 AS BIGINT) AS k, CAST(9.9 AS DOUBLE) AS v")
    assert(t.read.count() == 3)
    GraftSql.sql(spark,
      s"INSERT OVERWRITE '$p' VALUES (CAST(7 AS BIGINT), CAST(0.7 AS DOUBLE))")
    assert(t.read.as[(Long, Double)].collect().toSeq == Seq((7L, 0.7)))
    // operations are all logged commits
    assert(t.history().select("operation").as[String].collect().toSeq ==
      Seq("OVERWRITE", "APPEND", "UPDATE", "DELETE", "OVERWRITE"))
  }

  test("partition-only SQL DELETE takes the scoped (pruned) rewrite") {
    val (t, p) = freshTable("sql-dml-part")
    t.overwrite(Seq((1L, "p1", "a"), (2L, "p2", "b"), (3L, "p2", "c"))
      .toDF("k", "part", "v"), Seq("part"))
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p1Files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/part=p1"))
      .map(s => (s.getPath.getName, s.getModificationTime))
      .filter(_._1.endsWith(".parquet")).toSet
    val before = p1Files
    GraftSql.sql(spark, s"DELETE FROM '$p' WHERE part = 'p2'")
    assert(t.read.select("k").as[Long].collect().toSeq == Seq(1L))
    // pruned rewrite: the untouched p1 partition kept its exact files
    assert(before.nonEmpty && p1Files == before)
    GraftSql.sql(spark,
      s"UPDATE '$p' SET v = concat(v, '!') WHERE part = 'p1'")
    assert(t.read.select("v").as[String].collect().toSeq == Seq("a!"))
  }

  test("INSERT INTO … REPLACE WHERE is the predicate-scoped overwrite") {
    val (t, p) = freshTable("sql-rwh")
    t.overwrite(Seq((1L, "d1", 1.0), (2L, "d2", 2.0), (3L, "d1", 3.0))
      .toDF("k", "day", "v"), Seq("day"))
    // backfill d1 atomically; incoming rows checked against the predicate
    GraftSql.sql(spark,
      s"""INSERT INTO '$p' REPLACE WHERE day = 'd1'
         SELECT CAST(10 AS BIGINT) AS k, 'd1' AS day, CAST(9.0 AS DOUBLE) AS v""")
    assert(t.read.orderBy("k").as[(Long, Double, String)].collect().toSeq ==
      Seq((2L, 2.0, "d2"), (10L, 9.0, "d1")))
    assert(t.history(1).select("operation").as[String].head() == "REPLACE_WHERE")
    // rows outside the predicate's range are rejected, table unchanged
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""INSERT INTO '$p' REPLACE WHERE day = 'd1'
           SELECT CAST(11 AS BIGINT) AS k, 'd2' AS day, CAST(1.0 AS DOUBLE) AS v""")
    }
    assert(t.read.count() == 2)
  }

  test("CREATE OR REPLACE TABLE AS SELECT materializes a partitioned table") {
    val dir = tmpDir("sql-ctas") + "/t"
    Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "grp", "v")
      .createOrReplaceTempView("ctas_src")
    GraftSql.sql(spark,
      s"CREATE OR REPLACE TABLE '$dir' PARTITIONED BY (grp) AS SELECT * FROM ctas_src")
    val t = new ManagedTable(spark, dir)
    assert(t.read.count() == 2)
    assert(t.history(1).select("partitionColumns").collect()
      .head.getSeq[String](0) == Seq("grp"))
  }

  test("MERGE WITH SCHEMA EVOLUTION through SQL widens the target") {
    val (t, p) = freshTable("sql-merge-evolve")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    Seq((2L, "B", 9.0), (3L, "C", 3.5)).toDF("k", "v", "score")
      .createOrReplaceTempView("evolve_src")
    GraftSql.sql(spark,
      s"""MERGE WITH SCHEMA EVOLUTION INTO '$p' AS t USING evolve_src AS s
         ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(t.read.columns.toSeq == Seq("k", "v", "score"))
    assert(t.read.orderBy("k").as[(Long, String, Option[Double])]
      .collect().toSeq ==
      Seq((1L, "a", None), (2L, "B", Some(9.0)), (3L, "C", Some(3.5))))
  }

  test("CREATE TABLE … SHALLOW CLONE / CLONE through SQL") {
    val (t, p) = freshTable("sql-clone")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val base = tmpDir("sql-clone-targets")
    // SHALLOW: zero-copy, reads the source snapshot
    val r = GraftSql.sql(spark,
      s"CREATE TABLE '$base/shallow' SHALLOW CLONE '$p'").collect()
    assert(r.head.getBoolean(2))
    val sc = new ManagedTable(spark, s"$base/shallow")
    assert(sc.isShallowClone && sc.read.count() == 2)
    // default (no keyword) = DEEP, matching Delta: self-contained copy
    GraftSql.sql(spark, s"CREATE TABLE '$base/deep' CLONE '$p'")
    val dc = new ManagedTable(spark, s"$base/deep")
    assert(!dc.isShallowClone && dc.read.count() == 2)
  }

  test("CONVERT TO GRAFT adopts a plain-parquet dir into the commit log") {
    val dir = tmpDir("sql-convert") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(dir)
    val out = GraftSql.sql(spark, s"CONVERT TO GRAFT '$dir'").collect().head
    assert(out.getLong(1) == 0L) // BOOTSTRAP became version 0
    val t = new ManagedTable(spark, dir)
    assert(t.history().select("operation").as[String].collect().toSeq ==
      Seq("BOOTSTRAP"))
    // idempotent: converting a consistent table adds no commit
    GraftSql.sql(spark, s"CONVERT TO GRAFT '$dir'")
    assert(t.version == 0L)
  }

  test("ALTER TABLE: constraints and column DDL through SQL") {
    val (t, p) = freshTable("sql-alter")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    GraftSql.sql(spark, s"ALTER TABLE '$p' ADD CONSTRAINT k_pos CHECK (k > 0)")
    assert(t.constraints == Map("k_pos" -> "k > 0"))
    // the constraint is enforced on the next write
    intercept[Exception](t.append(Seq((-1L, "x")).toDF("k", "v")))
    GraftSql.sql(spark, s"ALTER TABLE '$p' DROP CONSTRAINT k_pos")
    assert(t.constraints.isEmpty)
    GraftSql.sql(spark, s"ALTER TABLE graft.`$p` RENAME COLUMN v TO label")
    assert(t.read.columns.toSeq == Seq("k", "label"))
    GraftSql.sql(spark, s"ALTER TABLE '$p' DROP COLUMN label")
    assert(t.read.columns.toSeq == Seq("k"))
    // ALTER TABLE on a catalog identifier is not ours
    assert(GraftSqlCommands.parse("ALTER TABLE db.t DROP COLUMN c").isEmpty)
  }

  test("ZORDER BY through SQL reorders the layout and commits") {
    val (t, p) = freshTable("sql-zorder")
    t.overwrite((1 to 1000).map(i => (i.toLong, (i * 37 % 1000).toLong))
      .toDF("a", "b").repartition(4))
    GraftSql.sql(spark, s"OPTIMIZE '$p' ZORDER BY (a, b)")
    assert(t.history(1).select("operation").as[String].head() == "ZORDER")
    assert(t.read.count() == 1000)
  }

  test("CLUSTER BY through SQL runs the Hilbert layout and commits") {
    val (t, p) = freshTable("sql-hilbert")
    t.overwrite((1 to 1000).map(i => (i.toLong, (i * 37 % 1000).toLong))
      .toDF("a", "b").repartition(4))
    GraftSql.sql(spark, s"OPTIMIZE '$p' CLUSTER BY (a, b)")
    assert(t.history(1).select("operation").as[String].head() == "ZORDER")
    assert(t.read.count() == 1000)
  }

  test("SYNC mirrors the target onto a source snapshot through SQL " +
      "(statement ≡ syncFrom API)") {
    import GraftSqlCommands._
    assert(parse("SYNC '/w/t' FROM '/w/s' ON (k1, k2)").contains(
      SyncGraftCommand("/w/t", Some("/w/s"), None, Seq("k1", "k2"))))
    assert(parse("SELECT 'SYNC' FROM t").isEmpty) // not ours
    val (t, p) = freshTable("sql-sync")
    t.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    val (src, sp) = freshTable("sql-sync-src")
    src.overwrite(Seq((2L, "B"), (3L, "c"), (4L, "D")).toDF("k", "v"))
    // graft-table source form: 1 deleted, 2 updated, 3 kept, 4 inserted
    GraftSql.sql(spark, s"SYNC graft.`$p` FROM graft.`$sp` ON (k)")
    val afterStmt = t.read.as[(Long, String)].collect().toSet
    assert(afterStmt == Set((2L, "B"), (3L, "c"), (4L, "D")))
    // the statement is exactly the API's clause-MERGE packaging
    val (t2, _) = freshTable("sql-sync-api")
    t2.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    t2.syncFrom(src.read, Seq("k"))
    assert(t2.read.as[(Long, String)].collect().toSet == afterStmt)
    // query source form
    Seq((4L, "d2"), (5L, "e")).toDF("k", "v").createOrReplaceTempView("sync_src")
    GraftSql.sql(spark, s"SYNC '$p' FROM (SELECT k, v FROM sync_src) ON (k)")
    assert(t.read.as[(Long, String)].collect().toSet ==
      Set((4L, "d2"), (5L, "e")))
  }

  test("non-graft SQL falls through to spark.sql") {
    assert(GraftSql.sql(spark, "SELECT 41 + 1 AS x").as[Int].head() == 42)
  }

  // ---- the injected-parser path (Delta's architecture) ------------------

  test("injectParser: spark.sql runs graft statements on an extended session") {
    val orig = spark // keep the shared suite session to restore below
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extended = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkSessionExtension)
      .getOrCreate()
    try {
      assert(extended ne orig) // a genuinely new session with the parser
      import extended.implicits._
      val p = tmpDir("sql-ext") + "/t"
      val t = new ManagedTable(extended, p)
      t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      Seq((2L, "B"), (3L, "C")).toDF("k", "v").createOrReplaceTempView("ext_src")
      extended.sql(
        s"""MERGE INTO graft.`$p` AS t USING ext_src AS s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
      assert(t.read.orderBy("k").as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "B"), (3L, "C")))
      assert(extended.sql(s"DESCRIBE HISTORY '$p'")
        .select("operation").as[String].collect().toSeq == Seq("MERGE", "OVERWRITE"))
      // ordinary SQL still parses through the delegate on the same session
      assert(extended.sql("SELECT 1 AS one").collect().head.getInt(0) == 1)

      // table-valued functions compose inside SELECTs (Delta's
      // table_changes architecture): time travel, history, and CDF
      assert(extended.sql(s"SELECT * FROM graft_version('$p', 0) ORDER BY k")
        .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
      assert(extended.sql(
        s"SELECT max(version) AS v FROM graft_history('$p')")
        .as[Long].head() == 1L)
      val cdf = extended.sql(
        s"""SELECT change_type, count(*) AS n
            FROM graft_table_changes('$p', 0, 1, 'k')
            GROUP BY change_type ORDER BY change_type""")
        .as[(String, Long)].collect().toSeq
      assert(cdf == Seq(("insert", 1L), ("unchanged", 1L), ("update", 1L)))
      // non-literal args are rejected with a pointed error
      val tvfErr = intercept[Exception](
        extended.sql(s"SELECT * FROM graft_version('$p', 1 + 1)").collect())
      assert(tvfErr.getMessage.contains("literal"))
      // keyless CDF TVF over row tracking: no key args at all
      val p2 = tmpDir("sql-ext-rid") + "/t"
      val t2 = new ManagedTable(extended, p2)
      t2.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      t2.enableRowTracking()
      val v0 = t2.version
      t2.deleteVectored(org.apache.spark.sql.functions.col("k") === 1)
      t2.append(Seq((3L, "c")).toDF("k", "v"))
      val kcdf = extended.sql(
        s"""SELECT k, change_type
            FROM graft_changes_by_id('$p2', $v0, ${t2.version})
            ORDER BY change_type, k""")
        .as[(Long, String)].collect().toSeq
      assert(kcdf == Seq((1L, "delete"), (3L, "insert")))
      // pipeline-operator TVFs: the contamination screen and the fixed
      // quality scorer compose into plain SELECTs like CDF does
      val pc = tmpDir("sql-ext-contam") + "/corpus"
      val pb = tmpDir("sql-ext-contam") + "/bench"
      val corpus = new ManagedTable(extended, pc)
      corpus.overwrite(Seq(
        (1L, "alpha beta gamma delta"),
        (2L, "red green blue cyan")).toDF("doc_id", "text"))
      new ManagedTable(extended, pb)
        .overwrite(Seq((9L, "alpha beta gamma")).toDF("doc_id", "text"))
      val contam = extended.sql(
        s"""SELECT doc_id FROM graft_contamination('$pc', '$pb',
            'doc_id', 'text', 3) WHERE contamination > 0 ORDER BY doc_id""")
        .as[Long].collect().toSeq
      assert(contam == Seq(1L), s"doc 1 shares the bench trigram: $contam")
      val quality = extended.sql(
        s"""SELECT doc_id, keep FROM graft_quality_score('$pc', 'doc_id',
            'text', 4096) ORDER BY doc_id""").collect()
      assert(quality.length == 2 && quality.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      // the TVF's keep decision equals the library call's (same fixed model)
      val lib = graft.ops.QualityClassifier.scoreFixed(corpus.read,
        "doc_id", "text", 4096).orderBy("doc_id")
        .select("keep").as[Boolean].collect().toSeq
      assert(quality.map(_.getBoolean(1)).toSeq == lib)
      // train → persist → score BY TVF: the whole learned-filter loop
      // composes in SQL, with the model a managed-table path
      val labeled = Seq(
        (1L, "good clean prose with words", 1),
        (2L, "zz xx qq junk zz xx", 0),
        (3L, "good prose again here", 1),
        (4L, "qq zz junk tokens xx", 0)).toDF("doc_id", "text", "y")
      val m = graft.ops.QualityClassifier.train(labeled, "doc_id", "text",
        "y", buckets = 256, epochs = 3, lr = 0.5)
      val pm = tmpDir("sql-ext-model") + "/model"
      graft.ops.QualityClassifier.saveModel(extended, pm, m)
      val viaTvf = extended.sql(
        s"""SELECT doc_id, logit, p, keep
            FROM graft_quality_score_model('$pc', 'doc_id', 'text', '$pm')
            ORDER BY doc_id""")
        .as[(Long, Double, Double, Boolean)].collect().toSeq
      val viaApi = graft.ops.QualityClassifier.scoreModel(corpus.read,
          "doc_id", "text", m).orderBy("doc_id")
        .as[(Long, Double, Double, Boolean)].collect().toSeq
      assert(viaTvf == viaApi,
        s"TVF scoring must equal API scoring: $viaTvf vs $viaApi")
      // a non-model table is refused pointedly
      val modelErr = intercept[Exception](extended.sql(
        s"""SELECT * FROM graft_quality_score_model('$pc', 'doc_id',
            'text', '$pc')""").collect())
      assert(modelErr.getMessage.contains("graft.classifier.buckets"))
      // a model table whose ROWS drifted from its buckets property (hand
      // edit, partial overwrite) is also refused pointedly, not with a raw
      // ArrayIndexOutOfBounds (review r13)
      new ManagedTable(extended, pm)
        .append(Seq((999L, 0.25)).toDF("b", "w")) // buckets property = 256
      val driftErr = intercept[IllegalArgumentException](
        graft.ops.QualityClassifier.loadModel(new ManagedTable(extended, pm)))
      assert(driftErr.getMessage.contains("bucket 999") &&
        driftErr.getMessage.contains(pm),
        s"drifted model should be named and refused: ${driftErr.getMessage}")
      // train → persist → ENCODE by TVF: the tokenizer gets the same SQL
      // loop as the classifier — the merge list is a managed-table path
      val bpeDocs = Seq(
        (1L, "the cat sat on the mat"),
        (2L, "the hat is on the cat"),
        (3L, "scat scat the cat")).toDF("doc_id", "text")
      val pd = tmpDir("sql-ext-bpe") + "/docs"
      new ManagedTable(extended, pd).overwrite(bpeDocs)
      val trained = graft.ops.Bpe.train(bpeDocs, "text", numMerges = 12,
        minCount = 1)
      val pt = tmpDir("sql-ext-bpe") + "/tok"
      graft.ops.Bpe.saveMerges(extended, pt, trained)
      assert(graft.ops.Bpe.loadMerges(new ManagedTable(extended, pt))
        == trained, "saveMerges/loadMerges must round-trip in rank order")
      val encTvf = extended.sql(
        s"""SELECT doc_id, array_join(tokens, '|') AS ts
            FROM graft_bpe_encode('$pd', 'doc_id', 'text', '$pt')
            ORDER BY doc_id""").as[(Long, String)].collect().toSeq
      val encApi = graft.ops.Bpe.encode(bpeDocs, "doc_id", "text", trained)
        .selectExpr("doc_id", "array_join(tokens, '|')")
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
      assert(encTvf == encApi,
        s"TVF encode must equal API encode: $encTvf vs $encApi")
      // a non-tokenizer table is refused pointedly
      val bpeErr = intercept[Exception](extended.sql(
        s"""SELECT * FROM graft_bpe_encode('$pd', 'doc_id', 'text', '$pd')""")
        .collect())
      assert(bpeErr.getMessage.contains("graft.bpe.merges"))
      // drifted ranks (partial overwrite) are refused, not encoded wrong
      new ManagedTable(extended, pt).append(
        Seq((99L, "x", "y")).toDF("rank", "a", "b"))
      val rankErr = intercept[IllegalArgumentException](
        graft.ops.Bpe.loadMerges(new ManagedTable(extended, pt)))
      assert(rankErr.getMessage.contains(pt) &&
        rankErr.getMessage.contains("rank"))
      // sequence packing as a TVF ≡ the API plan (q150's operator over a
      // persisted token-count table)
      val pk = tmpDir("sql-ext-pack") + "/toks"
      val tokCounts = Seq((1L, 700L), (2L, 200L), (3L, 0L), (4L, 1500L))
        .toDF("doc_id", "n_tokens")
      new ManagedTable(extended, pk).overwrite(tokCounts)
      val packTvf = extended.sql(
        s"""SELECT seq_id, doc_id, seq_offset, doc_offset, slice_len
            FROM graft_pack_sequences('$pk', 'doc_id', 'n_tokens', 512)
            ORDER BY seq_id, doc_id""")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      val packApi = graft.ops.Sampling.concatChunkSlices(
          tokCounts, "doc_id", "n_tokens", seqLen = 512)
        .orderBy("seq_id", "doc_id")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(packTvf == packApi && packTvf.nonEmpty,
        s"TVF packing must equal API packing: $packTvf vs $packApi")
      // train → persist → SCORE by TVF: the Stupid-Backoff LM gets the
      // same SQL loop — the count table is a managed-table path
      val lmDocs = Seq(
        (1L, "the cat sat on the mat"),
        (2L, "the cat sat on the hat"),
        (3L, "unrelated words entirely here")).toDF("doc_id", "text")
      val pld = tmpDir("sql-ext-lm") + "/docs"
      new ManagedTable(extended, pld).overwrite(lmDocs)
      val lm = graft.ops.NgramLm.train(lmDocs, "doc_id", "text")
      val plm = tmpDir("sql-ext-lm") + "/lm"
      graft.ops.NgramLm.saveLm(extended, plm, lm, minCount = 1L)
      val lmTvf = extended.sql(
        s"""SELECT doc_id, n_tokens, sb_q, hits3, hits2, hits1, oov
            FROM graft_lm_score('$pld', 'doc_id', 'text', '$plm')
            ORDER BY doc_id""")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      val lmApi = graft.ops.NgramLm.scoreQuantized(lmDocs, "doc_id",
          "text", lm).orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(lmTvf == lmApi && lmTvf.nonEmpty,
        s"TVF LM scoring must equal API scoring: $lmTvf vs $lmApi")
      // a non-LM table is refused pointedly
      val lmErr = intercept[Exception](extended.sql(
        s"""SELECT * FROM graft_lm_score('$pld', 'doc_id', 'text',
            '$pld')""").collect())
      assert(lmErr.getMessage.contains("graft.lm.grams"))
      // exact-substring dedup as TVFs ≡ the API plans (q154/q155's
      // operators over a managed path) — lmDocs docs 1/2 share the
      // 4-gram "the cat sat on"
      val spanTvf = extended.sql(
        s"""SELECT doc_id, span_start, span_len
            FROM graft_duplicated_spans('$pld', 'doc_id', 'text', 3)
            ORDER BY doc_id, span_start""")
        .as[(Long, Int, Int)].collect().toSeq
      val spanApi = graft.ops.Dedup.duplicatedSpans(lmDocs, "doc_id",
          "text", 3).orderBy("doc_id", "span_start")
        .as[(Long, Int, Int)].collect().toSeq
      assert(spanTvf == spanApi && spanTvf.nonEmpty,
        s"TVF spans must equal API spans: $spanTvf vs $spanApi")
      val exTvf = extended.sql(
        s"""SELECT doc_id, clean_text, tokens_kept, tokens_dropped
            FROM graft_excise_spans('$pld', 'doc_id', 'text', 3)
            ORDER BY doc_id""")
        .as[(Long, String, Long, Long)].collect().toSeq
      val exApi = graft.ops.Dedup.exciseDuplicatedSpans(lmDocs, "doc_id",
          "text", 3).orderBy("doc_id")
        .as[(Long, String, Long, Long)].collect().toSeq
      assert(exTvf == exApi, s"TVF excision must equal API: $exTvf")
      // whole-doc packing as a TVF ≡ the API plan (over the persisted
      // token-count table graft_pack_sequences already exercises)
      val wpTvf = extended.sql(
        s"""SELECT doc_id, n_tokens, fit, bin
            FROM graft_pack_whole_docs('$pk', 'doc_id', 'n_tokens', 512)
            ORDER BY doc_id""")
        .as[(Long, Long, Long, Long)].collect().toSeq
      val wpApi = graft.ops.Sampling.packWholeDocs(tokCounts, "doc_id",
          "n_tokens", 512).orderBy("doc_id")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(wpTvf == wpApi && wpTvf.nonEmpty,
        s"TVF whole-doc packing must equal API: $wpTvf vs $wpApi")
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("CTAS with TBLPROPERTIES creates the table with properties set") {
    val dir = tmpDir("sql-ctas-props") + "/t"
    Seq((1L, "x")).toDF("k", "v").createOrReplaceTempView("ctas_props_src")
    GraftSql.sql(spark,
      s"""CREATE OR REPLACE TABLE '$dir'
          TBLPROPERTIES ('graft.enableDeletionVectors' = 'true', 'team' = 'data')
          AS SELECT * FROM ctas_props_src""")
    val t = new ManagedTable(spark, dir)
    assert(t.read.count() == 1)
    // `properties` is the EFFECTIVE map (table file over process-wide
    // defaults); the assertions here are about TABLE-declared entries
    def declared(m: Map[String, String]): Map[String, String] =
      m -- ManagedTable.propertyDefaults.keys
    assert(declared(t.properties) == Map(
      "graft.enableDeletionVectors" -> "true", "team" -> "data"))
    // CREATE OR REPLACE defines a NEW table: the old property set must NOT
    // leak into it (an inherited enableDeletionVectors would silently flip
    // later DELETEs to merge-on-read)
    GraftSql.sql(spark,
      s"CREATE OR REPLACE TABLE '$dir' TBLPROPERTIES ('team' = 'ops') AS " +
        "SELECT * FROM ctas_props_src")
    assert(declared(t.properties) == Map("team" -> "ops"))
    // a value containing a paren or the other quote char parses intact
    GraftSql.sql(spark,
      s"""ALTER TABLE '$dir' SET TBLPROPERTIES ('note' = 'a)b "c"')""")
    assert(t.properties("note") == """a)b "c"""")
  }

  test("SET TBLPROPERTIES ('graft.rowTracking'='true') routes through the " +
      "real enable: current files get bases, other pairs still land") {
    val (t, p) = freshTable("sql-rowtrack")
    t.overwrite(spark.range(10).toDF("id").repartition(2))
    GraftSql.sql(spark, s"ALTER TABLE graft.`$p` SET TBLPROPERTIES " +
      "('graft.rowTracking' = 'true', 'team' = 'data')")
    assert(t.properties("graft.rowTracking") == "true")
    assert(t.properties("team") == "data")
    // a bare property write would leave existing files base-less and this
    // read would throw "no row-id base recorded"
    val ids = t.readWithRowIds.select(graft.table.RowTracking.col)
      .as[Long].collect().toSet
    assert(ids == (0L until 10L).toSet)
  }

  test("SET TBLPROPERTIES flips SQL DELETE to deletion vectors; REORG purges") {
    import org.apache.spark.sql.functions.col
    val (t, p) = freshTable("sql-dv")
    t.overwrite(spark.range(100).toDF("id").repartition(4))
    GraftSql.sql(spark,
      s"ALTER TABLE graft.`$p` SET TBLPROPERTIES ('graft.enableDeletionVectors' = 'true')")
    val filesBefore = t.detail().select("num_files").as[Long].head()
    GraftSql.sql(spark, s"DELETE FROM graft.`$p` WHERE id % 4 = 1")
    // merge-on-read: rows gone, zero files rewritten
    assert(t.read.count() == 75)
    assert(t.detail().select("num_files").as[Long].head() == filesBefore)
    assert(t.deletionVectors.values.sum == 25L)
    // DESCRIBE DETAIL carries both the property and the DV state
    val props = GraftSql.sql(spark, s"DESCRIBE DETAIL '$p'")
      .select("properties").as[Seq[String]].head()
    assert(props.contains("prop:graft.enableDeletionVectors=true"))
    assert(props.exists(_.startsWith("deletionVectors:")))
    // UPDATE under the property is merge-on-read too: old copies marked,
    // replacements appended
    GraftSql.sql(spark, s"UPDATE graft.`$p` SET id = id + 1000 WHERE id % 4 = 2")
    assert(t.read.filter(col("id") >= 1000).count() == 25)
    assert(t.read.count() == 75)
    assert(t.history(1).select("operation").as[String].head() == "UPDATE")
    // MERGE under the property displaces matched keys via bitmaps
    spark.range(0, 3).toDF("id").createOrReplaceTempView("dv_sql_src")
    GraftSql.sql(spark,
      s"""MERGE INTO graft.`$p` AS t USING dv_sql_src AS s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    // ids 0 and 3-cycle: 0 matched (survived the deletes), 1 was deleted →
    // re-inserted, 2 was updated away to 1002 → re-inserted
    assert(t.read.filter(col("id") < 3).count() == 3)
    assert(t.history(1).select("operation").as[String].head() == "MERGE")
    val afterMerge = t.read.count()
    // REORG materializes; the table is then vector-free with same content
    GraftSql.sql(spark, s"REORG TABLE graft.`$p` APPLY (PURGE)")
    assert(t.deletionVectors.isEmpty)
    assert(t.read.count() == afterMerge)
    // SHOW TBLPROPERTIES lists the keys as rows (effective map — drop
    // ambient process-wide defaults; the assertion is about the table's)
    assert(GraftSql.sql(spark, s"SHOW TBLPROPERTIES graft.`$p`")
      .as[(String, String)].collect().toSeq
      .filterNot { case (k, _) => ManagedTable.propertyDefaults.contains(k) }
      == Seq(("graft.enableDeletionVectors", "true")))
    // UNSET returns DELETE to the copy-on-write rewrite
    GraftSql.sql(spark,
      s"ALTER TABLE '$p' UNSET TBLPROPERTIES ('graft.enableDeletionVectors')")
    val toDrop = t.read.filter(col("id") % 4 === 2).count()
    GraftSql.sql(spark, s"DELETE FROM '$p' WHERE id % 4 = 2")
    assert(t.read.count() == afterMerge - toDrop)
    assert(t.deletionVectors.isEmpty)
    assert(t.read.filter(col("id") % 4 === 2).count() == 0)
  }
}

package graft.table

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full MERGE clause family ([[ManagedTable.mergeBuilder]]): conditional
  * and multiple WHEN MATCHED clauses, matched DELETE, explicit SET/VALUES
  * lists, WHEN NOT MATCHED BY SOURCE, schema evolution — in both the
  * copy-on-write (`execute`) and merge-on-read (`executeVectored`) forms.
  */
class MergeClauseSpec extends SparkSpec {
  import spark.implicits._

  private def tgt(dir: String, rows: Seq[(Long, String, Double)],
                  parts: Seq[String] = Nil): ManagedTable = {
    val t = new ManagedTable(spark, dir + "/t")
    t.overwrite(rows.toDF("id", "status", "amount"), parts)
    t
  }

  private def content(t: ManagedTable): Set[(Long, String, Double)] =
    t.read.select("id", "status", "amount")
      .as[(Long, String, Double)].collect().toSet

  test("CDC apply: tombstone-delete + update + insert in ONE merge") {
    val t = tgt(tmpDir("mc-cdc"),
      Seq((1L, "old", 10.0), (2L, "old", 20.0), (3L, "old", 30.0)))
    val cdc = Seq((2L, "upd", 21.0, "U"), (3L, "del", 0.0, "D"),
      (4L, "new", 40.0, "I"), (5L, "dead", 0.0, "D"))
      .toDF("id", "status", "amount", "op")
    t.mergeBuilder(cdc, Seq("id"))
      .whenMatchedDelete("s.op = 'D'")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll("s.op <> 'D'")
      .execute()
    // 1 untouched, 2 updated, 3 deleted, 4 inserted, 5's tombstone ignored
    assert(content(t) == Set((1L, "old", 10.0), (2L, "upd", 21.0),
      (4L, "new", 40.0)))
    assert(t.history(1).select("operation").as[String].head() == "MERGE")
  }

  test("conditional update with explicit SET; first matching clause wins") {
    val t = tgt(tmpDir("mc-cond"),
      Seq((1L, "a", 5.0), (2L, "a", 50.0), (3L, "a", 500.0)))
    val src = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "delta")
    t.mergeBuilder(src, Seq("id"))
      .whenMatchedUpdate(Map("status" -> "'big'"), "t.amount > 100")
      .whenMatchedUpdate(Map("amount" -> "t.amount + s.delta"),
        "t.amount > 10")
      .execute()
    // 3 hits the first clause (status only), 2 the second (amount only),
    // 1 matches no condition and passes through
    assert(content(t) == Set((1L, "a", 5.0), (2L, "a", 52.0),
      (3L, "big", 500.0)))
  }

  test("NOT MATCHED BY SOURCE delete mirrors the source (snapshot sync)") {
    val t = tgt(tmpDir("mc-sync"),
      Seq((1L, "x", 1.0), (2L, "x", 2.0), (3L, "x", 3.0)))
    val snapshot = Seq((2L, "y", 22.0), (9L, "y", 99.0))
      .toDF("id", "status", "amount")
    t.mergeBuilder(snapshot, Seq("id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .whenNotMatchedBySourceDelete()
      .execute()
    assert(content(t) == Set((2L, "y", 22.0), (9L, "y", 99.0)))
  }

  test("NOT MATCHED BY SOURCE conditional update flags unseen rows") {
    val t = tgt(tmpDir("mc-bsu"),
      Seq((1L, "live", 1.0), (2L, "live", 200.0)))
    val src = Seq((1L, "live", 1.5)).toDF("id", "status", "amount")
    t.mergeBuilder(src, Seq("id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedBySourceUpdate(Map("status" -> "'stale'"),
        "t.amount > 100")
      .execute()
    assert(content(t) == Set((1L, "live", 1.5), (2L, "stale", 200.0)))
  }

  test("explicit INSERT values null-fill unassigned columns") {
    val t = tgt(tmpDir("mc-ins"), Seq((1L, "a", 1.0)))
    val src = Seq((7L, "ignored", 7.0)).toDF("id", "status", "amount")
    t.mergeBuilder(src, Seq("id"))
      .whenNotMatchedInsert(Map("id" -> "s.id", "amount" -> "s.amount * 2"))
      .execute()
    val rows = t.read.select("id", "status", "amount")
      .as[(Long, Option[String], Double)].collect().toSet
    assert(rows == Set((1L, Some("a"), 1.0), (7L, None, 14.0)))
  }

  test("merge-on-read form gives the same answer with zero files rewritten") {
    def src(s: org.apache.spark.sql.SparkSession): DataFrame = {
      import s.implicits._
      Seq((2L, "upd", 21.0, "U"), (3L, "del", 0.0, "D"),
        (4L, "new", 40.0, "I")).toDF("id", "status", "amount", "op")
    }
    val rows = Seq((1L, "old", 10.0), (2L, "old", 20.0), (3L, "old", 30.0))
    val cow = tgt(tmpDir("mc-cow"), rows)
    cow.mergeBuilder(src(spark), Seq("id"))
      .whenMatchedDelete("s.op = 'D'").whenMatchedUpdateAll()
      .whenNotMatchedInsertAll("s.op <> 'D'").execute()
    val mor = tgt(tmpDir("mc-mor"), rows)
    val before = mor.detail().select("num_files").as[Long].head()
    mor.mergeBuilder(src(spark), Seq("id"))
      .whenMatchedDelete("s.op = 'D'").whenMatchedUpdateAll()
      .whenNotMatchedInsertAll("s.op <> 'D'").executeVectored()
    assert(content(mor) == content(cow))
    // MOR appends; the original files stay in place (marked, not rewritten)
    assert(mor.detail().select("num_files").as[Long].head() >= before)
    assert(mor.history(1).select("operation").as[String].head() == "MERGE")
  }

  test("by-source clauses work vectored (whole-table annotate, one commit)") {
    val t = tgt(tmpDir("mc-morbs"),
      Seq((1L, "x", 1.0), (2L, "x", 2.0), (3L, "x", 3.0)))
    val snapshot = Seq((2L, "y", 22.0), (9L, "y", 99.0))
      .toDF("id", "status", "amount")
    val v0 = t.version
    t.mergeBuilder(snapshot, Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .whenNotMatchedBySourceDelete()
      .executeVectored()
    assert(content(t) == Set((2L, "y", 22.0), (9L, "y", 99.0)))
    assert(t.version == v0 + 1, "one commit for the whole clause family")
  }

  test("syncFrom mirrors a snapshot in one statement") {
    val t = tgt(tmpDir("mc-syncop"),
      Seq((1L, "x", 1.0), (2L, "x", 2.0), (3L, "x", 3.0)))
    t.syncFrom(Seq((2L, "y", 22.0), (9L, "y", 99.0))
      .toDF("id", "status", "amount"), Seq("id"))
    assert(content(t) == Set((2L, "y", 22.0), (9L, "y", 99.0)))
  }

  test("partition-pruned clause merge only touches affected partitions") {
    val dir = tmpDir("mc-part")
    val t = new ManagedTable(spark, dir + "/t")
    t.overwrite(Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0),
        (4L, "p3", 4.0)).toDF("id", "part", "amount"), Seq("part"))
    val src = Seq((2L, "p1", 20.0, "U"), (3L, "p2", 0.0, "D"))
      .toDF("id", "part", "amount", "op")
    t.mergeBuilder(src, Seq("id"), partitionCols = Seq("part"))
      .whenMatchedDelete("s.op = 'D'")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll("s.op <> 'D'")
      .execute()
    assert(t.read.select("id", "part", "amount")
      .as[(Long, String, Double)].collect().toSet ==
      Set((1L, "p1", 1.0), (2L, "p1", 20.0), (4L, "p3", 4.0)))
    // untouched partition p3 keeps serving its ORIGINAL file (no rewrite):
    // the swap moves only affected dirs
    val p3Files = t.read.filter(col("part") === "p3")
      .select(input_file_name()).as[String].collect().toSet
    assert(p3Files.forall(f => f.contains("/part=p3/") && !f.contains("._v")))
  }

  test("schema evolution adds source-only columns through the builder") {
    val t = tgt(tmpDir("mc-evo"), Seq((1L, "a", 1.0), (2L, "a", 2.0)))
    val src = Seq((2L, "b", 2.5, "eu"), (3L, "c", 3.0, "us"))
      .toDF("id", "status", "amount", "region")
    t.mergeBuilder(src, Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .withSchemaEvolution()
      .execute()
    val rows = t.read.select("id", "status", "amount", "region")
      .as[(Long, String, Double, Option[String])].collect().toSet
    assert(rows == Set((1L, "a", 1.0, None), (2L, "b", 2.5, Some("eu")),
      (3L, "c", 3.0, Some("us"))))
  }

  test("update-only and delete-only merges need no insert clause") {
    val t = tgt(tmpDir("mc-upd"), Seq((1L, "a", 1.0), (2L, "a", 2.0)))
    val src = Seq((2L, "z", 0.0)).toDF("id", "status", "amount")
    t.mergeBuilder(src, Seq("id"))
      .whenMatchedUpdate(Map("status" -> "s.status")).execute()
    assert(content(t) == Set((1L, "a", 1.0), (2L, "z", 2.0)))
    t.mergeBuilder(src, Seq("id")).whenMatchedDelete().execute()
    assert(content(t) == Set((1L, "a", 1.0)))
  }

  test("a typo'd SET or INSERT column fails loudly, never no-ops") {
    val t = tgt(tmpDir("mc-typo"), Seq((1L, "a", 1.0)))
    val src = Seq((1L, "b", 2.0)).toDF("id", "status", "amount")
    val e1 = intercept[IllegalArgumentException] {
      t.mergeBuilder(src, Seq("id"))
        .whenMatchedUpdate(Map("amuont" -> "s.amount")).execute() }
    assert(e1.getMessage.contains("amuont"))
    val e2 = intercept[IllegalArgumentException] {
      t.mergeBuilder(src, Seq("id"))
        .whenNotMatchedInsert(Map("id" -> "s.id", "wrong" -> "s.amount"))
        .execute() }
    assert(e2.getMessage.contains("wrong"))
  }

  test("a source missing the partition column still prunes a matched-only " +
      "merge; with an insert clause it takes the full swap") {
    val t = new ManagedTable(spark, tmpDir("mc-nopart") + "/t")
    t.overwrite(Seq((1L, "p1", 1.0), (2L, "p2", 2.0))
      .toDF("id", "part", "amount"), Seq("part"))
    val src = Seq((2L, 20.0)).toDF("id", "amt2") // no `part` column
    t.mergeBuilder(src, Seq("id"), partitionCols = Seq("part"))
      .whenMatchedUpdate(Map("amount" -> "s.amt2"), "s.amt2 > t.amount")
      .execute()
    assert(t.read.select("id", "part", "amount")
      .as[(Long, String, Double)].collect().toSet ==
      Set((1L, "p1", 1.0), (2L, "p2", 20.0)))
    // with an insert clause the inserted rows' partitions are unknowable
    // from a part-less source — must still answer correctly (full swap)
    val src2 = Seq((3L, 30.0)).toDF("id", "amt2")
    t.mergeBuilder(src2, Seq("id"), partitionCols = Seq("part"))
      .whenMatchedUpdate(Map("amount" -> "s.amt2"))
      .whenNotMatchedInsert(Map("id" -> "s.id", "amount" -> "s.amt2",
        "part" -> "'p9'"))
      .execute()
    assert(t.read.filter(col("id") === 3)
      .select("part", "amount").as[(String, Double)].head() == ("p9", 30.0))
  }

  test("a CASE WHEN inside a SET expression parses through SQL MERGE") {
    val dir = tmpDir("mc-case")
    val t = new ManagedTable(spark, dir + "/t")
    t.overwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"))
    import spark.implicits._
    Seq((1L, "U", 100.0), (2L, "X", 200.0)).toDF("k", "op", "nv")
      .createOrReplaceTempView("mc_case_src")
    graft.sql.GraftSql.sql(spark,
      s"MERGE INTO '${dir + "/t"}' t USING mc_case_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET " +
        "v = CASE WHEN s.op = 'U' THEN s.nv ELSE t.v END")
    assert(t.read.as[(Long, Double)].collect().toSet ==
      Set((1L, 100.0), (2L, 20.0)))
  }

  test("illegal clause shapes and empty builders are refused") {
    val t = tgt(tmpDir("mc-bad"), Seq((1L, "a", 1.0)))
    val src = Seq((1L, "b", 2.0)).toDF("id", "status", "amount")
    val e1 = intercept[IllegalArgumentException] {
      t.mergeBuilder(src, Seq("id")).execute() }
    assert(e1.getMessage.contains("at least one WHEN clause"))
    val e2 = intercept[IllegalArgumentException] {
      t.mergeBuilder(src, Seq("id"), targetAlias = "x", sourceAlias = "x")
        .whenMatchedUpdateAll().execute() }
    assert(e2.getMessage.contains("aliases"))
    val e3 = intercept[IllegalArgumentException] {
      new ManagedTable(spark, tmpDir("mc-miss") + "/none")
        .mergeBuilder(src, Seq("id")).whenMatchedUpdateAll().execute() }
    assert(e3.getMessage.contains("does not exist"))
  }

  test("custom aliases resolve in conditions and assignments") {
    val t = tgt(tmpDir("mc-alias"), Seq((1L, "a", 1.0), (2L, "a", 2.0)))
    val src = Seq((1L, 100.0), (2L, 0.5)).toDF("id", "factor")
    t.mergeBuilder(src, Seq("id"), targetAlias = "tgt", sourceAlias = "upd")
      .whenMatchedUpdate(Map("amount" -> "tgt.amount * upd.factor"),
        "upd.factor > 1")
      .execute()
    assert(content(t) == Set((1L, "a", 100.0), (2L, "a", 2.0)))
  }

  test("generated columns compute on MERGE INSERT in both forms") {
    for ((vectored, tag) <- Seq((false, "cow"), (true, "mor"))) {
      val t = new ManagedTable(spark, tmpDir(s"mc-gen-$tag") + "/t")
      t.overwrite(Seq((1L, "2024-03-15", "2024-03"))
        .toDF("id", "d", "month"), Seq("month"))
      t.addGeneratedColumn("month", "substring(d, 1, 7)")
      // CDC source omits the generated partition column entirely
      val src = Seq((1L, "2024-03-20"), (2L, "2024-04-02"))
        .toDF("id", "d")
      val b = t.mergeBuilder(src, Seq("id"), Seq("month"))
        .whenMatchedUpdate(Map("d" -> "s.d"))
        .whenNotMatchedInsertAll()
      if (vectored) b.executeVectored() else b.execute()
      val got = t.read.orderBy("id").select("id", "d", "month")
        .as[(Long, String, String)].collect().toSeq
      // the INSERTED row generates its partition value; the UPDATED row
      // keeps its original (only inserts compute)
      assert(got == Seq((1L, "2024-03-20", "2024-03"),
        (2L, "2024-04-02", "2024-04")), s"$tag: $got")
    }
  }

  test("vectored schema evolution declares source-only columns " +
      "metadata-only; old files read null") {
    val dir = tmpDir("mc-evo-mor")
    val t = tgt(dir, Seq((1L, "a", 1.0), (2L, "a", 2.0)))
    def onDisk(): Set[String] = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir + "/t"))
        .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
    }
    val filesBefore = onDisk()
    val src = Seq((2L, "b", 2.5, "eu"), (3L, "c", 3.0, "us"))
      .toDF("id", "status", "amount", "region")
    t.mergeBuilder(src, Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .withSchemaEvolution()
      .executeVectored()
    val rows = t.read.select("id", "status", "amount", "region")
      .as[(Long, String, Double, Option[String])].collect().toSet
    assert(rows == Set((1L, "a", 1.0, None), (2L, "b", 2.5, Some("eu")),
      (3L, "c", 3.0, Some("us"))))
    // merge-on-read: every pre-merge file survives in place, plus appends
    val after = onDisk()
    assert(filesBefore.subsetOf(after) && after.size > filesBefore.size,
      s"MOR evolution must append beside old files, not rewrite them " +
        s"(before=$filesBefore after=$after)")
  }

  test("a failed vectored evolution rolls the schema declaration back") {
    val t = tgt(tmpDir("mc-evo-rb"), Seq((1L, "a", 1.0)))
    t.addConstraint("amt_pos", "amount >= 0")
    val src = Seq((2L, "b", -5.0, "eu")).toDF("id", "status", "amount", "region")
    intercept[Exception] {
      t.mergeBuilder(src, Seq("id")).whenNotMatchedInsertAll()
        .withSchemaEvolution().executeVectored()
    }
    assert(t.read.columns.toSeq == Seq("id", "status", "amount"),
      "a failed merge must not leave the evolved schema behind")
    assert(content(t) == Set((1L, "a", 1.0)))
  }
}

package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column mapping (Delta's `columnMapping.mode = name`): RENAME and DROP
  * COLUMN as pure metadata edits — zero files rewritten, old files still
  * read, writes and DML keep working through the logical→physical
  * indirection.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(t: ManagedTable): Set[String] =
    t.read.select(input_file_name()).as[String].collect().toSet

  test("rename under mapping rewrites zero files; old files still read") {
    val t = new ManagedTable(spark, tmpDir("cm-ren") + "/t")
    t.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "note", "amt")
      .repartition(2))
    t.enableColumnMapping()
    val before = dataFiles(t)
    t.renameColumn("note", "comment")
    assert(dataFiles(t) == before, "rename must move no data file")
    assert(t.read.columns.toSeq == Seq("id", "comment", "amt"))
    assert(t.read.select("id", "comment").as[(Long, String)].collect().toSet
      == Set((1L, "a"), (2L, "b")))
    assert(t.protocol._1.contains("column-mapping"))
    // rename back to the physical name drops the mapping entry
    t.renameColumn("comment", "note")
    assert(t.read.columns.toSeq == Seq("id", "note", "amt"))
  }

  test("time travel under mapping surfaces V-ERA logical names — each " +
      "commit records its naming state, renames land a version boundary") {
    val t = new ManagedTable(spark, tmpDir("cm-tt") + "/t")
    t.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "note", "amt"))
    t.enableColumnMapping() // commits the era boundary
    val preRename = t.version
    t.renameColumn("note", "comment") // its own commit under mapping
    val postRename = t.version
    assert(postRename == preRename + 1,
      "a mapped RENAME COLUMN must land a naming commit")
    t.append(Seq((3L, "c", 3.0)).toDF("id", "comment", "amt"))
    // rows at the old version are EXACT and the names are THAT VERSION'S
    // (Delta's metaData-per-version resolution): a rename no longer
    // retitles history
    val old = t.readVersion(preRename)
    assert(old.columns.toSeq == Seq("id", "note", "amt"),
      s"time travel shows v-era logical names: ${old.columns.toSeq}")
    assert(old.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    // the rename version and everything after it speak the new name
    assert(t.readVersion(postRename).columns.toSeq ==
      Seq("id", "comment", "amt"))
    assert(t.read.count() == 3)
    // readAsOf resolves through the same era record
    val h = t.history().collect()
    val renameTs = h.find(_.getAs[Long]("version") == postRename)
      .get.getAs[String]("timestamp")
    assert(t.readAsOf(renameTs).columns.toSeq == Seq("id", "comment", "amt"))
    // v-era names and v-era rows compose: replaying v-era SQL against the
    // time travel works (the auditor scenario the old pin broke)
    t.readVersion(preRename).createOrReplaceTempView("cm_tt_old")
    assert(spark.sql("SELECT note FROM cm_tt_old ORDER BY note")
      .as[String].collect().toSeq == Seq("a", "b"))
    // a column DROPPED after v is still visible AT v (metadata drop hides
    // it from live reads only from its own version on)
    t.dropColumn("amt")
    assert(t.read.columns.toSeq == Seq("id", "comment"))
    assert(t.readVersion(postRename).columns.toSeq ==
      Seq("id", "comment", "amt"),
      "a later metadata drop must not hide the column from history")
    assert(t.readVersion(preRename).columns.toSeq == Seq("id", "note", "amt"))
  }

  test("RESTORE under mapping rolls DATA back and keeps the live names; " +
      "clones carry the clone-time naming as their founding era") {
    val t = new ManagedTable(spark, tmpDir("cm-restore") + "/t")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "note"))
    t.enableColumnMapping()
    val preRename = t.version
    t.renameColumn("note", "comment")
    t.append(Seq((3L, "c")).toDF("id", "comment"))
    t.restore(preRename)
    // data = v(preRename); names = live (the rename survives the restore)
    assert(t.read.columns.toSeq == Seq("id", "comment"),
      s"RESTORE keeps live names: ${t.read.columns.toSeq}")
    assert(t.read.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // and the RESTORE commit records the live naming, so time travel TO
    // the restore version speaks the live name too
    assert(t.readVersion(t.version).columns.toSeq == Seq("id", "comment"))
    // pre-rename versions still resolve their own era
    assert(t.readVersion(preRename).columns.toSeq == Seq("id", "note"))
    // deep clone: fresh history, founding commit records clone-time naming
    val c = t.cloneTo(tmpDir("cm-restore") + "/clone")
    assert(c.read.columns.toSeq == Seq("id", "comment"))
    assert(c.readVersion(0).columns.toSeq == Seq("id", "comment"),
      "the clone's founding version speaks the clone-time names")
    c.renameColumn("comment", "body")
    assert(c.readVersion(0).columns.toSeq == Seq("id", "comment"),
      "the clone's own later rename must not retitle its founding era")
    // shallow clone: founding commit pins the source files + naming
    val sc = t.shallowCloneTo(tmpDir("cm-restore") + "/sclone")
    assert(sc.read.columns.toSeq == Seq("id", "comment"))
    assert(sc.readVersion(sc.version).columns.toSeq == Seq("id", "comment"))
  }

  test("disableColumnMapping leaves history readable under its own era " +
      "names (records survive the disable)") {
    val t = new ManagedTable(spark, tmpDir("cm-off-era") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("id", "note"))
    t.enableColumnMapping()
    t.renameColumn("note", "comment")
    val mappedV = t.version
    t.disableColumnMapping()
    assert(t.read.columns.toSeq == Seq("id", "comment"))
    // the retained pre-disable snapshot still carries PHYSICAL names in
    // its files; the era record keeps aliasing them to that era's logical
    assert(t.readVersion(mappedV).columns.toSeq == Seq("id", "comment"),
      s"pre-disable history must keep its era names: " +
        s"${t.readVersion(mappedV).columns.toSeq}")
    assert(t.readVersion(mappedV).orderBy("id").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a")))
    // the disable version itself is logical-named files + no record
    assert(t.readVersion(t.version).columns.toSeq == Seq("id", "comment"))
  }

  test("appends after a rename land physical; scans stay single-schema") {
    val t = new ManagedTable(spark, tmpDir("cm-app") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("id", "note"))
    t.enableColumnMapping()
    t.renameColumn("note", "comment")
    // append speaks the LOGICAL schema
    t.append(Seq((2L, "b")).toDF("id", "comment"))
    assert(t.read.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // the mixed dir still compacts and reads as ONE schema
    t.compact(numFiles = 1)
    assert(t.read.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("drop under mapping is metadata-only; re-adding the name does not " +
      "resurrect the dead data") {
    val t = new ManagedTable(spark, tmpDir("cm-drop") + "/t")
    t.overwrite(Seq((1L, "secret", 1.0), (2L, "hush", 2.0))
      .toDF("id", "note", "amt").repartition(2))
    t.enableColumnMapping()
    val before = dataFiles(t)
    t.dropColumn("note")
    assert(dataFiles(t) == before, "drop must move no data file")
    assert(t.read.columns.toSeq == Seq("id", "amt"))
    // a NEW column under the old name must read null, not 'secret'
    t.addColumns("note STRING")
    assert(t.read.select("note").as[Option[String]].collect().toSeq ==
      Seq(None, None))
    // and writes to it round-trip
    t.append(Seq((3L, 3.0, "fresh")).toDF("id", "amt", "note"))
    assert(t.read.filter(col("id") === 3).select("note").as[String].head()
      == "fresh")
  }

  test("chained renames (one pair's logical = another's physical) still " +
      "write correctly") {
    val t = new ManagedTable(spark, tmpDir("cm-chain") + "/t")
    t.overwrite(Seq((1L, "A", 1.0)).toDF("a", "b", "c"))
    t.enableColumnMapping()
    t.renameColumn("b", "x") // pairs: (x, b)
    t.renameColumn("a", "b") // pairs: (x, b), (b, a) — b is both sides
    assert(t.read.columns.toSeq == Seq("b", "x", "c"))
    t.append(Seq((2L, "B", 2.0)).toDF("b", "x", "c"))
    assert(t.read.orderBy("b").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "A", 1.0), (2L, "B", 2.0)))
    t.compact(numFiles = 1) // the rewrite path funnels toPhysical too
    assert(t.read.count() == 2)
  }

  test("DML, merge, and time travel speak logical names after a rename") {
    val t = new ManagedTable(spark, tmpDir("cm-dml") + "/t")
    t.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "note", "amt"))
    t.enableColumnMapping()
    val preRename = t.version // mapped, so its manifest records its era
    t.renameColumn("amt", "amount")
    // vectored DML with a logical-name predicate and assignment
    t.deleteVectored(col("amount") > 2.5)
    t.updateVectored(col("id") === 1, Map("amount" -> lit(10.0)))
    assert(t.read.select("id", "amount").as[(Long, Double)].collect().toSet
      == Set((1L, 10.0), (2L, 2.0)))
    // clause-family merge on the logical schema
    t.mergeBuilder(Seq((2L, "B", 22.0)).toDF("id", "note", "amount"),
        Seq("id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(t.read.select("id", "amount").as[(Long, Double)].collect().toSet
      == Set((1L, 10.0), (2L, 22.0)))
    // time travel speaks V-ERA names (the dedicated era tests pin the
    // full surface): the pre-rename mapped version still titles `amt` —
    // probed at the enable version, not v0, because under an ambient
    // `graft.columnMapping=name` default (soak cells C/D) the table is
    // mapped from BIRTH and v0 then records its own era too, while under
    // stock defaults v0 predates the record and falls back to live names
    assert(t.readVersion(preRename).columns.contains("amt"),
      t.readVersion(preRename).columns.toSeq.toString)
    // the live read keeps the post-rename title
    assert(t.read.columns.contains("amount"))
  }

  test("readWhere skipping still PRUNES on a renamed column (stats " +
      "lookups translate through the mapping)") {
    val t = new ManagedTable(spark, tmpDir("cm-skip") + "/t")
    t.overwrite(Seq.tabulate(20)(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .repartitionByRange(4, col("v")))
    t.enableColumnMapping()
    t.renameColumn("v", "value")
    val (kept, all) = t.filesOverlapping("value", 5.0, 7.0)
    assert(all.size == 4 && kept.size < all.size,
      s"rename must not disable skipping: kept ${kept.size} of ${all.size}")
    val r = t.readWhere("value", 5.0, 7.0)
      .select("id").as[Long].collect().toSet
    assert(r == Set(5L, 6L, 7L))
  }

  test("columnStats reports logical names and hides dropped columns") {
    val t = new ManagedTable(spark, tmpDir("cm-stats") + "/t")
    t.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "note", "amt"))
    t.enableColumnMapping()
    t.renameColumn("amt", "amount")
    t.dropColumn("note")
    val cols = t.columnStats().select("col_name").as[String].collect().toSet
    assert(cols == Set("id", "amount"), cols)
  }

  test("type widening composes with mapping (override keyed physical)") {
    val t = new ManagedTable(spark, tmpDir("cm-widen") + "/t")
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("n", "s"))
    t.enableColumnMapping()
    t.renameColumn("n", "num")
    t.alterColumnType("num", "BIGINT")
    assert(t.read.schema("num").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(t.read.select("num").as[Long].collect().toSet == Set(1L, 2L))
    t.append(Seq((3L, "c")).toDF("num", "s"))
    assert(t.read.select("num").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("DROP FEATURE refuses while the mapping is in use") {
    val t = new ManagedTable(spark, tmpDir("cm-feat") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("id", "note"))
    t.enableColumnMapping()
    t.renameColumn("note", "comment")
    val e = intercept[IllegalArgumentException] {
      t.dropTableFeature("column-mapping") }
    assert(e.getMessage.contains("still in use"))
    // a feature-less build must refuse the table outright (reader gate)
    assert(t.protocol._1.contains("column-mapping"))
  }

  test("SQL surface: TBLPROPERTIES enables, RENAME/DROP route metadata-only") {
    val dir = tmpDir("cm-sql")
    val p = dir + "/t"
    val t = new ManagedTable(spark, p)
    t.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "note", "amt")
      .repartition(2))
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE '$p' SET TBLPROPERTIES ('graft.columnMapping' = 'name')")
    assert(t.columnMappingEnabled && t.protocol._1.contains("column-mapping"))
    val before = dataFiles(t)
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE '$p' RENAME COLUMN note TO comment")
    graft.sql.GraftSql.sql(spark, s"ALTER TABLE '$p' DROP COLUMN amt")
    assert(dataFiles(t) == before, "SQL rename+drop must move no file")
    assert(t.read.columns.toSeq == Seq("id", "comment"))
    // 'none' routes through disableColumnMapping (rewrite + clear), not a
    // bare property write that would leave the files physical
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE '$p' SET TBLPROPERTIES ('graft.columnMapping' = 'none')")
    assert(!t.columnMappingEnabled)
    assert(!t.properties.contains("graft.schema.mapping"))
    assert(spark.read.parquet(p).columns.sorted.toSeq == Seq("comment", "id"))
  }

  test("full-schema writes reject columns colliding with dropped or " +
      "renamed-away physical names") {
    val t = new ManagedTable(spark, tmpDir("cm-clash") + "/t")
    t.overwrite(Seq((1L, "x", 1.0)).toDF("id", "note", "amt"))
    t.enableColumnMapping()
    t.renameColumn("note", "comment")
    // a fresh column named like the renamed-away PHYSICAL name would land
    // physical and silently surface as `comment` on every read
    val e1 = intercept[IllegalArgumentException] {
      t.overwrite(Seq((1L, "y", "z")).toDF("id", "comment", "note"))
    }
    assert(e1.getMessage.contains("renamed-away"))
    t.dropColumn("comment")
    // same-named reintroduction of a dropped column would be hidden by
    // the dropped-physical exclusion on every read
    val e2 = intercept[IllegalArgumentException] {
      t.overwrite(Seq((1L, "fresh")).toDF("id", "note"))
    }
    assert(e2.getMessage.contains("dropped"))
    // the sanctioned route maps the reintroduced name to a fresh physical
    t.addColumns("note STRING")
    assert(t.read.columns.toSeq == Seq("id", "amt", "note"))
    assert(t.read.select("note").filter(col("note").isNotNull).count() == 0)
  }

  test("disableColumnMapping rewrites to logical names and clears the " +
      "mapping in one operation") {
    val p = tmpDir("cm-off") + "/t"
    val t = new ManagedTable(spark, p)
    t.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "note", "amt"))
    t.enableColumnMapping()
    t.renameColumn("note", "comment")
    t.dropColumn("amt")
    t.disableColumnMapping()
    assert(!t.columnMappingEnabled)
    assert(!t.properties.contains("graft.schema.mapping"))
    assert(!t.properties.contains("graft.schema.dropped"))
    assert(t.read.columns.toSeq == Seq("id", "comment"))
    assert(t.read.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // the FILES now carry the logical name (and the dead dropped data is
    // physically reclaimed): a raw feature-less parquet read agrees
    val raw = spark.read.parquet(p)
    assert(raw.columns.sorted.toSeq == Seq("comment", "id"))
    // and the reader feature is finally droppable
    t.dropTableFeature("column-mapping")
    assert(!t.protocol._1.contains("column-mapping"))
    // idempotent on an unmapped table
    t.disableColumnMapping()
    assert(t.read.count() == 2)
  }

  test("disableColumnMapping on a NEVER-mapped table still pins an explicit " +
      "'none' — disable means disable under ambient defaults (advice r13)") {
    // the early (no-rewrite-needed) return used to skip the pin, so an
    // explicit disable on an unmapped table persisted NOTHING — a
    // GRAFT_PROPERTY_DEFAULTS=name introduced in a LATER session would
    // silently re-enable the mode, the exact later-session hole the
    // unconditional pin exists to close
    val t = new ManagedTable(spark, tmpDir("cm-off-unmapped") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("id", "note"))
    if (ManagedTable.propertyDefaults.get("graft.columnMapping")
        .contains("name"))
      // under soak cell C/D the table is born mapped; the rewrite path
      // already pins 'none' — this case is about the never-mapped path
      t.disableColumnMapping()
    t.disableColumnMapping()
    assert(t.properties.get("graft.columnMapping").contains("none"),
      "an explicit disable on an unmapped table must persist the 'none' pin")
    assert(!t.columnMappingEnabled)
    // and the pin is written ONCE — a second disable is a no-op commit-wise
    val propsFile = new java.io.File(t.path + "._log/_props.txt")
    val before = propsFile.lastModified()
    Thread.sleep(5)
    t.disableColumnMapping()
    assert(propsFile.lastModified() == before,
      "a table already pinned to 'none' must not rewrite its props file")
  }

  test("partition-column rename is metadata-only under mapping; dirs and " +
      "pruning keep working") {
    val t = new ManagedTable(spark, tmpDir("cm-pren") + "/t")
    t.overwrite(Seq((1L, "p1", 1.0), (2L, "p2", 2.0))
      .toDF("id", "part", "amt"), Seq("part"))
    // pin the UNMAPPED starting state this case is about — a config-matrix
    // soak cell may default columnMapping=name process-wide
    t.setProperties(Map("graft.columnMapping" -> "none"))
    // without mapping the dir scheme IS the name: refused
    val e = intercept[IllegalArgumentException] {
      t.renameColumn("part", "division") }
    assert(e.getMessage.contains("column mapping"))
    t.enableColumnMapping()
    val before = dataFiles(t)
    t.renameColumn("part", "division")
    assert(dataFiles(t) == before, "partition rename must move no file")
    assert(t.read.columns.toSeq == Seq("id", "amt", "division"))
    // dirs stay physical `part=`; the logical surface is `division`
    assert(before.forall(_.contains("/part=")))
    assert(t.read.filter(col("division") === "p2").select("id")
      .as[Long].collect().toSeq == Seq(2L))
    // appends speak the logical name and land in the physical dirs
    t.append(Seq((3L, 3.0, "p1")).toDF("id", "amt", "division"))
    assert(t.read.filter(col("division") === "p1").count() == 2)
    assert(dataFiles(t).forall(_.contains("/part=")))
    // SHOW PARTITIONS surfaces the logical name
    assert(t.partitions().columns.head == "division")
    assert(t.partitions().count() == 2)
  }

  test("disableColumnMapping handles renamed partition columns and " +
      "clash-remapped extras") {
    val p = tmpDir("cm-off2") + "/t"
    val t = new ManagedTable(spark, p)
    t.overwrite(Seq((1L, "p1", "x"), (2L, "p2", "y"))
      .toDF("id", "part", "note"), Seq("part"))
    t.enableColumnMapping()
    t.renameColumn("part", "division") // partition rename: metadata-only
    t.dropColumn("note")
    t.addColumns("note STRING") // clash-remaps to a fresh physical name
    t.disableColumnMapping()
    assert(t.read.columns.sorted.toSeq == Seq("division", "id", "note"))
    // the clash-remapped extra must NOT resurface as a phantom physical
    assert(!t.properties.contains("graft.schema.extras"))
    assert(t.read.filter(col("note").isNotNull).count() == 0)
    // dirs re-laid under the logical partition name; pruning still works
    assert(t.read.filter(col("division") === "p1").select("id")
      .as[Long].collect().toSeq == Seq(1L))
    t.dropTableFeature("column-mapping")
    assert(!t.protocol._1.contains("column-mapping"))
  }

  test("constraint-referenced columns stay refused") {
    val t = new ManagedTable(spark, tmpDir("cm-ref") + "/t")
    t.overwrite(Seq((1L, "p1", 1.0)).toDF("id", "part", "amt"))
    t.enableColumnMapping()
    t.addConstraint("pos", "amt >= 0")
    intercept[IllegalArgumentException] { t.renameColumn("amt", "amount") }
    intercept[IllegalArgumentException] { t.dropColumn("amt") }
    t.dropConstraint("pos")
    t.renameColumn("amt", "amount") // allowed once the reference is gone
    assert(t.read.columns.contains("amount"))
  }
}

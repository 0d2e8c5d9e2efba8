package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Row tracking: stable unique row ids — fresh base+index on appends,
  * materialized through maintenance rewrites, stable through MOR DML.
  */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private val RID = RowTracking.col

  private def mk(name: String, rows: Seq[(Long, String)]): ManagedTable = {
    val t = new ManagedTable(spark, tmpDir(name) + "/t")
    t.overwrite(rows.toDF("k", "v").repartition(3))
    t.enableRowTracking()
    t
  }

  private def idsOf(t: ManagedTable): Map[Long, Long] =
    t.readWithRowIds.select(col("k"), col(RID)).as[(Long, Long)]
      .collect().toMap

  test("enable assigns unique contiguous ids; appends extend them; the " +
      "plain read never surfaces the column") {
    val t = mk("rt-basic", (0L until 20L).map(k => (k, s"v$k")))
    val ids0 = idsOf(t)
    assert(ids0.size == 20 && ids0.values.toSet == (0L until 20L).toSet)
    t.append((20L until 30L).map(k => (k, s"v$k")).toDF("k", "v"))
    val ids1 = idsOf(t)
    assert(ids1.size == 30 && ids1.values.toSet.size == 30)
    assert(ids0.forall { case (k, id) => ids1(k) == id }) // old rows keep ids
    assert(!t.read.columns.contains(RID))
  }

  test("ids are stable through a vectored DELETE and through OPTIMIZE " +
      "(which materializes them); post-OPTIMIZE appends never collide") {
    val t = mk("rt-stable", (0L until 40L).map(k => (k, s"v$k")))
    val before = idsOf(t)
    t.deleteVectored(col("k") % 10 === 3)
    val afterDel = idsOf(t)
    assert(afterDel.keySet == before.keySet.filterNot(_ % 10 == 3))
    assert(afterDel.forall { case (k, id) => before(k) == id })
    t.compact(numFiles = 2) // materializes ids into the rewritten files
    val afterOpt = idsOf(t)
    assert(afterOpt == afterDel)
    assert(!t.read.columns.contains(RID)) // hidden from the plain scan
    t.append((100L until 110L).map(k => (k, s"v$k")).toDF("k", "v"))
    val afterApp = idsOf(t)
    assert(afterApp.values.toSet.size == afterApp.size) // still unique
    assert(afterDel.forall { case (k, id) => afterApp(k) == id })
  }

  test("incremental OPTIMIZE (compactSmall) and clustering preserve ids; " +
      "PURGE of deletion vectors preserves surviving ids") {
    val t = mk("rt-maint", (0L until 30L).map(k => (k, s"v$k")))
    for (b <- 0 until 3) // small-file debt
      t.append(Seq((100L + b, s"x$b")).toDF("k", "v"))
    val before = idsOf(t)
    t.compactSmall(minFileBytes = 1024 * 1024)
    assert(idsOf(t) == before)
    t.cluster("k")
    assert(idsOf(t) == before)
    t.deleteVectored(col("k") < 5)
    t.purgeDeletes()
    val after = idsOf(t)
    assert(after == before.filter(_._1 >= 5))
  }

  test("a vectored UPDATE gives the updated row a fresh id and keeps " +
      "every untouched id") {
    val t = mk("rt-upd", (0L until 10L).map(k => (k, s"v$k")))
    val before = idsOf(t)
    t.updateVectored(col("k") === 4, Map("v" -> lit("V4")))
    val after = idsOf(t)
    assert(after.keySet == before.keySet)
    assert(after.filter(_._1 != 4L) == before.filter(_._1 != 4L))
    assert(after(4L) != before(4L)) // replacement row, replacement id
    assert(after.values.toSet.size == 10)
  }

  test("stats skipping and columnStats ignore the materialized id column") {
    val t = mk("rt-stats", (0L until 50L).map(k => (k, s"v$k")))
    t.cluster("k") // materialize ids; range layout for skipping
    val stats = t.columnStats().select("col_name").as[String].collect().toSet
    assert(!stats.contains(RID))
    assert(stats.contains("k"))
    val r = t.readWhere("k", 10L, 14L)
    assert(r.select("k").as[Long].collect().sorted.toSeq == (10L to 14L))
    assert(!r.columns.contains(RID))
  }

  test("a deep clone carries ids verbatim; a shallow clone serves them " +
      "after materialize()") {
    val t = mk("rt-clone", (0L until 15L).map(k => (k, s"v$k")))
    t.compact(numFiles = 1) // mix in a materialized file
    t.append(Seq((99L, "z")).toDF("k", "v")) // plus a fresh one
    val src = idsOf(t)
    val deep = t.cloneTo(tmpDir("rt-clone-deep") + "/t")
    assert(idsOf(deep) == src)
    val sh = t.shallowCloneTo(tmpDir("rt-clone-sh") + "/t")
    intercept[IllegalArgumentException] { sh.readWithRowIds }
    sh.materialize()
    assert(idsOf(sh) == src)
  }

  test("type widening composes with row tracking: a maintenance rewrite " +
      "over mixed narrow/wide files keeps ids and the widened schema") {
    val t = new ManagedTable(spark, tmpDir("rt-widen") + "/t")
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v")) // k: INT
    t.alterColumnType("k", "bigint")                    // metadata-only
    t.enableRowTracking()
    t.append(Seq((3L, "c"), (4L, "d")).toDF("k", "v"))  // k: BIGINT file
    val before = t.readWithRowIds.select(col("k").cast("long"), col(RID))
      .as[(Long, Long)].collect().toMap
    assert(before.keySet == Set(1L, 2L, 3L, 4L))
    t.compact(numFiles = 1) // mixed INT32/INT64 files rewrite through ids
    val after = t.readWithRowIds.select(col("k").cast("long"), col(RID))
      .as[(Long, Long)].collect().toMap
    assert(after == before)
    assert(t.read.schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("version-pinned row-id reads serve historical snapshots with the " +
      "same ids; the keyless CDF classifies by id and sees through OPTIMIZE") {
    val t = mk("rt-cdf", (0L until 20L).map(k => (k, s"v$k")))
    val v0 = t.version
    val ids0 = idsOf(t)
    t.deleteVectored(col("k") < 5)
    val v1 = t.version
    t.append((100L until 105L).map(k => (k, s"v$k")).toDF("k", "v"))
    val v2 = t.version
    t.compact(numFiles = 1) // row-neutral: must not appear in any feed
    val v3 = t.version
    // time travel: the v0 snapshot reads back with its original ids
    val at0 = t.readVersionWithRowIds(v0)
      .select(col("k"), col(RID)).as[(Long, Long)].collect().toMap
    assert(at0 == ids0)
    // keyless CDF v0 -> v2: deletes are the DV-marked rows, inserts the
    // appended ones — no user key anywhere
    val ch = t.changesById(v0, v2)
      .select(col("k"), col("change_type")).as[(Long, String)]
      .collect().toSet
    assert(ch == ((0L until 5L).map(k => (k, "delete")) ++
      (100L until 105L).map(k => (k, "insert"))).toSet)
    // OPTIMIZE-only window: empty feed (ids see through the rewrite)
    assert(t.changesById(v2, v3).isEmpty)
    // and the full window equals the v0->v2 feed
    assert(t.changesById(v0, v3)
      .select(col("k"), col("change_type")).as[(Long, String)]
      .collect().toSet == ch)
    // a vectored UPDATE surfaces as delete + insert of the changed row
    t.updateVectored(col("k") === 10, Map("v" -> lit("V10")))
    val upd = t.changesById(v3, t.version)
      .select(col("k"), col("v"), col("change_type"))
      .as[(Long, String, String)].collect().toSet
    assert(upd == Set((10L, "v10", "delete"), (10L, "V10", "insert")))
  }

  test("enable refuses a table carrying unrecorded materialized ids") {
    val t = mk("rt-orphan-src", (0L until 8L).map(k => (k, s"v$k")))
    t.compact(numFiles = 1) // materialized column in the data files
    val p2 = tmpDir("rt-orphan") + "/t"
    t.readWithRowIds.write.parquet(p2) // raw copy WITH the id column
    val t2 = new ManagedTable(spark, p2)
    val e = intercept[IllegalArgumentException] { t2.enableRowTracking() }
    assert(e.getMessage.contains("materialized row ids"))
  }
}

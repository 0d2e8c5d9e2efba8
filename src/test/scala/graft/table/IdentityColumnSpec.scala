package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Identity columns: engine-assigned unique values with a persisted
  * high-water mark — dense per batch, unique across the table's whole
  * history, gaps allowed (Delta's IDENTITY contract).
  */
class IdentityColumnSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String) =
    new ManagedTable(spark, tmpDir(name) + "/t")

  test("appends without the column get dense, unique, increasing values") {
    val t = freshTable("id-basic")
    t.overwrite(Seq("a", "b", "c").toDF("v"))
    t.addIdentityColumn("id", startWith = 10, incrementBy = 5)
    // backfill assigned 10, 15, 20 to the existing rows
    assert(t.read.select("id").as[Long].collect().sorted.toSeq == Seq(10L, 15L, 20L))
    t.append(Seq("d", "e").toDF("v"))
    val ids = t.read.select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(10L, 15L, 20L, 25L, 30L))
    // values pair with rows 1:1, no duplicates across batches
    assert(t.read.select("id").distinct().count() == 5)
    assert(t.identityColumns("id") == ((10L, 5L, 35L)))
  }

  test("rows already carrying the column pass through unchanged") {
    val t = freshTable("id-keep")
    t.addIdentityColumn("id")
    t.overwrite(Seq("a", "b").toDF("v"))
    val before = t.read.select("v", "id").as[(String, Long)].collect().toMap
    // rewriting ops (compact) read existing values and keep them
    t.compact(1)
    assert(t.read.select("v", "id").as[(String, Long)].collect().toMap == before)
    // an explicit append WITH the column keeps the caller's values
    t.append(Seq(("z", 999L)).toDF("v", "id"))
    assert(t.read.filter(col("v") === "z").select("id").as[Long].head() == 999L)
  }

  test("merge assigns fresh values to source rows missing the column") {
    val t = freshTable("id-merge")
    t.overwrite(Seq(("k1", 1.0), ("k2", 2.0)).toDF("k", "x"))
    t.addIdentityColumn("rid")
    t.merge(Seq(("k2", 20.0), ("k3", 30.0)).toDF("k", "x"), Seq("k"))
    val rows = t.read.select("k", "rid").as[(String, Long)].collect().toMap
    assert(rows.size == 3 && rows.values.toSeq.distinct.size == 3)
    // vectored merge too
    t.setProperties(Map("graft.enableDeletionVectors" -> "true"))
    t.mergeVectored(Seq(("k4", 40.0)).toDF("k", "x"), Seq("k"))
    val rows2 = t.read.select("k", "rid").as[(String, Long)].collect().toMap
    assert(rows2.size == 4 && rows2.values.toSeq.distinct.size == 4)
  }

  test("a crash-shaped gap never reuses values; declarations are validated") {
    val t = freshTable("id-gap")
    t.overwrite(Seq("a").toDF("v"))
    t.addIdentityColumn("id")
    // re-declaring or shadowing an existing column is rejected
    intercept[IllegalArgumentException](t.addIdentityColumn("id"))
    intercept[IllegalArgumentException](t.addIdentityColumn("v"))
    intercept[IllegalArgumentException](t.addIdentityColumn("x", incrementBy = 0))
    val (_, _, next0) = t.identityColumns("id")
    t.append(Seq("b", "c").toDF("v"))
    val (_, _, next1) = t.identityColumns("id")
    assert(next1 == next0 + 2)
    // detail surfaces the declaration
    val props = t.detail().select("properties").as[Seq[String]].head()
    assert(props.exists(_.startsWith("identity:id=start 1 step 1 next")))
  }

  test("SQL ALTER TABLE ADD IDENTITY COLUMN declares and backfills") {
    val t = freshTable("id-sql")
    t.overwrite(Seq("a", "b").toDF("v"))
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`${t.path}` ADD IDENTITY COLUMN rid START WITH 7 INCREMENT BY 3")
    assert(t.read.select("rid").as[Long].collect().sorted.toSeq == Seq(7L, 10L))
    t.append(Seq("c").toDF("v"))
    assert(t.read.select("rid").as[Long].collect().sorted.toSeq == Seq(7L, 10L, 13L))
  }

  test("two queued writers never hand out the same identity value") {
    val t = freshTable("id-race")
    t.overwrite(Seq("seed").toDF("v"))
    t.addIdentityColumn("id")
    val t1 = new ManagedTable(spark, t.path).withLeaseWait(30000)
    val t2 = new ManagedTable(spark, t.path).withLeaseWait(30000)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new Runnable {
        def run(): Unit = t1.append(Seq("x1", "x2").toDF("v")) })
      val f2 = pool.submit(new Runnable {
        def run(): Unit = t2.merge(Seq(("y1")).toDF("v"), Seq("v")) })
      f1.get(); f2.get()
    } finally pool.shutdown()
    val ids = t.read.select("id").as[Long].collect().toSeq
    assert(ids.size == 4 && ids.distinct.size == 4)
  }

  test("rename/drop of an identity column is rejected until its declaration drops") {
    val t = freshTable("id-guard")
    t.overwrite(Seq("a").toDF("v"))
    t.addIdentityColumn("id")
    intercept[IllegalArgumentException](t.renameColumn("id", "rid"))
    intercept[IllegalArgumentException](t.dropColumn("id"))
    t.dropIdentityColumn("id")
    t.renameColumn("id", "rid") // a plain column now — rename proceeds
    assert(t.read.columns.toSeq.contains("rid"))
    assert(t.identityColumns.isEmpty)
  }

  test("clone carries the identity declaration and high-water mark") {
    val t = freshTable("id-clone")
    t.overwrite(Seq("a", "b").toDF("v"))
    t.addIdentityColumn("id", startWith = 100)
    val c = t.cloneTo(tmpDir("id-clone-dst") + "/c")
    assert(c.identityColumns("id")._1 == 100L)
    c.append(Seq("c").toDF("v"))
    // the clone continues from the source's high-water mark, so its new
    // values never collide with the cloned rows'
    assert(c.read.select("id").distinct().count() == 3)
  }
}

package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Metadata-only ALTER TABLE ADD COLUMNS: declared columns read as typed
  * nulls from pre-ALTER files, materialize organically through later
  * writes, and drop/rename back out without a rewrite while still
  * declared-only.
  */
class AddColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def files(t: ManagedTable): Set[String] =
    t.read.select(input_file_name()).distinct().as[String].collect().toSet

  test("ADD COLUMNS is metadata-only and reads serve typed nulls") {
    val t = new ManagedTable(spark, tmpDir("addcols") + "/t")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val before = files(t)
    t.addColumns("score DOUBLE, tag STRING")
    // zero files rewritten, no new commit needed for the data
    assert(files(t) == before)
    val sch = t.read.schema
    assert(sch("score").dataType == DoubleType)
    assert(sch("tag").dataType == StringType)
    assert(t.read.filter(col("score").isNull && col("tag").isNull).count() == 2)
    // time travel sees the (current-state) widened schema as nulls too
    assert(t.readVersion(0).schema.fieldNames.contains("score"))
  }

  test("mixed pre/post-ALTER files both read correctly") {
    val t = new ManagedTable(spark, tmpDir("addcols-mixed") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    t.addColumns("score DOUBLE")
    // materialize real values in a post-ALTER file
    t.append(Seq((2L, "b", 0.9)).toDF("k", "v", "score"))
    // and a post-ALTER append WITHOUT the column conforms to null
    t.append(Seq((3L, "c")).toDF("k", "v"))
    val rows = t.read.select("k", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some(0.9), 3L -> None))
    // predicates over the declared column see materialized data
    assert(t.read.filter(col("score") > 0.5).select("k").as[Long]
      .collect().toSeq == Seq(2L))
    // skipping read path (explicit file scan) agrees
    assert(t.readWhere("k", 1L, 3L).select("k", "score")
      .as[(Long, Option[Double])].collect().toMap == rows)
  }

  test("partitioned table: column ORDER is stable across materialization") {
    val t = new ManagedTable(spark, tmpDir("addcols-part") + "/t")
    t.overwrite(Seq((1L, "a", "d1")).toDF("k", "v", "day"), Seq("day"))
    t.addColumns("score DOUBLE")
    // extras sit BEFORE the partition columns from the very first read …
    val orderBefore = t.read.schema.fieldNames.toSeq
    assert(orderBefore == Seq("k", "v", "score", "day"), orderBefore)
    // … so materializing the column must not flip the order (inference
    // then sees score in a footer, ahead of the dir-derived day)
    t.append(Seq((2L, "b", 0.7, "d2")).toDF("k", "v", "score", "day"), Seq("day"))
    val orderAfter = t.read.schema.fieldNames.toSeq
    assert(orderAfter == orderBefore, orderAfter)
    assert(t.read.select("k", "score").as[(Long, Option[Double])]
      .collect().toMap == Map(1L -> None, 2L -> Some(0.7)))
  }

  test("validation: existing or duplicate names are refused") {
    val t = new ManagedTable(spark, tmpDir("addcols-val") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException] { t.addColumns("v STRING") }
    intercept[IllegalArgumentException] { t.addColumns("x INT, X LONG") }
    t.addColumns("x INT")
    intercept[IllegalArgumentException] { t.addColumns("x LONG") }
  }

  test("declared-only columns drop and rename as metadata edits") {
    val t = new ManagedTable(spark, tmpDir("addcols-drop") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    val v0 = t.version
    t.addColumns("score DOUBLE, tag STRING")
    t.renameColumn("tag", "label")
    assert(t.read.schema.fieldNames.toSet == Set("k", "v", "score", "label"))
    t.dropColumn("score")
    t.dropColumn("label")
    assert(t.read.schema.fieldNames.toSet == Set("k", "v"))
    // none of it committed a rewrite
    assert(t.version == v0)
  }

  test("dropping a MATERIALIZED declared column rewrites and un-declares") {
    val t = new ManagedTable(spark, tmpDir("addcols-dropm") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    t.addColumns("score DOUBLE")
    t.append(Seq((2L, "b", 0.5)).toDF("k", "v", "score"))
    t.dropColumn("score")
    assert(t.read.schema.fieldNames.toSet == Set("k", "v"))
    assert(t.read.count() == 2)
    // the declaration is gone: a fresh handle doesn't resurrect the column
    assert(new ManagedTable(spark, t.path).read.schema.fieldNames.toSet
      == Set("k", "v"))
  }

  test("SQL form: ALTER TABLE … ADD COLUMNS (…)") {
    val t = new ManagedTable(spark, tmpDir("addcols-sql") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE '${t.path}' ADD COLUMNS (score DOUBLE, tag STRING)")
    assert(t.read.schema.fieldNames.toSet == Set("k", "v", "score", "tag"))
  }
}

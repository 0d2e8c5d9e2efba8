package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata-only ALTER COLUMN TYPE (Delta's type-widening feature):
  * lossless widenings are property edits; pre-ALTER files widen per file
  * in the reader, post-ALTER appends conform to the wide type.
  */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def files(t: ManagedTable): Set[String] =
    t.read.select(input_file_name()).distinct().as[String].collect().toSet

  test("int->long widening is metadata-only; mixed files read and filter") {
    val t = new ManagedTable(spark, tmpDir("widen-il") + "/t")
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val before = files(t)
    t.alterColumnType("k", "BIGINT")
    assert(files(t) == before)
    assert(t.read.schema("k").dataType == LongType)
    // a post-ALTER append carries real longs; the pre-ALTER file widens
    t.append(Seq((3000000000L, "c")).toDF("k", "v"))
    assert(t.read.orderBy("k").select("k").as[Long].collect().toSeq ==
      Seq(1L, 2L, 3000000000L))
    assert(t.read.filter(col("k") > 2L).count() == 1)
    // a narrow append still conforms (upcast), like Delta
    t.append(Seq((4, "d")).toDF("k", "v"))
    assert(t.read.count() == 4)
  }

  test("float->double, decimal growth and date->timestamp_ntz widen") {
    val t = new ManagedTable(spark, tmpDir("widen-mix") + "/t")
    t.overwrite(Seq((1, 1.5f, "1.23", "2020-01-02")).toDF("k", "f", "d0", "dt0")
      .withColumn("d", col("d0").cast("decimal(5,2)"))
      .withColumn("dt", col("dt0").cast("date"))
      .select("k", "f", "d", "dt"))
    t.alterColumnType("f", "DOUBLE")
    t.alterColumnType("d", "DECIMAL(12,4)")
    t.alterColumnType("dt", "TIMESTAMP_NTZ")
    val sch = t.read.schema
    assert(sch("f").dataType == DoubleType)
    assert(sch("d").dataType == DecimalType(12, 4))
    assert(sch("dt").dataType == TimestampNTZType)
    val r = t.read.head
    assert(r.getDouble(sch.fieldIndex("f")) == 1.5d)
    assert(r.getDecimal(sch.fieldIndex("d")).toPlainString == "1.2300")
  }

  test("lossy or narrowing changes are refused") {
    val t = new ManagedTable(spark, tmpDir("widen-bad") + "/t")
    t.overwrite(Seq((1L, 1.5, "x")).toDF("k", "f", "v"))
    intercept[IllegalArgumentException] { t.alterColumnType("k", "INT") }
    intercept[IllegalArgumentException] { t.alterColumnType("k", "DOUBLE") }
    intercept[IllegalArgumentException] { t.alterColumnType("f", "FLOAT") }
    intercept[IllegalArgumentException] { t.alterColumnType("v", "BIGINT") }
    intercept[IllegalArgumentException] { t.alterColumnType("nope", "BIGINT") }
  }

  test("widening a declared (ADD COLUMNS) column updates its declaration") {
    val t = new ManagedTable(spark, tmpDir("widen-extra") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    t.addColumns("score INT")
    t.alterColumnType("score", "BIGINT")
    assert(t.read.schema("score").dataType == LongType)
    t.append(Seq((2L, "b", 5L)).toDF("k", "v", "score"))
    assert(t.read.filter(col("score") === 5L).count() == 1)
  }

  test("widening a MATERIALIZED declared column sticks (declaration wins)") {
    val t = new ManagedTable(spark, tmpDir("widen-extra-mat") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    t.addColumns("score INT")
    t.append(Seq((2L, "b", 7)).toDF("k", "v", "score"))   // materializes INT
    t.alterColumnType("score", "BIGINT")
    // the declaration is the source of truth: whatever footer inference
    // samples, the schema is deterministically wide
    assert(t.read.schema("score").dataType == LongType)
    t.append(Seq((3L, "c", 3000000000L)).toDF("k", "v", "score"))
    assert(t.read.orderBy("k").select("score").as[Option[Long]]
      .collect().toSeq == Seq(None, Some(7L), Some(3000000000L)))
  }

  test("a full overwrite clears stale schema declarations") {
    val t = new ManagedTable(spark, tmpDir("widen-ovr") + "/t")
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    t.alterColumnType("k", "BIGINT")
    t.addColumns("score DOUBLE")
    // overwrite re-founds the schema: k becomes a STRING, score is gone
    t.overwrite(Seq(("x", "a")).toDF("k", "v"))
    assert(t.read.schema("k").dataType == StringType)
    assert(!t.read.schema.fieldNames.contains("score"))
    assert(t.read.as[(String, String)].collect().toSeq == Seq(("x", "a")))
  }

  test("drop clears the override; SQL form works") {
    val t = new ManagedTable(spark, tmpDir("widen-sql") + "/t")
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE '${t.path}' ALTER COLUMN k TYPE BIGINT")
    assert(t.read.schema("k").dataType == LongType)
    t.dropColumn("k")
    assert(t.properties.get("graft.schema.types").isEmpty)
  }
}

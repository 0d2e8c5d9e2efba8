package graft.io

import graft.SparkSpec
import org.apache.spark.sql.types._

class IoSpec extends SparkSpec {
  import spark.implicits._

  test("csv round-trip with explicit schema and options") {
    val dir = tmpDir("io-csv") + "/out"
    val df = Seq((1L, "a,b", java.sql.Date.valueOf("2024-01-02")),
                 (2L, "c\"d", java.sql.Date.valueOf("2024-02-03")))
      .toDF("k", "s", "d")
    Io.writeCsv(df, dir)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType), StructField("d", DateType)))
    val back = Io.readCsv(spark, dir, Some(schema))
    assert(back.orderBy("k").collect().toSeq == df.orderBy("k").collect().toSeq)
  }

  test("csv honors delimiter, quote, escape and dateFormat options (S4 surface)") {
    val dir = tmpDir("io-opts") + "/out"
    val df = Seq((1L, "semi;colon", java.sql.Date.valueOf("2024-03-05")),
                 (2L, "with'quote", java.sql.Date.valueOf("2024-12-31")))
      .toDF("k", "s", "d")
    Io.writeCsv(df, dir, delimiter = ";", quote = "'", escape = "\\",
      dateFormat = "dd/MM/yyyy")
    val lines = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".csv"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).sorted.toSeq
    assert(lines.exists(_.contains("05/03/2024")), lines.mkString("|"))
    assert(lines.exists(_.contains("'semi;colon'")), lines.mkString("|"))
    // read back with matching options
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType), StructField("d", StringType)))
    val back = spark.read.option("header", "true").option("sep", ";")
      .option("quote", "'").option("escape", "\\")
      .schema(schema).csv(dir)
    assert(back.count() == 2)
    assert(back.filter(back("s") === "semi;colon").count() == 1)
    assert(back.filter(back("s") === "with'quote").count() == 1)
  }

  test("single-file export produces exactly one csv file") {
    val f = tmpDir("io-single") + "/export.csv"
    Io.exportSingleCsv(spark, spark.range(100).toDF("id"), f)
    val lines = scala.io.Source.fromFile(f).getLines().toSeq
    assert(lines.head == "id")
    assert(lines.size == 101)
  }

  test("catalog DDL: schema + external table + describe") {
    val dir = tmpDir("io-ddl") + "/t"
    spark.range(5).toDF("id").write.parquet(dir)
    Io.createSchema(spark, "gold_test")
    // a single quote in the comment must not break out of the SQL literal
    Io.registerExternalTable(spark, "gold_test.t1", dir, "client's test table")
    assert(spark.table("gold_test.t1").count() == 5)
    assert(Io.showTables(spark, "gold_test").count() >= 1)
    val desc = Io.describeTable(spark, "gold_test.t1")
    assert(desc.count() >= 1)
    spark.sql("DROP TABLE gold_test.t1")
  }

  test("parquet write honors maxRecordsPerFile") {
    val dir = tmpDir("io-maxrec") + "/t"
    Io.writeParquet(spark.range(100).toDF("id").coalesce(1), dir, maxRecordsPerFile = 30L)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 4)
  }

  test("writeSized scales file count with the size estimate") {
    val small = tmpDir("io-sized-s")
    val one = Io.writeSized(spark.range(100).toDF("id"), small)
    assert(one == 1)
    assert(spark.read.parquet(small).count() == 100)
    val many = tmpDir("io-sized-m")
    // force a tiny target so even a small frame splits into several files
    val n = Io.writeSized(spark.range(100000).toDF("id"), many,
      targetFileBytes = 64 * 1024)
    assert(n > 1)
    assert(spark.read.parquet(many).count() == 100000)
  }

  test("parquet zstd codec round-trips and writes .zstd part files") {
    val dir = tmpDir("io-zstd")
    val df = spark.range(1000).toDF("id")
    Io.writeParquet(df, dir, codec = "zstd")
    val zstd = new java.io.File(dir).listFiles
      .count(_.getName.endsWith(".zstd.parquet"))
    assert(zstd >= 1, "expected zstd part files")
    assert(Io.readParquet(spark, dir).count() == 1000)
  }

  test("json-lines round-trip with gzip compression preserves rows") {
    val dir = tmpDir("io-json")
    val df = Seq((1, "a", 1.5), (2, "b", -0.25)).toDF("k", "name", "x")
    Io.writeJson(df, dir)
    val gz = new java.io.File(dir).listFiles.count(_.getName.endsWith(".json.gz"))
    assert(gz >= 1, "expected gzip part files")
    val back = Io.readJson(spark, dir, Some(df.schema))
      .orderBy("k").as[(Int, String, Double)].collect().toSeq
    assert(back == Seq((1, "a", 1.5), (2, "b", -0.25)))
  }
}

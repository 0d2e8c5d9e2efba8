package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S11 smoke: round-trip the JDBC sink/source against the embedded Derby
  * engine on Spark's classpath — the closest offline stand-in for the
  * reference's Postgres serving path (silver.py:14–73).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("writeJdbc overwrite + readJdbc round-trips rows and schema") {
    val df = Seq((1L, "EUR", 1.08), (2L, "GBP", 1.27), (3L, "JPY", 0.0067))
      .toDF("id", "currency", "rate")
    Io.writeJdbc(df, url, "rates")
    val back = Io.readJdbc(spark, url, "rates")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(back == Seq((1L, "EUR", 1.08), (2L, "GBP", 1.27), (3L, "JPY", 0.0067)))
  }

  test("overwrite replaces, append accumulates") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y")).toDF("id", "v")
    Io.writeJdbc(a, url, "t_modes")
    Io.writeJdbc(b, url, "t_modes") // overwrite
    assert(Io.readJdbc(spark, url, "t_modes").count() == 1)
    Io.writeJdbc(a, url, "t_modes", mode = "append")
    assert(Io.readJdbc(spark, url, "t_modes").count() == 2)
  }

  test("Postgres dialect maps the silver/gold schema to the reference's DDL types") {
    // The warehouse twin can't run real Postgres offline (accepted gap),
    // but Spark SHIPS the Postgres dialect — so the DDL type mapping the
    // reference's silver.py relies on (BIGINT keys, DOUBLE PRECISION
    // amounts, NUMERIC decimals, TEXT dims, TIMESTAMP dates) is testable
    // without a server: writeJdbc against a postgresql:// URL would emit
    // exactly these column types.
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    val pg = JdbcDialects.get("jdbc:postgresql://db.example.invalid/wh")
    def ddl(dt: DataType): String =
      pg.getJDBCType(dt)
        .orElse(org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
          .getCommonJDBCType(dt))
        .map(_.databaseTypeDefinition).getOrElse(sys.error(s"no mapping: $dt"))
    assert(ddl(LongType) == "BIGINT")
    assert(ddl(DoubleType) == "FLOAT8")          // Postgres DOUBLE PRECISION
    assert(ddl(DecimalType(18, 6)) == "NUMERIC(18,6)")
    assert(ddl(StringType) == "TEXT")
    // Spark's TimestampType has instant semantics → timestamptz; the
    // reference's naive silver timestamps are the NTZ type → TIMESTAMP
    assert(ddl(TimestampType) == "TIMESTAMP WITH TIME ZONE")
    assert(ddl(TimestampNTZType) == "TIMESTAMP")
    assert(ddl(BooleanType) == "BOOLEAN")
    assert(ddl(BinaryType) == "BYTEA")
    // identifier quoting differs from Derby's — pinned so a dialect swap
    // can't silently change emitted DDL
    assert(pg.quoteIdentifier("order") == "\"order\"")
  }

  test("partitioned read shards the extract across range queries") {
    val df = spark.range(0, 100).toDF("id").withColumn("v", col("id") * 2)
    Io.writeJdbc(df, url, "t_part")
    val back = Io.readJdbc(spark, url, "t_part",
      partitionColumn = Some(("id", 0L, 100L, 4)))
    assert(back.rdd.getNumPartitions == 4)
    assert(back.agg(sum("v")).as[Long].head() == (0L until 100L).map(_ * 2).sum)
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot / vec_cosine SQL functions match the Column API") {
    GraftFunctions.register(spark)
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val (d, c) = spark.sql(
      "SELECT vec_dot(a, b), vec_cosine(a, b) FROM vecs")
      .as[(Double, Double)].head()
    assert(d == 11.0)
    val expect = spark.table("vecs")
      .select(graft.ops.Similarity.cosine(col("a"), col("b")))
      .as[Double].head()
    assert(c == expect)
  }

  test("rolling_hash SQL function matches the Column API") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT rolling_hash('hello world')").as[Long].head()
    val viaCol = Seq("hello world").toDF("s")
      .select(RollingHash.rolling_hash(col("s"))).as[Long].head()
    assert(viaSql == viaCol)
  }

  test("MinHashAgg signature equals the explode+MIN-columns plan") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words in this one here"),
      (3L, "short text")
    ).toDF("doc_id", "text")
    val viaColumns = graft.ops.Dedup
      .minhashSignatures(docs, "doc_id", "text", n = 3, numHashes = 16)
      .as[(Long, Seq[Long])].collect().toMap
    val hashes = docs.select(col("doc_id").as("doc_id"),
      explode(graft.ops.Dedup.shingles(col("text"), 3)).as("s"))
      .withColumn("h", pmod(xxhash64(col("s")), lit(2147483647L)))
    val viaAgg = hashes.groupBy("doc_id")
      .agg(MinHashAgg.minhash_agg(col("h"), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaAgg == viaColumns)
  }

  test("SimHashAgg equals the 64-column formulation on testdata docs") {
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = graft.ops.Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val b = graft.ops.Dedup.simhashViaColumns(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("SimHashAgg is partition-count independent") {
    val df = spark.range(0, 500).toDF("w").withColumn("h", xxhash64(col("w")))
      .withColumn("g", col("w") % 3)
    val a = df.repartition(7).groupBy("g")
      .agg(SimHashAgg.simhash_agg(col("h"))).as[(Long, Long)].collect().toMap
    val b = df.coalesce(1).groupBy("g")
      .agg(SimHashAgg.simhash_agg(col("h"))).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("MinHashAgg merges partial buffers correctly across partitions") {
    val df = spark.range(0, 1000).toDF("h").repartition(7)
      .withColumn("h", pmod(xxhash64(col("h")), lit(2147483647L)))
    val a = df.agg(MinHashAgg.minhash_agg(col("h"), 8)).as[Seq[Long]].head()
    val b = df.coalesce(1).agg(MinHashAgg.minhash_agg(col("h"), 8)).as[Seq[Long]].head()
    assert(a == b)
  }

  test("vec_moments SQL function matches the Column API; rejects non-literal dim") {
    GraftFunctions.register(spark)
    Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f))).toDF("id", "v")
      .createOrReplaceTempView("mvecs")
    val viaSql = spark.sql("SELECT m.n, m.s, m.ss FROM " +
        "(SELECT vec_moments(v, 2) AS m FROM mvecs)")
      .as[(Long, Seq[Double], Seq[Double])].head()
    assert(viaSql == ((2L, Seq(4.0, 6.0), Seq(10.0, 14.0, 20.0))))
    val err = intercept[Exception](spark.sql("SELECT vec_moments(v, id) FROM mvecs"))
    assert(err.getMessage.toLowerCase.contains("literal"))
  }
}

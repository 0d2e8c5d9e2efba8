package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns identical results to the plain join") {
    // skewed fact: 90% of rows on one key
    val fact = (1L to 1000L).map(i => (if (i <= 900) 1L else i % 50, i))
      .toDF("k", "v")
    val dim = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join preserves unmatched fact rows") {
    val fact = Seq((1L, 10L), (99L, 20L)).toDF("k", "v")
    val dim = Seq((1L, "a")).toDF("k", "name")
    val got = Skew.saltedJoin(fact, dim, "k", 4, "left")
      .orderBy("v").collect()
    assert(got.length == 2)
    assert(got(1).isNullAt(2)) // k=99 survives with null dim
  }

  test("bucketed table join is shuffle-free (co-located sort-merge join)") {
    spark.sql("DROP TABLE IF EXISTS bt_fact")
    spark.sql("DROP TABLE IF EXISTS bt_dim")
    Skew.writeBucketed(spark.range(1000).toDF("k").withColumn("v", col("k") * 2), "bt_fact", "k", 4)
    Skew.writeBucketed(spark.range(100).toDF("k").withColumn("w", col("k") + 1), "bt_dim", "k", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bt_fact").join(spark.table("bt_dim"), "k")
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE bt_fact"); spark.sql("DROP TABLE bt_dim")
    }
  }
}

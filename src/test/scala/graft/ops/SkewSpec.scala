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

  test("AQE splits a skewed join partition (OptimizeSkewedJoin fires)") {
    // Preconditions AQE needs before the skew=true marker can appear:
    // a real shuffle SMJ (both broadcast paths disabled), a skewed
    // partition larger than BOTH factor×median AND the byte threshold,
    // and an advisory size smaller than the skewed partition so there is
    // something to split into. Round-2 attempts missed the second
    // broadcast knob (adaptive has its OWN threshold) — with both at -1
    // and thresholds scaled to local data sizes, the optimizer fires.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      // one hot key with ~200k wide rows (≫64KB in one shuffle partition),
      // the rest uniform-tiny
      val fact = spark.range(220000L)
        .select((when(col("id") < 200000L, 7L).otherwise(col("id") % 97)).as("k"),
          concat(lit("payload-payload-payload-payload-"), col("id")).as("v"))
      // key-unique right side: the join fans out 1:1, only the LEFT shuffle
      // partition holding key 7 is skewed (and gets split).
      // Two more preconditions found adjudicating the round-2 failure:
      //  - the wide payload column must SURVIVE column pruning into the
      //    shuffle (an all-equal pruned key column compresses below any
      //    realistic threshold — shuffle sizes are compressed bytes);
      //  - nothing downstream may require the join's hash partitioning
      //    (a same-key groupBy right after the join makes the split add a
      //    shuffle, which OptimizeSkewedJoin refuses without
      //    forceOptimizeSkewedJoin).
      val other = spark.range(97L).select(col("id").as("k"), col("id").as("w"))
      val joined = fact.join(other, "k")
        .filter(substring(col("v"), -1, 1) === "7") // thin the collect, keep the join shape
      // collect() executes THIS DataFrame's own queryExecution (count()
      // would execute a different wrapped plan and leave this one initial)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
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

package graft.pipeline

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {

  test("full corpus flow: annotate, dedup, split, partitioned write, stats") {
    val wh = tmpDir("corpus") + "/wh"
    val p = new CorpusPipeline(spark, wh)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = p.run(docs, "doc_id", "text", minQuality = 0.3, minEstSim = 0.9)

    val n = out.count()
    assert(n > 0 && n <= docs.count())
    // annotation columns present
    val cols = out.columns.toSet
    assert(Set("quality_score", "lang_pred", "token_estimate", "split").subsetOf(cols))
    // split is a partition: both values materialize as directories
    val splits = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "test"))
    // stats aggregates are consistent with the table
    val s = p.stats().agg(sum("n_docs")).head.getLong(0)
    assert(s == n)
  }

  test("pipeline is deterministic: rerun on re-sharded input matches") {
    val whA = tmpDir("corpus-a") + "/wh"; val whB = tmpDir("corpus-b") + "/wh"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = new CorpusPipeline(spark, whA)
      .run(docs, "doc_id", "text").select("doc_id", "split")
      .orderBy("doc_id").collect().toSeq
    val b = new CorpusPipeline(spark, whB)
      .run(docs.repartition(13), "doc_id", "text").select("doc_id", "split")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("near-dup removal keeps one doc per planted cluster") {
    val wh = tmpDir("corpus-dd") + "/wh"
    val p = new CorpusPipeline(spark, wh)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val kept = p.run(docs, "doc_id", "text", minQuality = 0.0)
    // sf0.001 documents contain planted near-dups; some must be removed
    assert(kept.count() < docs.count())
  }
}

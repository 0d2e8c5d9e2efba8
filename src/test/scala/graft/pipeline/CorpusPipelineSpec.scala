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

  test("observed run: in-flight audit metrics match the written table") {
    val wh = tmpDir("corpus-obs") + "/wh"
    val p = new CorpusPipeline(spark, wh)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (out, m) = p.runObserved(docs, "doc_id", "text",
      minQuality = 0.3, minEstSim = 0.9)
    val written = out.count()
    assert(m("docs_written") == written)
    assert(m("tokens_written") ==
      out.agg(sum("token_estimate")).head.getLong(0))
    assert(m("train_docs") ==
      out.filter(col("split") === "train").count())
    assert(written > 0)
  }

  test("incremental run: corpus dups dropped, fresh docs appended, store grows") {
    import spark.implicits._
    val wh = tmpDir("corpus-inc") + "/wh"
    val p = new CorpusPipeline(spark, wh)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    p.run(docs, "doc_id", "text", minQuality = 0.0, minEstSim = 0.9)
    val n0 = p.corpus.read.count()
    val sig0 = p.signatureStore.read.count()
    assert(sig0 == n0) // one signature per kept doc
    // batch: one exact dup of a kept corpus doc + one genuinely new doc
    val dupText = p.corpus.read.orderBy("doc_id").select("text").head.getString(0)
    val batch = Seq(
      (900001L, dupText),
      (900002L, "a genuinely new document with words that appear nowhere else qqq zzz")
    ).toDF("doc_id", "text")
    val after = p.runIncremental(batch, "doc_id", "text", minQuality = 0.0)
    val keptNew = after.filter(col("doc_id") >= 900000L)
      .select("doc_id").as[Long].collect().toSet
    assert(keptNew == Set(900002L), s"got $keptNew") // dup dropped, fresh kept
    assert(after.count() == n0 + 1)
    assert(p.signatureStore.read.count() == sig0 + 1)
    // the appended store blocks a re-send of the same new doc
    val again = p.runIncremental(
      Seq((900003L, "a genuinely new document with words that appear nowhere else qqq zzz"))
        .toDF("doc_id", "text"), "doc_id", "text", minQuality = 0.0)
    assert(again.count() == n0 + 1)
  }

  test("streaming corpus ingest: foreachBatch runIncremental dedups across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val wh = tmpDir("corpus-stream") + "/wh"
    val p = new CorpusPipeline(spark, wh)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    p.run(docs, "doc_id", "text", minQuality = 0.0, minEstSim = 0.9)
    val n0 = p.corpus.read.count()
    val dupText = p.corpus.read.orderBy("doc_id").select("text").head.getString(0)
    val fresh = "a brand new streaming document with words appearing nowhere else xxq zzv"

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        p.runIncremental(batch, "doc_id", "text", minQuality = 0.0): Unit
      }
      .start()
    // batch 1: a corpus dup + a fresh doc
    mem.addData((910001L, dupText), (910002L, fresh))
    q.processAllAvailable()
    assert(p.corpus.read.count() == n0 + 1)
    // batch 2: re-send of batch 1's fresh doc — the signature store grown
    // by batch 1 must block it across the micro-batch boundary
    mem.addData((910003L, fresh))
    q.processAllAvailable(); q.stop()
    val keptNew = p.corpus.read.filter(col("doc_id") >= 910000L)
      .select("doc_id").as[Long].collect().toSet
    assert(keptNew == Set(910002L), s"got $keptNew")
    assert(p.corpus.read.count() == n0 + 1)
    // every history mutation is a logged APPEND after the seed OVERWRITE
    val ops = p.corpus.history().collect().map(_.getAs[String]("operation")).toSeq
    assert(ops.count(_ == "APPEND") >= 1 && ops.last == "OVERWRITE")
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

  test("streaming ingest: cross-batch dedup via the store; replayed batches vanish") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val wh = tmpDir("corpus-stream") + "/wh"
    val p = new CorpusPipeline(spark, wh)
    // distinct-vocabulary docs (no accidental near-dups across texts)
    def doc(tag: String) = (1 to 40).map(i => s"$tag$i word$tag$i").mkString(" ")
    val (tA, tB, tC) = (doc("alpha"), doc("beta"), doc("gamma"))
    val mem = MemoryStream[(Long, String)]
    val q = p.ingestStream(mem.toDS().toDF("doc_id", "text"), "doc_id", "text",
      checkpoint = tmpDir("corpus-stream-ckpt"), minQuality = 0.0)
    // batch 0 bootstraps the corpus+store; contains an in-batch exact dup
    mem.addData((1L, tA), (2L, tB), (3L, tA))
    q.processAllAvailable()
    assert(p.corpus.read.count() == 2)
    // batch 1: duplicate of a STORED doc (identical signature → est 1.0,
    // deterministically dropped) plus one genuinely new doc
    mem.addData((10L, tA), (11L, tC))
    q.processAllAvailable()
    assert(p.corpus.read.count() == 3)
    assert(p.corpus.read.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 11L))
    // batch 2: an at-least-once REPLAY of batch 1 — every doc matches its
    // own signatures in the store, the whole batch dedups away
    mem.addData((10L, tA), (11L, tC))
    q.processAllAvailable()
    q.stop()
    assert(p.corpus.read.count() == 3)
    // the signature store tracks exactly the kept docs
    assert(p.signatureStore.read.select("doc_id").distinct().count() == 3)
  }
}

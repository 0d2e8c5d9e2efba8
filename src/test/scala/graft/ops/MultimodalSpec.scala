package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table schema: binary payload + typed metadata") {
    val docs = Seq((1L, "hello")).toDF("doc_id", "text")
    val m = Multimodal.asMediaTable(docs, "doc_id", "text")
    val f = m.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("payload") == "binary")
    assert(f("n_bytes") == "bigint")
    assert(m.select("n_bytes").as[Long].head() == 5L)
  }

  test("feature extraction is distributed, deterministic, and keyed") {
    val docs = Seq((1L, "hello world"), (2L, "spark")).toDF("doc_id", "text")
    val m = Multimodal.asMediaTable(docs, "doc_id", "text").repartition(2)
    val feats1 = Multimodal.extractFeatures(spark, m).collect().sortBy(_.media_id)
    val feats2 = Multimodal.extractFeatures(spark, m).collect().sortBy(_.media_id)
    assert(feats1.toSeq == feats2.toSeq)
    assert(feats1.map(_.media_id).toSeq == Seq(1L, 2L))
    // crc32 pinned by VALUE against java.util.zip.CRC32 on the exact
    // payload bytes (q35 dropped the column from its oracle projection —
    // DuckDB has no crc32 — so this is its only value-level gate)
    val expectCrc = Map(1L -> "hello world", 2L -> "spark").map {
      case (id, s) =>
        val c = new java.util.zip.CRC32()
        c.update(s.getBytes("UTF-8"))
        id -> c.getValue
    }
    assert(feats1.forall(f => f.checksum == expectCrc(f.media_id)),
      feats1.map(f => (f.media_id, f.checksum)).toSeq.toString)
    assert(feats1.forall(f => f.mean_intensity > 0 && f.width >= 1 && f.height >= 1))
  }

  test("stub frame sampler strides the payload") {
    val frames = Multimodal.StubCodec.sampleFrames(Array.fill[Byte](100)(1), 30)
    assert(frames == Seq(0L, 30L, 60L, 90L))
  }

  test("distributed frame sampling fans out one row per frame") {
    val docs = Seq((1L, "x" * 100), (2L, "y" * 10)).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(spark, media, stride = 30).collect()
    assert(frames.count(_.media_id == 1L) == 4)
    assert(frames.count(_.media_id == 2L) == 1)
    assert(frames.filter(_.media_id == 1L).map(_.frame_bytes).sum == 100L)
  }

  test("resize bounds payload size and is deterministic") {
    val docs = Seq((1L, "z" * 1000)).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val a = Multimodal.resizeAll(spark, media, targetBytes = 64).collect()(0)
    val b = Multimodal.resizeAll(spark, media, targetBytes = 64).collect()(0)
    assert(a.n_bytes <= 64 && a.n_bytes > 0)
    assert(a.payload.toSeq == b.payload.toSeq)
  }

  test("repartitionForDecode sizes task count from rows/target, floored at slots") {
    val docs = (1L to 100L).map(i => (i, s"payload text number $i"))
      .toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    // LocalRelation carries an exact row count: 100/10 + 1 = 11 tasks
    val n = Multimodal.repartitionForDecode(media, targetRecordsPerTask = 10L)
      .rdd.getNumPartitions
    assert(n == 11, s"got $n")
    // huge target floors at the slot count (everything still parallel)
    val slots = spark.sparkContext.defaultParallelism
    val m = Multimodal.repartitionForDecode(media, targetRecordsPerTask = 1000000L)
      .rdd.getNumPartitions
    assert(m == slots, s"got $m")
  }
}

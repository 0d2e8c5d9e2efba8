package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1L to 1000L).map(i => (i, s"g${i % 3}")).toDF("id", "g")

  test("hashSplit is stable under repartitioning") {
    val a = Sampling.hashSplit(df, "id", 80)
      .filter(col("is_train")).select("id").as[Long].collect().toSet
    val b = Sampling.hashSplit(df.repartition(7), "id", 80)
      .filter(col("is_train")).select("id").as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size - 800) < 60) // ~80% within tolerance
  }

  test("hashSplit train/test partition the data") {
    val s = Sampling.hashSplit(df, "id", 80)
    assert(s.filter(col("is_train")).count() + s.filter(!col("is_train")).count() == 1000)
  }

  test("stratifiedSampleExact takes exactly k per group (or all if fewer)") {
    val got = Sampling.stratifiedSampleExact(df, "g", "id", 50)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(got.values.forall(_ == 50L))
    val small = Sampling.stratifiedSampleExact(df.filter(col("id") <= 10), "g", "id", 50)
    assert(small.count() == 10) // groups smaller than k keep everything
  }

  test("weighted sample biases toward heavy rows and is deterministic") {
    val weighted = (1L to 1000L).map(i => (i, if (i <= 100) 10.0 else 0.1))
      .toDF("id", "w")
    val a = Sampling.weightedSampleExact(weighted, "id", "w", 100)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSampleExact(weighted.repartition(9), "id", "w", 100)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // the 100 heavy rows (weight 100x) should dominate the sample
    assert(a.count(_ <= 100L) > 60, s"heavy rows sampled: ${a.count(_ <= 100L)}")
  }

  test("token packing: every shard within budget except oversize singletons") {
    val docs = (1L to 200L).map(i => (i, 100L + (i % 7) * 50L)).toDF("doc_id", "tokens")
    val packed = Sampling.packByTokenBudget(docs, "doc_id", "tokens", 1000L)
    val shards = packed.groupBy("shard")
      .agg(sum("tokens").as("t"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    // exclusive-cumsum packing: a shard exceeds budget only via its last doc
    assert(shards.forall { case (_, t, n) => t < 1000L + 400L })
    assert(packed.count() == 200)
    // shards are contiguous ranges of the order
    val ids = packed.orderBy("doc_id").select("shard").as[Long].collect()
    assert(ids.toSeq == ids.sorted.toSeq)
  }

  test("mix keeps the requested per-source fractions (modulo buckets)") {
    val src = (1L to 1000L).map(i => (i, s"s${i % 2}")).toDF("id", "src")
    val mixed = Sampling.mix(Seq(
      src.filter($"src" === "s0") -> 0.5,
      src.filter($"src" === "s1") -> 0.1), "id")
    val n = mixed.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(n("s0") > 200 && n("s0") < 300) // ~50% of 500
    assert(n("s1") > 20 && n("s1") < 80)   // ~10% of 500
  }

  test("stratified sample is deterministic across runs") {
    val a = Sampling.stratifiedSampleExact(df, "g", "id", 10).select("id").as[Long].collect().toSet
    val b = Sampling.stratifiedSampleExact(df.repartition(13), "g", "id", 10)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("distributed token packing equals the global-window form (any partitioning)") {
    val r = new scala.util.Random(11)
    val docs = (1L to 500L).map(i => (i, 1L + r.nextInt(400).toLong))
      .toDF("doc_id", "tokens")
    val global = Sampling.packByTokenBudget(docs, "doc_id", "tokens", budget = 1000L)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 3, 7, 16)) {
      val dist = Sampling.packByTokenBudgetDistributed(
          docs.repartition(5), "doc_id", "tokens", budget = 1000L, partitions = parts)
        .select("doc_id", "shard").as[(Long, Long)].collect().toMap
      assert(dist == global, s"partitions=$parts")
    }
  }

  test("concatChunkSlices: slices tile the token stream exactly — per-doc " +
      "sums, per-sequence fills, boundary spans, and any partitioning") {
    val r = new scala.util.Random(7)
    // token counts around and above seqLen so docs routinely span 2+
    // sequences; a few zero-token docs that must vanish
    val docs = (1L to 200L).map(i =>
      (i, if (i % 37 == 0) 0L else 1L + r.nextInt(150).toLong))
      .toDF("doc_id", "tokens")
    val seqLen = 64L
    val slices = Sampling.concatChunkSlices(docs, "doc_id", "tokens", seqLen)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val tok = docs.as[(Long, Long)].collect().toMap
    val total = tok.values.sum
    // per-doc: slice lengths sum to the doc's tokens; offsets partition it
    val byDoc = slices.groupBy(_._2)
    assert(byDoc.keySet == tok.filter(_._2 > 0).keySet,
      "every tokenful doc sliced, zero-token docs absent")
    for ((d, ss) <- byDoc) {
      assert(ss.map(_._5).sum == tok(d), s"doc $d slice sum")
      val sorted = ss.sortBy(_._1)
      assert(sorted.head._4 == 0L, s"doc $d first slice starts at 0")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._4 == a._4 + a._5, s"doc $d slices contiguous")
          assert(b._1 == a._1 + 1, s"doc $d spans consecutive sequences")
        case _ => ()
      }
    }
    // per-sequence: every sequence is FULL (seqLen) except the last
    val bySeq = slices.groupBy(_._1)
    val lastSeq = (total - 1) / seqLen
    assert(bySeq.keySet == (0L to lastSeq).toSet, "no sequence gaps")
    for ((s, ss) <- bySeq) {
      val fill = ss.map(_._5).sum
      if (s < lastSeq) assert(fill == seqLen, s"seq $s fill $fill")
      else assert(fill == total - lastSeq * seqLen, s"final seq fill $fill")
      // slice seq_offsets tile [0, fill)
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 == a._3 + a._5, s"seq $s contiguous")
        case _ => ()
      }
    }
    // the placement is partitioning-invariant (two-pass prefix sum)
    for (parts <- Seq(1, 3, 16)) {
      val again = Sampling.concatChunkSlices(docs.repartition(9), "doc_id",
          "tokens", seqLen, partitions = parts)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(again == slices.toSet, s"partitions=$parts")
    }
  }

  // 400/200/100 rows in domains big/mid/small
  private lazy val domains = (1L to 700L)
    .map(i => (i, if (i <= 400) "big" else if (i <= 600) "mid" else "small"))
    .toDF("id", "dom")

  test("temperatureSample: alpha=1 is the natural distribution (keeps all)") {
    assert(Sampling.temperatureSample(domains, "dom", "id", 1.0).count() == 700)
  }

  test("temperatureSample: alpha=0 flattens toward the smallest domain") {
    val got = Sampling.temperatureSample(domains, "dom", "id", 0.0)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    // rates: big 0.25, mid 0.5, small 1.0 → expected ≈ 100 each (hash jitter)
    assert(got("small") == 100)
    assert(math.abs(got("big") - 100) < 40, got.toString)
    assert(math.abs(got("mid") - 100) < 40, got.toString)
  }

  test("temperatureSample rates follow (n_min/n)^(1-alpha); alpha=0.5 via sqrt") {
    val rates = Sampling.temperatureSample(domains, "dom", "id", 0.5)
      .select("dom", "sample_rate").distinct().as[(String, Double)].collect().toMap
    assert(rates("small") == 1.0)
    assert(rates("mid") == math.sqrt(100.0 / 200.0))
    assert(rates("big") == math.sqrt(100.0 / 400.0))
  }

  test("temperatureSample modulo selector is exactly reproducible") {
    // modulus 10, alpha=0: thresholds big=floor(0.25*10)=2, mid=5, small=10
    val got = Sampling.temperatureSample(domains, "dom", "id", 0.0,
        byHash = false, modulus = 10L)
      .select("id").as[Long].collect().toSet
    val expect = (1L to 700L).filter { i =>
      val thr = if (i <= 400) 2 else if (i <= 600) 5 else 10
      i % 10 < thr
    }.toSet
    assert(got == expect)
  }

  test("temperatureSample is stable under repartitioning") {
    val a = Sampling.temperatureSample(domains, "dom", "id", 0.3)
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(domains.repartition(13), "dom", "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("packWholeDocs: equals the sequential size-class reference, " +
      "keeps the fill/fullness bounds, invariant to partitioning") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 400L).map(i => (i, rnd.nextInt(80) + 1L)) ++
      Seq((500L, 200L), (501L, 0L)) // oversize at seqLen=128; token-less
    val df = docs.toDF("doc_id", "n_tokens")
    def run(d: org.apache.spark.sql.DataFrame, parts: Int = 0) =
      Sampling.packWholeDocs(d, "doc_id", "n_tokens", 128, parts)
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val out = run(df)
    // sequential reference: class fit = 128 div n (0 for oversize), rank
    // within class in doc_id order, bin = rank0 div max(fit, 1)
    val expect = docs.filter(_._2 >= 1).map { case (id, nt) =>
      (id, nt, if (nt > 128) 0L else 128L / nt)
    }.groupBy(_._3).toSeq.flatMap { case (f, ds) =>
      ds.sortBy(_._1).zipWithIndex.map { case ((id, nt, _), i) =>
        (id, nt, f, (i / math.max(f, 1L).toInt).toLong)
      }
    }.sorted
    assert(out == expect)
    // invariants on the real output
    assert(!out.exists(_._1 == 501L), "token-less docs pack nothing")
    val os = out.filter(_._1 == 500L)
    assert(os.size == 1 && os.head._3 == 0L, "oversize flags fit=0")
    val byBin = out.filter(_._3 > 0).groupBy(x => (x._3, x._4))
    byBin.foreach { case ((f, b), ds) =>
      assert(ds.map(_._2).sum <= 128, s"bin ($f,$b) overfull")
      assert(ds.size <= f, s"bin ($f,$b): ${ds.size} docs > fit $f")
    }
    byBin.groupBy(_._1._1).foreach { case (f, bins) =>
      val last = bins.keys.map(_._2).max
      bins.foreach { case ((_, b), ds) => if (b < last) {
        assert(ds.size == f, s"non-final bin ($f,$b) not full")
        assert(ds.map(_._2).sum * 2 > 128,
          s"full bin ($f,$b) under 50% utilized")
      }}
    }
    // partitioning invariance (input layout AND rank-partition count)
    assert(run(df.repartition(7), parts = 3) == out)
    assert(run(df.repartition(1), parts = 1) == out)
  }
}

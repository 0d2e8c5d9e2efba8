package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "THE  quick   brown fox jumps over the lazy dog"), // exact dup of 1 after normalize
    (4L, "completely different text about spark engines and data"),
    (5L, "short")
  ).toDF("doc_id", "text")

  test("simhashPairsProbing finds every pair through hamming 7 that " +
      "chunk blocking provably can't") {
    import spark.implicits._
    // near-dup docs whose simhashes differ in >3 bits spread over all four
    // 16-bit chunks defeat plain 4-chunk pigeonhole blocking; probing's
    // guarantee reaches hamming 7
    val base = "the quick brown fox jumps over the lazy dog again and again " * 5
    val docs = Seq(
      (1L, base),
      (2L, base + " tail variation one two"),
      (3L, "completely different content about weather patterns in spring"))
      .toDF("doc_id", "text")
    val probing = Dedup.simhashPairsProbing(docs, "doc_id", "text")
      .select("d1", "d2", "hamming").as[(Long, Long, Long)].collect().toSet
    // ground truth: all pairs' exact hamming
    val sigs = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val all = for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 7
    } yield (a, b, h.toLong)
    assert(probing == all.toSet, s"probing=$probing truth=${all.toSet}")
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairsProbing(docs, "doc_id", "text", maxDist = 8) }
    assert(e.getMessage.contains("distance 7"))
  }

  test("exact dedup groups normalized duplicates") {
    val d = Dedup.exact(docs, "doc_id", "text").collect()
    assert(d.length == 4) // 1&3 collapse
    val dup = d.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dup.getAs[Long]("keeper_id") == 1L)
  }

  test("ngram jaccard finds the near-dup pair and only it at 0.5") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L))) // identical shingle sets
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH candidates contain the true near-dups (recall)") {
    val got = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3,
      numHashes = 32, bands = 16, minEstSim = 0.3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 3L)), s"exact dup must collide in every band: $got")
    assert(got.contains((1L, 2L)), s"near dup should collide in some band: $got")
  }

  test("minhash signature of identical texts is identical, est_sim = 1") {
    val sig = docs.filter(col("doc_id").isin(1L, 3L))
      .select(Dedup.minhashSignature(col("text"), 3, 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(sig(0) == sig(1))
  }

  test("simhash: identical docs distance 0, near-dups small, different large") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(4L)))
  }

  test("components: chains collapse to min label (driver and distributed paths agree)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("d1", "d2")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L)
    val viaDriver = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    val viaPropagation = Dedup.components(pairs, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == expect)
    assert(viaPropagation == expect)
  }

  test("components on a random graph: both paths identical") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(300)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .filter(p => p._1 != p._2).toDF("d1", "d2")
    val a = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    val b = Dedup.components(pairs, maxDriverEdges = 0L).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("dedupCorpus keeps exactly one doc per near-dup cluster") {
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text", minEstSim = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(3L)) // exact dup cluster {1,3} -> keep 1
    assert(kept.contains(4L) && kept.contains(5L))  // singletons survive
  }

  test("dedupCorpus with a shared signature table is identical (incl. doc subsets)") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, numHashes = 32)
      .localCheckpoint()
    val direct = Dedup.dedupCorpus(docs, "doc_id", "text", minEstSim = 0.9)
      .select("doc_id").as[Long].collect().toSet
    val shared = Dedup.dedupCorpus(docs, "doc_id", "text", minEstSim = 0.9,
      signatures = Some(sig)).select("doc_id").as[Long].collect().toSet
    assert(shared == direct)
    // the cached table covers a SUPERSET of the docs being deduped
    val subset = docs.filter(col("doc_id") =!= 2L)
    val directSub = Dedup.dedupCorpus(subset, "doc_id", "text", minEstSim = 0.9)
      .select("doc_id").as[Long].collect().toSet
    val sharedSub = Dedup.dedupCorpus(subset, "doc_id", "text", minEstSim = 0.9,
      signatures = Some(sig)).select("doc_id").as[Long].collect().toSet
    assert(sharedSub == directSub)
  }

  test("contamination: benchmark members 1.0, overlapping docs fractional, clean 0") {
    val bench = docs.filter(col("doc_id") === 1L)
    val c = Dedup.contamination(docs, bench, "doc_id", "text", n = 3)
      .as[(Long, Double)].collect().toMap
    assert(c(1L) == 1.0)
    assert(c(3L) == 1.0)            // exact dup of 1 -> same shingles
    assert(c(2L) > 0.0 && c(2L) < 1.0) // near-dup shares a strict subset
    assert(c(4L) == 0.0 && c(5L) == 0.0)
  }

  test("contaminationIndexed skips files the shingle bloom clears and still " +
      "answers exactly; appended files index incrementally") {
    // three files with DISJOINT vocabularies: only file A shares shingles
    // with the benchmark, so B and C must be skippable
    val mk = (id: Long, words: Seq[String]) => (id, words.mkString(" "))
    val fileA = Seq(mk(1L, Seq("alpha", "beta", "gamma", "delta", "epsilon")),
      mk(2L, Seq("beta", "gamma", "delta", "zeta", "eta")))
    val fileB = Seq(mk(10L, Seq("red", "green", "blue", "cyan", "magenta")),
      mk(11L, Seq("green", "blue", "cyan", "yellow", "black")))
    val fileC = Seq(mk(20L, Seq("oak", "pine", "birch", "cedar", "maple")))
    val t = new graft.table.ManagedTable(spark, tmpDir("shingle-skip") + "/t")
    t.overwrite(fileA.toDF("doc_id", "text").coalesce(1))
    t.append(fileB.toDF("doc_id", "text").coalesce(1))
    t.addShingleBloomIndex("text", n = 3)
    val bench = Seq(mk(100L, Seq("alpha", "beta", "gamma", "delta")))
      .toDF("doc_id", "text")
    // the probe must clear file B (disjoint vocabulary → no shared shingle)
    import org.apache.spark.sql.functions.xxhash64
    val keys = Dedup.shingleIndex(bench, "doc_id", "text", 3)
      .select(xxhash64(col("s"))).as[Long].collect()
    val (kept, all) = t.shingleFilesMightHit("text", 3, keys)
    assert(all.size == 2 && kept.size == 1,
      s"expected 1 of 2 files kept, got ${kept.size} of ${all.size}")
    // identical answer to the plain screen — zero-scored docs included
    def screen(df: org.apache.spark.sql.DataFrame) =
      Dedup.contamination(df, bench, "doc_id", "text", n = 3)
        .as[(Long, Double)].collect().toMap
    val got = Dedup.contaminationIndexed(t, bench, "doc_id", "text", n = 3)
      .as[(Long, Double)].collect().toMap
    assert(got == screen(t.read), s"indexed screen must equal exact: $got")
    assert(got(10L) == 0.0 && got(1L) > 0.0)
    // append a third file: the commit indexes it incrementally, the skip
    // set grows, and the answer stays exact
    t.append(fileC.toDF("doc_id", "text").coalesce(1))
    val (kept2, all2) = t.shingleFilesMightHit("text", 3, keys)
    assert(all2.size == 3 && kept2.size == 1,
      s"appended file should be skippable: ${kept2.size} of ${all2.size}")
    val got2 = Dedup.contaminationIndexed(t, bench, "doc_id", "text", n = 3)
      .as[(Long, Double)].collect().toMap
    assert(got2 == screen(t.read))
    assert(got2(20L) == 0.0)
    // a vectored delete no longer forces the fallback: the screen pins a
    // version and the pinned reader applies that version's DVs on BOTH
    // the kept and the skipped scans — files stay skipped, answer exact
    t.deleteVectored(col("doc_id") === 11L)
    val (kept3, all3) = t.shingleFilesMightHit("text", 3, keys)
    assert(all3.size == 3 && kept3.size == 1,
      "a DV must not disable file skipping")
    val got3 = Dedup.contaminationIndexed(t, bench, "doc_id", "text", n = 3)
      .as[(Long, Double)].collect().toMap
    assert(got3 == screen(t.read) && !got3.contains(11L))
  }

  test("contaminationIndexed is version-pinned: a vectored delete and a " +
      "compaction landing between the probe and the scans change nothing") {
    val mk = (id: Long, words: Seq[String]) => (id, words.mkString(" "))
    val hot = Seq(mk(1L, Seq("alpha", "beta", "gamma", "delta", "epsilon")),
      mk(2L, Seq("beta", "gamma", "delta", "zeta", "eta")))
    val cold = Seq(mk(10L, Seq("red", "green", "blue", "cyan", "magenta")),
      mk(11L, Seq("green", "blue", "cyan", "yellow", "black")))
    val t = new graft.table.ManagedTable(spark, tmpDir("shingle-pin") + "/t")
    t.overwrite(hot.toDF("doc_id", "text").coalesce(1))
    t.append(cold.toDF("doc_id", "text").coalesce(1))
    t.addShingleBloomIndex("text", n = 3)
    val bench = Seq(mk(100L, Seq("alpha", "beta", "gamma", "delta")))
      .toDF("doc_id", "text")
    val expected = Dedup.contamination(t.read, bench, "doc_id", "text", n = 3)
      .as[(Long, Double)].collect().toMap
    // the hook lands a DV-delete AND a file-retiring compaction in the
    // window between the bloom probe and the scan construction — the
    // pinned version must keep resolving (retired files through the
    // snapshot dirs) and keep answering as of the pinned version (the
    // later DV never applies)
    val got = Dedup.contaminationIndexedHooked(t, bench, "doc_id", "text",
      n = 3, maxStraddlers = 10000, afterProbe = () => {
        t.deleteVectored(col("doc_id") === 1L)
        t.compact(numFiles = 1)
      }).as[(Long, Double)].collect().toMap
    assert(got == expected,
      s"pinned screen diverged under concurrent mutations: $got vs $expected")
    assert(got.contains(1L), "the post-probe DV must NOT apply at the " +
      "pinned version")
    // quiet-state sanity: a fresh call sees the post-mutation table
    val after = Dedup.contaminationIndexed(t, bench, "doc_id", "text", n = 3)
      .as[(Long, Double)].collect().toMap
    assert(!after.contains(1L) && after.keySet == expected.keySet - 1L)
  }

  test("contaminationIndexed runs the SKIPPING path on a column-mapped " +
      "corpus, across a text-column RENAME (decl keyed by physical name)") {
    val mk = (id: Long, words: Seq[String]) => (id, words.mkString(" "))
    val fileA = Seq(mk(1L, Seq("alpha", "beta", "gamma", "delta", "epsilon")))
    val fileB = Seq(mk(10L, Seq("red", "green", "blue", "cyan", "magenta")))
    val t = new graft.table.ManagedTable(spark, tmpDir("shingle-map") + "/t")
    t.overwrite(fileA.toDF("doc_id", "text").coalesce(1))
    t.enableColumnMapping()
    t.append(fileB.toDF("doc_id", "text").coalesce(1))
    t.addShingleBloomIndex("text", n = 3)
    // RENAME is a pure metadata edit; the index keys the PHYSICAL name,
    // so it survives and probes translate the new logical name at lookup
    t.renameColumn("text", "body")
    val bench = Seq(mk(100L, Seq("alpha", "beta", "gamma", "delta")))
      .toDF("doc_id", "body")
    import org.apache.spark.sql.functions.xxhash64
    val keys = Dedup.shingleIndex(bench, "doc_id", "body", 3)
      .select(xxhash64(col("s"))).as[Long].collect()
    val (kept, all) = t.shingleFilesMightHit("body", 3, keys)
    assert(all.size == 2 && kept.size == 1,
      s"mapped probe must still skip file B: ${kept.size} of ${all.size}")
    val expected = Dedup.contamination(t.read, bench, "doc_id", "body", n = 3)
      .as[(Long, Double)].collect().toMap
    val got = Dedup.contaminationIndexed(t, bench, "doc_id", "body", n = 3)
      .as[(Long, Double)].collect().toMap
    assert(got == expected, s"mapped skipping screen diverged: $got")
    assert(got(1L) > 0.0 && got(10L) == 0.0)
    // incremental refresh under mapping: a post-rename append indexes its
    // new file on the same physical-keyed declaration and stays skippable
    t.append(Seq(mk(20L, Seq("oak", "pine", "birch", "cedar", "maple")))
      .toDF("doc_id", "body").coalesce(1))
    val (kept2, all2) = t.shingleFilesMightHit("body", 3, keys)
    assert(all2.size == 3 && kept2.size == 1,
      s"post-rename append must be skippable: ${kept2.size} of ${all2.size}")
    val got2 = Dedup.contaminationIndexed(t, bench, "doc_id", "body", n = 3)
      .as[(Long, Double)].collect().toMap
    assert(got2 ==
      Dedup.contamination(t.read, bench, "doc_id", "body", n = 3)
        .as[(Long, Double)].collect().toMap)
  }

  test("contaminationIndexed keeps one-row-per-doc semantics for ids that " +
      "straddle kept and skipped files, and for duplicate rows") {
    val mk = (id: Long, words: Seq[String]) => (id, words.mkString(" "))
    // file A (kept): shares shingles with the benchmark; doc 7 also has a
    // row here. file B (skipped): disjoint vocabulary; doc 7's OTHER row
    // and doc 10's two identical rows live here.
    val fileA = Seq(mk(1L, Seq("alpha", "beta", "gamma", "delta", "epsilon")),
      mk(7L, Seq("alpha", "beta", "gamma", "zeta", "eta")))
    val fileB = Seq(mk(7L, Seq("red", "green", "blue", "cyan", "magenta")),
      mk(10L, Seq("oak", "pine", "birch", "cedar", "maple")),
      mk(10L, Seq("oak", "pine", "birch", "cedar", "maple")))
    val t = new graft.table.ManagedTable(spark, tmpDir("shingle-strad") + "/t")
    t.overwrite(fileA.toDF("doc_id", "text").coalesce(1))
    t.append(fileB.toDF("doc_id", "text").coalesce(1))
    t.addShingleBloomIndex("text", n = 3)
    val bench = Seq(mk(100L, Seq("alpha", "beta", "gamma", "delta")))
      .toDF("doc_id", "text")
    import org.apache.spark.sql.functions.xxhash64
    val keys = Dedup.shingleIndex(bench, "doc_id", "text", 3)
      .select(xxhash64(col("s"))).as[Long].collect()
    val (kept, all) = t.shingleFilesMightHit("text", 3, keys)
    assert(all.size == 2 && kept.size == 1, "file B must be skippable")
    val expected = Dedup.contamination(t.read, bench, "doc_id", "text", n = 3)
      .as[(Long, Double)].collect()
    assert(expected.map(_._1).distinct.length == expected.length)
    val got = Dedup.contaminationIndexed(t, bench, "doc_id", "text", n = 3)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).distinct.length == got.length,
      s"one row per doc_id required, got ${got.toSeq.sortBy(_._1)}")
    assert(got.toMap == expected.toMap,
      s"straddler doc 7 must score over the UNION of its shingles: " +
        s"${got.toSeq.sortBy(_._1)} vs ${expected.toSeq.sortBy(_._1)}")
    // doc 7's score dilutes: its skipped-file row adds unmatched shingles
    assert(got.toMap.apply(7L) > 0.0 && got.toMap.apply(7L) < 1.0)
    assert(got.toMap.apply(10L) == 0.0)
    // the skipped files' id column is scanned ONCE, at build: the zeros
    // branch of the returned plan reads the build-time-checkpointed
    // distinct-id set (a LogicalRDD), not the parquet files again
    // (verdict r13 — the skipped side is by design the bulk of the
    // corpus, and an extra id pass over it is real I/O at scale)
    val plan = Dedup.contaminationIndexed(t, bench, "doc_id", "text", n = 3)
      .queryExecution.optimizedPlan
    val rddScans = plan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r }
    assert(rddScans.nonEmpty,
      s"zeros branch must read the checkpointed skipped-id set:\n$plan")
  }

  test("incremental dedup: batch docs matching the existing corpus are dropped") {
    // existing corpus = doc 1 only, represented by its signature store
    val existingSig = Dedup.minhashSignatures(
      docs.filter(col("doc_id") === 1L), "doc_id", "text", n = 3, numHashes = 32)
    val batch = docs.filter(col("doc_id") =!= 1L) // 2,3,4,5
    val (kept, keptSig) = Dedup.dedupIncremental(batch, "doc_id", "text", existingSig)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(3L))            // exact dup of existing doc 1
    assert(ids.contains(4L) && ids.contains(5L))
    assert(ids.contains(2L))             // near- but not 0.9-dup of doc 1
    // returned signatures cover exactly the kept docs (store append-ready)
    assert(keptSig.select("doc_id").as[Long].collect().toSet == ids)
    // a second batch with a dup of a KEPT doc is dropped against the
    // appended store
    val store = existingSig.unionByName(keptSig)
    val batch2 = Seq((10L, "completely different text about spark engines and data"))
      .toDF("doc_id", "text") // exact dup of kept doc 4
    val (kept2, _) = Dedup.dedupIncremental(batch2, "doc_id", "text", store)
    assert(kept2.count() == 0)
  }

  test("dropDuplicateChunks removes cross-doc boilerplate, keeps unique spans") {
    val boiler = Seq(
      (1L, "the same header alpha beta gamma"),
      (2L, "the same header delta epsilon zeta"),
      (3L, "common footer text"),
      (4L, "common footer text")).toDF("doc_id", "text")
    val out = Dedup.dropDuplicateChunks(boiler, "doc_id", "text", chunkWords = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha beta gamma", 1L, 1L),
      (2L, "delta epsilon zeta", 1L, 1L),
      // wholly-boilerplate docs SURFACE with empty text, not vanish
      (3L, "", 0L, 1L),
      (4L, "", 0L, 1L)))
  }

  test("dropDuplicateChunks keeps within-doc repetition (cross-doc only)") {
    val rep = Seq((1L, "x y z x y z"), (2L, "totally unrelated words here"))
      .toDF("doc_id", "text")
    val out = Dedup.dropDuplicateChunks(rep, "doc_id", "text", chunkWords = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // "x y z" repeats only WITHIN doc 1: countDistinct(doc)=1, so both
    // occurrences survive in original order
    assert(out.head == ((1L, "x y z x y z", 2L, 0L)))
  }

  test("stop-shingle removal caps hot shingles") {
    val many = (1L to 50L).map(i => (i, s"common prefix words here tail$i")).toDF("doc_id", "text")
    val idx = Dedup.shingleIndex(many, "doc_id", "text", 3, maxDocFreq = 10)
    // 'common prefix words' appears in all 50 docs -> dropped
    assert(idx.filter(col("s") === "common prefix words").count() == 0)
    assert(idx.count() > 0)
  }

  test("semDedup keeps the lowest-id representative per cluster-local dup set") {
    val e = Seq(
      (1L, Seq(1.0f, 0.0f)),     // cluster 0 keeper
      (2L, Seq(0.999f, 0.02f)),  // near-dup of 1 → dropped
      (3L, Seq(0.0f, 1.0f)),     // cluster 1 keeper
      (4L, Seq(0.02f, 0.999f)),  // near-dup of 3 → dropped
      (5L, Seq(0.7f, 0.7f))      // equidistant odd one out → kept
    ).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("label", "centroid")
    val kept = Dedup.semDedup(e, "vec_id", "embedding", cents, 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("semDedup greedy rule: a dropped doc still dominates its own near-dups") {
    // chain at ~20° steps: cos(1,2) ≈ cos(2,3) ≈ 0.94 ≥ 0.9 but
    // cos(1,3) ≈ 0.77 < 0.9 — doc 3 must STILL drop (dominated by the
    // already-dropped 2), the documented non-transitive greedy semantics
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val e = Seq((1L, at(0)), (2L, at(20)), (3L, at(40))).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0.0))).toDF("label", "centroid")
    val kept = Dedup.semDedup(e, "vec_id", "embedding", cents, 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("semDedup never pairs across clusters") {
    // identical vectors in DIFFERENT clusters both survive: the pairwise
    // join is cluster-bounded by construction
    val e = Seq((1L, Seq(1.0f, 1.0f)), (2L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    // force different assignment via distinct nearest centroids is
    // impossible for identical vectors — instead check the join shape on
    // clearly-separated clusters with within-cluster identity only
    val e2 = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("label", "centroid")
    val kept = Dedup.semDedup(e2, "vec_id", "embedding", cents, 0.5)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L)) // orthogonal → different clusters → both kept
    val sameCluster = Dedup.semDedup(e, "vec_id", "embedding", cents, 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(sameCluster == Set(1L)) // identical → same cluster → one keeper
  }

  test("semDedupAuto ≡ semDedup over the separately-fitted codebook") {
    val r = new scala.util.Random(11)
    def jitter(base: Seq[Float]) = base.map(x => x + (r.nextFloat() - 0.5f) * 0.05f)
    val rows = (0 until 30).map { i =>
      val base = if (i % 3 == 0) Seq(1.0f, 0.1f, 0f) else if (i % 3 == 1)
        Seq(0f, 1.0f, 0.1f) else Seq(0.1f, 0f, 1.0f)
      (i.toLong, jitter(base))
    }
    val e = rows.toDF("vec_id", "embedding").cache()
    val cents = Embeddings.kmeansFit(e, "vec_id", "embedding", k = 3, iters = 2)
    val viaAuto = Dedup.semDedupAuto(e, "vec_id", "embedding", k = 3, iters = 2,
      minCos = 0.98).select("vec_id").as[Long].collect().toSet
    val viaFit = Dedup.semDedup(e, "vec_id", "embedding", cents, 0.98)
      .select("vec_id").as[Long].collect().toSet
    assert(viaAuto == viaFit)
    assert(viaAuto.nonEmpty && viaAuto.size < 30) // jittered triples collapse
  }

  test("exactKeepBest keeps the highest-score copy, ties to lowest id") {
    val d = Seq(
      (1L, "alpha beta gamma", 0.3),
      (2L, "ALPHA  beta   gamma", 0.9),  // same fingerprint, better score
      (3L, "alpha beta gamma", 0.9),     // ties with 2 → 2 wins (lower id)
      (4L, "something else", 0.1)
    ).toDF("doc_id", "text", "score")
    val kept = Dedup.exactKeepBest(d, "doc_id", "text", "score")
      .select("doc_id", "dup_count").as[(Long, Long)].collect().toMap
    assert(kept == Map(2L -> 3L, 4L -> 1L))
  }

  test("shingles: the one-pass native expression equals the old lambda " +
      "formulation on every tokenization edge") {
    // the formulation ShingleArray replaced — kept here as the semantic
    // reference: correct, but the lambda body re-embeds words(text), so
    // interpreted higher-order eval re-tokenizes the document PER
    // SHINGLE (quadratic in doc length)
    def oldShingles(text: org.apache.spark.sql.Column, n: Int) = {
      val w = graft.ops.TextAnalysis.words(text)
      array_distinct(
        when(size(w) >= n,
          transform(sequence(lit(1), size(w) - (n - 1)),
            i => concat_ws(" ", slice(w, i, lit(n)))))
          .otherwise(array(concat_ws(" ", w))))
    }
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "A  B\tb c  a b"), // case, tabs, repeated shingle (order!)
      (3L, "one two"),        // fewer words than n
      (4L, ""), (5L, "   "),  // empty and whitespace-only
      (6L, "ünïcode ÉÉ ss ß mixed"), // non-ascii lowercase kernel
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    for (n <- Seq(2, 3)) {
      val a = docs.select(col("doc_id"),
          Dedup.shingles(col("text"), n).as("s"))
        .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
      val b = docs.select(col("doc_id"), oldShingles(col("text"), n).as("s"))
        .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
      assert(a == b, s"n=$n")
    }
  }

  test("shingle bloom build right-sizes a file whose key count swamps " +
      "the row heuristic (adaptive rebuild keeps skipping effective)") {
    // one ROW (auto sizing: max(4096, rows×32) = 4096 items) carrying
    // ~9k shingles: without the saturation rebuild the filter answers
    // "maybe" at a huge false-positive rate and the file is never
    // skippable — correct but silently unprunable
    val rnd = new scala.util.Random(7)
    val hot = Seq.fill(9100)(rnd.alphanumeric.take(6).mkString).mkString(" ")
    val t = new graft.table.ManagedTable(spark, tmpDir("shingle-sat") + "/t")
    t.overwrite(Seq((1L, "alpha beta gamma delta"))
      .toDF("doc_id", "text").coalesce(1))
    t.append(Seq((10L, hot)).toDF("doc_id", "text").coalesce(1))
    t.addShingleBloomIndex("text", n = 3, fpp = 0.001)
    val bench = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    import org.apache.spark.sql.functions.xxhash64
    val keys = Dedup.shingleIndex(bench, "doc_id", "text", 3)
      .select(xxhash64(col("s"))).as[Long].collect()
    val (kept, all) = t.shingleFilesMightHit("text", 3, keys)
    assert(all.size == 2 && kept.size == 1,
      s"the saturated file must be rebuilt right-sized and skipped: " +
        s"kept ${kept.size} of ${all.size}")
    // and the screen stays exact either way
    val got = Dedup.contaminationIndexed(t, bench, "doc_id", "text", n = 3)
      .as[(Long, Double)].collect().toMap
    assert(got(10L) == 0.0 && got(1L) > 0.0, got.toString)
  }

  test("word chunks: the one-pass expression equals the lambda " +
      "formulation; tokenless docs normalize to ONE empty chunk") {
    def oldChunks(text: org.apache.spark.sql.Column, cw: Int) = {
      val w = graft.ops.TextAnalysis.words(text)
      transform(sequence(lit(0),
          ceil(size(w).cast("double") / cw).cast("int") - 1),
        i => concat_ws(" ", slice(w, i * cw + 1, lit(cw))))
    }
    val docs = Seq(
      (1L, "a b c d e f g"), // partial tail chunk
      (2L, "A  B\tc"),       // case + tabs, exactly one chunk at cw=3
      (3L, "x"),             // fewer words than cw
      (4L, "ü É ss ß q w"),
      (5L, null.asInstanceOf[String])) // null: stays null, no rows
      .toDF("doc_id", "text")
    for (cw <- Seq(2, 3)) {
      val a = docs.select(col("doc_id"),
          graft.functions.WordChunks.word_chunks(col("text"), cw).as("c"))
        .orderBy("doc_id")
        .as[(Long, Option[Seq[String]])].collect().toSeq
      val b = docs.select(col("doc_id"), oldChunks(col("text"), cw).as("c"))
        .orderBy("doc_id")
        .as[(Long, Option[Seq[String]])].collect().toSeq
      assert(a == b, s"cw=$cw")
    }
    // the DELIBERATE edge change: the lambda's ceil(0/cw)−1 built
    // sequence(0, −1) = [0, −1] — an artifact PAIR of empty chunks for
    // a tokenless doc; the expression emits one
    val e = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val got = e.select(col("doc_id"),
        graft.functions.WordChunks.word_chunks(col("text"), 3).as("c"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(got == Seq((1L, Seq("")), (2L, Seq(""))))
  }

  // hand-computed k=3 span fixture: A/B share two overlapping-in-A
  // 3-grams; C repeats a 3-gram within itself and touches (not
  // overlaps) so the intervals chain; D is one sliding run
  private val spanDocs = Seq(
    (1L, "a b c d e f g h"),       // anchors p2,p3 → one span [2,5]
    (2L, "x x b c d y c d e"),     // anchors p3,p7 → gap at 6 → two spans
    (3L, "p q r p q r s t"),       // p1,p4 TOUCH ([1,3]+[4,6]) + p5,p6
    (4L, "p q r s t u"))           // p1,p2,p3 → one span [1,5]

  test("duplicatedSpans merges overlapping AND touching anchors into " +
      "maximal spans; within-doc repeats count; positions are 1-based") {
    val got = Dedup.duplicatedSpans(spanDocs.toDF("doc_id", "text"),
        "doc_id", "text", k = 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 2, 4),           // "b c d e": [2,4] ∪ [3,5]
      (2L, 3, 3), (2L, 7, 3), // gap at position 6 splits
      (3L, 1, 8),           // whole doc: [1,3] touches [4,6], chain on
      (4L, 1, 5)))
  }

  test("exciseDuplicatedSpans drops exactly the covered tokens and " +
      "keeps a row for a fully-duplicated doc") {
    val got = Dedup.exciseDuplicatedSpans(spanDocs.toDF("doc_id", "text"),
        "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a f g h", 4L, 4L),
      (2L, "x x y", 3L, 6L),
      (3L, "", 0L, 8L),     // one big span: surfaces empty, not absent
      (4L, "u", 1L, 5L)))
  }

  test("incremental duplicated spans against a gram store ≡ the union " +
      "screen; the store folds batches additively; non-stores refused") {
    val base = Seq(spanDocs(0), spanDocs(2))  // docs 1 and 3
    val batch = Seq(spanDocs(1), spanDocs(3)) // docs 2 and 4
    val store = Dedup.saveGramStore(spark, tmpDir("gramstore") + "/s",
      base.toDF("doc_id", "text"), "doc_id", "text", k = 3)
    val inc = Dedup.duplicatedSpansIncremental(
        batch.toDF("doc_id", "text"), "doc_id", "text", store)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int)].collect().toSeq
    // the exactness law: ≡ the one-shot screen over the UNION,
    // restricted to batch ids
    val unionSpans = Dedup.duplicatedSpans(spanDocs.toDF("doc_id", "text"),
        "doc_id", "text", 3)
      .filter(col("doc_id").isin(2L, 4L))
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int)].collect().toSeq
    assert(inc == unionSpans && inc == Seq((2L, 3, 3), (2L, 7, 3),
      (4L, 1, 5)))
    // the excision twin obeys the same law (pure function of anchors)
    val exInc = Dedup.exciseDuplicatedSpansIncremental(
        batch.toDF("doc_id", "text"), "doc_id", "text", store)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    val exUnion = Dedup.exciseDuplicatedSpans(
        spanDocs.toDF("doc_id", "text"), "doc_id", "text", 3)
      .filter(col("doc_id").isin(2L, 4L))
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(exInc == exUnion && exInc.nonEmpty)
    // fold the batch in: the store now equals a fresh full-corpus build
    Dedup.updateGramStore(store, batch.toDF("doc_id", "text"),
      "doc_id", "text")
    val full = Dedup.saveGramStore(spark, tmpDir("gramstore") + "/f",
      spanDocs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
    assert(store.read.as[(String, Long)].collect().sorted.toSeq ==
      full.read.as[(String, Long)].collect().sorted.toSeq)
    // a third batch screens against everything folded so far
    val b3 = Seq((9L, "c d e f g zz"))
    val inc3 = Dedup.duplicatedSpansIncremental(
        b3.toDF("doc_id", "text"), "doc_id", "text", store)
      .as[(Long, Int, Int)].collect().toSeq
    assert(inc3 == Seq((9L, 1, 5)), inc3.toString) // "c d e f g" known
    val law3 = Dedup.duplicatedSpans(
        (spanDocs ++ b3).toDF("doc_id", "text"), "doc_id", "text", 3)
      .filter(col("doc_id") === 9L)
      .as[(Long, Int, Int)].collect().toSeq
    assert(inc3 == law3)
    // a table without the declaration is refused pointedly
    val plain = new graft.table.ManagedTable(spark,
      tmpDir("gramstore") + "/p")
    plain.overwrite(Seq(("x y z", 1L)).toDF("gram", "c"))
    val e = intercept[IllegalArgumentException](
      Dedup.duplicatedSpansIncremental(b3.toDF("doc_id", "text"),
        "doc_id", "text", plain))
    assert(e.getMessage.contains("graft.spanstore.k"))
  }

  test("duplicated-span results are partitioning-invariant and a " +
      "duplicate-free corpus yields no spans") {
    val df = spanDocs.toDF("doc_id", "text")
    def run(parts: Int) =
      Dedup.duplicatedSpans(df.repartition(parts), "doc_id", "text", 3)
        .orderBy("doc_id", "span_start")
        .as[(Long, Int, Int)].collect().toSeq
    assert(run(1) == run(5))
    val unique = Seq((1L, "one two three"), (2L, "four five six"))
      .toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(unique, "doc_id", "text", 2).count() == 0)
    val ex = Dedup.exciseDuplicatedSpans(unique, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(ex == Seq((1L, "one two three", 3L, 0L),
      (2L, "four five six", 3L, 0L)))
  }
}

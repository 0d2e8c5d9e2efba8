package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(-1.0f, 0.0f, 0.0f)),
    (4L, Seq(0.95f, 0.05f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine of identical vectors is 1, orthogonal 0, opposite -1") {
    val c = embs.select(col("vec_id"),
      Similarity.cosine(col("embedding"), array(lit(1.0f), lit(0.0f), lit(0.0f))).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(c(0L) - 1.0) < 1e-12)
    assert(math.abs(c(2L)) < 1e-12)
    assert(math.abs(c(3L) + 1.0) < 1e-12)
  }

  test("brute-force top-k orders by similarity with id tiebreak") {
    val top = Similarity.cosineTopK(embs, "vec_id", "embedding", 0L, 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(4L, 1L, 2L))
  }

  test("ANN top-k is exactly brute-force top-k restricted to the query bucket") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.model.Tables.embeddings(spark, dir)
    val planes = Similarity.hyperplanes(4, 64)
    val bucketed = e.withColumn("b", Similarity.lshBucket(col("embedding"), planes))
    val qBucket = bucketed.filter(col("vec_id") === 0L).select("b").as[Long].head()
    val inBucket = bucketed.filter(col("b") === qBucket).drop("b")
    val bruteInBucket = Similarity.cosineTopK(inBucket, "vec_id", "embedding", 0L, 5)
      .select("vec_id").as[Long].collect().toSeq
    val ann = Similarity.annTopK(e, "vec_id", "embedding", 0L, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ann == bruteInBucket, s"ann=$ann expected=$bruteInBucket")
    assert(ann.nonEmpty)
  }

  test("near-dup pairs finds the planted close pair") {
    val pairs = Similarity.nearDupPairs(embs, "vec_id", "embedding", 0.99)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 4L)) && pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._2 == 3L))
  }

  test("multi-probe ANN recall >= single-probe; probing all buckets isn't worse") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.model.Tables.embeddings(spark, dir)
    val brute = Similarity.cosineTopK(e, "vec_id", "embedding", 0L, 5)
      .select("vec_id").as[Long].collect().toSet
    def recall(p: Int) = (Similarity.annTopK(e, "vec_id", "embedding", 0L, 5,
      numProbes = p).select("vec_id").as[Long].collect().toSet intersect brute).size
    assert(recall(4) >= recall(1))
  }

  test("IVF with all lists probed equals brute force") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.model.Tables.embeddings(spark, dir)
    val cents = Embeddings.centroids(e, "label", "embedding")
    val nLists = cents.count().toInt
    val ivf = Similarity.ivfTopK(e, "vec_id", "embedding", cents, 0L, 5, nLists)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.cosineTopK(e, "vec_id", "embedding", 0L, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == brute)
  }

  test("prebuilt IVF index: probe equals inline ivfTopK and prunes list partitions") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.model.Tables.embeddings(spark, dir)
    val cents = Embeddings.centroids(e, "label", "embedding")
    val path = tmpDir("ivf-index")
    Similarity.buildIvfIndex(e, "vec_id", "embedding", cents, path)
    val qv = e.filter(col("vec_id") === 0L).select("embedding").head.getSeq[Float](0)
    val probe = Similarity.ivfProbe(spark, path, "vec_id", "embedding", qv,
      k = 5, nProbe = 2, excludeId = Some(0L))
    val inline = Similarity.ivfTopK(e, "vec_id", "embedding", cents, 0L, 5, nProbe = 2)
    assert(probe.select("vec_id").as[Long].collect().toSeq
      == inline.select("vec_id").as[Long].collect().toSeq)
    // the probe's list scan is partition-pruned: a non-trivial
    // PartitionFilters on assigned_label, and no per-query assignment join
    val plan = probe.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*assigned_label[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.isDefined, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("batch IVF kNN join equals per-query probes") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.model.Tables.embeddings(spark, dir)
    val cents = Embeddings.centroids(e, "label", "embedding")
    val path = tmpDir("ivf-knn")
    Similarity.buildIvfIndex(e, "vec_id", "embedding", cents, path)
    val queryIds = Seq(0L, 7L, 13L)
    val queries = e.filter(col("vec_id").isin(queryIds: _*))
    val batch = Similarity.ivfKnnJoin(spark, path, queries, "vec_id", "embedding",
        k = 5, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    queryIds.foreach { qid =>
      val qv = e.filter(col("vec_id") === qid).select("embedding").head.getSeq[Float](0)
      val single = Similarity.ivfProbe(spark, path, "vec_id", "embedding", qv,
          k = 5, nProbe = 2, excludeId = Some(qid))
        .select("vec_id").as[Long].collect().toSet
      assert(batch(qid) == single, s"qid=$qid")
    }
  }

  test("indexed near-dup pairs with full probing equal the exact quadratic form") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.model.Tables.embeddings(spark, dir)
    val cents = Embeddings.centroids(e, "label", "embedding")
    val nLists = cents.count().toInt
    val path = tmpDir("ivf-neardup")
    Similarity.buildIvfIndex(e, "vec_id", "embedding", cents, path)
    val indexed = Similarity.nearDupPairsIndexed(spark, path, e, "vec_id", "embedding",
        minCos = 0.4, nProbe = nLists, kCap = 1000)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val exact = Similarity.nearDupPairs(e, "vec_id", "embedding", 0.4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(indexed == exact, s"indexed=${indexed.size} exact=${exact.size}")
    assert(exact.nonEmpty)
  }

  test("indexed near-dup at full probe reproduces q23's oracle rows on sf0.01") {
    // q23_embed_neardup is the bit-exact DuckDB-anchored form (quadratic,
    // small-sf only); this pins the PRODUCTION path — the IVF-indexed join —
    // to the same rows AND the same cos_sim values on the oracle fixture,
    // closing the exactness chain indexed ≡ quadratic ≡ DuckDB.
    val dir = "/root/testdata/sf0.01"
    val e = graft.model.Tables.embeddings(spark, dir)
    val cents = Embeddings.centroids(e, "label", "embedding")
    val nLists = cents.count().toInt
    val path = tmpDir("ivf-neardup-oracle")
    Similarity.buildIvfIndex(e, "vec_id", "embedding", cents, path)
    val indexed = Similarity.nearDupPairsIndexed(spark, path, e, "vec_id", "embedding",
        minCos = 0.4, nProbe = nLists, kCap = 1000000)
      .select("id1", "id2", "cos_sim").as[(Long, Long, Double)].collect().toSet
    val oracleAnchor = graft.SparkEntry.queries("q23_embed_neardup")(spark, dir)
      .select("id1", "id2", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(indexed == oracleAnchor,
      s"indexed=${indexed.size} anchor=${oracleAnchor.size}")
    assert(oracleAnchor.nonEmpty)
  }

  test("symmetrization keeps a pair discovered in only one direction under kCap") {
    // Planted geometry (unit vectors at -2°…+25° from v0): with kCap=2,
    // v0's top-2 is {v1, v2} — v5 never appears in a query-0 result — but
    // v5's top-2 is {v0, v1} with cos(0,5)≈0.906 ≥ minCos. The (0,5) pair is
    // therefore discovered ONLY in the 5→0 direction; orienting by
    // query<neighbor before symmetrizing would drop it (ADVICE r2).
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99985f, -0.01745f, 0.0f)),
      (2L, Seq(0.99939f, -0.03490f, 0.0f)),
      (5L, Seq(0.90631f, 0.42262f, 0.0f))
    ).toDF("vec_id", "embedding")
    val path = tmpDir("ivf-sym")
    // single-list index: candidate generation is exhaustive, so kCap is the
    // only truncation in play
    val centOne = Seq((0L, Seq(1.0f, 0.0f, 0.0f))).toDF("label", "centroid")
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", centOne, path)
    val pairs = Similarity.nearDupPairsIndexed(spark, path, vecs, "vec_id", "embedding",
        minCos = 0.85, nProbe = 1, kCap = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSeq
    assert(pairs.contains((0L, 5L)), s"one-direction pair lost: $pairs")
    // orientation + dedup: every pair asc-ordered and emitted exactly once
    assert(pairs.forall(p => p._1 < p._2), pairs)
    assert(pairs.distinct == pairs, pairs)
  }

  test("quadratic near-dup guard refuses oversized inputs, allows override") {
    val big = spark.range(0, 50).selectExpr("id as vec_id",
      "array(cast(id as float), 1.0f) as embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.nearDupPairs(big, "vec_id", "embedding", 0.9, maxRows = 10)
    }
    assert(e.getMessage.contains("nearDupPairsIndexed"))
    // override still runs, and under-threshold inputs are untouched
    assert(Similarity.nearDupPairs(big, "vec_id", "embedding", -1.0,
      maxRows = 10, allowQuadratic = true).count() == 50L * 49 / 2)
    assert(Similarity.nearDupPairs(embs, "vec_id", "embedding", 0.99)
      .count() > 0)
  }

  test("lsh bucket is deterministic across evaluations") {
    val planes = Similarity.hyperplanes(4, 3)
    val b1 = embs.select(Similarity.lshBucket(col("embedding"), planes)).as[Long].collect()
    val b2 = embs.select(Similarity.lshBucket(col("embedding"), planes)).as[Long].collect()
    assert(b1.toSeq == b2.toSeq)
  }
}

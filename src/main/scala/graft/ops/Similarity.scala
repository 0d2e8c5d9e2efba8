package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`, 64-dim in
  * the testdata): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH bucketing as the scale path.
  *
  * Numeric determinism: the dot product is a strict left-to-right fold in
  * DOUBLE (`aggregate(zip_with(...))`), bit-identical to DuckDB's
  * `list_dot_product(CAST(a AS DOUBLE[]), ...)` — verified empirically, so
  * cosine scores hash-match the oracle exactly, no rounding needed.
  *
  * Scale design: brute-force is a broadcast of the query vector over a
  * linear scan (perfectly parallel, no shuffle, TakeOrderedAndProject for
  * the top-k — never a global sort). Pairwise near-dup is quadratic and
  * only for small corpora; the LSH variant shuffles on bucket ids instead,
  * and at 100 TB you'd pre-partition the table by bucket so probes prune
  * partitions.
  */
object Similarity {

  /** Strict sequential dot product in double precision — a native codegen'd
    * Catalyst expression ([[graft.functions.DotProduct]]); same fold order
    * as DuckDB's list_dot_product, so oracle results stay bit-identical.
    */
  def dot(a: Column, b: Column): Column = graft.functions.Vec.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k neighbors of the vector with id `queryId`.
    * The 1-row query side is broadcast; the scan stays pipeline-parallel
    * and each side's norm is computed once, not per pair.
    */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"), norm(col(vecCol)).as("__qn"))
    embeddings.join(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        (dot(col(vecCol), col("__qvec")) / (norm(col(vecCol)) * col("__qn"))).as("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** Exact pairwise cosine near-duplicates (cos ≥ `minCos`). Quadratic —
    * the small-corpus baseline; [[nearDupPairsIndexed]] is the scale path.
    * Norms are precomputed per row (O(n)) instead of per pair (O(n²)).
    *
    * Scale guard: an inequality-only join plans as a broadcast nested
    * loop, so above `maxRows` input rows this REFUSES to run (a bounded
    * `limit(maxRows+1)` probe, not a full count) and points at the
    * IVF-indexed form instead of silently planning a cartesian that would
    * never finish at corpus scale. `allowQuadratic = true` overrides for
    * callers who measured and accepted the O(n²) cost.
    */
  def nearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                   minCos: Double, maxRows: Int = 10000,
                   allowQuadratic: Boolean = false): DataFrame = {
    if (!allowQuadratic) {
      val probed = embeddings.select(col(idCol)).limit(maxRows + 1).count()
      if (probed > maxRows) throw new IllegalArgumentException(
        s"nearDupPairs is quadratic (all-pairs join) and the input exceeds " +
          s"$maxRows rows; use nearDupPairsIndexed (IVF kNN join, corpus-" +
          s"linear) or pass allowQuadratic = true after sizing the cost")
    }
    val a = embeddings.select(col(idCol).as("id1"), col(vecCol).as("v1"),
      norm(col(vecCol)).as("n1"))
    val b = embeddings.select(col(idCol).as("id2"), col(vecCol).as("v2"),
      norm(col(vecCol)).as("n2"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (dot(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }

  /** Deterministic seeded gaussian hyperplanes (numPlanes × dim). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id: bit i = sign of ⟨plane_i, vec⟩.
    * Pure expressions; the bucket id is a BIGINT suitable for partitioning.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      val planeCol = array(p.map(lit): _*)
      acc + when(dot(vec, planeCol) > 0, lit(1L << i)).otherwise(0L)
    }

  /** Bucketed ANN with multi-probe: search the query's LSH bucket plus the
    * `numProbes−1` Hamming-1 neighbor buckets (each one hyperplane flip
    * away). Recall/latency tuned by numPlanes × numProbes; the probe set is
    * built lazily (query row × literal masks, broadcast), so the scan side
    * stays a single pruned pass.
    */
  def annTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, numPlanes: Int = 4, dim: Int = 64,
              numProbes: Int = 1, seed: Long = 42L): DataFrame = {
    require(numProbes >= 1 && numProbes <= numPlanes + 1)
    val planes = hyperplanes(numPlanes, dim, seed)
    val bucketed = embeddings.withColumn("__bucket", lshBucket(col(vecCol), planes))
    val masks = 0L +: (0 until (numProbes - 1)).map(1L << _)
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"), col("__bucket").as("__qbucket"),
        explode(array(masks.map(lit): _*)).as("__mask"))
      .withColumn("__pbucket", col("__qbucket").bitwiseXOR(col("__mask")))
    bucketed.join(broadcast(q), col("__bucket") === col("__pbucket"))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col(vecCol), col("__qvec")).as("cos_sim"),
        col("__bucket").as("bucket"))
      .dropDuplicates(idCol)
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** Build a persistent IVF index at `path`: the corpus is assigned to its
    * nearest codebook centroid ONCE and written as inverted lists
    * partitioned by the list id (`assigned_label`), alongside the codebook.
    * Probes ([[ivfProbe]]) then prune to `nProbe` partition directories —
    * an index, not a scan. At 100 TB the build is one assignment pass; the
    * per-list files stay scan-friendly because `partitionBy` groups rows by
    * list without a shuffle beyond the assignment's own.
    */
  def buildIvfIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                    cents: DataFrame, path: String): Unit = {
    Embeddings.assignToCentroids(embeddings, idCol, vecCol, cents)
      .select(col(idCol), col("assigned_label"))
      .join(embeddings, Seq(idCol))
      .write.mode("overwrite").partitionBy("assigned_label")
      .parquet(s"$path/lists")
    cents.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Probe a prebuilt IVF index with a literal query vector: score the
    * codebook, pick the `nProbe` nearest lists, and scan ONLY those
    * partitions. The probe labels are collected to the driver — bounded by
    * `nProbe` over a codebook that is small by construction — so the list
    * scan gets STATIC partition pruning (`PartitionFilters` in the plan,
    * asserted in SimilaritySpec).
    */
  def ivfProbe(spark: SparkSession, path: String, idCol: String, vecCol: String,
               queryVec: Seq[Float], k: Int, nProbe: Int,
               excludeId: Option[Long] = None): DataFrame = {
    val qv = typedlit(queryVec)
    val probeLabels = spark.read.parquet(s"$path/centroids")
      .select(col("label"), cosine(col("centroid"), qv).as("c"))
      .orderBy(desc("c"), col("label")).limit(nProbe)
      .select("label").collect().map(_.get(0))
    val lists = spark.read.parquet(s"$path/lists")
      .filter(col("assigned_label").isin(probeLabels: _*))
    excludeId.foldLeft(lists)((d, id) => d.filter(col(idCol) =!= id))
      .select(col(idCol), cosine(col(vecCol), qv).as("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** Batch kNN join over a prebuilt IVF index: top-k approximate neighbors
    * for EVERY query row in one pass — the operator behind embedding-level
    * corpus dedup and retrieval joins. Each query scores the broadcast
    * codebook, keeps its `nProbe` nearest lists, and joins the (pruned)
    * inverted lists on the list id; Spark's dynamic partition pruning cuts
    * the list scan to the union of probed partitions because
    * `assigned_label` is the index's partition column. Per-query results
    * are identical to [[ivfProbe]] (asserted in spec).
    */
  def ivfKnnJoin(spark: SparkSession, path: String, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val lists = spark.read.parquet(s"$path/lists")
    val q = queries.select(col(idCol).as("__qid"), col(vecCol).as("__qvec"))
    // nProbe nearest lists per query (query × codebook is small: |Q|·|lists|)
    val probes = Relational.topKPerGroup(
        q.join(broadcast(cents))
          .select(col("__qid"), col("__qvec"), col("label"),
            cosine(col("centroid"), col("__qvec")).as("__c")),
        "__qid", nProbe, "__c", "label")
      .select(col("__qid"), col("__qvec"), col("label").as("assigned_label"))
    // no dedup needed: the index assigns each doc to exactly one list
    val scored = lists.join(probes, Seq("assigned_label"))
      .filter(col(idCol) =!= col("__qid"))
      .select(col("__qid").as("query_id"), col(idCol).as("neighbor_id"),
        cosine(col(vecCol), col("__qvec")).as("cos_sim"))
    Relational.topKPerGroup(scored, "query_id", k, "cos_sim", "neighbor_id")
      .drop("rn")
  }

  /** Embedding near-duplicate pairs at scale: every vector kNN-joins the
    * IVF index and pairs with neighbors at cosine ≥ `minCos` — the indexed
    * complement of the exact-but-quadratic [[nearDupPairs]]. With `nProbe`
    * = the full codebook it degenerates to the exact result (spec); in
    * production nProbe bounds each query to a few lists, trading recall
    * for a corpus-linear scan. `kCap` bounds per-vector candidate fanout.
    */
  def nearDupPairsIndexed(spark: SparkSession, path: String, embeddings: DataFrame,
                          idCol: String, vecCol: String, minCos: Double,
                          nProbe: Int, kCap: Int = 50): DataFrame =
    ivfKnnJoin(spark, path, embeddings, idCol, vecCol, k = kCap, nProbe = nProbe)
      .filter(col("cos_sim") >= minCos)
      // symmetrize BEFORE orienting the pair: a hit found only in the
      // higher-id→lower-id direction (the lower id's top-kCap being full of
      // closer neighbors) must still survive — discarding one direction
      // outright would lose recall beyond the documented nProbe approximation.
      // cos_sim is direction-independent (the dot fold sees the identical
      // product sequence), so distinct dedups the two orientations exactly.
      .select(least(col("query_id"), col("neighbor_id")).as("id1"),
        greatest(col("query_id"), col("neighbor_id")).as("id2"), col("cos_sim"))
      .distinct()

  /** IVF-style ANN without a prebuilt index: one-shot form of
    * [[buildIvfIndex]]+[[ivfProbe]] for ad-hoc queries — the assignment is
    * computed inline (a full pass), so for repeated probes build the index
    * instead.
    */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              cents: DataFrame, queryId: Long, k: Int, nProbe: Int): DataFrame = {
    val assign = Embeddings.assignToCentroids(embeddings, idCol, vecCol, cents)
      .select(col(idCol), col("assigned_label"))
    val q = embeddings.filter(col(idCol) === queryId).select(col(vecCol).as("__qvec"))
    val probeLists = cents.join(broadcast(q))
      .select(col("label"), cosine(col("centroid"), col("__qvec")).as("c"))
      .orderBy(desc("c"), col("label"))
      .limit(nProbe)
      .select(col("label").as("assigned_label"))
    val candidates = embeddings
      .join(assign, idCol)
      .join(broadcast(probeLists), Seq("assigned_label"), "left_semi")
    candidates.join(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col(vecCol), col("__qvec")).as("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }
}

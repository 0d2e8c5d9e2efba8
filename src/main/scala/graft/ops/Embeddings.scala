package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational.dsum

/** Embedding-column analytics beyond search: per-label centroids and
  * centroid-based assignment — the building blocks of clustering /
  * classification passes over a 100 TB embedding store.
  *
  * Centroids use posexplode + (label, pos) hash aggregation: fully
  * codegen'd, map-side combinable, and shuffling only (labels × dims)
  * aggregated cells — never whole vectors. Sums go through the DECIMAL
  * determinism contract so the DuckDB oracle matches bit-exactly.
  */
object Embeddings {

  /** Per-label per-dimension centroid components (long form: label, pos,
    * c). 1-based pos to match SQL array indexing in the oracle.
    */
  def centroidComponents(embeddings: DataFrame, labelCol: String,
                         vecCol: String): DataFrame =
    embeddings
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("pos", (col("pos") + 1).cast("long"))
      .groupBy("label", "pos")
      .agg((dsum(col("x").cast("double")) / count(lit(1))).as("c"))

  /** Centroids re-assembled as vectors (label, centroid array<double>). */
  def centroids(embeddings: DataFrame, labelCol: String, vecCol: String): DataFrame =
    centroidComponents(embeddings, labelCol, vecCol)
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label"), transform(col("pc"), p => p.getField("c")).as("centroid"))

  /** Per-row cosine to the corpus MEAN embedding — the k = 1 degenerate
    * of semantic dedup (a single cluster makes SemDeDup's score "cosine
    * to the one centroid" = cosine to the global mean), exposed as the
    * oracle anchor of the label-free k-means family (q113a): the mean
    * rides the q46 DECIMAL determinism contract, the cosine the strict
    * sequential [[Similarity.dot]], so an independent SQL engine
    * reproduces every value bit-exactly. One shuffle of `dim` aggregated
    * cells + a `dim`-value driver collect; the scoring half is a
    * codegen'd per-row expression over the scan.
    */
  def cosineToMean(embeddings: DataFrame, idCol: String,
                   vecCol: String): DataFrame = {
    val mu = embeddings
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg((dsum(col("x").cast("double")) / count(lit(1))).as("c"))
      .orderBy("pos").select("c").collect().map(_.getDouble(0)).toSeq
    val v = transform(col(vecCol), x => x.cast("double"))
    embeddings.select(col(idCol),
      Similarity.cosine(v, typedLit(mu)).as("cos_to_mean"))
  }

  /** Symmetric int8 scalar quantization (long form: id, pos, q) — the 4×
    * storage cut for a 100 TB embedding store. q = floor(x·127/amax + 0.5):
    * floor-plus-half instead of round() because double round() half-cases
    * are not portable across engines, floor is. 1-based pos (SQL array
    * convention, as [[centroidComponents]]).
    */
  def quantizeInt8(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val amax = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    embeddings
      .withColumn("__amax", amax)
      .select(col(idCol), col("__amax"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idCol), (col("pos") + 1).cast("int").as("pos"),
        when(col("__amax") === 0.0, lit(0))
          .otherwise(floor(col("x").cast("double") * 127.0 / col("__amax") + 0.5))
          .cast("int").as("q"))
  }

  /** One-pass population moments of a vector column via
    * [[graft.functions.VectorMomentsAgg]]: (n, Σx, upper-tri Σxxᵀ),
    * collected as the single aggregate row. The only data movement is the
    * O(d²)-double partial buffers.
    */
  def moments(embeddings: DataFrame, vecCol: String, dim: Int)
      : (Long, Array[Double], Array[Double]) = {
    val r = embeddings
      .agg(graft.functions.VectorMomentsAgg.vector_moments(col(vecCol), dim).as("m"))
      .select("m.n", "m.s", "m.ss").head()
    (r.getLong(0), r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray)
  }

  /** Population covariance from already-collected moments:
    * cov(i,j) = Σxy/n − μᵢμⱼ (driver-side arithmetic, no data pass).
    */
  private def covFromMoments(n: Long, s: Array[Double], ss: Array[Double],
                             dim: Int): Array[Array[Double]] = {
    require(n > 0, s"covariance needs rows, got n=$n")
    val mu = s.map(_ / n)
    val c = Array.ofDim[Double](dim, dim)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = ss(k) / n - mu(i) * mu(j)
        c(i)(j) = v; c(j)(i) = v
        k += 1; j += 1
      }
      i += 1
    }
    c
  }

  /** Population covariance matrix of a vector column (one [[moments]] pass). */
  def covarianceMatrix(embeddings: DataFrame, vecCol: String, dim: Int)
      : Array[Array[Double]] = {
    val (n, s, ss) = moments(embeddings, vecCol, dim)
    covFromMoments(n, s, ss, dim)
  }

  /** Cyclic-Jacobi eigendecomposition of a symmetric matrix (driver-side;
    * d ≤ a few hundred — the d×d covariance is always metadata-sized no
    * matter how many rows produced it). Returns (eigenvalues, eigenvectors
    * as rows), sorted by eigenvalue DESC with deterministic tie-break and
    * sign convention (largest-|component| entry positive, lowest index on
    * ties) so reruns and re-partitionings yield the same basis.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag: Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < 64 && offDiag > 1e-20) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq; a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi; a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq; v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { c =>
      val col = Array.tabulate(d)(r => v(r)(c))
      val pivot = col.indices.maxBy(i => (math.abs(col(i)), -i))
      if (col(pivot) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** Top-k PCA basis of the embedding store: (eigenvalues, components k×d). */
  def pcaBasis(embeddings: DataFrame, vecCol: String, dim: Int, k: Int)
      : (Array[Double], Array[Array[Double]]) = {
    require(k >= 1 && k <= dim, s"k=$k out of range [1, $dim]")
    val (vals, vecs) = jacobiEigen(covarianceMatrix(embeddings, vecCol, dim))
    (vals.take(k), vecs.take(k))
  }

  /** Project every vector onto the top-k principal components (long form:
    * id, pos 1..k, p). `whiten=true` scales each component by 1/√λ so the
    * output has ~unit variance per dimension — the standard preprocessing
    * before quantization or cosine ANN. ONE moments pass serves both the
    * mean and the eigenbasis (at a 100 TB store a second aggregation pass
    * is the dominant cost); the basis enters the plan as literals, so the
    * projection itself is one narrow codegen'd map over the store —
    * no shuffle, no join.
    */
  def pcaProject(embeddings: DataFrame, idCol: String, vecCol: String,
                 dim: Int, k: Int, whiten: Boolean = false): DataFrame = {
    require(k >= 1 && k <= dim, s"k=$k out of range [1, $dim]")
    val (n, s, ss) = moments(embeddings, vecCol, dim)
    require(n > 0, "pcaProject needs a non-empty store")
    val mu = s.map(_ / n)
    val (vals0, vecs0) = jacobiEigen(covFromMoments(n, s, ss, dim))
    val (vals, comps) = (vals0.take(k), vecs0.take(k))
    val muLit = typedLit(mu.toSeq)
    val centered = zip_with(col(vecCol), muLit, (x, m) => x.cast("double") - m)
    val projCols = (0 until k).map { j =>
      val raw = graft.functions.Vec.dot(centered, typedLit(comps(j).toSeq))
      val scaled =
        if (whiten && vals(j) > 0.0) raw / math.sqrt(vals(j)) else raw
      scaled.as(s"p$j")
    }
    embeddings
      .select(col(idCol), array(projCols: _*).as("proj"))
      .select(col(idCol), posexplode(col("proj")).as(Seq("pos0", "p")))
      .select(col(idCol), (col("pos0") + 1).cast("int").as("pos"), col("p"))
  }

  /** Assign each vector to the nearest centroid by cosine (broadcast the
    * centroid table; linear scan, no shuffle).
    */
  def assignToCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                        cents: DataFrame): DataFrame = {
    // embeddings may carry its own `label`; keep the centroid's distinct
    val c = cents.select(col("label").as("__clabel"), col("centroid"))
    val scored = embeddings.join(broadcast(c))
      .select(col(idCol), col("__clabel"),
        Similarity.cosine(col(vecCol), col("centroid")).as("cos_sim"))
    Relational.topKPerGroup(scored, idCol, 1, "cos_sim", "__clabel")
      .select(col(idCol), col("__clabel").as("assigned_label"), col("cos_sim"))
  }

  /** [[assignToCentroids]]' Euclidean sibling: nearest centroid by L2
    * distance (the metric product quantization and classic Lloyd use).
    * argmin ‖x−c‖² = argmin (‖c‖² − 2⟨x,c⟩) — ‖x‖² is constant per row,
    * so the scan computes one dot per centroid and never a subtraction
    * loop; ties break to the ascending label like the cosine form.
    */
  def assignToCentroidsL2(embeddings: DataFrame, idCol: String, vecCol: String,
                          cents: DataFrame): DataFrame = {
    val c = cents.select(col("label").as("__clabel"), col("centroid"))
    val scored = embeddings.join(broadcast(c))
      .select(col(idCol), col("__clabel"),
        (Similarity.dot(col("centroid"), col("centroid"))
          - lit(2.0) * Similarity.dot(col(vecCol), col("centroid"))).as("__part"))
    // topKPerGroup keeps the MAX of its rank column → rank by the negated
    // partial distance
    Relational.topKPerGroup(scored.withColumn("__rank", -col("__part")),
        idCol, 1, "__rank", "__clabel")
      .select(col(idCol), col("__clabel").as("assigned_label"))
  }

  /** Deterministic Lloyd k-means over the embedding store — cosine
    * assignment by default (the spherical shape [[assignToCentroids]]
    * uses), `metric = "l2"` for the Euclidean form ([[pqTrain]]'s
    * sub-quantizers). Init is
    * content-deterministic — the k rows with the smallest
    * (xxhash64(id), id) seed the codebook — so the fit reproduces across
    * runs, partitionings and cluster sizes (no `rand()`, the [[Sampling]]
    * discipline). Each iteration is one broadcast assignment plus one
    * cell-level mean under the DECIMAL determinism contract
    * ([[centroidComponents]]' aggregation, so the means are
    * partition-order independent too); the k×d codebook lives on the
    * driver between passes (metadata-sized at any corpus scale). Empty
    * clusters keep their previous centroid. Returns (label, centroid),
    * the [[centroids]] shape. Cache the input first: the fit makes
    * `iters + 1` passes over it.
    */
  def kmeansFit(embeddings: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int, metric: String = "cosine"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(k >= 1, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(metric == "cosine" || metric == "l2", s"unknown metric: $metric")
    val seeds = embeddings
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[Seq[Double]].collect()
    require(seeds.length == k, s"k=$k exceeds the ${seeds.length} input rows")
    var codebook: Seq[(Int, Seq[Double])] = seeds.toSeq.zipWithIndex.map(_.swap)
    for (_ <- 0 until iters) {
      val cents = codebook.toDF("label", "centroid")
      val assigned = (if (metric == "l2")
          assignToCentroidsL2(embeddings, idCol, vecCol, cents)
        else assignToCentroids(embeddings, idCol, vecCol, cents))
        .select(col(idCol), col("assigned_label"))
      val next = centroids(embeddings.join(assigned, Seq(idCol)),
          "assigned_label", vecCol)
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      codebook = codebook.map { case (l, old) => (l, next.getOrElse(l, old)) }
    }
    codebook.toDF("label", "centroid")
  }

  /** Mean cosine distance (1 − cos) to the assigned centroid — the
    * spherical k-means objective; non-increasing over [[kmeansFit]]
    * iterations (spec-asserted).
    */
  def kmeansObjective(embeddings: DataFrame, idCol: String, vecCol: String,
                      cents: DataFrame): Double =
    assignToCentroids(embeddings, idCol, vecCol, cents)
      .agg(avg(lit(1.0) - col("cos_sim"))).head().getDouble(0)

  // ---- product quantization (Jégou, Douze, Schmid 2011) -----------------

  /** (id, sub, __sub) — every vector exploded into its m contiguous
    * sub-vectors; the shared shape of joint PQ training and encoding.
    */
  private def explodeSubs(embeddings: DataFrame, idCol: String, vecCol: String,
                          dim: Int, m: Int): DataFrame = {
    val d = dim / m
    embeddings.select(col(idCol), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"), slice(col(vecCol), s * d + 1, d).as("__sub"))): _*))
        .as("e"))
      .select(col(idCol), col("e.sub").as("sub"), col("e.__sub").as("__sub"))
  }

  /** Per-(id, sub) nearest sub-centroid by L2 over the broadcast m·k
    * codebook — one job for ALL subspaces (the window keys on (id, sub):
    * corpus-cardinality, perfectly spread). Same argmin identity and
    * ascending-label ties as [[assignToCentroidsL2]].
    */
  private def assignSubs(subs: DataFrame, idCol: String,
                         codebooks: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = codebooks.select(col("sub"), col("label"), col("centroid"))
    val scored = subs.join(broadcast(cb), Seq("sub"))
      .withColumn("__rank",
        lit(2.0) * Similarity.dot(col("__sub"), col("centroid"))
          - Similarity.dot(col("centroid"), col("centroid")))
    scored.withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol), col("sub"))
          .orderBy(desc("__rank"), col("label"))))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("sub"), col("label"), col("__sub"))
  }

  /** Train an m-subspace product quantizer: split each vector into m
    * contiguous sub-vectors of dim/m dims and fit m independent L2
    * codebooks of k centroids JOINTLY — one assignment job + one
    * DECIMAL-contract mean job per Lloyd iteration covers every subspace
    * (the m separate fits would re-scan the corpus m times per
    * iteration; at 100 TB the scan count is the cost). Init is the same
    * content-deterministic rule as [[kmeansFit]] — the k rows with the
    * smallest (xxhash64(id), id) seed every subspace's codebook — so the
    * joint fit is bit-identical to m independent `kmeansFit(metric="l2")`
    * runs over the slices (spec-asserted). Returns (sub, label,
    * centroid): m·k rows, metadata-sized. Storage story: codes are m
    * small ints per vector (m bytes at k ≤ 256) vs dim floats — a
    * 4·dim/m× cut (64× at dim=64, m=4), far past int8's fixed 4×, with
    * [[pqAdcTopK]] scoring straight on the codes.
    */
  def pqTrain(embeddings: DataFrame, idCol: String, vecCol: String,
              dim: Int, m: Int, k: Int, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val d = dim / m
    val seeds = embeddings
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[Seq[Double]].collect()
    require(seeds.length == k, s"k=$k exceeds the ${seeds.length} input rows")
    var codebook: Seq[(Int, Int, Seq[Double])] =
      for (s <- 0 until m; (v, l) <- seeds.zipWithIndex)
        yield (s, l, v.slice(s * d, (s + 1) * d))
    val subs = explodeSubs(embeddings, idCol, vecCol, dim, m)
    for (_ <- 0 until iters) {
      val cents = codebook.toDF("sub", "label", "centroid")
      val next = assignSubs(subs, idCol, cents)
        .select(col("sub"), col("label"), posexplode(col("__sub")).as(Seq("pos", "x")))
        .groupBy("sub", "label", "pos")
        .agg((dsum(col("x").cast("double")) / count(lit(1))).as("c"))
        .groupBy("sub", "label")
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("sub"), col("label"),
          transform(col("pc"), p => p.getField("c")).as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toSeq).toMap
      codebook = codebook.map { case (s, l, old) =>
        (s, l, next.getOrElse((s, l), old))
      }
    }
    codebook.toDF("sub", "label", "centroid")
  }

  /** Encode every vector as its m nearest-sub-centroid labels (one
    * `codes` array<int> per row), all subspaces in ONE assignment job
    * plus one per-id regroup — never m passes or m joins.
    */
  def pqEncode(embeddings: DataFrame, idCol: String, vecCol: String,
               codebooks: DataFrame, dim: Int, m: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    assignSubs(explodeSubs(embeddings, idCol, vecCol, dim, m), idCol, codebooks)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("sub"), col("label")))).as("sl"))
      .select(col(idCol),
        transform(col("sl"), p => p.getField("label")).as("codes"))
  }

  /** Asymmetric-distance top-k over PQ codes: the query builds one
    * m×k inner-product lookup table on the driver (tiny — it scores the
    * codebook, not the corpus), the table enters the plan as array
    * literals, and every code row scores with m `element_at`s + adds —
    * a codegen'd narrow map over m-byte codes instead of dim-float
    * vectors, the PQ scan economics. Approximates ⟨q,x⟩ by
    * Σ_s ⟨q_s, centroid(s, code_s)⟩; exact when vectors sit on their
    * centroids (spec), recall-checked against the exact scan otherwise.
    */
  def pqAdcTopK(codes: DataFrame, idCol: String, codebooks: DataFrame,
                queryVec: Seq[Double], m: Int, topK: Int): DataFrame = {
    val d = queryVec.length / m
    val cb = codebooks.select(col("sub"), col("label"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2))
      .toMap
    val tables: Seq[Seq[(Int, Double)]] = (0 until m).map { s =>
      val qs = queryVec.slice(s * d, (s + 1) * d)
      cb.keys.filter(_._1 == s).map(_._2).toSeq.sorted.map { l =>
        l -> cb((s, l)).zip(qs).map { case (c, q) => c * q }.sum
      }
    }
    val score = (0 until m).foldLeft(lit(0.0)) { (acc, s) =>
      // labels are dense 0..k-1 (kmeansFit construction): element_at is a
      // direct 1-based index into the per-subspace table literal
      acc + element_at(array(tables(s).map(t => lit(t._2)): _*),
        col("codes").getItem(s) + 1)
    }
    codes.select(col(idCol), score.as("adc_score"))
      .orderBy(desc("adc_score"), col(idCol))
      .limit(topK)
  }
}

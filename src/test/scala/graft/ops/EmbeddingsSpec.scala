package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = Seq(
    (0L, Seq(1.0f, 0.0f), 0),
    (1L, Seq(3.0f, 0.0f), 0),
    (2L, Seq(0.0f, 2.0f), 1),
    (3L, Seq(0.0f, 4.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("centroids average per label and dimension") {
    val c = Embeddings.centroids(embs, "label", "embedding")
      .as[(Int, Seq[Double])].collect().toMap
    assert(c(0) == Seq(2.0, 0.0))
    assert(c(1) == Seq(0.0, 3.0))
  }

  test("assignToCentroids sends each vector to its own label's centroid") {
    val cents = Embeddings.centroids(embs, "label", "embedding")
    val got = Embeddings.assignToCentroids(embs, "vec_id", "embedding", cents)
      .select("vec_id", "assigned_label").as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("int8 quantization: symmetric, max maps to ±127, zero vector to 0") {
    val v = Seq(
      (0L, Seq(2.0f, -1.0f, 0.0f)),
      (1L, Seq(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Embeddings.quantizeInt8(v, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(q((0L, 1)) == 127)   // amax element
    assert(q((0L, 2)) == -63)   // floor(-63.5 + 0.5) = -63
    assert(q((0L, 3)) == 0)
    assert(Seq(1, 2, 3).forall(p => q((1L, p)) == 0)) // zero vector guard
  }

  test("quantization round-trip error is bounded by amax/254 (seeded property)") {
    val r = new scala.util.Random(7)
    val rows = (0L until 50L).map(i => (i, Seq.fill(16)((r.nextFloat() - 0.5f) * 10f)))
    val df = rows.toDF("vec_id", "embedding")
    val q = Embeddings.quantizeInt8(df, "vec_id", "embedding").collect()
      .map(row => (row.getLong(0), row.getInt(1)) -> row.getInt(2)).toMap
    rows.foreach { case (id, vec) =>
      val amax = vec.map(x => math.abs(x.toDouble)).max
      vec.zipWithIndex.foreach { case (x, i) =>
        val deq = q((id, i + 1)) * amax / 127.0
        assert(math.abs(x.toDouble - deq) <= amax / 254.0 + 1e-9,
          s"id=$id pos=${i + 1} x=$x deq=$deq")
      }
    }
  }

  // ---- moments / PCA ---------------------------------------------------

  private def randomStore(n: Int, d: Int, seed: Int) = {
    val r = new scala.util.Random(seed)
    // correlated data: dims 0/1 strongly coupled so PCA has a clear axis
    (0L until n.toLong).map { i =>
      val base = r.nextGaussian()
      val v = Array.tabulate(d) {
        case 0 => (base * 3.0 + r.nextGaussian() * 0.1).toFloat
        case 1 => (base * 2.0 + r.nextGaussian() * 0.1).toFloat
        case _ => (r.nextGaussian() * 0.5).toFloat
      }
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("vector_moments agrees with the explode-based sums; skips bad rows") {
    val d = 6
    val good = randomStore(40, d, 11)
    val bad = Seq((100L, Seq(1.0f, 2.0f)), (101L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val (n, s, ss) = Embeddings.moments(good.union(bad), "embedding", d)
    assert(n == 40) // wrong-length and null rows ignored
    val rows = good.select("embedding").as[Seq[Float]].collect()
    val expS = Array.tabulate(d)(i => rows.map(_(i).toDouble).sum)
    (0 until d).foreach(i => assert(math.abs(s(i) - expS(i)) < 1e-9))
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      val exp = rows.map(v => v(i).toDouble * v(j).toDouble).sum
      assert(math.abs(ss(k) - exp) < 1e-9, s"ss($i,$j)")
      k += 1
    }
  }

  test("jacobiEigen reconstructs the matrix with an orthonormal basis") {
    val r = new scala.util.Random(3)
    val d = 8
    val half = Array.fill(d, d)(r.nextGaussian())
    val sym = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => half(i)(k) * half(j)(k)).sum)
    val (vals, vecs) = Embeddings.jacobiEigen(sym)
    assert(vals.sorted.reverse.sameElements(vals)) // sorted desc
    for (a <- 0 until d; b <- 0 until d) {
      val dotAB = (0 until d).map(i => vecs(a)(i) * vecs(b)(i)).sum
      assert(math.abs(dotAB - (if (a == b) 1.0 else 0.0)) < 1e-9, s"ortho($a,$b)")
      // Σ_k λ_k v_k[a] v_k[b] == sym(a)(b)
      val rec = (0 until d).map(k => vals(k) * vecs(k)(a) * vecs(k)(b)).sum
      assert(math.abs(rec - sym(a)(b)) < 1e-8, s"reconstruct($a,$b)")
    }
  }

  test("pcaProject: component variances equal eigenvalues; whitening normalizes") {
    val d = 6
    val store = randomStore(300, d, 5)
    val (vals, _) = Embeddings.pcaBasis(store, "embedding", d, 3)
    assert(vals(0) > vals(1)) // the engineered dominant axis
    val proj = Embeddings.pcaProject(store, "vec_id", "embedding", d, 3)
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    (1 to 3).foreach { pos =>
      val xs = proj.filter(_._1 == pos).map(_._2)
      val mean = xs.sum / xs.length
      val popVar = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      assert(math.abs(popVar - vals(pos - 1)) < 1e-6 * math.max(1.0, vals(pos - 1)),
        s"var(pos=$pos)=$popVar vs λ=${vals(pos - 1)}")
      assert(math.abs(mean) < 1e-9, "projection of centered data has zero mean")
    }
    val white = Embeddings.pcaProject(store, "vec_id", "embedding", d, 3, whiten = true)
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    (1 to 3).foreach { pos =>
      val xs = white.filter(_._1 == pos).map(_._2)
      val popVar = xs.map(x => x * x).sum / xs.length
      assert(math.abs(popVar - 1.0) < 1e-6, s"whitened var(pos=$pos)=$popVar")
    }
  }

  test("jacobiEigen on arbitrary symmetric matrices (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val genSym = for {
      d <- Gen.chooseNum(1, 10)
      cells <- Gen.listOfN(d * d, Gen.chooseNum(-100.0, 100.0))
    } yield {
      val h = cells.toArray.grouped(d).toArray
      Array.tabulate(d, d)((i, j) => h(i)(j) + h(j)(i)) // symmetric, indefinite
    }
    val prop = Prop.forAll(genSym) { m =>
      val d = m.length
      val (vals, vecs) = Embeddings.jacobiEigen(m)
      val scale = math.max(1.0, m.map(_.map(math.abs).max).max)
      val sortedDesc = vals.zip(vals.tail).forall { case (a, b) => a >= b }
      val ortho = (0 until d).forall(a => (0 until d).forall { b =>
        val dot = (0 until d).map(i => vecs(a)(i) * vecs(b)(i)).sum
        math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8
      })
      val recon = (0 until d).forall(a => (0 until d).forall { b =>
        val r = (0 until d).map(k => vals(k) * vecs(k)(a) * vecs(k)(b)).sum
        math.abs(r - m(a)(b)) < 1e-7 * scale
      })
      sortedDesc && ortho && recon
    }
    val res = check(Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("moments aggregate is partition-layout invariant (within double tolerance)") {
    val store = randomStore(200, 5, 21)
    val (n1, s1, ss1) = Embeddings.moments(store.repartition(13), "embedding", 5)
    val (n2, s2, ss2) = Embeddings.moments(store.coalesce(1), "embedding", 5)
    assert(n1 == n2)
    s1.zip(s2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    ss1.zip(ss2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("kmeansFit is bit-deterministic across partition layouts") {
    val store = randomStore(120, 6, 33).cache()
    val a = Embeddings.kmeansFit(store.repartition(11), "vec_id", "embedding", 4, 3)
      .as[(Int, Seq[Double])].collect().toMap
    val b = Embeddings.kmeansFit(store.coalesce(1), "vec_id", "embedding", 4, 3)
      .as[(Int, Seq[Double])].collect().toMap
    // content-hash init + DECIMAL-contract means: identical bits, not just close
    assert(a == b)
    assert(a.size == 4 && a.values.forall(_.length == 6))
  }

  test("kmeansFit objective is non-increasing over iterations") {
    val store = randomStore(150, 5, 9).cache()
    val objs = (0 to 3).map { it =>
      Embeddings.kmeansObjective(store, "vec_id", "embedding",
        Embeddings.kmeansFit(store, "vec_id", "embedding", 4, it))
    }
    objs.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + 1e-12, s"objective rose: $objs")
    }
  }

  test("assignToCentroidsL2 picks by distance where cosine cannot distinguish") {
    // both centroids point the same direction — cosine ties, L2 doesn't
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(10.0, 0.0))).toDF("label", "centroid")
    val pts = Seq((1L, Seq(2.0f, 0.0f)), (2L, Seq(9.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Embeddings.assignToCentroidsL2(pts, "vec_id", "embedding", cents)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1))
  }

  test("pq: codes are deterministic and ADC is exact when vectors sit on centroids") {
    // 2 subspaces × 4 distinct sub-values: vectors are exactly on the
    // convergent codebook → reconstruction (and thus ADC dot) is exact
    val subVals = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(-1.0f, 0.0f), Seq(0.0f, -1.0f))
    val rows = (0 until 32).map { i =>
      (i.toLong, subVals(i % 4) ++ subVals((i / 4) % 4))
    }
    val e = rows.toDF("vec_id", "embedding").cache()
    val cb = Embeddings.pqTrain(e, "vec_id", "embedding", dim = 4, m = 2,
      k = 4, iters = 4)
    assert(cb.count() == 8)
    val codes = Embeddings.pqEncode(e, "vec_id", "embedding", cb, dim = 4, m = 2)
    val codesRepart = Embeddings.pqEncode(e.repartition(7), "vec_id", "embedding",
      cb, dim = 4, m = 2)
    val cm = codes.as[(Long, Seq[Int])].collect().toMap
    assert(cm == codesRepart.as[(Long, Seq[Int])].collect().toMap) // deterministic
    // same sub-value → same code in that subspace
    assert(rows.groupBy(_._2.take(2)).values.forall { grp =>
      grp.map(r => cm(r._1)(0)).distinct.length == 1
    })
    val q = Seq(0.5, 1.5, -0.5, 2.0)
    val adc = Embeddings.pqAdcTopK(codes, "vec_id", cb, q, m = 2, topK = 32)
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, v) =>
      val exact = v.map(_.toDouble).zip(q).map { case (x, y) => x * y }.sum
      assert(math.abs(adc(id) - exact) < 1e-9, s"id=$id adc=${adc(id)} exact=$exact")
    }
  }

  test("joint pqTrain is bit-identical to m independent per-subspace L2 fits") {
    val store = randomStore(60, 8, 3).cache()
    val joint = Embeddings.pqTrain(store, "vec_id", "embedding",
        dim = 8, m = 2, k = 4, iters = 2)
      .as[(Int, Int, Seq[Double])].collect().toSet
    val separate = (0 until 2).flatMap { s =>
      Embeddings.kmeansFit(
        store.select(col("vec_id"), slice(col("embedding"), s * 4 + 1, 4).as("sub")),
        "vec_id", "sub", 4, 2, metric = "l2")
        .as[(Int, Seq[Double])].collect().map { case (l, c) => (s, l, c) }
    }.toSet
    assert(joint == separate)
  }

  test("pq ADC ranks clustered neighbors like the exact scan (recall)") {
    val r = new scala.util.Random(17)
    val bases = Seq(
      Seq.fill(8)(r.nextGaussian()), Seq.fill(8)(r.nextGaussian()),
      Seq.fill(8)(r.nextGaussian()), Seq.fill(8)(r.nextGaussian()))
    val rows = (0 until 80).map { i =>
      (i.toLong, bases(i % 4).map(x => (x + r.nextGaussian() * 0.05).toFloat))
    }
    val e = rows.toDF("vec_id", "embedding").cache()
    val cb = Embeddings.pqTrain(e, "vec_id", "embedding", dim = 8, m = 2,
      k = 8, iters = 3)
    val codes = Embeddings.pqEncode(e, "vec_id", "embedding", cb, dim = 8, m = 2)
    val q = bases(1).map(_ + 0.01)
    val adcTop = Embeddings.pqAdcTopK(codes, "vec_id", cb, q, m = 2, topK = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    // PQ collapses within-cluster jitter to shared codes, so the exact
    // scan's jitter-ranked order inside the bundle is unrecoverable BY
    // DESIGN — the recall that matters is cluster membership: every ADC
    // hit must come from the query's bundle
    assert(adcTop.forall(_ % 4 == 1), s"adc leaked other bundles: $adcTop")
    // and the exact top-10 is the same bundle (sanity of the fixture)
    val exactTop = rows.sortBy { case (_, v) =>
      -v.map(_.toDouble).zip(q).map { case (x, y) => x * y }.sum
    }.take(10).map(_._1).toSet
    assert(exactTop.forall(_ % 4 == 1), s"fixture drifted: $exactTop")
  }

  test("kmeansFit recovers well-separated clusters; empty clusters keep their seed") {
    // three tight orthogonal bundles; k=3 must land one centroid in each
    val r = new scala.util.Random(5)
    val rows = (0 until 60).map { i =>
      val base = Array(0f, 0f, 0f); base(i % 3) = 1f
      (i.toLong, base.toSeq.map(_ + (r.nextFloat() - 0.5f) * 0.02f))
    }
    val e = rows.toDF("vec_id", "embedding").cache()
    val cents = Embeddings.kmeansFit(e, "vec_id", "embedding", 3, 5)
    val assigned = Embeddings.assignToCentroids(e, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("assigned_label")).as[(Long, Int)].collect()
    // every bundle maps to exactly one distinct label
    val byBundle = assigned.groupBy(_._1 % 3).map { case (b, xs) =>
      b -> xs.map(_._2).distinct
    }
    assert(byBundle.values.forall(_.length == 1), byBundle.toString)
    assert(byBundle.values.flatten.toSet.size == 3)
  }
}

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
}

package graft.ops

import graft.SparkSpec
import graft.functions.Hilbert
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def idx(bits: Int, coords: Long*): Long =
    Hilbert.index(coords.toArray, bits)

  test("Hilbert index is a bijection on the full grid (2-D and 3-D)") {
    val seen2 = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield idx(4, x, y)).toSet
    assert(seen2 == (0L until 256L).toSet)
    val seen3 = (for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield idx(3, x, y, z)).toSet
    assert(seen3 == (0L until 512L).toSet)
  }

  test("consecutive Hilbert indices are always grid neighbors") {
    // the defining curve property (and what Morton lacks): step i → i+1
    // moves exactly one coordinate by exactly 1
    val byIdx = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield (idx(4, x, y), (x, y))).sortBy(_._1).map(_._2)
    byIdx.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      val d = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(d == 1, s"jump from ($x1,$y1) to ($x2,$y2)")
    }
    val byIdx3 = (for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield (idx(3, x, y, z), (x, y, z))).sortBy(_._1).map(_._2)
    byIdx3.sliding(2).foreach { case Seq((x1, y1, z1), (x2, y2, z2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1)
    }
  }

  test("curve locality beats Morton: smaller bounding boxes per block") {
    // bounding-box area of every UNALIGNED 16-cell window of the visit
    // order, summed. Aligned power-of-two blocks tie (both curves make
    // perfect 4×4 squares there); real files don't align, and on sliding
    // windows Morton's diagonal jumps blow the box up while Hilbert's
    // neighbor-step property keeps it tight — the file-pruning win,
    // made concrete.
    def blockArea(order: Seq[(Long, Long)]): Long =
      order.sliding(16, 7).map { b =>
        val xs = b.map(_._1); val ys = b.map(_._2)
        (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
      }.sum
    def morton2(x: Long, y: Long): Long =
      (0 until 5).map { j =>
        (((x >> j) & 1L) << (2 * j)) + (((y >> j) & 1L) << (2 * j + 1))
      }.sum
    val cells = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val h = cells.sortBy { case (x, y) => idx(5, x, y) }
    val m = cells.sortBy { case (x, y) => morton2(x, y) }
    assert(blockArea(h) < blockArea(m),
      s"hilbert=${blockArea(h)} morton=${blockArea(m)}")
  }

  test("withHilbertKey equals the direct transform on a uniform grid") {
    // 4×4 grid: ntile(4) assigns bucket = value exactly, so the column
    // expression must reproduce Hilbert.index((x, y)) verbatim
    val grid = (for (x <- 0L until 4L; y <- 0L until 4L) yield (x, y))
      .toDF("x", "y")
    val got = Zorder.withHilbertKey(grid, Seq("x", "y"), bits = 2)
      .select("x", "y", "__h").as[(Long, Long, Long)].collect()
    assert(got.length == 16)
    got.foreach { case (x, y, h) =>
      assert(h == idx(2, x, y), s"($x,$y): h=$h != ${idx(2, x, y)}")
    }
  }

  test("clusterHilbert rewrite preserves the multiset, commits, and prunes") {
    val t = new graft.table.ManagedTable(spark, tmpDir("hilbert") + "/t")
    val df = graft.model.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_quantity")
    t.overwrite(df.repartition(8))
    t.clusterHilbert(Seq("l_orderkey", "l_partkey"), bits = 4, numFiles = 8)
    assert(t.history(1).collect().head.getAs[String]("operation") == "ZORDER")
    val after = t.read
    assert(after.count() == df.count())
    assert(after.exceptAll(df).isEmpty && df.exceptAll(after).isEmpty)
    // a narrow 2-D box must skip files on the clustered layout
    val (keptK, allK) = t.filesOverlapping("l_orderkey", 0, 100)
    assert(keptK.size < allK.size, s"no pruning: ${keptK.size}/${allK.size}")
    // and the scan stays exact
    val want = df.filter(col("l_orderkey").between(0, 100)
      && col("l_partkey").between(0, 50)).count()
    val got = t.readWhereAll(Seq(("l_orderkey", 0, 100), ("l_partkey", 0, 50)))
      .count()
    assert(got == want)
  }
}

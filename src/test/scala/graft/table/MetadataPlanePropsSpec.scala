package graft.table

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Arbitrary, Gen, Prop}
import org.scalacheck.Prop.forAll

/** Property suite for the metadata-plane primitives BOTH planning venues
  * (driver fold + distributed jobs) build on: the sidecar/checkpoint
  * codecs must round-trip every representable entry (a lossy codec would
  * silently corrupt the stats cache and mis-prune), the ColAgg merge
  * must be a commutative semigroup (executor partial-merge order is
  * arbitrary), and the skipping decision must be SOUND under stat
  * widening (looser bounds may only keep MORE files, never prune one a
  * tighter-stat venue kept).
  */
class MetadataPlanePropsSpec extends AnyFunSuite {
  import MetadataPlane._

  /** Raw-scalacheck runner (no scalatest bridge in the offline cache):
    * 200 cases per property, failing with the shrunk counterexample.
    */
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200),
      prop)
    assert(res.passed, res.status.toString)
  }

  // strings that stress the codec: control chars, tabs (the cell
  // separator), supplementary code points, %-escapes, empties — but only
  // WELL-FORMED UTF-16: the codec's whole input domain is schema names,
  // decoded parquet strings, and code-point-aware truncations, none of
  // which can carry an unpaired surrogate (URLEncoder is lossy on those,
  // by design of UTF-8 itself)
  private def wellFormed(s: String): Boolean =
    new String(s.getBytes("UTF-8"), "UTF-8") == s
  private val nastyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.listOf(Gen.oneOf("\t", "\n", "%", "=", " ", "\"", "\\",
      "\u00df", "\u2260", "\ud83d\udca1", "x")).map(_.mkString),
    Gen.const(""),
    Gen.const("%v2"), // the format marker must never collide
    Arbitrary.arbitrary[String]).suchThat(wellFormed)

  private val statGen: Gen[(String, Stat)] = for {
    c <- nastyString
    k <- Gen.oneOf("i", "d", "s", "D", "T", "t", "n")
    mn <- nastyString
    mx <- nastyString
    nulls <- Gen.oneOf(Gen.const(-1L), Gen.chooseNum(0L, Long.MaxValue / 2))
  } yield (c, (k, mn, mx, nulls))

  private val entryGen: Gen[Entry] = for {
    p <- nastyString.suchThat(_ => true)
    len <- Gen.chooseNum(0L, Long.MaxValue / 2)
    rows <- Gen.chooseNum(0L, Long.MaxValue / 2)
    stats <- Gen.mapOf(statGen)
  } yield Entry(p, len, rows, stats)

  test("sidecar line codec round-trips every entry (v2)") {
    // paths with newlines can't ride a LINE format; the writer only ever
    // sees real filesystem paths, but the codec property should hold for
    // anything line-representable
    val lineSafe = entryGen.suchThat(e =>
      !e.path.exists(c => c == '\n' || c == '\r' || c == '\t'))
    check(forAll(lineSafe) { e =>
      parseLine(sidecarLine(e)) == Some(e)
    })
  }

  test("statsCells codec round-trips every stats map") {
    check(forAll(Gen.mapOf(statGen)) { m =>
      parseStatsCells(statsCells(m)) == m
    })
  }

  test("mergeColAgg is commutative and associative on nulls/known, and " +
      "kind-stable") {
    val aggGen: Gen[ColAgg] = for {
      k <- Gen.oneOf("i", "d", "s", "D", "T", "t", "n", "!", "#")
      mn <- Gen.chooseNum(-1000000L, 1000000L).map(_.toString)
      mx <- Gen.chooseNum(-1000000L, 1000000L).map(_.toString)
      nulls <- Gen.oneOf(Gen.const(-1L), Gen.chooseNum(0L, 1000000L))
      known <- Gen.chooseNum(0L, 1000000L)
    } yield ColAgg(k, mn, mx, nulls, known)
    // numeric-looking bounds: the i/d kinds compare via numLeq, so the
    // generator stays in parseable space (the real writers guarantee it)
    check(forAll(aggGen, aggGen, aggGen) { (a, b, c) =>
      val ab = mergeColAgg(a, b); val ba = mergeColAgg(b, a)
      val abc1 = mergeColAgg(mergeColAgg(a, b), c)
      val abc2 = mergeColAgg(a, mergeColAgg(b, c))
      // bounds comparisons for "s" use utf8Leq on the numeric strings —
      // fine, any total order merges associatively
      Prop(ab == ba) && Prop(abc1 == abc2)
    })
  }

  test("keepForRange is sound under stat widening: looser bounds never " +
      "prune a file tighter bounds kept") {
    val boundsGen = for {
      lo <- Gen.chooseNum(-10000L, 10000L)
      hi <- Gen.chooseNum(-10000L, 10000L)
    } yield decodeBounds(math.min(lo, hi), math.max(lo, hi), "UTC").get
    val fileGen = for {
      mn <- Gen.chooseNum(-10000L, 10000L)
      mx <- Gen.chooseNum(-10000L, 10000L)
      widen <- Gen.chooseNum(0L, 5000L)
      rows <- Gen.chooseNum(1L, 1000L)
    } yield (math.min(mn, mx), math.max(mn, mx), widen, rows)
    check(forAll(fileGen, boundsGen) { case ((mn, mx, w, rows), b) =>
      def stat(lo: Long, hi: Long): Option[Stat] =
        Some(("i", lo.toString, hi.toString, 0L))
      val tight = keepForRange(stat(mn, mx), rows, b)
      val wide = keepForRange(stat(mn - w, mx + w), rows, b)
      // soundness: widening the recorded range can only ADD overlap
      Prop(!tight || wide)
    })
  }

  test("keepForRange with missing or unusable stats always keeps") {
    val boundsGen = for {
      lo <- Gen.chooseNum(-10000L, 10000L)
      hi <- Gen.chooseNum(-10000L, 10000L)
    } yield decodeBounds(math.min(lo, hi), math.max(lo, hi), "UTC").get
    check(forAll(boundsGen, Gen.chooseNum(1L, 100L)) { (b, rows) =>
      Prop(keepForRange(None, rows, b)) &&
        // "n" kind with surviving non-null rows: conservative keep
        Prop(keepForRange(Some(("n", "", "", 0L)), rows, b))
    })
  }

  test("partitionSegments inverts Hive-style escaping for any values") {
    val valGen = nastyString.suchThat(s =>
      s.nonEmpty && !s.exists(c => c == '\n' || c == '\r'))
    check(forAll(valGen, valGen) { (c, v) =>
      val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      val path = s"/w/t/${esc.escapePathName(c)}=${esc.escapePathName(v)}/f.parquet"
      partitionSegments(path) == Seq((c, v))
    })
  }
}

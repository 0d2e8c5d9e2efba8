package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the LAST ~2000 chars of Bench's stdout. r12's
  * artifact lost value/calib/spreadTotal to that window exactly when its
  * ~11% host inflation needed certifying. These cases pin the property
  * that matters: the compact line's certificate (value, calib,
  * calibAttempts, spreadTotal) and the spreadSlow map survive a
  * 2000-char tail cut at the realistic query-count scale, and the full
  * (file) line stays parseable JSON.
  */
class BenchLineSpec extends AnyFunSuite {

  // 170 entries at realistic key/value widths — slightly above the
  // current 164-query ledger so the pin doesn't rot as queries land.
  private val entries: Map[String, (Double, Double)] =
    (1 to 170).map { i =>
      f"q$i%03d" -> (i * 0.0173 % 4.0 + 0.05, i * 0.0031 % 0.4)
    }.toMap

  private def compact: String = Bench.renderLine(
    entries, v => f"$v%.3f", withSpread = false,
    total = 102.654, spreadTotal = 8.217, calib = 0.158,
    calibAttempts = 2, sfDir = "/root/testdata/sf0.1", calibEnd = 0.162)

  test("certificate fields survive the driver's 2000-char tail capture") {
    val line = compact
    assert(line.length > 2000, // the hazard is real at this scale
      s"line only ${line.length} chars — truncation pin is vacuous")
    val tail = line.takeRight(2000)
    for (field <- Seq("\"value\":102.654", "\"calib\":0.158",
        "\"calibAttempts\":2", "\"calibEnd\":0.162", "\"spreadTotal\":8.217"))
      assert(tail.contains(field), s"$field missing from 2000-char tail")
  }

  test("spreadSlow carries the 10 slowest queries and sits in the tail") {
    val line = compact
    val tail = line.takeRight(2000)
    val anchor = "\"spreadSlow\":{"
    assert(tail.contains(anchor))
    val body = tail.substring(tail.indexOf(anchor) + anchor.length,
      tail.indexOf('}', tail.indexOf(anchor)))
    val keys = body.split(',').map(_.split(':')(0).replace("\"", "")).toSet
    val slowest = entries.toSeq.sortBy(-_._2._1).take(10).map(_._1).toSet
    assert(keys == slowest, s"spreadSlow keys $keys != slowest $slowest")
  }

  test("both line variants parse as JSON with the certificate present") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    for (line <- Seq(compact, Bench.renderLine(entries, _.toString,
        withSpread = true, total = 102.654, spreadTotal = 8.217,
        calib = 0.158, calibAttempts = 2, sfDir = "/root/testdata/sf0.1"))) {
      val node = mapper.readTree(line)
      assert(node.get("value").asDouble() == 102.654)
      assert(node.get("calib").asDouble() == 0.158)
      assert(node.get("spreadTotal").asDouble() == 8.217)
      assert(node.get("queries").size() == entries.size)
    }
  }

  test("summary line is a complete JSON object inside any tail window") {
    // The summary is emitted as the very LAST stdout line, after the
    // compact line — so the driver's tail capture always ENDS with it.
    // Pin: it parses standalone, is far under the 2000-char window even
    // with a long sfDir, and carries every verdict-bearing aggregate.
    val line = Bench.renderSummary(total = 102.654, spreadTotal = 8.217,
      calib = 0.158, calibAttempts = 2, calibEnd = 0.162, nQueries = 170,
      sfDir = "/root/testdata/sf0.1")
    assert(line.length < 250, s"summary too long (${line.length}) to be " +
      "tail-proof alongside a trailing newline and stray log residue")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "summary")
    assert(node.get("value").asDouble() == 102.654)
    assert(node.get("calib").asDouble() == 0.158)
    assert(node.get("calibAttempts").asInt() == 2)
    assert(node.get("calibEnd").asDouble() == 0.162)
    assert(node.get("spreadTotal").asDouble() == 8.217)
    assert(node.get("nQueries").asInt() == 170)
    // the whole-stdout shape the driver sees: compact line + summary line;
    // a 2000-char tail of that stream still contains the full summary.
    val stream = compact + "\n" + line + "\n"
    val tail = stream.takeRight(2000)
    val last = tail.split('\n').filter(_.nonEmpty).last
    assert(mapper.readTree(last).get("metric").asText() == "summary")
  }

  test("loadReference's queries-anchor parse still works on the new layout") {
    // loadReference anchors on "queries":{ and stops at the first '}' —
    // the reorder must keep the queries object flat and present.
    val full = Bench.renderLine(entries, _.toString, withSpread = true,
      total = 1.0, spreadTotal = 0.1, calib = 0.1, calibAttempts = 1,
      sfDir = "x")
    val anchor = "\"queries\":{"
    val start = full.indexOf(anchor)
    assert(start >= 0)
    val body = full.substring(start + anchor.length,
      full.indexOf('}', start + anchor.length))
    val parsed = body.split(',').flatMap { kv =>
      kv.split(':') match {
        case Array(k, v) => v.toDoubleOption.map(
          k.trim.stripPrefix("\"").stripSuffix("\"") -> _)
        case _ => None
      }
    }.toMap
    assert(parsed.size == entries.size)
    assert(math.abs(parsed("q001") - entries("q001")._1) < 1e-9)
  }
}

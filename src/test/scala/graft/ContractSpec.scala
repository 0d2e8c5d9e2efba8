package graft

/** Driver-contract integrity: a typo'd oracle key or a query that throws
  * would silently weaken the correctness gate — fail the build instead.
  */
class ContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every oracleSql key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("every query executes at sf0.001 with sane, unique column names") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val cols = df.columns
        assert(cols.nonEmpty && cols.distinct.length == cols.length,
          s"$name: duplicate/empty columns ${cols.mkString(",")}")
        df.count() // must execute
      } catch {
        case e: Throwable => failures += s"$name: ${e.getMessage.take(120)}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows with the flagship schema") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("total_amount"))
  }
}

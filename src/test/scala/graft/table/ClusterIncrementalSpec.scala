package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Liquid-style incremental clustering: only files appended since the
  * last clustering pass are rewritten; the already-clustered majority of
  * the table never moves.
  */
class ClusterIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def liveFiles(t: ManagedTable): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(t.path))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(_.getAbsolutePath).toSet
  }

  private def mkRows(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, i % 97, s"r$i")).toDF("id", "k", "s")

  test("second pass moves only the appended files") {
    val t = new ManagedTable(spark, tmpDir("clinc") + "/t")
    t.overwrite(mkRows(0, 5000).repartition(4))
    t.clusterIncremental(Seq("id", "k"))
    val afterFull = liveFiles(t)

    t.append(mkRows(5000, 5500).repartition(2))
    val appended = liveFiles(t) -- afterFull
    assert(appended.nonEmpty)

    t.clusterIncremental(Seq("id", "k"))
    val afterInc = liveFiles(t)
    // every file of the full pass survives untouched; every appended
    // file was rewritten
    assert(afterFull.subsetOf(afterInc), "clustered files must not move")
    assert((appended & afterInc).isEmpty, "appended files must be rewritten")
    // all rows intact, exactly once
    assert(t.read.count() == 5500)
    assert(t.read.agg(sum("id")).as[Long].head() == 5499L * 5500 / 2)
  }

  test("no new files means no new commit") {
    val t = new ManagedTable(spark, tmpDir("clinc-noop") + "/t")
    t.overwrite(mkRows(0, 1000))
    t.clusterIncremental(Seq("id"))
    val v = t.version
    t.clusterIncremental(Seq("id"))
    assert(t.version == v, "idle incremental pass must be a no-op")
  }

  test("changed column set forces a full re-layout") {
    val t = new ManagedTable(spark, tmpDir("clinc-cols") + "/t")
    t.overwrite(mkRows(0, 2000).repartition(3))
    t.clusterIncremental(Seq("id"))
    val before = liveFiles(t)
    t.clusterIncremental(Seq("k"))
    // different keys: nothing on disk counts as clustered — all move
    assert((before & liveFiles(t)).isEmpty, "stale layout must be rewritten")
    assert(t.read.count() == 2000)
  }

  test("plain OPTIMIZE on a clusterBy table runs the incremental pass") {
    val t = new ManagedTable(spark, tmpDir("clinc-sql") + "/t")
    t.overwrite(mkRows(0, 3000).repartition(3))
    t.setProperties(Map("graft.clusterBy" -> "id,k"))
    graft.sql.GraftSql.sql(spark, s"OPTIMIZE '${t.path}'").collect()
    val afterFull = liveFiles(t)
    assert(t.history().select("operation").as[String].collect()
      .contains("CLUSTER(id,k;hilbert)"))

    t.append(mkRows(3000, 3200))
    graft.sql.GraftSql.sql(spark, s"OPTIMIZE '${t.path}'").collect()
    assert(afterFull.subsetOf(liveFiles(t)), "incremental, not full")
    assert(t.read.count() == 3200)
    // DESCRIBE DETAIL surfaces the declared clustering keys (Delta's
    // clusteringColumns field), both via the API and the SQL command
    assert(t.detail().select("clustering_columns").as[Seq[String]].head() ==
      Seq("id", "k"))
    assert(graft.sql.GraftSql.sql(spark, s"DESCRIBE DETAIL '${t.path}'")
      .select("clustering_columns").as[Seq[String]].head() == Seq("id", "k"))
  }

  test("deletion vectors drop their rows when the file is re-clustered") {
    val t = new ManagedTable(spark, tmpDir("clinc-dv") + "/t")
    t.overwrite(mkRows(0, 1000))
    t.clusterIncremental(Seq("id"))
    t.append(mkRows(1000, 1200))
    t.deleteVectored(col("id") >= lit(1100L), Nil)
    t.clusterIncremental(Seq("id"))
    assert(t.read.count() == 1100)
    assert(t.read.filter(col("id") >= 1100).count() == 0)
  }
}

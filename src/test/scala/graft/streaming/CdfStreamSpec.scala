package graft.streaming

import graft.SparkSpec
import graft.table.ManagedTable
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Streaming change-data-feed over a managed table: per-commit diffs with
  * version-number offsets, including merge-on-read (deletion-vector)
  * deletes.
  */
class CdfStreamSpec extends SparkSpec {
  import spark.implicits._

  test("change stream emits insert/update/delete per commit with versions") {
    val t = new ManagedTable(spark, tmpDir("cdf-src") + "/t")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val q = t.readChangeStream(Seq("k"))
      .writeStream.format("memory").queryName("cdf_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // default start = current version: the seed data is NOT replayed
      assert(spark.table("cdf_sink").count() == 0)

      t.merge(Seq((2L, "B"), (3L, "C")).toDF("k", "v"), Seq("k"))
      q.processAllAvailable()
      val afterMerge = spark.table("cdf_sink")
        .select("k", "v", "change_type", "graft_commit_version")
        .as[(Long, String, String, Long)].collect().toSet
      assert(afterMerge == Set(
        (2L, "B", "update", 1L), (3L, "C", "insert", 1L)))

      // a vectored (merge-on-read) delete surfaces as a CDF delete too
      t.deleteVectored(col("k") === 1)
      q.processAllAvailable()
      val deletes = spark.table("cdf_sink")
        .filter(col("change_type") === "delete")
        .select("k", "graft_commit_version").as[(Long, Long)].collect().toSeq
      assert(deletes == Seq((1L, 2L)))
      // graft_commit_timestamp (Delta's _commit_timestamp): every change
      // row carries the RECORDED time of its batch-window's end commit
      val tsByVersion = t.history().select("version", "timestamp")
        .as[(Long, String)].collect()
        .map { case (v, ts) =>
          // Spark TimestampType is micros; the recorded instant can carry
          // nanos — truncate the expectation the way the lit() cast does
          v -> java.sql.Timestamp.from(java.time.Instant.parse(ts)
            .truncatedTo(java.time.temporal.ChronoUnit.MICROS)) }.toMap
      val stamped = spark.table("cdf_sink")
        .select("graft_commit_version", "graft_commit_timestamp")
        .as[(Long, java.sql.Timestamp)].collect().toSeq
      assert(stamped.nonEmpty &&
        stamped.forall { case (v, ts) => ts == tsByVersion(v) },
        stamped.toString)
    } finally q.stop()
  }

  test("restart resumes from the checkpoint, emitting changes made while down") {
    val dir = tmpDir("cdf-restart")
    val t = new ManagedTable(spark, dir + "/t")
    val ckpt = dir + "/ckpt"
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    def start() = t.readChangeStream(Seq("k"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.filter(col("change_type") === "insert").select("k")
          .as[Long].collect().foreach(k => seen.add(k)); ()
      }.start()
    val q1 = start()
    q1.processAllAvailable()
    t.append(Seq((2L, "b")).toDF("k", "v"))
    q1.processAllAvailable()
    q1.stop()
    assert(seen.contains(2L))
    // this change lands while NO stream is running
    t.append(Seq((3L, "c")).toDF("k", "v"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // the restarted instance re-resolves "now" but must still drain the
      // checkpointed gap — nothing arrives if resume is broken
      assert(seen.contains(3L))
    } finally q2.stop()
  }

  test("maxVersionsPerTrigger drains a backlog as per-version batches") {
    val t = new ManagedTable(spark, tmpDir("cdf-pace-v") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v").coalesce(1))   // v0
    t.append(Seq((2L, "b")).toDF("k", "v").coalesce(1))      // v1
    t.append(Seq((3L, "c")).toDF("k", "v").coalesce(1))      // v2
    val q = t.readChangeStream(Seq("k"), startingVersion = 0,
        maxVersionsPerTrigger = 1)
      .writeStream.format("memory").queryName("cdf_pace_v")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // uncapped this backlog is ONE batch stamped version 2; capped it
      // must arrive as (0,1] then (1,2], each stamped with its own end
      val rows = spark.table("cdf_pace_v")
        .select("k", "change_type", "graft_commit_version")
        .as[(Long, String, Long)].collect().toSet
      assert(rows == Set((2L, "insert", 1L), (3L, "insert", 2L)))
    } finally q.stop()
  }

  test("maxFilesPerTrigger packs whole commits up to the file budget") {
    val t = new ManagedTable(spark, tmpDir("cdf-pace-f") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v").coalesce(1))   // v0
    t.append(Seq((2L, "b")).toDF("k", "v").coalesce(1))      // v1: 1 file
    t.append(Seq((3L, "c")).toDF("k", "v").coalesce(1))      // v2: 1 file
    t.append(Seq((4L, "d")).toDF("k", "v").coalesce(1))      // v3: 1 file
    val q = t.readChangeStream(Seq("k"), startingVersion = 0,
        maxFilesPerTrigger = 2)
      .writeStream.format("memory").queryName("cdf_pace_f")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // budget 2 admits v1+v2 into the first batch (stamped 2), v3 alone
      // into the second (stamped 3)
      val rows = spark.table("cdf_pace_f")
        .select("k", "graft_commit_version").as[(Long, Long)].collect().toSet
      assert(rows == Set((2L, 2L), (3L, 2L), (4L, 3L)))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains a capped backlog fully, then stops") {
    val t = new ManagedTable(spark, tmpDir("cdf-avnow") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v").coalesce(1))   // v0
    t.append(Seq((2L, "b")).toDF("k", "v").coalesce(1))      // v1
    t.append(Seq((3L, "c")).toDF("k", "v").coalesce(1))      // v2
    t.append(Seq((4L, "d")).toDF("k", "v").coalesce(1))      // v3
    val q = t.readChangeStream(Seq("k"), startingVersion = 0,
        maxVersionsPerTrigger = 1)
      .writeStream.format("memory").queryName("cdf_avnow")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      // AvailableNow must keep triggering capped batches until the
      // backlog latched at start is drained, then terminate on its own
      assert(q.awaitTermination(120000L), "AvailableNow query did not finish")
      val rows = spark.table("cdf_avnow")
        .select("k", "graft_commit_version").as[(Long, Long)].collect().toSet
      assert(rows == Set((2L, 1L), (3L, 2L), (4L, 3L)))
    } finally q.stop()
  }

  test("rate limits survive a restart (engine-provided start offsets)") {
    val dir = tmpDir("cdf-pace-restart")
    val t = new ManagedTable(spark, dir + "/t")
    val ckpt = dir + "/ckpt"
    t.overwrite(Seq((1L, "a")).toDF("k", "v").coalesce(1))   // v0
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = t.readChangeStream(Seq("k"), maxVersionsPerTrigger = 1)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("k", "graft_commit_version").as[(Long, Long)]
          .collect().foreach(seen.add); ()
      }.start()
    val q1 = start()
    q1.processAllAvailable()
    t.append(Seq((2L, "b")).toDF("k", "v").coalesce(1))      // v1
    q1.processAllAvailable()
    q1.stop()
    // two commits land while the stream is down; the restarted instance
    // must drain them as TWO capped batches, not one coalesced catch-up
    t.append(Seq((3L, "c")).toDF("k", "v").coalesce(1))      // v2
    t.append(Seq((4L, "d")).toDF("k", "v").coalesce(1))      // v3
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val rows = seen.asScala.toSet
      assert(rows == Set((2L, 1L), (3L, 2L), (4L, 3L)))
    } finally q2.stop()
  }

  test("initialSnapshot: the snapshot replays as paced insert batches " +
      "(DVs applied, expired early log OK), then diffs flow") {
    val dir = tmpDir("cdf-snap")
    val t = new ManagedTable(spark, dir + "/t")
    t.setProperties(Map("graft.manifest.checkpointInterval" -> "1"))
    t.overwrite(Seq.tabulate(6)(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(6, col("k")))
    t.deleteVectored(col("k") === 4)
    t.cleanupLog(t.version) // a startingVersion-0 replay is now impossible
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, String)]()
    def start() = t.readChangeStream(Seq("k"), initialSnapshot = true,
        maxFilesPerTrigger = 2)
      .writeStream.option("checkpointLocation", dir + "/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("k", "change_type")
          .as[(Long, String)].collect()
        if (rows.nonEmpty) batches.add(rows.length.toLong)
        rows.foreach(seen.add); ()
      }.start()
    val q = start()
    q.processAllAvailable()
    // snapshot: 5 live rows (k=4 deleted) as inserts, in >= 3 paced batches
    assert(seen.asScala.toSet ==
      Set(0L, 1L, 2L, 3L, 5L).map(k => (k, "insert")), seen)
    assert(batches.size >= 3, s"snapshot must be paced, got $batches")
    // incremental phase: an update flows as a diff
    t.updateVectored(col("k") === 1, Map("v" -> lit("V1")))
    q.processAllAvailable()
    q.stop()
    assert(seen.asScala.exists { case (k, ct) => k == 1L && ct == "update" })
  }

  test("initialSnapshot under distributedPlanning=always: the CDF paced " +
      "snapshot delivers the same rows and pacing as the driver fold") {
    def run(mode: String, dir: String): (Set[(Long, String)], Int) = {
      val t = new ManagedTable(spark, dir + "/t")
      t.overwrite(Seq((0L, "seed")).toDF("k", "v"))
      t.setProperties(Map(
        "graft.manifest.checkpointFormat" -> "parquet",
        "graft.manifest.checkpointInterval" -> "1",
        "graft.metadata.distributedPlanning" -> mode))
      t.overwrite(Seq.tabulate(6)(i => (i.toLong, s"v$i")).toDF("k", "v")
        .repartitionByRange(6, col("k")))
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, String)]()
      val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      val q = t.readChangeStream(Seq("k"), initialSnapshot = true,
          maxFilesPerTrigger = 2)
        .writeStream.option("checkpointLocation", dir + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.select("k", "change_type").as[(Long, String)].collect()
          if (rows.nonEmpty) nBatches.incrementAndGet()
          rows.foreach(seen.add); ()
        }.start()
      q.awaitTermination(120000L)
      (seen.asScala.toSet, nBatches.get())
    }
    val (distRows, distBatches) = run("always", tmpDir("cdf-snapdist"))
    val (drvRows, drvBatches) = run("never", tmpDir("cdf-snapdrv"))
    assert(distRows == (0L to 5L).map(k => (k, "insert")).toSet, distRows)
    assert(distRows == drvRows)
    assert(distBatches == drvBatches && distBatches == 3, // ceil(6/2)
      s"pacing differs: dist=$distBatches driver=$drvBatches")
  }

  test("startingTimestamp starts at the first commit at or after the timestamp") {
    val t = new ManagedTable(spark, tmpDir("cdf-start-ts") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))               // v0
    t.append(Seq((2L, "b")).toDF("k", "v"))                  // v1
    t.append(Seq((3L, "c")).toDF("k", "v"))                  // v2
    val tsOfV1 = t.history().filter(col("version") === 1)
      .select("timestamp").as[String].head()
    val q = t.readChangeStream(Seq("k"), startingTimestamp = tsOfV1)
      .writeStream.format("memory").queryName("cdf_start_ts")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // v1 committed AT the timestamp, so the feed covers (v0, v2]:
      // k=2 and k=3 arrive, the seed row k=1 does not
      val ks = spark.table("cdf_start_ts").select("k").as[Long].collect().toSet
      assert(ks == Set(2L, 3L))
    } finally q.stop()
  }

  test("startingTimestamp at or before the first commit replays everything") {
    val t = new ManagedTable(spark, tmpDir("cdf-ts-origin") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))               // v0
    t.append(Seq((2L, "b")).toDF("k", "v"))                  // v1
    val tsOfV0 = t.history().filter(col("version") === 0)
      .select("timestamp").as[String].head()
    val q = t.readChangeStream(Seq("k"), startingTimestamp = tsOfV0)
      .writeStream.format("memory").queryName("cdf_ts_origin")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // v0 commits AT the timestamp, so the base is the empty pre-founding
      // state: even the seed row replays, as an insert
      val rows = spark.table("cdf_ts_origin")
        .select("k", "change_type").as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "insert"), (2L, "insert")))
    } finally q.stop()
  }

  test("startingTimestamp beyond all commits behaves like the default latest start") {
    val t = new ManagedTable(spark, tmpDir("cdf-ts-future") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))               // v0
    t.append(Seq((2L, "b")).toDF("k", "v"))                  // v1
    val q = t.readChangeStream(Seq("k"),
        startingTimestamp = "2100-01-01T00:00:00Z")
      .writeStream.format("memory").queryName("cdf_ts_future")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdf_ts_future").count() == 0)
      // changes committed after stream start still arrive
      t.append(Seq((3L, "c")).toDF("k", "v"))
      q.processAllAvailable()
      assert(spark.table("cdf_ts_future").select("k").as[Long]
        .collect().toSet == Set(3L))
    } finally q.stop()
  }

  test("startingVersion replays history; multiple commits coalesce to net change") {
    val t = new ManagedTable(spark, tmpDir("cdf-replay") + "/t")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))            // v0
    t.append(Seq((2L, "b")).toDF("k", "v"))               // v1
    t.merge(Seq((2L, "b2")).toDF("k", "v"), Seq("k"))     // v2
    val q = t.readChangeStream(Seq("k"), startingVersion = 0)
      .writeStream.format("memory").queryName("cdf_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // one batch: the NET diff v0 → v2 (k=2 appears once, as an insert)
      val rows = spark.table("cdf_replay")
        .select("k", "v", "change_type").as[(Long, String, String)]
        .collect().toSet
      assert(rows == Set((2L, "b2", "insert")))
    } finally q.stop()
  }
}

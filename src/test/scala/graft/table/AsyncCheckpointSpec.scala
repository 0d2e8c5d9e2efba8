package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Async (retro) checkpoints — `graft.manifest.asyncCheckpoint`: a
  * checkpoint-due commit writes an ordinary O(churn) delta manifest and
  * the checkpoint trails as post-commit maintenance under
  * `_checkpoints.d/` (Delta's `_last_checkpoint` discipline). These
  * cases pin the trust story end-to-end: the boundary commit really is
  * a delta, readers fold checkpoint + trailing deltas while the
  * checkpoint lags (the crash window), maintenance is idempotent and
  * race-safe across handles, drift detection moves to maintenance, and
  * log retention can anchor on a retro checkpoint behind the
  * `checkpoint-retro` reader feature.
  */
class AsyncCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String, partSize: Int = 0) = {
    val t = new ManagedTable(spark, tmpDir(name) + "/t")
    // pin the FOUNDING commit to the inline-JSON format before it happens:
    // these specs build their parquet-checkpoint history explicitly from
    // v1 on, and the venue pins assert the no-parquet-base fallback —
    // ambient soak defaults (GRAFT_PROPERTY_DEFAULTS) must not hand v0 a
    // parquet sidecar
    t.setProperties(Map("graft.manifest.checkpointFormat" -> "json",
      "graft.manifest.asyncCheckpoint" -> "false"))
    t.overwrite(Seq((0L, "seed")).toDF("k", "v")) // v0: founding checkpoint
    val base = Map(
      "graft.manifest.asyncCheckpoint" -> "true",
      "graft.manifest.checkpointFormat" -> "parquet")
    t.setProperties(if (partSize > 0)
      base + ("graft.manifest.checkpointPartSize" -> partSize.toString)
    else base)
    t
  }

  private def manifestText(t: ManagedTable, v: Long): String = {
    val p = java.nio.file.Paths.get(t.path + "._log", f"v$v%05d.json")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  private def retroPtr(t: ManagedTable, v: Long) =
    new java.io.File(t.path + f"._log/_checkpoints.d/v$v%05d.json")

  test("the checkpoint-due commit is a delta; reads fold the lagging chain; " +
      "maintenance publishes the retro checkpoint") {
    CheckpointMaintenance.suspended = true
    try {
      val t = freshTable("ac-basic")
      for (i <- 1 to 13) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      // v10 was checkpoint-due (default interval 10) but committed as a
      // pure delta — the Nth commit is as fast as the others
      val txt = manifestText(t, 10L)
      assert(txt.contains("\"add\":[") && !txt.contains("\"files\"") &&
        !txt.contains("filesParquet"), s"v10 should be a delta: $txt")
      // the crash window: no retro checkpoint has landed, every read
      // folds v0's checkpoint + 13 deltas and is still exact
      assert(!new java.io.File(t.path + "._log/_checkpoints.d").exists())
      assert(t.read.count() == 14L)
      assert(t.readVersion(10).count() == 11L)
      val truth = t.read.orderBy("k").as[(Long, String)].collect().toSeq
      // "recovery": any process's next maintenance run publishes the
      // trailing checkpoint — here invoked directly, as after a crash
      t.runCheckpointMaintenance()
      assert(retroPtr(t, 13L).exists(),
        "maintenance should checkpoint the latest state (v13)")
      val fresh = new ManagedTable(spark, t.path)
      assert(fresh.read.orderBy("k").as[(Long, String)].collect().toSeq
        == truth)
      assert(fresh.readVersion(11).count() == 12L)
      // idempotent: a second run (the re-scheduled maintenance) is a no-op
      t.runCheckpointMaintenance()
      assert(t.read.count() == 14L)
    } finally CheckpointMaintenance.suspended = false
  }

  test("scheduled maintenance lands the retro checkpoint without any await " +
      "on the commit path") {
    val t = freshTable("ac-sched", partSize = 4)
    for (i <- 1 to 10) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
    t.awaitCheckpointMaintenance()
    // maintenance checkpoints the latest state it saw — some version in
    // [10, current]; its sidecars are multi-part parquet
    val dir = new java.io.File(t.path + "._log/_checkpoints.d")
    assert(dir.exists() && dir.listFiles().exists(_.getName.endsWith(".json")),
      "scheduled maintenance should have published a retro pointer")
    val ptr = dir.listFiles().filter(_.getName.endsWith(".json")).head
    val ptxt = new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8")
    assert(ptxt.contains("filesParquetParts"), ptxt)
    assert(t.read.count() == 11L)
  }

  test("two handles racing the maintenance both finish; the pointer stays valid") {
    CheckpointMaintenance.suspended = true
    try {
      val t1 = freshTable("ac-race", partSize = 3)
      for (i <- 1 to 10) t1.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      val t2 = new ManagedTable(spark, t1.path)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = Seq(t1, t2).map { t =>
        new Thread(() =>
          try t.runCheckpointMaintenance()
          catch { case e: Throwable => errs.add(e); () })
      }
      threads.foreach(_.start()); threads.foreach(_.join(60000))
      assert(errs.isEmpty, s"racing maintenance threw: ${errs}")
      assert(retroPtr(t1, 10L).exists())
      // reconstruction through the raced retro checkpoint is exact
      val fresh = new ManagedTable(spark, t1.path)
      assert(fresh.readVersion(10).count() == 11L)
      assert(fresh.read.count() == 11L)
    } finally CheckpointMaintenance.suspended = false
  }

  test("retro parts are run-unique, so a cross-venue race can never mix " +
      "row→part layouts under a published pointer") {
    CheckpointMaintenance.suspended = true
    try {
      val t1 = freshTable("ac-xvenue", partSize = 3)
      for (i <- 1 to 10) t1.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      t1.runCheckpointMaintenance() // retro #1: the parquet base
      for (i <- 11 to 14) t1.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      // the two venues lay rows out DIFFERENTLY under the same part count:
      // the driver stream splits sequentially, the Spark job hash-partitions
      // by path. Race them for the same version — the published pointer
      // must name a complete, duplicate-free part set from ONE run.
      t1.setProperties(Map("graft.metadata.distributedPlanning" -> "always"))
      val t2 = new ManagedTable(spark, t1.path)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val th1 = new Thread(() =>
        try t1.runCheckpointMaintenance()
        catch { case e: Throwable => errs.add(e); () })
      th1.start()
      // flip the venue mid-race (an operator config change — ADVICE's
      // scenario) and run the second handle's maintenance concurrently
      t2.setProperties(Map("graft.metadata.distributedPlanning" -> "never"))
      val th2 = new Thread(() =>
        try t2.runCheckpointMaintenance()
        catch { case e: Throwable => errs.add(e); () })
      th2.start()
      th1.join(60000); th2.join(60000)
      assert(errs.isEmpty, s"racing mixed-venue maintenance threw: $errs")
      val v = t1.version
      assert(retroPtr(t1, v).exists())
      val txt = new String(java.nio.file.Files.readAllBytes(
        retroPtr(t1, v).toPath), "UTF-8")
      val names = "\"(v[^\"]*\\.checkpoint\\.parquet)\"".r
        .findAllMatchIn(txt).map(_.group(1)).toSeq
      // run-unique names: every part carries its run segment, and the
      // whole published set came from a single run
      assert(names.nonEmpty &&
        names.forall(_.matches("v\\d+\\.r[0-9a-f]{8}\\.p\\d+\\.checkpoint\\.parquet")),
        s"retro parts must be run-unique: $names")
      assert(names.map(_.replaceAll("\\.p\\d+.*", "")).distinct.size == 1,
        s"a published pointer must reference ONE run's parts: $names")
      // and the part set reconstructs the exact live set: no dup/missing
      // rows regardless of which run won
      val rows = spark.read.parquet(
          names.map(n => t1.path + "._log/" + n): _*)
        .select("path").collect().map(_.getString(0)).toSeq
      assert(rows.distinct.size == rows.size, "duplicate rows in retro parts")
      val liveNames = new java.io.File(t1.path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      assert(rows.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
        == liveNames, "retro parts must cover exactly the live set")
      val fresh = new ManagedTable(spark, t1.path)
      assert(fresh.readVersion(v).count() == 15L)
    } finally CheckpointMaintenance.suspended = false
  }

  test("maintenance detects out-of-band drift and the next commit absorbs it") {
    CheckpointMaintenance.suspended = true
    try {
      val t = freshTable("ac-drift")
      for (i <- 1 to 3) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      val before = t.read.count() // 4: seed + 3 appends, pre-stray
      // out-of-band writer drops a stray parquet file into the live dir
      val dataDir = new java.io.File(t.path)
      val part = dataDir.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dataDir, "part-stray-oob.parquet").toPath)
      t.runCheckpointMaintenance() // verification invalidates the state
      t.append(Seq((99L, "post")).toDF("k", "v")) // listing path: absorbs
      // the stray is now IN THE LOG: a fresh handle's log-derived
      // time-travel read of the new version serves it
      val absorbed = new ManagedTable(spark, t.path)
      assert(absorbed.readVersion(absorbed.version).count() ==
        before + 1 /*append*/ + 1 /*stray row*/,
        "the commit after drift detection should fold the stray into the log")
      assert(t.lastFunnelOverReport == 0)
    } finally CheckpointMaintenance.suspended = false
  }

  test("successive maintenance runs chain incrementally: the second retro " +
      "assembles from the first, and reads stay exact") {
    CheckpointMaintenance.suspended = true
    try {
      val t = freshTable("ac-chain", partSize = 3)
      for (i <- 1 to 10) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      t.runCheckpointMaintenance() // retro #1 at v10
      assert(retroPtr(t, 10L).exists())
      for (i <- 11 to 21) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      t.runCheckpointMaintenance() // retro #2 at v21, base = retro #1 ± churn
      assert(retroPtr(t, 21L).exists())
      val fresh = new ManagedTable(spark, t.path)
      assert(fresh.read.count() == 22L)
      assert(fresh.readVersion(21).count() == 22L)
      assert(fresh.readVersion(15).count() == 16L) // walks back to retro #1
      assert(fresh.readVersion(9).count() == 10L)  // pre-retro delta chain
    } finally CheckpointMaintenance.suspended = false
  }

  test("the distributed planner prunes from RETRO checkpoint sidecars") {
    CheckpointMaintenance.suspended = true
    try {
      val t = freshTable("ac-dplan", partSize = 4)
      t.setProperties(Map("graft.metadata.distributedPlanning" -> "always"))
      for (i <- 1 to 10)
        t.append(Seq((i * 100L, s"r$i")).toDF("k", "v")
          .repartitionByRange(1, col("k")))
      t.runCheckpointMaintenance() // retro at v10: the only parquet base
      assert(retroPtr(t, 10L).exists())
      // the pruned read plans as a Spark job over the retro's sidecar
      // parts (distributedBase resolves the retro first); the kept set
      // must still answer exactly
      val (kept, all) = t.filesOverlapping("k", 300L, 300L)
      assert(kept.size < all.size, "stats pruning over retro sidecars")
      assert(t.readWhere("k", 300L, 300L).count() == 1L)
      assert(t.read.count() == 11L)
    } finally CheckpointMaintenance.suspended = false
  }

  test("above the planning cutover the retro checkpoint assembles as a " +
      "Spark job, row-identical to the driver stream") {
    CheckpointMaintenance.suspended = true
    try {
      val t = freshTable("ac-distassy", partSize = 3)
      t.setProperties(Map("graft.metadata.distributedPlanning" -> "always"))
      for (i <- 1 to 10) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      // retro #1: no parquet base exists yet, so the job declines and the
      // driver stream seeds the chain — the documented fallback
      t.runCheckpointMaintenance()
      assert(t.lastRetroVenue == "driver")
      val v1 = (0L to 20L).find(v => retroPtr(t, v).exists()).get
      // churn beyond pure adds, then retro #2 assembles AS A SPARK JOB
      // from retro #1 ± churn
      t.delete(col("k") === 3L)
      for (i <- 11 to 14) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      t.runCheckpointMaintenance()
      assert(t.lastRetroVenue == "distributed",
        "a parquet base above the cutover must assemble via the job")
      val v2 = (v1 + 1 to v1 + 20).find(v => retroPtr(t, v).exists()).get
      // part names come from the POINTER (they are run-unique — the staged
      // part set of a racing run must never be confused with the published
      // one), exactly as readers resolve them
      def retroParts(v: Long): Seq[String] = {
        val txt = new String(java.nio.file.Files.readAllBytes(
          retroPtr(t, v).toPath), "UTF-8")
        "\"(v[^\"]*\\.checkpoint\\.parquet)\"".r
          .findAllMatchIn(txt).map(_.group(1)).toSeq
      }
      def retroRows(v: Long): Set[(String, Long, Long, String)] = {
        val parts = retroParts(v)
          .map(n => t.path + "._log/" + n).sorted
        assert(parts.length > 1, s"expected multi-part retro at v$v")
        spark.read.parquet(parts.toIndexedSeq: _*)
          .select(col("path").cast("string"), col("len").cast("long"),
            col("rows").cast("long"), col("stats").cast("string"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) "" else r.getString(3))).toSet
      }
      val jobRows = retroRows(v2)
      assert(jobRows.map(_._1).forall(!_.contains(".tmp-")), "staged names " +
        "must never leak into the checkpoint")
      // bit-parity: wipe retro #2 and re-assemble the SAME version via the
      // driver stream (property edits don't bump the version) — the two
      // venues must produce the identical row set
      retroPtr(t, v2).delete()
      new java.io.File(t.path + "._log").listFiles()
        .filter(_.getName.matches(f"v$v2%05d\\..*checkpoint\\.parquet"))
        .foreach(_.delete())
      t.setProperties(Map("graft.metadata.distributedPlanning" -> "never"))
      t.runCheckpointMaintenance()
      assert(t.lastRetroVenue == "driver")
      assert(retroPtr(t, v2).exists(), "same version, re-checkpointed")
      assert(retroRows(v2) == jobRows,
        "driver and distributed assemblies must be row-identical")
      // the job-written parts serve every downstream reader: fresh-handle
      // recon, time travel onto the retro, and the next maintenance chain
      t.setProperties(Map("graft.metadata.distributedPlanning" -> "always"))
      for (i <- 15 to 18) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      t.runCheckpointMaintenance()
      assert(t.lastRetroVenue == "distributed")
      val fresh = new ManagedTable(spark, t.path)
      assert(fresh.read.count() == 18L) // 19 appends (incl. seed) − 1 delete
      assert(fresh.readVersion(v2).count() == 14L) // 15 − the delete
    } finally CheckpointMaintenance.suspended = false
  }

  test("the append stream replays across a retro checkpoint boundary " +
      "exactly once (checkpoints stay a pure cache for streams)") {
    CheckpointMaintenance.suspended = true
    try {
      val t = freshTable("ac-stream", partSize = 3)
      for (i <- 1 to 11) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      t.runCheckpointMaintenance() // retro mid-history
      assert(retroPtr(t, 11L).exists())
      for (i <- 12 to 14) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      val q = t.readStreamAppends(startingVersion = 0)
        .writeStream.format("memory").queryName("ac_stream_sink")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table("ac_stream_sink").as[(Long, String)]
          .collect().sorted.toSeq ==
          (Seq((0L, "seed")) ++ (1 to 14).map(i => (i.toLong, s"r$i"))),
          "every append exactly once, retro boundary invisible")
      } finally q.stop()
    } finally CheckpointMaintenance.suspended = false
  }

  test("DV commits at the async boundary: the retro checkpoint lists files, " +
      "DVs keep applying, and the fresh-handle read is exact") {
    CheckpointMaintenance.suspended = true
    try {
      val t = freshTable("ac-dv", partSize = 3)
      for (i <- 1 to 9) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      // the checkpoint-due v10 commit is itself a DV delete (zero file
      // churn) — the boundary must stay an O(churn) delta either way
      t.deleteVectored(col("k") === 4L)
      assert(t.version == 10L)
      val txt = manifestText(t, 10L)
      assert(!txt.contains("filesParquet") && !txt.contains("\"files\""),
        s"DV boundary commit should be a delta: $txt")
      t.runCheckpointMaintenance()
      assert(retroPtr(t, 10L).exists())
      val fresh = new ManagedTable(spark, t.path)
      assert(fresh.read.count() == 9L) // 10 rows − the DV'd one
      assert(fresh.readVersion(9).count() == 10L) // pre-delete snapshot
      assert(fresh.readVersion(10).as[(Long, String)].collect()
        .forall(_._1 != 4L), "the DV applies over the retro checkpoint")
    } finally CheckpointMaintenance.suspended = false
  }

  test("a retro pointer that anchors the log horizon is never retracted, " +
      "even when a lock overlaps the publish") {
    CheckpointMaintenance.suspended = true
    try {
      val t = freshTable("ac-anchor", partSize = 3)
      for (i <- 1 to 12) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      t.runCheckpointMaintenance()
      assert(retroPtr(t, 12L).exists())
      t.cleanupLog(12L) // anchors on the retro: manifests below are gone
      assert(!new java.io.File(t.path + "._log/v00011.json").exists())
      // the race's tail, simulated: the pointer needs re-publishing while
      // ANOTHER writer holds the commit lock (publishRetroPointer's
      // post-publish check fires) — retracting here would leave the log
      // unreconstructable, so the anchored pointer must be KEPT
      retroPtr(t, 12L).delete()
      val lock = new java.io.File(t.path + "._log/_commit.lock")
      assert(lock.createNewFile())
      try t.runCheckpointMaintenance()
      finally lock.delete()
      assert(retroPtr(t, 12L).exists(),
        "an anchored pointer must survive the overlap check")
      val fresh = new ManagedTable(spark, t.path)
      assert(fresh.read.count() == 13L)
      assert(fresh.readVersion(12).count() == 13L)
      // the retract-CRASH story: cleanupLog hardened its anchor into a
      // copy the retraction never touches — even with the main pointer
      // gone for good (maintenance killed between delete and restore),
      // reconstruction falls through to the copy instead of walking into
      // the deleted manifests
      assert(new java.io.File(
        t.path + "._log/_checkpoints.d/v00012.anchor.json").exists(),
        "cleanupLog must harden a retro anchor before deleting below it")
      retroPtr(t, 12L).delete()
      val afterCrash = new ManagedTable(spark, t.path)
      assert(afterCrash.read.count() == 13L)
      assert(afterCrash.readVersion(12).count() == 13L,
        "the anchor copy must serve reconstruction with the pointer gone")
    } finally CheckpointMaintenance.suspended = false
  }

  test("an overlapped publish of a NON-anchoring pointer retracts " +
      "immediately — never kept, never restored; reads fold the manifest " +
      "chain") {
    CheckpointMaintenance.suspended = true
    try {
      val t = freshTable("ac-retract", partSize = 3)
      for (i <- 1 to 7) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      // the full manifest chain is intact (no cleanup), so the pointer is
      // a pure cache: an overlapping mutation (simulated by a held lease)
      // must retract it outright — the r12 protocol restored it and kept
      // it after 3 attempts, which is exactly how a remap-missed pointer
      // with pre-remap paths could survive (ADVICE r12)
      val lock = new java.io.File(t.path + "._log/_commit.lock")
      assert(lock.createNewFile())
      try t.runCheckpointMaintenance()
      finally lock.delete()
      assert(!retroPtr(t, 7L).exists(),
        "a non-anchoring pointer must be retracted on overlap, not kept")
      val fresh = new ManagedTable(spark, t.path)
      assert(fresh.read.count() == 8L)
      assert(fresh.readVersion(7).count() == 8L,
        "reconstruction folds the manifest chain with the pointer retracted")
      // the next quiet maintenance run re-publishes it
      t.runCheckpointMaintenance()
      assert(retroPtr(t, 7L).exists())
    } finally CheckpointMaintenance.suspended = false
  }

  test("maintenance self-heals a DANGLING checkpoint manifest (sidecar " +
      "gone): the publish is not suppressed, and the pointer is kept when " +
      "it is the only thing serving recon(v)") {
    CheckpointMaintenance.suspended = true
    try {
      val t = new ManagedTable(spark, tmpDir("ac-heal") + "/t")
      // SYNCHRONOUS MULTIPART parquet checkpoints: v10's manifest carries
      // filesParquetParts with its own part files (multipart matters —
      // retro parts are run-unique, so the healing pointer's artifacts
      // stay distinct from the manifest's dangling ones; single-sidecar
      // retro shares the manifest's path and would heal the manifest
      // itself)
      t.setProperties(Map("graft.manifest.checkpointFormat" -> "parquet",
        "graft.manifest.asyncCheckpoint" -> "false",
        "graft.manifest.checkpointPartSize" -> "3"))
      t.overwrite(Seq((0L, "seed")).toDF("k", "v"))
      for (i <- 1 to 10) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      assert(manifestText(t, 10L).contains("filesParquetParts"),
        "v10 must be a sync multipart checkpoint manifest")
      // remap-crash debris, simulated: one part vanishes, the manifest
      // dangles — a fresh handle can no longer reconstruct v10
      val part = new java.io.File(t.path + "._log").listFiles()
        .find(f => f.getName.startsWith("v00010.p") &&
          f.getName.endsWith(".checkpoint.parquet"))
        .getOrElse(fail("no v10 checkpoint part found"))
      assert(part.delete())
      intercept[Exception] {
        new ManagedTable(spark, t.path).readVersion(10).count() }
      // the old `already` probe counted the dangling manifest as "already
      // checkpointed" and skipped; now maintenance publishes the retro
      // pointer that REPAIRS reconstruction
      t.runCheckpointMaintenance()
      assert(retroPtr(t, 10L).exists(),
        "a dangling checkpoint must not suppress the retro publish")
      assert(new ManagedTable(spark, t.path).readVersion(10).count() == 11L)
      // anchored + overlap on the same state: manifests below the horizon
      // gone (an old cleanup), pointer lost (retraction flicker), a
      // writer's lease held — the re-published pointer must be KEPT: the
      // dangling manifest cannot self-anchor (its sidecar is gone), so
      // the pointer is load-bearing
      for (i <- 0 to 9)
        new java.io.File(t.path + f"._log/v$i%05d.json").delete()
      retroPtr(t, 10L).delete()
      val lock = new java.io.File(t.path + "._log/_commit.lock")
      assert(lock.createNewFile())
      try t.runCheckpointMaintenance()
      finally lock.delete()
      assert(retroPtr(t, 10L).exists(),
        "the pointer serving a dangling-manifest horizon must be kept")
      val healed = new ManagedTable(spark, t.path)
      assert(healed.read.count() == 11L)
      assert(healed.readVersion(10).count() == 11L)
    } finally CheckpointMaintenance.suspended = false
  }

  test("cleanupLog anchors on a retro checkpoint behind the checkpoint-retro " +
      "reader feature") {
    CheckpointMaintenance.suspended = true
    try {
      val t = freshTable("ac-retention", partSize = 3)
      for (i <- 1 to 12) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      t.runCheckpointMaintenance() // retro at v12
      assert(retroPtr(t, 12L).exists())
      t.cleanupLog(12L)
      // v12's manifest is a delta, so the horizon anchored on the retro
      // checkpoint: manifests below are gone and the feature is recorded
      assert(!new java.io.File(t.path + "._log/v00005.json").exists())
      assert(new java.io.File(t.path + "._log/v00012.json").exists())
      assert(t.protocol._1.contains("checkpoint-retro"))
      // reconstruction at and above the horizon still works, fresh handle
      val fresh = new ManagedTable(spark, t.path)
      assert(fresh.read.count() == 13L)
      assert(fresh.readVersion(12).count() == 13L)
      // below the horizon: a clean horizon error, not a corrupt-log walk
      intercept[Exception] { fresh.readVersion(4).count() }
    } finally CheckpointMaintenance.suspended = false
  }

  test("an outcome-wait that EXPIRES with the lease still held keeps the " +
      "anchored pointer provisionally and records a re-verify marker; the " +
      "next maintenance run renders the real verdict (advice r13)") {
    CheckpointMaintenance.suspended = true
    try {
      val t = freshTable("ac-reverify", partSize = 3)
      for (i <- 1 to 12) t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))
      t.runCheckpointMaintenance()
      assert(retroPtr(t, 12L).exists())
      t.cleanupLog(12L) // anchors on the retro; hardened copy landed
      val marker = new java.io.File(
        t.path + "._log/_checkpoints.d/v00012.reverify")
      def overlappedPublish(): Unit = {
        retroPtr(t, 12L).delete()
        val lock = new java.io.File(t.path + "._log/_commit.lock")
        assert(lock.createNewFile())
        // the lock is held for the ENTIRE maintenance call, so the
        // bounded outcome-wait expires with the mutation "still running"
        try t.runCheckpointMaintenance()
        finally lock.delete()
        assert(retroPtr(t, 12L).exists(),
          "the anchored pointer must be kept (provisionally) on timeout")
        assert(marker.exists(),
          "an expired wait under a held lease must record a re-verify marker")
      }
      // verdict 1: the slow mutation released the lease WITHOUT moving the
      // version (a cleanup, or an abort) — the deferred kept verdict
      overlappedPublish()
      t.runCheckpointMaintenance()
      assert(!marker.exists(), "the marker must clear once adjudicated")
      assert(retroPtr(t, 12L).exists(),
        "version held: the pointer content is exactly recon(v) — kept")
      assert(new ManagedTable(spark, t.path).readVersion(12).count() == 13L)
      // verdict 2: a commit LANDS past v before the next maintenance run —
      // the pointer is adjudicated like a witnessed overlap: the hardened
      // anchor copy predates the mutation (any remap sweep rewrote it), so
      // the possibly-stale pointer retracts and the copy serves recon(v)
      overlappedPublish()
      t.append(Seq((13L, "r13")).toDF("k", "v")) // version moves to 13
      t.runCheckpointMaintenance()
      assert(!marker.exists(), "the marker must clear once adjudicated")
      assert(!retroPtr(t, 12L).exists(),
        "commit landed: the provisional pointer must retract (the anchor " +
          "copy serves reconstruction)")
      val fresh = new ManagedTable(spark, t.path)
      assert(fresh.read.count() == 14L)
      assert(fresh.readVersion(12).count() == 13L,
        "the hardened anchor copy must serve recon(12) after retraction")
    } finally CheckpointMaintenance.suspended = false
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** BPE training at REALISTIC merge counts — the scale story for
  * `ops/Bpe.scala` (SCALING.md): classic BPE trains on the vocab-bounded
  * (word, count) table, so the driver venue with INCREMENTAL pair stats
  * is the intended path at real tokenizer scale (30k–50k merges over a
  * web-corpus vocab); the distributed venue's 2-jobs-per-merge loop is
  * the above-`maxDriverVocab` fallback, priced here per merge so the
  * docs can state its regime honestly.
  *
  * Synthetic vocab: Zipf-ish counts over random ASCII words — the shape
  * that drives BPE work (many rare types, few huge ones).
  */
object BpeBench {
  private def synthVocab(types: Int, seed: Long): Seq[(String, Long)] = {
    val r = new scala.util.Random(seed)
    val letters = "abcdefghijklmnopqrstuvwxyz"
    (0 until types).map { i =>
      val len = 2 + r.nextInt(10)
      val w = (0 until len).map(_ => letters(r.nextInt(26))).mkString
      // Zipf-ish: rank-based count, floor 2 so minCount=2 keeps everything
      (w, math.max(2L, (1000000.0 / (i + 1)).toLong))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.toSeq
  }

  def main(args: Array[String]): Unit = {
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val x = f; (x, (System.nanoTime() - t0) / 1e9)
    }
    // driver venue, incremental stats: the real-merge-count regime
    for ((types, merges) <- Seq((100000, 30000), (1000000, 30000))) {
      val vocab = synthVocab(types, seed = 7)
      val (m, s) = timed(graft.ops.Bpe.trainFromVocab(vocab, merges, minCount = 2L))
      println(f"[bpe-bench] driver-incremental types=$types%d merges=${m.size}%d " +
        f"(asked $merges%d): $s%.1f s")
    }
    // naive full-recount (the paper's loop verbatim) at a size it can
    // finish — the contrast that motivates the incremental trainer
    {
      val vocab = synthVocab(20000, seed = 7)
      val (m, s) = timed(graft.ops.Bpe.trainDriverNaive(vocab, 500, minCount = 2L))
      println(f"[bpe-bench] driver-naive types=20000 merges=${m.size}%d: $s%.1f s")
    }
    // distributed venue: per-merge job cost (2 vocab-sized jobs/merge) —
    // measured at a small merge count, priced per merge
    val spark = graft.GraftSession.local("bpe-bench")
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      val docs = synthVocab(100000, seed = 7).toDF("word", "cnt")
        .selectExpr("word AS text") // one word per row; wordCounts re-counts
      val t0 = System.nanoTime()
      val m = graft.ops.Bpe.train(docs.withColumn("doc_id",
          org.apache.spark.sql.functions.monotonically_increasing_id()),
        "text", numMerges = 50, maxDriverVocab = 0L)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-bench] distributed types=100000 merges=${m.size}%d: " +
        f"$s%.1f s (${s / math.max(1, m.size)}%.2f s/merge — at 30k merges " +
        f"this venue is ${s / math.max(1, m.size) * 30000 / 3600}%.1f h; " +
        "crash-recovery/above-maxDriverVocab only)")
    } finally spark.stop()
  }
}

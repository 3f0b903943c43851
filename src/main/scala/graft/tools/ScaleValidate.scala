package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Runs the dedup/similarity/text families over one or more corpus dirs
  * and prints per-query wall seconds + shuffle MB (the Bench listener
  * discipline) — one JSON line per dir. Feed it the base sf0.1 corpus
  * and a `ScaleGen` scratch corpus to measure how each family's shuffle
  * actually scales; SCALE_VALIDATION.md commits the comparison against
  * the laws claimed in SCALE.md.
  *
  * `sbt "runMain graft.tools.ScaleValidate /root/testdata/sf0.1 /tmp/graft_scale/x30"`
  */
object ScaleValidate {

  /** (family, predicted scaling vs corpus factor F, queries). The
    * prediction strings are the SCALE.md laws being tested. */
  val Families: Seq[(String, String, Seq[String])] = Seq(
    ("linear-token", "shuffle ∝ tokens: ≈F×", Seq(
      "dedup_substring", "kmv_distinct", "term_rarity_topk",
      "cross_doc_ngrams", "doc_repetition", "winnow_fingerprints")),
    ("doc-proportional", "shuffle ∝ docs: ≈F×", Seq(
      "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
      "dedup_clusters", "dedup_apply")),
    ("projection", "shuffle ≈ 0 at any scale", Seq(
      "text_quality", "quality_gopher", "doc_fingerprint",
      "embed_quantize", "train_split")),
    ("vocab-bounded", "shuffle ∝ vocab/partials: ≪F×", Seq(
      "cms_heavy_hitters", "vocab_topk", "bpe_pairs")),
    ("broadcast-side", "shuffle ∝ corpus partials, broadcast fixed: ≤F×", Seq(
      "decontaminate", "decontam_bloom", "ann_cosine_topk",
      "ann_batch_topk", "ivf_topk", "dedup_embedding_cosine")),
    ("bounded-candidates", "pairs df-capped: ≈F× (dup pairs ∝ docs)", Seq(
      "dedup_shingle_jaccard", "source_overlap")))

  def main(rawArgs: Array[String]): Unit = {
    // --no-broadcast pins every stats-decided join to shuffle strategy —
    // the regime ALL relations are in at 100 TB. Comparing runs with and
    // without it separates genuine scaling from the one-time step change
    // when a relation outgrows the 10 MB auto-broadcast threshold.
    val noBroadcast = rawArgs.contains("--no-broadcast")
    val args = rawArgs.filterNot(_ == "--no-broadcast")
    require(args.nonEmpty, "usage: ScaleValidate [--no-broadcast] <dir> ...")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scale-validate")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (noBroadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })

    val names = Families.flatMap(_._3)
    args.foreach { dir =>
      val rows = names.map { name =>
        val s0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[scale] $name on $dir failed: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        var last = -1L; var stable = 0; var waited = 0
        while (stable < 2 && waited < 2000) {
          Thread.sleep(50L); waited += 50
          val cur = shuffleBytes.get()
          if (cur == last) stable += 1 else { stable = 0; last = cur }
        }
        (name, sec, (shuffleBytes.get() - s0) / 1048576.0)
      }
      val qs = rows.map { case (k, sec, mb) =>
        "\"" + k + f"""\":{"sec":$sec%.2f,"shuffle_mb":$mb%.2f}"""
      }.mkString("{", ",", "}")
      println(s"""{"dir":"$dir","queries":$qs}""")
    }
    spark.stop()
  }
}

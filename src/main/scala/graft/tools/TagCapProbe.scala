package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the [[graft.text.HtmlExtract]] block-list cost law at a
  * production-sized tag list: `scored()` materializes 3 derived columns
  * per candidate block tag (block, stripped text, mass) in ONE
  * projection — 15 columns at the gate's 5 tags, 60 at a production
  * ~20-tag list. The law to verify: columns ∝ tags, still a single
  * whole-stage-codegen projection, zero shuffle — i.e. the cost grows
  * linearly in tags × rows with no plan-shape change.
  *
  * `sbt "runMain graft.tools.TagCapProbe /root/testdata/sf0.1"`
  * prints per-tag-count wall seconds, the codegen span count, and the
  * exchange count (expected 0 beyond the parallelize exchange).
  */
object TagCapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-tagcap-probe")
      .config("spark.sql.shuffle.partitions", "32")
      // pure-projection probe: AQE off so executedPlan shows the codegen
      // spans directly (AQE wraps them behind un-executed stage nodes)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    for (nTags <- Seq(5, 10, 20)) {
      val tags = (0 until nTags).map(i => s"tag$i")
      // synthetic page carrying every tag so each regexp genuinely binds
      val page = concat(
        (tags.flatMap(t => Seq(lit(s"<$t>block "), col("doc_id") % 7,
          lit(s" of $t for doc "), col("text"), lit(s"</$t>")))): _*)
      var df = graft.Tables.parallel(spark, dir, "documents")
        .withColumn("page", page)
      for (t <- tags) {
        df = df.withColumn(s"b_$t",
            regexp_extract(col("page"), s"(?s)<$t[^>]*>.*?</$t>", 0))
          .withColumn(s"t_$t", trim(regexp_replace(regexp_replace(
            col(s"b_$t"), graft.text.HtmlExtract.TagRe, " "),
            graft.text.HtmlExtract.WsRe, " ")))
          .withColumn(s"m_$t", when(length(col(s"b_$t")) > 0,
            length(col(s"t_$t")).cast("double") * length(col(s"t_$t")) /
              length(col(s"b_$t"))).otherwise(lit(0.0)))
      }
      val out = df.select(col("doc_id") +:
        tags.map(t => col(s"m_$t")): _*)
      // executed-stage count is the law's physical evidence: one scan
      // stage + the Tables.parallel spread exchange, NEVER growing with
      // the tag list (a per-tag shuffle or an un-fused stage would show
      // here immediately)
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = { stages.incrementAndGet(); () }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      out.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain the final stage event
      spark.sparkContext.removeSparkListener(listener)
      val exchanges = "Exchange".r
        .findAllIn(out.queryExecution.executedPlan.toString).size
      println(f"tags=$nTags%2d cols=${3 * nTags}%3d wall=$sec%.2fs " +
        s"stages=${stages.get} exchanges=$exchanges")
    }
    spark.stop()
  }
}

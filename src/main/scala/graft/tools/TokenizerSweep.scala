package graft.tools

import graft.Tables
import graft.text.{Bpe, TextQueries, WordPiece}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fertility-vs-merge-budget sweep for the two merge-trained tokenizers
  * (dev measurement tool, the IVF recall-dial pattern): train BPE and
  * WordPiece at several merge budgets on one corpus and print corpus
  * fertility (tokens/word over the weighted vocabulary) per point — the
  * table SCALE.md commits. BPE fertility is provably non-increasing in
  * the budget (each extra merge can only join adjacent symbols — the
  * spec locks it); WordPiece's greedy munch has no such guarantee, so
  * its dial is measured, not assumed.
  *
  * `sbt "runMain graft.tools.TokenizerSweep /root/testdata/sf0.1 2 4 8 16"`
  */
object TokenizerSweep {

  /** Corpus fertility of a symbolization: Σ n_occ·|tokens| / Σ n_occ. */
  private def fertility(enc: DataFrame): Double = {
    val Array(r) = enc.agg(
      sum(col("w") * size(col("sym"))).cast("double").as("toks"),
      sum(col("w")).cast("double").as("words")).collect()
    r.getDouble(0) / r.getDouble(1)
  }

  /** BPE at budget k: replay the first k trained merges over the vocab. */
  def bpeFertility(docs: DataFrame, merges: Seq[(String, String)], k: Int): Double =
    fertility(merges.take(k).foldLeft(
      Bpe.symbolizeWeighted(docs)) { case (df, (a, b)) =>
      df.withColumn("sym", Bpe.applyMerge(a, b))
    })

  /** WordPiece at budget k: greedy munch against the first k pieces. */
  def wordpieceFertility(docs: DataFrame, pieces: Seq[String], k: Int): Double = {
    val enc = Bpe.symbolizeWeighted(docs)
      .withColumn("t", concat_ws("", col("sym")))
      .withColumn("cnt", WordPiece.munchCount(pieces.take(k)))
    val Array(r) = enc.agg(
      sum(col("w") * col("cnt")).cast("double").as("toks"),
      sum(col("w")).cast("double").as("words")).collect()
    r.getDouble(0) / r.getDouble(1)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TokenizerSweep <sfDir> <k> [k ...]")
    val dir = args.head
    val ks = args.tail.map(_.toInt).sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-tokenizer-sweep")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = Tables.parallel(spark, dir, "documents").cache()
      docs.count()
      val kMax = ks.max
      // train ONCE at the largest budget; smaller budgets are prefixes
      // (both trainers are greedy-sequential, so the first k choices of
      // a k-budget run equal the first k of a kMax-budget run)
      val bpeMerges = Bpe.trainMerges(Bpe.symbolizeWeighted(docs), kMax).map(_._1)
      val wpPieces = WordPiece.trainPieces(Bpe.symbolizeWeighted(docs), kMax)
      val rows = ks.map { k =>
        val b = bpeFertility(docs, bpeMerges, k)
        val w = wordpieceFertility(docs, wpPieces, k)
        f"""{"k":$k,"bpe":$b%.4f,"wordpiece":$w%.4f}"""
      }
      println(s"""{"dir":"$dir","sweep":[${rows.mkString(",")}]}""")
      docs.unpersist()
    } finally spark.stop()
  }
}

package graft.streaming

import graft.Tables
import graft.dedup.DedupQueries
import graft.dedup.DedupQueries.{SimhashBlockBits, SimhashHammingK,
  SimhashNumBlocks}
import graft.text.TextQueries.words
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming Hamming near-dup filter — the deployment twin of
  * [[DedupQueries.dedupSimhashHamming]]: the corpus simhashes are
  * frozen into a block-keyed index ONCE (collapse-first: one row per
  * DISTINCT signature per block, carrying the member id array), and
  * every arriving document is checked as it lands.
  *
  * Everything per-document is a STATELESS projection: the arriving
  * doc's 32-bit simhash is the same in-row aggregate expression the
  * batch gate evaluates ([[DedupQueries.simhashExpr]] — one sha256 per
  * word, majority vote), its K+1 block keys explode from that one
  * value, and candidates come from an INNER stream-static equi-join on
  * (block, key) against the frozen index (Manku et al. 2007: any pair
  * at Hamming ≤ K agrees exactly on some block). The popcount verify
  * and the member-pair expansion are further projections. The one
  * stateful operator is the final `dropDuplicates` collapsing
  * multi-block hits of the same pair — alert-count-sized state, the
  * same bound as [[StreamNearDup]].
  */
object StreamSimhash {

  /** Frozen index: one row per (block j, block key, signature) with the
    * signature's sorted member ids. Build once, reuse for the stream. */
  final case class Index(blocks: DataFrame)

  def buildIndex(s: SparkSession, dir: String): Index = {
    val sigs = Tables.parallel(s, dir, "documents")
      .withColumn("w", words(col("text")))
      .filter(size(col("w")) >= 1)
      .selectExpr("doc_id", s"${DedupQueries.simhashExpr("w")} AS c_sim")
      .groupBy("c_sim")
      .agg(sort_array(collect_list(col("doc_id"))).as("c_ids"))
    val blocks = sigs.select(col("c_sim"), col("c_ids"),
      explode(expr(s"transform(sequence(0, ${SimhashNumBlocks - 1}), " +
        s"j -> struct(j AS j, shiftright(c_sim, $SimhashBlockBits * j) " +
        s"& ${(1 << SimhashBlockBits) - 1} AS key))")).as("b"))
      .select(col("b.j").as("j"), col("b.key").as("key"),
        col("c_sim"), col("c_ids"))
      .localCheckpoint(true)
    Index(blocks)
  }

  /** Arriving (doc_id, text) stream → Hamming near-dup alerts
    * (a_id, b_id, hamming) in the batch gate's canonical orientation;
    * replaying the corpus yields exactly the batch pair relation. */
  def matchesOverStream(docs: DataFrame, idx: Index): DataFrame =
    docs
      .withColumn("w", words(col("text")))
      .filter(size(col("w")) >= 1)
      .selectExpr("doc_id AS s_doc",
        s"${DedupQueries.simhashExpr("w")} AS s_sim")
      .select(col("s_doc"), col("s_sim"),
        explode(expr(s"transform(sequence(0, ${SimhashNumBlocks - 1}), " +
          s"j -> struct(j AS j, shiftright(s_sim, $SimhashBlockBits * j) " +
          s"& ${(1 << SimhashBlockBits) - 1} AS key))")).as("b"))
      .select(col("s_doc"), col("s_sim"), col("b.j").as("j"),
        col("b.key").as("key"))
      .join(idx.blocks, Seq("j", "key")) // stream-static inner equi-join
      .withColumn("hamming",
        expr("cast(bit_count(s_sim ^ c_sim) AS BIGINT)"))
      .filter(col("hamming") >= 1 && col("hamming") <= SimhashHammingK)
      .select(explode(expr("transform(c_ids, y -> struct(" +
        "least(s_doc, y) AS a, greatest(s_doc, y) AS b))")).as("p"),
        col("hamming"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"), col("hamming"))
      .dropDuplicates("a_id", "b_id")

  def outputMode: OutputMode = OutputMode.Append()
}

package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding primitives over the `documents` corpus — the
  * tokenizer-training side of a data pipeline (Sennrich et al. 2016):
  *
  *  - [[bpePairs]]: corpus-wide adjacent-character-pair frequencies (the
  *    statistic the first BPE merge is chosen from), as a gate query with
  *    a DuckDB oracle;
  *  - [[trainMerges]]: the full iterative trainer — k rounds of
  *    count-pairs → pick argmax → apply merge, each round one distributed
  *    aggregation over the symbolized corpus;
  *  - [[bpeEncode]]: the apply side — the trained merge table encoded over
  *    the whole corpus, with a post-training oracle (the merges inlined as
  *    literals into a DuckDB `list_reduce` fold, the same pattern Ivf uses
  *    for its centroids).
  *
  * Scale shape: every round is one explode + one count shuffle (the same
  * shape as `vocab_topk`), and the merge application is a per-row fold —
  * no driver-side data beyond the single winning pair per round. Real
  * trainers batch counts over a word-frequency table instead of raw
  * occurrences — [[symbolizeWeighted]] IS that table (pair counts weighted
  * by word frequency are identical to per-occurrence counts, so the merges
  * are the same while every round shrinks from corpus-sized to
  * vocab-sized), and [[bpeEncode]] trains and encodes over it: at 100 TB
  * the 8 training rounds and the fold both touch the vocabulary relation,
  * and per-source token totals come from one weighted aggregation.
  */
object Bpe {

  val TopPairs = 20

  /** Adjacent 2-char pair counts within words, top [[TopPairs]] by count
    * (ties broken by pair). The `length >= 2` guard precedes the
    * `sequence(1, n-1)` so the sequence bounds are always ascending. */
  def bpePairs(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(s, dir, "documents")
      .select(explode(TextQueries.words(col("text"))).as("t"))
      .filter(length(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(t) - 1), i -> substring(t, i, 2))"))
        .as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("pair"))
      .limit(TopPairs)

  /** Symbolize a corpus for [[trainMerges]]: one row per word occurrence,
    * `sym` = its character array. */
  def symbolize(docs: DataFrame): DataFrame =
    docs.select(explode(TextQueries.words(col("text"))).as("t"))
      .select(charSplit.as("sym"))

  /** Word-frequency symbolization — one row per DISTINCT word with its
    * occurrence count `w`. Pair counts summed over `w` equal the
    * per-occurrence counts exactly, so [[trainMerges]] learns identical
    * merges from a relation the size of the vocabulary, not the corpus. */
  def symbolizeWeighted(docs: DataFrame): DataFrame =
    docs.select(explode(TextQueries.words(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("w"))
      .select(charSplit.as("sym"), col("w"))

  private def charSplit: Column = expr(
    "transform(sequence(1, char_length(t)), i -> substring(t, i, 1))")

  /** One greedy left-to-right application of merge (a, b) → ab over a
    * `sym: array<string>` column — the standard BPE application order, so
    * "aaa" under merge (a, a) becomes ["aa", "a"]. */
  def applyMerge(a: String, b: String): Column = {
    val (qa, qb, qm) = (SqlLit.spark(a), SqlLit.spark(b), SqlLit.spark(a + b))
    expr(
      s"""aggregate(sym, cast(array() AS array<string>),
         |  (acc, x) -> CASE WHEN size(acc) > 0
         |      AND element_at(acc, size(acc)) = $qa AND x = $qb
         |    THEN concat(slice(acc, 1, size(acc) - 1), array($qm))
         |    ELSE concat(acc, array(x)) END)""".stripMargin)
  }

  /** Train `k` BPE merges over a `sym: array<string>` corpus — one row per
    * occurrence ([[symbolize]]) or per distinct word with an occurrence
    * count `w` ([[symbolizeWeighted]]; identical merges, vocab-sized
    * rounds). Each round: count adjacent symbol pairs (one aggregation
    * job), pick the most frequent (count desc, then (a, b) asc for
    * determinism), rewrite every row with [[applyMerge]]'s greedy fold.
    * Returns the merge list as ((a, b), count). */
  def trainMerges(symbolized: DataFrame, k: Int): Seq[((String, String), Long)] = {
    val weight =
      if (symbolized.columns.contains("w")) col("w") else lit(1L).as("w")
    var syms = symbolized.select(col("sym"), weight).cache()
    val merges = Seq.newBuilder[((String, String), Long)]
    try {
      for (_ <- 0 until k) {
        val top = weightedPairs(syms)
          .orderBy(desc("n_ab"), asc("a"), asc("b"))
          .limit(1)
          .collect()
        if (top.isEmpty) return merges.result()
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += (((a, b), n))
        syms = mergeRound(syms, a, b)
      }
      merges.result()
    } finally syms.unpersist()
  }

  /** Weighted adjacent-pair counts of the current symbolization — the
    * per-round statistic BOTH merge trainers ([[trainMerges]] count
    * argmax, [[WordPiece.trainPieces]] likelihood argmax) aggregate. */
  private[text] def weightedPairs(syms: DataFrame): DataFrame =
    syms
      .filter(size(col("sym")) >= 2)
      .select(col("w"), explode(expr(
        """transform(sequence(1, size(sym) - 1),
          |  i -> struct(element_at(sym, i) AS a,
          |              element_at(sym, i + 1) AS b))""".stripMargin))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("w")).as("n_ab"))

  /** Apply merge (a, b), materialize the rewritten cache BEFORE dropping
    * the parent's (the fold references it), return the new relation —
    * the per-round cache discipline shared by both trainers. */
  private[text] def mergeRound(syms: DataFrame, a: String, b: String): DataFrame = {
    val next = syms.select(applyMerge(a, b).as("sym"), col("w")).cache()
    next.count()
    syms.unpersist()
    next
  }

  /** Merges trained (and applied) by [[bpeEncode]]. */
  val KMerges = 8

  /** Gate query for the APPLY side of the tokenizer loop: train
    * [[KMerges]] merges on the word-frequency table, encode every word
    * with them, and emit per-source token totals before/after — the
    * compression check a tokenizer build ends with. Encoding runs on the
    * vocabulary relation and joins back implicitly through the weighted
    * aggregate: `n_occ × tokens(word)` summed per source, never a
    * per-occurrence fold. The oracle is built AFTER training by inlining
    * the merge literals into a chain of DuckDB `list_reduce` folds (list-
    * of-lists accumulator — bit-identical greedy semantics). */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(s, dir, "documents")
    val merges = trainMerges(symbolizeWeighted(docs), KMerges).map(_._1)
    synchronized { lastEncodeOracle = Some(encodeOracleSql(merges)) }
    val vocab = docs
      .select(col("source"), explode(TextQueries.words(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("n_occ"))
      .withColumn("sym", charSplit)
    val enc = merges.foldLeft(vocab) { case (df, (a, b)) =>
      df.withColumn("sym", applyMerge(a, b))
    }
    enc.groupBy("source").agg(
      sum(col("n_occ")).cast("long").as("n_words"),
      sum(col("n_occ") * length(col("t"))).cast("long").as("chars_before"),
      sum(col("n_occ") * size(col("sym"))).cast("long").as("tokens_after"))
  }

  // The encode oracle exists only once the merges are trained (their
  // literals come from the corpus), so bpeEncode records it and `oracles`
  // is a def: Verify runs every query BEFORE dumping oracle SQL.
  private var lastEncodeOracle: Option[String] = None

  /** Post-training oracle for `bpe_encode`: the trained merges inlined as
    * literals; per-merge application = a `list_reduce` over the symbol
    * list wrapped element-per-list (DuckDB's reduce seeds the accumulator
    * with the first element, which matches the fold's empty-acc step). */
  private def encodeOracleSql(merges: Seq[(String, String)]): String = {
    val steps = merges.zipWithIndex.map { case ((a, b), i) =>
      val (qa, qb, qm) = (SqlLit.duck(a), SqlLit.duck(b), SqlLit.duck(a + b))
      s"""s${i + 1} AS (SELECT source, t, n_occ,
         |  list_reduce(list_transform(sym, s -> [s]),
         |    (acc, x) -> CASE WHEN acc[-1] = $qa AND x[1] = $qb
         |      THEN list_append(acc[1:len(acc)-1], $qm)
         |      ELSE list_append(acc, x[1]) END) AS sym
         |  FROM s$i)""".stripMargin
    }
    val ctes = Seq(
      """occ AS (SELECT source,
        |          unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |            AS t
        |        FROM documents)""".stripMargin,
      "voc AS (SELECT source, t, count(*) AS n_occ FROM occ GROUP BY source, t)",
      """s0 AS (SELECT source, t, n_occ,
        |  list_transform(range(1, length(t) + 1), i -> substr(t, i, 1)) AS sym
        |  FROM voc)""".stripMargin) ++ steps
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT source, sum(n_occ)::BIGINT AS n_words,
       |  sum(n_occ * length(t))::BIGINT AS chars_before,
       |  sum(n_occ * len(sym))::BIGINT AS tokens_after
       |FROM s${merges.size} GROUP BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_pairs" -> bpePairs,
    "bpe_encode" -> bpeEncode)

  def oracles: Map[String, String] = {
    val base = Map(
      "bpe_pairs" ->
        (s"WITH ${TextQueries.wordsCte},\n" +
          s"""t AS (SELECT unnest(w) AS t FROM w),
            |p AS (SELECT unnest(list_transform(range(1, length(t)),
            |               i -> substr(t, i, 2))) AS pair
            |      FROM t WHERE length(t) >= 2)
            |SELECT pair, count(*) AS n FROM p GROUP BY pair
            |ORDER BY n DESC, pair ASC LIMIT $TopPairs""".stripMargin))
    synchronized(lastEncodeOracle) match {
      case Some(sql) => base + ("bpe_encode" -> sql)
      case None => base
    }
  }
}

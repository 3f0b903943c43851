package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima 2012; the BERT
  * tokenizer family) — third member of the tokenizer trio next to [[Bpe]]
  * (count-argmax merges, merge-replay apply) and [[Unigram]] (Viterbi over
  * a pruned seed vocabulary). WordPiece differs on BOTH halves of the
  * loop:
  *
  *  - '''training''' picks the merge maximizing the LIKELIHOOD ratio
  *    count(ab) / (count(a)·count(b)) — the pair whose join most improves
  *    a unigram LM of the symbol stream — rather than raw count(ab);
  *  - '''apply''' is greedy longest-match-first (maximal munch) against
  *    the final piece vocabulary, NOT a replay of the merge sequence.
  *
  * Both halves run on the word-frequency relation ([[Bpe.symbolizeWeighted]]
  * — vocab-sized, provably identical statistics to per-occurrence rows).
  * Training pays ONE distributed aggregation (the collected VocabCap-
  * bounded vocabulary) and loops locally ([[Bpe.trainMerges]] split);
  * the apply side compiles the trained
  * pieces into a per-length literal CASE chain inside one `aggregate` fold
  * — pure codegen-able Catalyst, no UDF, vocab-sized input. The oracle is
  * built AFTER training ([[Bpe]]/Ivf pattern): the same maximal-munch fold
  * as a DuckDB `list_reduce` with the piece literals inlined — integer
  * position/count arithmetic only, so the gate is exact hash equality.
  *
  * The `##` continuation marking of BERT vocabularies is presentation: it
  * distinguishes word-initial from word-internal pieces in the emitted
  * token STRINGS. The gate emits fertility totals (token counts), which
  * the marking cannot change; single characters are always in-vocab, so
  * the UNK fallback tokenizes unknown characters one-by-one.
  */
object WordPiece {

  /** Merges trained (and applied) by [[wordpieceEncode]]. */
  val KMerges = 8

  /** Train `k` likelihood-scored merges over a weighted `(sym, w)` corpus:
    * ONE distributed aggregation ([[Bpe.collectVocab]] — the word-
    * frequency table, VocabCap-bounded), then the k-round loop locally
    * (the [[Bpe.trainMerges]] split; formerly two aggregations + a
    * corpus rewrite per merge). Per round: adjacent-pair counts and
    * unigram symbol counts over the vocab rows, score = n_ab /
    * (n_a · n_b) in double (the identical IEEE ops the distributed round
    * computed — same argmax), tie-break (score desc, a asc, b asc),
    * then [[Bpe.applyMergeLocal]]'s greedy fold rewrites the rows.
    * Returns the merged piece strings in training order. */
  def trainPieces(symbolized: DataFrame, k: Int): Seq[String] = {
    var words = Bpe.collectVocab(symbolized)
    val pieces = Seq.newBuilder[String]
    var taken = 0
    var exhausted = false
    while (taken < k && !exhausted) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      val unitCounts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (syms, w) =>
        var i = 0
        while (i < syms.length) {
          unitCounts.update(syms(i), unitCounts.getOrElse(syms(i), 0L) + w)
          if (i < syms.length - 1) {
            val key = (syms(i), syms(i + 1))
            pairCounts.update(key, pairCounts.getOrElse(key, 0L) + w)
          }
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((a, b), _) = pairCounts.minBy { case ((a, b), nAb) =>
          (-(nAb.toDouble /
            (unitCounts(a).toDouble * unitCounts(b).toDouble)), a, b)
        }
        pieces += (a + b)
        taken += 1
        words = words.map { case (syms, w) =>
          (Bpe.applyMergeLocal(syms, a, b), w)
        }
      }
    }
    pieces.result()
  }

  /** SQL-text form of the maximal-munch fold over the word expression
    * `word` (a column name or a lambda variable — the nesting
    * [[graft.streaming.StreamTokenize]] needs): `char_length` steps of
    * `(pos, cnt)` state; each step tries piece lengths longest-first
    * (per-length literal IN lists) and falls back to a single character
    * (every char is in-vocab; unknown chars become 1 token each). Steps
    * after `pos` passes the end are identity. */
  private[graft] def munchSql(pieces: Seq[String], word: String): String = {
    val byLen = pieces.distinct.filter(_.length >= 2)
      .groupBy(_.length).toSeq.sortBy(-_._1)
    val arms = byLen.map { case (len, ps) =>
      val inList = ps.sorted.map(SqlLit.spark).mkString(", ")
      s"""WHEN acc.pos + ${len - 1} <= char_length($word)
         |  AND substring($word, acc.pos, $len) IN ($inList)
         |THEN named_struct('pos', acc.pos + $len, 'cnt', acc.cnt + 1)"""
        .stripMargin
    }.mkString("\n")
    s"""aggregate(sequence(1, char_length($word)),
       |  named_struct('pos', 1, 'cnt', 0),
       |  (acc, i) -> CASE
       |    WHEN acc.pos > char_length($word) THEN acc
       |    $arms
       |    ELSE named_struct('pos', acc.pos + 1, 'cnt', acc.cnt + 1) END,
       |  acc -> acc.cnt)""".stripMargin
  }

  /** Maximal-munch token count of word column `t` — see [[munchSql]]. */
  def munchCount(pieces: Seq[String]): Column = expr(munchSql(pieces, "t"))

  /** Broadcast-relation twin of [[munchCount]] — the production-vocabulary
    * apply path. The literal path inlines every trained piece into the
    * plan (ideal at gate vocab: InSet, codegen); at a 30k-piece BERT-style
    * vocabulary the plan would embed the whole vocabulary. Here the pieces
    * arrive as a broadcast-joined RELATION, so plan size depends only on
    * the MAX piece length:
    *
    *  1. explode each distinct word into (pos, candidate-length) windows,
    *     join `substring(t, pos, len)` against the broadcast piece
    *     relation, keep per-(word, pos) the LONGEST match — the "jump";
    *  2. fold over the word once, following jumps (missing pos → single
    *     char, the always-in-vocab fallback), counting tokens.
    *
    * Greedy longest-match-first semantics are identical to the literal
    * CASE chain (its arms are ordered longest-first, so the taken arm IS
    * the max matching length). Input `words` must have a string column
    * `t` (distinct words — the vocab-sized apply relation); returns
    * `(t, cnt)`. */
  def munchCountsBroadcast(words: DataFrame, pieces: Seq[String]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val ps = pieces.distinct.filter(_.length >= 2)
    if (ps.isEmpty)
      return words.select(col("t"), char_length(col("t")).cast("int").as("cnt"))
    val maxLen = ps.map(_.length).max
    val pieceRel = ps.map(p => (p, p.length)).toDF("piece", "piece_len")
    val cand = words
      .select(col("t"), explode(sequence(lit(1), char_length(col("t")))).as("pos"))
      .select(col("t"), col("pos"),
        explode(sequence(lit(2), lit(maxLen))).as("cand_len"))
      .filter(col("pos") + col("cand_len") - 1 <= char_length(col("t")))
      .withColumn("sub", col("t").substr(col("pos"), col("cand_len")))
    val jumps = cand
      .join(broadcast(pieceRel),
        cand("sub") === pieceRel("piece") &&
          cand("cand_len") === pieceRel("piece_len"))
      .groupBy("t", "pos").agg(max(col("cand_len")).as("jump"))
      .groupBy("t").agg(map_from_entries(
        collect_list(struct(col("pos"), col("jump")))).as("jumps"))
    words.join(jumps, Seq("t"), "left")
      .select(col("t"), expr(
        """aggregate(sequence(1, char_length(t)),
          |  named_struct('pos', 1, 'cnt', 0),
          |  (acc, i) -> CASE WHEN acc.pos > char_length(t) THEN acc
          |    ELSE named_struct(
          |      'pos', acc.pos + coalesce(try_element_at(jumps, acc.pos), 1),
          |      'cnt', acc.cnt + 1) END,
          |  acc -> acc.cnt)""".stripMargin).as("cnt"))
  }

  /** Gate query: train [[KMerges]] likelihood merges, tokenize the corpus
    * vocabulary by maximal munch, and emit per-source fertility totals in
    * the same shape as `bpe_encode`/`unigram_encode` so the three
    * tokenizers compare column-for-column. */
  def wordpieceEncode(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(s, dir, "documents")
    val pieces = trainPieces(Bpe.symbolizeWeighted(docs), KMerges)
    synchronized { lastEncodeOracle = Some(encodeOracleSql(pieces)) }
    docs
      .select(col("source"), explode(TextQueries.words(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("n_occ"))
      .withColumn("cnt", munchCount(pieces))
      .groupBy("source").agg(
        sum(col("n_occ")).cast("long").as("n_words"),
        sum(col("n_occ") * length(col("t"))).cast("long").as("chars_before"),
        sum(col("n_occ") * col("cnt")).cast("long").as("tokens_after"))
  }

  // Post-training oracle (Bpe pattern): exists only once the pieces are
  // trained; Verify runs queries before dumping oracle SQL.
  private var lastEncodeOracle: Option[String] = None

  /** DuckDB twin of [[munchCount]]: `list_reduce` over a prepended-seed
    * list (DuckDB's reduce takes the first element as the accumulator, so
    * the seed `[1, 0]` rides in front of `char_length(t)` dummy elements
    * — same trick as the `bpe_encode` oracle), with the identical
    * per-length CASE chain over `[pos, cnt]` integer state. */
  private def encodeOracleSql(pieces: Seq[String]): String = {
    val byLen = pieces.distinct.filter(_.length >= 2)
      .groupBy(_.length).toSeq.sortBy(-_._1)
    val arms = byLen.map { case (len, ps) =>
      val inList = ps.sorted.map(SqlLit.duck).mkString(", ")
      s"""WHEN acc[1] + ${len - 1} <= length(t)
         |  AND substr(t, acc[1], $len) IN ($inList)
         |THEN [acc[1] + $len, acc[2] + 1]""".stripMargin
    }.mkString("\n")
    s"""WITH occ AS (SELECT source,
       |          unnest(list_filter(string_split(text, ' '), x -> x <> ''))
       |            AS t
       |        FROM documents),
       |voc AS (SELECT source, t, count(*) AS n_occ FROM occ GROUP BY source, t),
       |enc AS (SELECT source, t, n_occ,
       |  list_reduce(
       |    list_prepend([1, 0],
       |      list_transform(range(1, length(t) + 1), i -> [0, 0])),
       |    (acc, x) -> CASE
       |      WHEN acc[1] > length(t) THEN acc
       |      $arms
       |      ELSE [acc[1] + 1, acc[2] + 1] END)[2] AS cnt
       |  FROM voc)
       |SELECT source, sum(n_occ)::BIGINT AS n_words,
       |  sum(n_occ * length(t))::BIGINT AS chars_before,
       |  sum(n_occ * cnt)::BIGINT AS tokens_after
       |FROM enc GROUP BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wordpiece_encode" -> wordpieceEncode)

  def oracles: Map[String, String] =
    synchronized(lastEncodeOracle) match {
      case Some(sql) => Map("wordpiece_encode" -> sql)
      case None => Map.empty
    }
}

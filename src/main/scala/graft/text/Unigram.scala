package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the SentencePiece-family counterpart of [[Bpe]]): seed a piece
  * inventory from substring frequencies, score pieces by corpus
  * surprisal, Viterbi-segment every word to the minimum-cost piece
  * sequence, re-estimate piece frequencies from the segmentations
  * (hard/Viterbi EM — the integer-exact stand-in for SentencePiece's
  * expected-count EM, whose float lattice posteriors have no
  * cross-engine bit guarantee), prune unused pieces, and segment again.
  * Costs stay in the engine's integer house style: piece cost =
  * bit-length surprisal `length(bin(total div freq))` (see
  * [[TextQueries.qualityLmScore]]), so every comparison is exact in
  * both engines.
  *
  * Everything is vocab-bounded: training folds run on the DISTINCT-word
  * relation (one row per word type, weighted by occurrence count — the
  * same trick as [[Bpe.symbolizeWeighted]]), the piece table is hinted
  * broadcast into the edge join, and the only corpus-sized jobs are the
  * two word-count aggregations at the ends. The per-word Viterbi is one
  * `aggregate` fold over `char_length(t)` positions with an
  * `array_min` over same-end edges — the DP VALUE (min cost, then min
  * piece count) is tie-free, so the gate output is deterministic under
  * any candidate order; only the M-step's path extraction needs a tie
  * rule (shortest edge first), and that is Spark-internal.
  *
  * The oracle is built post-training ([[Ivf]]/[[Bpe]] pattern): the
  * final piece-cost table is inlined as literals and DuckDB replays
  * ONLY the final Viterbi value-DP (a `list_reduce` over positions with
  * a seed element, list-of-[cost,k] accumulator) plus the per-source
  * aggregation — bit-identical integer arithmetic, no float anywhere.
  * Collecting the final piece table to the driver for the oracle is
  * vocab-sized by design (the Bloom/centroid/merge-literal precedent).
  */
object Unigram {

  /** Longest candidate piece. 4 on a max-8-char vocabulary keeps every
    * word a genuine multi-edge DP (≥ 2 pieces) while the candidate set
    * stays ≤ 4 × chars per word. */
  val MaxPiece = 4

  /** Edge inventory of a word: every (end, len ≤ [[MaxPiece]]) substring
    * position, as one exploded struct column `ed = (e, l, p)`. */
  private def edgeCandidates: Column = explode(expr(
    s"""flatten(transform(sequence(1, char_length(t)),
       |  e -> transform(sequence(1, least($MaxPiece, e)),
       |    l -> struct(cast(e AS bigint) AS e, cast(l AS bigint) AS l,
       |                substring(t, e - l + 1, l) AS p))))""".stripMargin))

  /** Distinct words with corpus occurrence weights — the training
    * relation ([[Bpe.symbolizeWeighted]]'s shape). */
  private def distinctWords(docs: DataFrame): DataFrame =
    docs.select(explode(TextQueries.words(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("w"))

  /** Seed piece frequencies: every substring occurrence (per position),
    * weighted by the containing word's corpus count. */
  private def seedFreqs(words: DataFrame): DataFrame =
    words.select(col("w"), edgeCandidates.as("ed"))
      .groupBy(col("ed.p").as("p")).agg(sum(col("w")).as("f"))

  /** Bit-length surprisal costs over a (p, f) frequency table:
    * c = length(bin(total div f)) — integer-exact in both engines. */
  private def withCosts(freqs: DataFrame): DataFrame = {
    val tot = freqs.agg(sum(col("f")).cast("long").as("tot"))
    freqs.crossJoin(broadcast(tot))
      .select(col("p"),
        length(bin(expr("tot div f"))).cast("long").as("c"))
  }

  /** Per-word Viterbi edge lists: candidate positions joined to the
    * (hinted-broadcast, vocab-sized) piece cost table. Pieces pruned in
    * the M-step simply produce no edge; single-char pieces are always
    * retained, so every position stays reachable. */
  private def edgeLists(words: DataFrame, costs: DataFrame): DataFrame =
    words.select(col("t"), col("w"), edgeCandidates.as("ed"))
      .select(col("t"), col("w"), col("ed.e"), col("ed.l"), col("ed.p"))
      .join(broadcast(costs), "p")
      .groupBy("t", "w")
      .agg(collect_list(struct(col("e"), col("l"), col("c"))).as("edges"))

  /** The Viterbi value DP: best(i) = (cost, pieces) of the cheapest
    * segmentation of the first i chars, as `best[i+1]` of the result
    * array (best[1] = (0, 0) seed). `array_min` over structs is the
    * lexicographic (cost, pieces) argmin — tie-free as a VALUE. */
  private def dpBest: Column = expr(
    """aggregate(sequence(1, char_length(t)),
      |  array(named_struct('c', cast(0 AS bigint), 'k', cast(0 AS bigint))),
      |  (acc, i) -> concat(acc, array(array_min(transform(
      |    filter(edges, ed -> ed.e = i),
      |    ed -> named_struct(
      |      'c', element_at(acc, cast(i - ed.l + 1 AS int)).c + ed.c,
      |      'k', element_at(acc, cast(i - ed.l + 1 AS int)).k + 1))))))
      |""".stripMargin)

  /** Path extraction for the M-step: walk backward from char_length(t),
    * at each stop taking the SHORTEST edge consistent with the DP value
    * (the Spark-internal tie rule; the gate output never depends on
    * it). One fold step per position bounds the walk. */
  private def backtrackUsed: Column = {
    val minL =
      """array_min(transform(filter(edges, ed -> ed.e = acc.pos
        |  AND element_at(best, cast(acc.pos - ed.l + 1 AS int)).c + ed.c
        |      = element_at(best, cast(acc.pos + 1 AS int)).c
        |  AND element_at(best, cast(acc.pos - ed.l + 1 AS int)).k + 1
        |      = element_at(best, cast(acc.pos + 1 AS int)).k),
        |ed -> ed.l))""".stripMargin
    expr(
      s"""aggregate(sequence(1, char_length(t)),
         |  named_struct('pos', cast(char_length(t) AS bigint),
         |               'used', cast(array() AS array<string>)),
         |  (acc, i) -> CASE WHEN acc.pos = 0 THEN acc ELSE named_struct(
         |    'pos', acc.pos - $minL,
         |    'used', concat(acc.used, array(substring(t,
         |      cast(acc.pos - $minL + 1 AS int), cast($minL AS int))))) END,
         |  acc -> acc.used)""".stripMargin)
  }

  /** One hard-EM round: segment with `costs`, re-count piece usage from
    * the chosen paths, keep used pieces (single-char pieces always, at
    * frequency ≥ 1 — the fallback inventory), re-score. */
  private def emRound(words: DataFrame, seed: DataFrame,
                      costs: DataFrame): DataFrame = {
    val usage = edgeLists(words, costs)
      .withColumn("best", dpBest)
      .select(col("w"), explode(backtrackUsed).as("p"))
      .groupBy("p").agg(sum(col("w")).as("u"))
    val refreshed = seed.select(col("p")).join(usage, Seq("p"), "left")
      .select(col("p"),
        when(length(col("p")) === 1,
          greatest(coalesce(col("u"), lit(0L)), lit(1L)))
          .otherwise(coalesce(col("u"), lit(0L))).as("f"))
      .filter(col("f") > 0)
    withCosts(refreshed)
  }

  /** Train end-to-end and return the final piece-cost table, sorted by
    * piece. EXECUTES the training (this is the one vocab-sized driver
    * collect — the merge-literal precedent); the word-count and seed
    * relations are cached for the duration so the corpus is scanned
    * once, and unpersisted before returning. Shared verbatim by the
    * gate query and the spec so the two can never train different
    * models. */
  def trainedCosts(s: SparkSession, dir: String): Seq[(String, Long)] = {
    val words = distinctWords(Tables.parallel(s, dir, "documents")).cache()
    try trainedCostsOver(words)
    finally words.unpersist()
  }

  /** Training over an explicit distinct-word relation — shared by
    * [[trainedCosts]] and [[unigramEncode]], which materializes the
    * words ONCE and reuses them for the apply-phase segmentation
    * (previously the apply re-derived distinct words with a fresh
    * corpus scan + shuffle after training unpersisted them). */
  private def trainedCostsOver(words: DataFrame): Seq[(String, Long)] = {
    val seed = seedFreqs(words).cache()
    try
      emRound(words, seed, withCosts(seed)).orderBy("p").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    finally seed.unpersist()
  }

  /** Gate query: per-source fertility of the trained unigram tokenizer —
    * (n_words, chars_before, tokens_after), directly comparable with
    * [[Bpe.bpeEncode]]'s columns on the same corpus. Training runs once
    * in [[trainedCosts]]; the returned APPLY plan references only the
    * collected piece literals (a local relation, like [[Ivf]]'s
    * centroid literals), so it rescans the corpus exactly twice — the
    * distinct-word relation for segmentation and the per-source word
    * counts — instead of replaying the training DAG. The final per-word
    * token count comes from the tie-free value DP and joins (broadcast,
    * vocab-sized) onto the per-source word counts. */
  def unigramEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.parallel(s, dir, "documents")
    // one materialized distinct-word relation feeds training (seed +
    // EM edge lists) AND the apply-phase segmentation — one corpus
    // word-count pass instead of two
    val words = distinctWords(docs).localCheckpoint(true)
    val pieceLits = trainedCostsOver(words)
    synchronized { lastOracle = Some(oracleSql(pieceLits)) }
    val litCosts = pieceLits.toDF("p", "c")
    val segmented = edgeLists(words, litCosts)
      .withColumn("best", dpBest)
      .select(col("t"),
        expr("element_at(best, char_length(t) + 1).k").as("k"))
    val perSource = docs
      .select(col("source"), explode(TextQueries.words(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("n_occ"))
    perSource.join(broadcast(segmented), "t")
      .groupBy("source").agg(
        sum(col("n_occ")).cast("long").as("n_words"),
        sum(col("n_occ") * length(col("t"))).cast("long").as("chars_before"),
        sum(col("n_occ") * col("k")).cast("long").as("tokens_after"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "unigram_encode" -> unigramEncode)

  private var lastOracle: Option[String] = None

  private def q(v: String) = SqlLit.duck(v)

  /** Post-training oracle: the trained piece costs inlined as literals;
    * the same value DP as [[dpBest]] as a `list_reduce` over positions
    * (seed element prepended — DuckDB 1.0's reduce has no initial-value
    * arg), accumulator = list of [cost, pieces] pairs, candidate argmin
    * via `list_aggregate(..., 'min')` (lexicographic on lists). */
  private def oracleSql(pieces: Seq[(String, Long)]): String = {
    val rows = pieces.map { case (p, c) => s"(${q(p)}, $c)" }
      .mkString(",\n    ")
    s"""WITH pieces(p, c) AS (VALUES
       |    $rows),
       |occ AS (SELECT source,
       |          unnest(list_filter(string_split(text, ' '), x -> x <> ''))
       |            AS t
       |        FROM documents),
       |voc AS (SELECT source, t, count(*) AS n_occ FROM occ GROUP BY source, t),
       |w AS (SELECT DISTINCT t FROM voc),
       |pos AS (SELECT t, unnest(range(1, length(t) + 1)) AS e FROM w),
       |cand AS (
       |  SELECT t, e, unnest(range(1, least($MaxPiece, e) + 1)) AS l
       |  FROM pos),
       |edge AS (
       |  SELECT c1.t, list([c1.e::BIGINT, c1.l::BIGINT, p.c::BIGINT]) AS edges
       |  FROM cand c1 JOIN pieces p ON substr(c1.t, c1.e - c1.l + 1, c1.l) = p.p
       |  GROUP BY c1.t),
       |dp AS (
       |  SELECT t,
       |    list_reduce(
       |      list_concat([[[0, 0]]::BIGINT[][]],
       |        list_transform(range(1, length(t) + 1), i -> [[i, 0]]::BIGINT[][])),
       |      (acc, x) -> list_append(acc,
       |        list_aggregate(
       |          list_transform(
       |            list_filter(edges, ed -> ed[1] = x[1][1]),
       |            ed -> [acc[x[1][1] - ed[2] + 1][1] + ed[3],
       |                   acc[x[1][1] - ed[2] + 1][2] + 1]),
       |          'min'))) AS best
       |  FROM edge)
       |SELECT v.source, sum(v.n_occ)::BIGINT AS n_words,
       |  sum(v.n_occ * length(v.t))::BIGINT AS chars_before,
       |  sum(v.n_occ * d.best[length(v.t) + 1][2])::BIGINT AS tokens_after
       |FROM voc v JOIN dp d ON v.t = d.t
       |GROUP BY v.source""".stripMargin
  }

  def oracles: Map[String, String] =
    synchronized(lastOracle) match {
      case Some(sql) => Map("unigram_encode" -> sql)
      case None => Map.empty
    }
}

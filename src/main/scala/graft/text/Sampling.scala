package graft.text

import graft.Tables
import graft.text.TextQueries.{hex32, words}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data mixing:
  *
  *  - deterministic cap-per-group sampling ("at most k documents per
  *    source"): rank by a sha256-derived hash instead of rand() — the
  *    shuffle-safe, replayable form of reservoir sampling (same sample on
  *    every rerun, any partitioning, any cluster size);
  *  - token-budget selection ("best documents per source until N tokens"):
  *    quality-ordered running token sum per group, cut at the budget —
  *    the mixing step that builds a fixed-size training blend.
  *
  * Both are one window over one key shuffle; no collect, no per-group
  * memory beyond the running aggregates.
  */
object Sampling {

  val CapPerSource = 5
  val TokenBudgetPerSource = 400L

  /** THE token count all corpus-shaping operators share (whitespace words
    * of `text`) — one definition so a tokenizer change can't leave two
    * windows and two oracle CTEs disagreeing. */
  private def nTokens: Column = size(words(col("text"))).cast("long")

  /** Running per-group token sum over an `n_tokens` column in `order`. */
  private def runningTokens(order: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum("n_tokens").over(order.rowsBetween(Window.unboundedPreceding,
      Window.currentRow))

  /** At most [[CapPerSource]] docs per source, chosen by hash order. */
  def samplePerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(hex32(concat(col("source"), lit("|"), col("doc_id"))),
        col("doc_id"))
    Tables(s, dir, "documents")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= CapPerSource)
      .select(col("source"), col("rk"), col("doc_id"))
  }

  /** Highest-uniqueness docs per source until the running whitespace-token
    * count exceeds the budget (the first doc crossing the line is kept, as
    * budget mixes usually overshoot one doc rather than undershoot). */
  def tokenBudgetMix(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .withColumn("n_tokens", nTokens)
      .withColumn("uniq_ratio",
        size(array_distinct(words(col("text")))) / size(words(col("text"))))
    val order = Window.partitionBy("source")
      .orderBy(desc("uniq_ratio"), asc("doc_id"))
    d.withColumn("running_tokens", runningTokens(order))
      .filter(col("running_tokens") - col("n_tokens") < TokenBudgetPerSource)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("running_tokens"))
  }

  /** Split-bucket hash of a doc key — THE single statement of the
    * assignment hash, shared by [[trainSplit]], [[splitLeakfree]] and
    * the in-row streaming form [[splitOf]] so a consumer can never
    * disagree with the table about where a document landed. */
  private[graft] def splitBucket(key: Column): Column =
    pmod(hex32(concat(lit("split|"), key)), lit(100))

  private[graft] def splitFromBucket(bucket: Column): Column =
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")

  /** A document's split as ONE in-row expression (no table lookup) —
    * what a streaming consumer computes for an ARRIVING doc; equals
    * [[trainSplit]]'s `split` column by shared construction. */
  def splitOf(docId: Column): Column = splitFromBucket(splitBucket(docId))

  /** Deterministic train/val/test assignment — the split every training
    * pipeline needs to be REPRODUCIBLE and LEAK-FREE: the bucket is a
    * sha256-derived hash of a salted doc key (never `rand()` — reruns,
    * retries and repartitions must all agree), and `group_split` assigns
    * by `source` only, so correlated documents travel together and cannot
    * leak across the split boundary. Pure projection: no shuffle at all. */
  def trainSplit(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .withColumn("bucket", splitBucket(col("doc_id")))
      .withColumn("g_bucket",
        pmod(hex32(concat(lit("gsplit|"), col("source"))), lit(100)))
      .select(col("doc_id"), col("source"), col("bucket"),
        splitFromBucket(col("bucket")).as("split"),
        splitFromBucket(col("g_bucket")).as("group_split"))
  }

  /** Cross-split leakage report — the governance check a train/val/test
    * release runs AFTER splitting: any verified near-duplicate pair
    * whose members landed in DIFFERENT splits is an eval-leakage path
    * (the val/test member is effectively in the training set). Composes
    * two proven gates — [[trainSplit]]'s hash assignment and the
    * LSH-verified near-dup pair relation — so the report cannot drift
    * from either; the fix it motivates (split by CLUSTER, not by doc)
    * is exactly why `dedup_clusters` runs before splitting in a real
    * pipeline. Scale: pair-bound (a projection join over the verified
    * pair relation + the split projection). */
  def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.dedup.DedupQueries.dedupMinhashLsh(s, dir)
      .select(col("a_id"), col("b_id"), col("jaccard"))
    val splits = trainSplit(s, dir).select(col("doc_id"), col("split"))
    pairs
      .join(splits.select(col("doc_id").as("a_id"),
        col("split").as("split_a")), "a_id")
      .join(splits.select(col("doc_id").as("b_id"),
        col("split").as("split_b")), "b_id")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("a_id"), col("b_id"), col("split_a"), col("split_b"),
        col("jaccard"))
  }

  /** Leakage-FREE split assignment — the fix [[splitLeakage]]'s report
    * motivates, shipped as its own operator: documents are bucketed by
    * the hash of their near-dup CLUSTER id (the [[graft.dedup
    * .ConnectedComponents.dedupClusters]] label) instead of their own
    * id, so every verified near-dup pair — and transitively every
    * member of a cluster — lands in the SAME split by construction, and
    * [[splitLeakage]] recomputed over this assignment is empty (spec'd).
    * Unclustered documents hash their own id with the SAME salt as
    * [[trainSplit]], so only clustered documents move relative to the
    * naive assignment. Scale: one left join against the pair-bound
    * cluster labels on top of the zero-shuffle projection. */
  def splitLeakfree(s: SparkSession, dir: String): DataFrame = {
    val clusters = graft.dedup.ConnectedComponents.dedupClusters(s, dir)
      .select(col("doc_id"), col("cluster_id"))
    Tables(s, dir, "documents")
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket", splitBucket(col("split_key")))
      .select(col("doc_id"), col("split_key"), col("bucket"),
        splitFromBucket(col("bucket")).as("split"))
  }

  /** Deterministic stratified sampling — the reproducible twin of
    * `DataFrameStatFunctions.sampleBy`: each stratum keeps its own
    * fraction of rows, membership decided by a salted hash so reruns,
    * task retries and repartitionings all keep the identical sample (the
    * property `rand()`-based sampleBy lacks). Pure projection + filter:
    * no shuffle. The per-source fraction here is itself hash-derived
    * (0–99 %) to exercise a distinct threshold per stratum without a
    * config table; production code passes a `Map[stratum, fraction]`. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("threshold",
        pmod(hex32(concat(lit("frac|"), col("source"))), lit(100)))
      .withColumn("h",
        pmod(hex32(concat(lit("strat|"), col("source"), lit("|"),
          col("doc_id"))), lit(100)))
      .filter(col("h") < col("threshold"))
      .select(col("doc_id"), col("source"), col("threshold"), col("h"))

  val PackBinTokens = 2048L

  /** Sequence packing — the concat-and-chunk step that turns a document
    * stream into fixed-budget training bins: per source, documents are
    * laid out in deterministic order and each belongs to the bin its
    * start offset falls in (`floor(start / budget)`). One window over one key
    * shuffle (same shape as [[tokenBudgetMix]]); bin summary per
    * (source, bin). Greedy first-fit packing is inherently sequential —
    * this cumulative-floor layout is the distributed-friendly form, and
    * the wasted tail per bin is bounded by one document. */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("source").orderBy("doc_id")
    Tables(s, dir, "documents")
      .withColumn("n_tokens", nTokens)
      .withColumn("running", runningTokens(order))
      .withColumn("bin_id",
        ((col("running") - col("n_tokens")) / PackBinTokens).cast("long"))
      .groupBy("source", "bin_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("bin_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  /** Padding-strategy batch planner — the strategy twin of
    * [[packSequences]]: instead of concatenating docs into fixed bins,
    * batch docs of similar length and pad to the bucket size. Buckets
    * are exact powers of two (bucket/2 < n_tokens ≤ bucket, computed
    * with INTEGER bit arithmetic — `shiftleft(1, length(bin(n-1)))` —
    * because `ceil(log2(n))` through doubles mis-buckets near powers
    * of two and `log` carries no cross-engine rounding guarantee).
    * Per bucket: docs, real tokens, padded tokens, waste ratio — the
    * readout that decides between padding and packing for a corpus.
    * Pure projection + one bucket-keyed aggregation (partials ∝
    * ~20 buckets per partition); zero joins. */
  def lengthBuckets(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("n_tokens", nTokens)
      .filter(col("n_tokens") >= 1)
      .withColumn("bucket", expr(
        "CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT) " +
          "ELSE shiftleft(CAST(1 AS BIGINT), length(bin(n_tokens - 1))) " +
          "END"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("total_tokens"))
      .select(col("bucket"), col("n_docs"), col("total_tokens"),
        (col("bucket") * col("n_docs")).as("padded_tokens"),
        round(lit(1.0) -
          col("total_tokens") / (col("bucket") * col("n_docs")), 4)
          .as("waste_ratio"))

  /** Temperature-weighted source mixture — the sampling-weight table for
    * multi-source training blends: weight_s ∝ tokens_s^α normalized over
    * sources, with α = 0.5 (temperature sampling à la multilingual LM
    * training; α < 1 upweights small sources). α is fixed at 1/2 so the
    * power is `sqrt` — a correctly-rounded IEEE op both engines compute
    * bit-identically, unlike `pow(x, 0.7)` which carries no such
    * guarantee. The normalizing sum is folded over a SORTED per-source
    * list (sources are few by definition), pinning the double-summation
    * order so the denominator is also bit-identical cross-engine — the
    * same discipline `runningTokens` applies to window order. */
  def mixWeights(s: SparkSession, dir: String): DataFrame = {
    val per = Tables(s, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(nTokens).cast("long").as("tokens"))
    val denom = per.agg(
      aggregate(
        array_sort(collect_list(struct(col("source"),
          sqrt(col("tokens").cast("double")).as("sq")))),
        lit(0.0), (a, x) => a + x.getField("sq")).as("denom"))
    per.crossJoin(denom)
      .select(col("source"), col("n_docs"), col("tokens"),
        round(sqrt(col("tokens").cast("double")) / col("denom"), 6).as("weight"))
  }

  /** Temperature-scaled mixture weights — the sampling-temperature dial
    * of multi-source data mixing (Gopher/LLaMA-style `w ∝ mass^(1/T)`):
    * T=1 is proportional sampling, T→∞ uniform, and intermediate T
    * up-weights small sources without drowning large ones.
    * [[mixWeights]] is exactly the T=2 column. The grid is {1, 2, 4, ∞}
    * BY DESIGN: those exponents evaluate as sqrt chains, which IEEE
    * requires correctly rounded in both engines — a general `pow` is
    * not, and would make the hash gate flaky in the last ulp. Denominator
    * sums run in source-sorted order (the [[mixWeights]] fold), so the
    * doubles are order-deterministic. */
  def mixWeightsTemp(s: SparkSession, dir: String): DataFrame = {
    val per = Tables(s, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(nTokens).cast("long").as("tokens"))
    def v(t: Int): Column = t match {
      case 1 => col("tokens").cast("double")
      case 2 => sqrt(col("tokens").cast("double"))
      case _ => sqrt(sqrt(col("tokens").cast("double")))
    }
    def denomOf(t: Int): Column =
      aggregate(
        array_sort(collect_list(struct(col("source"), v(t).as("v")))),
        lit(0.0), (a, x) => a + x.getField("v"))
    val denom = per.agg(
      denomOf(1).as("d1"), denomOf(2).as("d2"), denomOf(4).as("d4"),
      count(lit(1)).as("nsrc"))
    per.crossJoin(denom)
      .select(col("source"), col("n_docs"), col("tokens"),
        round(v(1) / col("d1"), 6).as("w_t1"),
        round(v(2) / col("d2"), 6).as("w_t2"),
        round(v(4) / col("d4"), 6).as("w_t4"),
        round(lit(1.0) / col("nsrc"), 6).as("w_uniform"))
  }

  /** Negatives per anchor, and the anchor subsample stride (every 50th
    * doc keeps the gate output compact; production uses stride 1). */
  val NegPerAnchor = 4
  val AnchorStride = 50L

  /** Deterministic contrastive negative mining — for each anchor document,
    * [[NegPerAnchor]] pseudo-random partner documents drawn uniformly from
    * the corpus by hashing (anchor, j) into the contiguous doc_id space.
    * No rand(): reruns, task retries, and any partitioning produce the
    * same pairs (the property that makes a 100 TB contrastive-pairs build
    * resumable), and the oracle re-derives them exactly. Self-pairs are
    * dropped (expected 1/n of draws), and two draws j1 != j2 that hash to
    * the same partner are collapsed to one (doc_id, neg_id) row keeping
    * the smallest j — so an anchor never receives duplicate negatives,
    * at the cost of occasionally fewer than [[NegPerAnchor]] partners.
    * The emitted (anchor, neg_id) list is the JOIN SPEC for the gather
    * step — at scale the text/embedding fetch is one hash join by
    * neg_id, never a shuffle of the corpus per anchor. */
  def negativePairs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(col("doc_id"))
      .filter(col("doc_id") % AnchorStride === 0)
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("n_docs"),
        explode(sequence(lit(1), lit(NegPerAnchor))).as("j"))
      .withColumn("neg_id",
        hex32(concat(col("doc_id").cast("string"), lit("#"),
          col("j").cast("string"))) % col("n_docs"))
      .filter(col("neg_id") =!= col("doc_id"))
      .groupBy(col("doc_id"), col("neg_id"))
      .agg(min(col("j")).cast("long").as("j"))
      .select(col("doc_id"), col("j"), col("neg_id"))
  }

  /** Epoch-cap water-filling budget (numerator/denominator of the
    * total-mass multiple): B = 3·M/2 — more than one epoch of the
    * corpus, so low-cap sources bind and their excess flows to
    * high-cap sources. */
  val EpochBudgetNum = 3L
  val EpochBudgetDen = 2L

  /** Global token-budget allocation with per-source MAX-EPOCH caps —
    * the data-recipe constraint ("never repeat a source more than E
    * times") solved as water-filling in CLOSED FORM, no iteration:
    * every uncapped source trains the same number of epochs e (the
    * water level), a source is capped iff its cap lies below e, and
    * sorting sources by cap makes the capped set a PREFIX — so e falls
    * out of prefix sums: for the boundary after row k (caps
    * ascending), e = (B − Σ_{i≤k} E_i·m_i) / (M − Σ_{i≤k} m_i), valid
    * iff E_k ≤ e < E_{k+1}. Exactly one boundary satisfies that (a
    * sentinel cap-0 row covers the nobody-capped case; the last row,
    * where the denominator is 0, covers everybody-capped), and ALL
    * selection arithmetic is integer cross-multiplication — no float
    * enters until the final epochs readout. Caps are hash-derived
    * (1..4) as the gate's stand-in for the per-source policy table.
    * Scale: one per-source aggregation (partials ∝ sources), a window
    * over S+1 rows, one broadcast of the single selected boundary;
    * the alloc products need hugeint/decimal above ~10^18
    * token-mass × budget, noted here, gate-exact in int64. */
  def epochCapMix(s: SparkSession, dir: String): DataFrame =
    waterFill(s, Tables(s, dir, "documents")
      .groupBy("source").agg(sum(nTokens).as("mass"))
      .withColumn("cap",
        (pmod(hex32(concat(lit("cap|"), col("source"))), lit(4)) + 1)
          .cast("long")))

  /** The allocator core over any `(source, mass, cap)` relation —
    * factored out so the water-filling laws are property-testable on
    * synthetic inputs. */
  def waterFill(s: SparkSession, srcs: DataFrame): DataFrame = {
    val byCap = Window.orderBy("cap", "source")
    val cum = byCap.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withSentinel = srcs.unionByName(
      s.range(1).select(lit("~sentinel").as("source"), lit(0L).as("mass"),
        lit(0L).as("cap")))
    val totals = srcs.agg(sum("mass").as("m_total"))
      .withColumn("budget",
        expr(s"($EpochBudgetNum * m_total) DIV $EpochBudgetDen"))
    val boundary = withSentinel
      .crossJoin(broadcast(totals))
      .withColumn("cum_em", sum(col("cap") * col("mass")).over(cum))
      .withColumn("cum_m", sum("mass").over(cum))
      .withColumn("next_cap", lead("cap", 1).over(byCap))
      .withColumn("w_num", col("budget") - col("cum_em"))
      .withColumn("w_den", col("m_total") - col("cum_m"))
      .filter(col("w_num") >= col("cap") * col("w_den") &&
        (col("next_cap").isNull ||
          col("w_num") < col("next_cap") * col("w_den")))
      .select("w_num", "w_den")
    srcs.crossJoin(broadcast(boundary))
      .withColumn("capped",
        when(col("cap") * col("w_den") <= col("w_num"), 1L).otherwise(0L))
      .withColumn("alloc_tokens",
        when(col("capped") === 1L, col("cap") * col("mass"))
          .otherwise(expr("w_num * mass DIV w_den")))
      .select(col("source"), col("mass"), col("cap").as("cap_epochs"),
        col("capped"), col("alloc_tokens"),
        round(col("alloc_tokens") * lit(1.0) / col("mass"), 4).as("epochs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "epoch_cap_mix" -> epochCapMix,
    "negative_pairs" -> negativePairs,
    "mix_weights" -> mixWeights,
    "mix_weights_temp" -> mixWeightsTemp,
    "sample_per_group" -> samplePerGroup,
    "token_budget_mix" -> tokenBudgetMix,
    "train_split" -> trainSplit,
    "split_leakage" -> splitLeakage,
    "split_leakfree" -> splitLeakfree,
    "stratified_sample" -> stratifiedSample,
    "pack_sequences" -> packSequences,
    "length_buckets" -> lengthBuckets)

  /** The hash split assignment as CTE `sp(doc_id, split)` — THE single
    * SQL statement of [[trainSplit]]'s hash, shared with the
    * release-report oracle so the composed leakage column can never use
    * a different split than the gate it re-reads. */
  private[graft] val splitCte: String =
    """sp AS (SELECT doc_id,
      |  CASE WHEN ('0x' || substr(sha256('split|' || doc_id), 1, 8))::BIGINT
      |         % 100 < 80 THEN 'train'
      |       WHEN ('0x' || substr(sha256('split|' || doc_id), 1, 8))::BIGINT
      |         % 100 < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "epoch_cap_mix" ->
      s"""WITH d AS (
        |  SELECT source,
        |    sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT
        |      AS mass
        |  FROM documents GROUP BY source),
        |c AS (
        |  SELECT source, mass,
        |    1 + ('0x' || substr(sha256('cap|' || source), 1, 8))::BIGINT % 4
        |      AS cap
        |  FROM d
        |  UNION ALL SELECT '~sentinel', 0::BIGINT, 0::BIGINT),
        |t AS (SELECT sum(mass)::BIGINT AS m_total,
        |        ($EpochBudgetNum * sum(mass)::BIGINT) // $EpochBudgetDen
        |          AS budget
        |      FROM d),
        |w AS (
        |  SELECT c.*, t.m_total, t.budget,
        |    (sum(cap * mass) OVER (ORDER BY cap, source
        |       ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_em,
        |    (sum(mass) OVER (ORDER BY cap, source
        |       ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_m,
        |    lead(cap) OVER (ORDER BY cap, source) AS next_cap
        |  FROM c, t),
        |b AS (
        |  SELECT (budget - cum_em) AS w_num, (m_total - cum_m) AS w_den
        |  FROM w
        |  WHERE budget - cum_em >= cap * (m_total - cum_m)
        |    AND (next_cap IS NULL
        |         OR budget - cum_em < next_cap * (m_total - cum_m)))
        |SELECT source, mass, cap AS cap_epochs,
        |  (CASE WHEN cap * w_den <= w_num THEN 1 ELSE 0 END)::BIGINT
        |    AS capped,
        |  (CASE WHEN cap * w_den <= w_num THEN cap * mass
        |        ELSE w_num * mass // w_den END)::BIGINT AS alloc_tokens,
        |  round((CASE WHEN cap * w_den <= w_num THEN cap * mass
        |              ELSE w_num * mass // w_den END) * 1.0 / mass, 4)
        |    AS epochs
        |FROM c, b WHERE source <> '~sentinel'""".stripMargin,
    "negative_pairs" ->
      s"""WITH n AS (SELECT count(*) AS n_docs FROM documents),
        |a AS (SELECT doc_id FROM documents WHERE doc_id % $AnchorStride = 0),
        |js AS (SELECT unnest(range(1, ${NegPerAnchor + 1})) AS j),
        |p AS (SELECT a.doc_id, js.j,
        |        ('0x' || substr(sha256(a.doc_id || '#' || js.j), 1, 8))::BIGINT
        |          % n.n_docs AS neg_id
        |      FROM a, js, n)
        |SELECT doc_id, min(j) AS j, neg_id FROM p
        |WHERE neg_id <> doc_id GROUP BY doc_id, neg_id""".stripMargin,
    "mix_weights" ->
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT
        |      AS tokens
        |  FROM documents GROUP BY source),
        |d AS (SELECT list_reduce(
        |        list_prepend(0.0, list(sqrt(tokens::DOUBLE) ORDER BY source)),
        |        (a, b) -> a + b) AS denom
        |      FROM per)
        |SELECT source, n_docs, tokens,
        |  round(sqrt(tokens::DOUBLE) / denom, 6) AS weight
        |FROM per, d""".stripMargin,
    "mix_weights_temp" ->
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT
        |      AS tokens
        |  FROM documents GROUP BY source),
        |d AS (SELECT
        |    list_reduce(list_prepend(0.0,
        |      list(tokens::DOUBLE ORDER BY source)), (a, b) -> a + b) AS d1,
        |    list_reduce(list_prepend(0.0,
        |      list(sqrt(tokens::DOUBLE) ORDER BY source)), (a, b) -> a + b) AS d2,
        |    list_reduce(list_prepend(0.0,
        |      list(sqrt(sqrt(tokens::DOUBLE)) ORDER BY source)),
        |      (a, b) -> a + b) AS d4,
        |    count(*) AS nsrc
        |  FROM per)
        |SELECT source, n_docs, tokens,
        |  round(tokens::DOUBLE / d1, 6) AS w_t1,
        |  round(sqrt(tokens::DOUBLE) / d2, 6) AS w_t2,
        |  round(sqrt(sqrt(tokens::DOUBLE)) / d4, 6) AS w_t4,
        |  round(1.0 / nsrc, 6) AS w_uniform
        |FROM per, d""".stripMargin,
    "sample_per_group" ->
      s"""SELECT source, rk, doc_id FROM (
        |  SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY ('0x' || substr(sha256(source || '|' || doc_id), 1, 8))::BIGINT,
        |             doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= $CapPerSource""".stripMargin,
    "split_leakage" ->
      (s"WITH ${graft.dedup.DedupQueries.lshPairsCte},\n" +
        s"""$splitCte
          |SELECT l.a_id, l.b_id, sa.split AS split_a, sb.split AS split_b,
          |  l.jaccard
          |FROM lshpairs l
          |JOIN sp sa ON sa.doc_id = l.a_id
          |JOIN sp sb ON sb.doc_id = l.b_id
          |WHERE sa.split <> sb.split""".stripMargin),
    "split_leakfree" ->
      (s"WITH RECURSIVE ${graft.dedup.DedupQueries.lshPairsCte},\n" +
        """edges AS (SELECT a_id AS src, b_id AS dst FROM lshpairs
          |          UNION SELECT b_id, a_id FROM lshpairs),
          |reach(a, b) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
          |comp AS (SELECT a AS doc_id, min(b) AS cluster_id
          |         FROM reach GROUP BY a),
          |k AS (SELECT d.doc_id,
          |        coalesce(c.cluster_id, d.doc_id) AS split_key
          |      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
          |b AS (SELECT doc_id, split_key,
          |        ('0x' || substr(sha256('split|' || split_key), 1, 8))::BIGINT
          |          % 100 AS bucket
          |      FROM k)
          |SELECT doc_id, split_key, bucket,
          |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
          |       ELSE 'test' END AS split
          |FROM b""".stripMargin),
    "train_split" ->
      """WITH b AS (SELECT doc_id, source,
        |  ('0x' || substr(sha256('split|' || doc_id), 1, 8))::BIGINT % 100
        |    AS bucket,
        |  ('0x' || substr(sha256('gsplit|' || source), 1, 8))::BIGINT % 100
        |    AS g_bucket
        |  FROM documents)
        |SELECT doc_id, source, bucket,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split,
        |  CASE WHEN g_bucket < 80 THEN 'train' WHEN g_bucket < 90 THEN 'val'
        |       ELSE 'test' END AS group_split
        |FROM b""".stripMargin,
    "pack_sequences" ->
      s"""WITH d AS (
        |  SELECT source, doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
        |      AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT *, (sum(n_tokens) OVER (
        |    PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS running
        |  FROM d)
        |SELECT source, (running - n_tokens) // $PackBinTokens AS bin_id,
        |  count(*) AS n_docs, sum(n_tokens)::BIGINT AS bin_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM r GROUP BY 1, 2""".stripMargin,
    "length_buckets" ->
      """WITH d AS (
        |  SELECT len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
        |    AS n_tokens
        |  FROM documents),
        |f AS (SELECT n_tokens,
        |        CASE WHEN n_tokens <= 1 THEN 1::BIGINT
        |             ELSE (1::BIGINT << length(bin(n_tokens - 1))) END
        |          AS bucket
        |      FROM d WHERE n_tokens >= 1)
        |SELECT bucket, count(*)::BIGINT AS n_docs,
        |  sum(n_tokens)::BIGINT AS total_tokens,
        |  (bucket * count(*))::BIGINT AS padded_tokens,
        |  round(1.0 - sum(n_tokens) * 1.0 / (bucket * count(*)), 4)
        |    AS waste_ratio
        |FROM f GROUP BY bucket""".stripMargin,
    "stratified_sample" ->
      """WITH s AS (SELECT doc_id, source,
        |  ('0x' || substr(sha256('frac|' || source), 1, 8))::BIGINT % 100
        |    AS threshold,
        |  ('0x' || substr(sha256('strat|' || source || '|' || doc_id), 1, 8))::BIGINT % 100
        |    AS h
        |  FROM documents)
        |SELECT doc_id, source, threshold, h FROM s WHERE h < threshold"""
        .stripMargin,
    "token_budget_mix" ->
      s"""WITH d AS (
        |  SELECT source, doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
        |      AS n_tokens,
        |    len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))
        |      * 1.0 /
        |    len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS uniq_ratio
        |  FROM documents),
        |r AS (
        |  SELECT *, (sum(n_tokens) OVER (
        |    PARTITION BY source ORDER BY uniq_ratio DESC, doc_id ASC
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS running_tokens
        |  FROM d)
        |SELECT source, doc_id, n_tokens, running_tokens
        |FROM r WHERE running_tokens - n_tokens < $TokenBudgetPerSource"""
        .stripMargin)
}

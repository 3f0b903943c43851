package graft.tools

import org.apache.spark.sql.SparkSession

/** Seeded synthetic scale-up of the full testdata star schema — the
  * input for the empirical validation of SCALE.md's shuffle scaling
  * laws (`ScaleValidate`, results in SCALE_VALIDATION.md). Writes a
  * FACTOR× corpus to a scratch dir (never under /root/testdata).
  *
  * Relational tables model the realistic growth shape — facts grow,
  * dimensions don't:
  *
  *  - `region nation customer supplier part` are copied VERBATIM (the
  *    broadcast-dim side of every join is held fixed, exactly the
  *    100 TB regime where dims stay hinted-broadcast);
  *  - `orders`/`lineitem` replicate ×FACTOR with `o_orderkey`/
  *    `l_orderkey` shifted by k·Stride per replica k: the order⋈line
  *    join stays key-consistent, orders-per-customer and
  *    lines-per-part grow ×FACTOR (fact growth against fixed keys —
  *    the skew/top-k control), all measures/dates unchanged;
  *  - `events` replicates ×FACTOR with BOTH `event_id` and `user_id`
  *    shifted by k·Stride: users grow ×FACTOR with each user's
  *    timeline preserved verbatim, so per-key window/session state is
  *    constant while total stream volume scales — the state-bound
  *    control for the window/session/as-of families. (`ts` is read
  *    with the nanos-as-long conf and written back as int64; the
  *    `Tables` loader applies the same conversion either way.)
  *
  * The `documents`/`embeddings` corpus keeps a controlled duplicate
  * structure so every dedup/similarity family's prediction is crisp:
  *
  *  - replica 0 is the base corpus verbatim (original doc_ids, so the
  *    `doc_id < DecontamEvalDocs` eval slice is unchanged and the
  *    decontamination queries keep a fixed broadcast side);
  *  - per extra replica k, ids shift by k·Stride and every token is
  *    REMAPPED into a replica-keyed slot of a fixed 997-token space
  *    (`w<(hash+37k) mod 997>`): token count scales exactly ×FACTOR,
  *    per-doc repetition structure is preserved, corpus-wide vocab is
  *    BOUNDED by 997 at any factor (the vocab-law control), and
  *    replicas share (almost) no tokens, so their trigram Jaccard is ≈0
  *    and they are NOT near-duplicates. (A same-multiset permutation
  *    fails here: with the base corpus's 31-token vocabulary, permuted
  *    replicas keep trigram Jaccard above the 0.5 near-dup threshold
  *    and every document becomes a FACTOR-clique — pairs ∝ docs×F²,
  *    which is a corpus artifact, not an engine property.);
  *  - in replica 1 only: every 10th document is copied VERBATIM (exact
  *    duplicates ∝ docs) and every 10th+1 document gets a 1-in-50 token
  *    substitution (trigram Jaccard ≈ 0.89 — a near-duplicate), so
  *    exact/near dup pair counts grow linearly in docs, never
  *    quadratically;
  *  - embeddings: replica 1 of every 50th vector is a tiny perturbation
  *    (a cosine near-dup), all other replicas are large seeded
  *    perturbations (far vectors), L2-normalized either way.
  *
  * Everything is keyed on (id, k) — deterministic under any
  * partitioning, no RNG state shared across rows.
  */
object ScaleGen {

  val Stride = 10000000L

  def remap(tokens: Array[String], k: Int): Array[String] =
    tokens.map(t => "w" + (((t.hashCode & 0x7fffffff) + 37L * k) % 997))

  def mutateText(docId: Long, k: Int, text: String): String = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (k == 1 && docId % 10 == 0) text // exact duplicate
    else if (k == 1 && docId % 10 == 1)
      toks.zipWithIndex.map { case (t, j) =>
        if (j % 50 == 17) s"sub${(docId + j) % 1000}" else t
      }.mkString(" ") // near-duplicate
    else remap(toks, k).mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale/x30"
    val factor = if (args.length > 2) args(2).toInt else 30
    if (args.length > 3 && args(3) == "fixeddup") {
      val spark = SparkSession.builder()
        .master("local[32]")
        .appName("graft-scalegen-fixeddup")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      generateFixedDup(spark, base, out, factor)
      val nd = spark.read.parquet(s"$out/documents.parquet").count()
      println(s"wrote $out (fixeddup): $nd documents (factor $factor)")
      spark.stop()
      return
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, base, out, factor)
    val nd = spark.read.parquet(s"$out/documents.parquet").count()
    val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
    val nl = spark.read.parquet(s"$out/lineitem.parquet").count()
    val nv = spark.read.parquet(s"$out/events.parquet").count()
    println(s"wrote $out: $nd documents, $ne embeddings, $nl lineitem, " +
      s"$nv events (factor $factor)")
    spark.stop()
  }

  /** Writes the scaled corpus — shared by [[main]] and the invariant
    * spec (`ScaleToolsSpec`) so the generator the measurements run on is
    * exactly the generator the tests lock. */
  def generate(spark: SparkSession, base: String, out: String,
               factor: Int): Unit = {
    require(!out.startsWith("/root/testdata"), "scratch dir only")
    import spark.implicits._

    val ks = spark.range(factor).select($"id".cast("int").as("k"))

    val docs = spark.read.parquet(s"$base/documents.parquet")
      .as[(Long, String, String, String, Long)]
    val scaledDocs = docs.crossJoin(ks)
      .as[(Long, String, String, String, Long, Int)]
      .map { case (id, text, lang, source, nChars, k) =>
        // replica 0 is the base corpus VERBATIM — including its n_chars,
        // whatever definition the base generator used; only mutated
        // replicas recompute it from the mutated text
        val t = if (k == 0) text else mutateText(id, k, text)
        val n = if (k == 0) nChars else t.length.toLong
        (id + k * Stride, t, lang, source, n)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    scaledDocs.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val embs = spark.read.parquet(s"$base/embeddings.parquet")
      .as[(Long, Array[Float], Int)]
    val scaledEmbs = embs.crossJoin(ks)
      .as[(Long, Array[Float], Int, Int)]
      .map { case (id, emb, label, k) =>
        val v =
          if (k == 0) emb
          else {
            val rnd = new scala.util.Random(id * 1000003L + k)
            val eps = if (k == 1 && id % 50 == 0) 0.01f else 0.8f
            val raw = emb.map(x => x + (rnd.nextFloat() - 0.5f) * 2 * eps)
            val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
            if (n == 0f) raw else raw.map(_ / n)
          }
        (id + k * Stride, v, label)
      }
      .toDF("vec_id", "embedding", "label")
    scaledEmbs.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    // Dimensions verbatim — the fixed broadcast side of every join.
    Seq("region", "nation", "customer", "supplier", "part").foreach { tn =>
      spark.read.parquet(s"$base/$tn.parquet")
        .write.mode("overwrite").parquet(s"$out/$tn.parquet")
    }

    // Facts ×FACTOR with replica-shifted keys.
    spark.read.parquet(s"$base/orders.parquet").crossJoin(ks)
      .select(($"o_orderkey" + $"k" * Stride).as("o_orderkey"),
        $"o_custkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderdate", $"o_orderpriority")
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/orders.parquet")

    spark.read.parquet(s"$base/lineitem.parquet").crossJoin(ks)
      .select(($"l_orderkey" + $"k" * Stride).as("l_orderkey"),
        $"l_partkey", $"l_suppkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice", $"l_discount", $"l_tax", $"l_returnflag",
        $"l_linestatus", $"l_shipdate")
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/lineitem.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$base/events.parquet").crossJoin(ks)
      .select(($"event_id" + $"k" * Stride).as("event_id"), $"ts",
        ($"user_id" + $"k" * Stride).as("user_id"),
        $"event_type", $"value", $"props")
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/events.parquet")
  }

  /** Per-replica remap into a replica-PRIVATE 997-slot token space —
    * equal tokens stay equal (the base corpus's internal exact/near-dup
    * structure reproduces inside every replica, trigram-for-trigram),
    * while replicas share ZERO tokens. */
  def remapPrivate(tokens: Array[String], k: Int): Array[String] =
    tokens.map(t => s"r${k}w${(t.hashCode & 0x7fffffff) % 997}")

  /** FIXED-dup-rate scale variant (round-7 verdict #4): distinct mass
    * grows ∝F while the duplicate RATE stays constant — the real-world
    * shape (a bigger crawl has proportionally more duplicates, not more
    * copies of the same ones). Replica 0 is the base verbatim; replica
    * k ≥ 1 is the base with every token remapped by [[remapPrivate]].
    * Because the spaces are replica-private, no cross-replica candidate
    * pair can exist, so the verified dup-pair relation grows exactly ∝F
    * (≈ per-replica internal pairs × F). The SHARED-997-slot remap of
    * [[generate]] deliberately bounds corpus vocab for the vocab-law
    * control, but its cross-replica slot collisions merge short docs
    * into near-dup cliques growing ∝C(F,2) — the corpus artifact the
    * dup-pair-bound family rows measured. This variant removes it so
    * the engine's own law (shuffle ∝ verified pairs ∝ docs) is
    * measurable. Documents only — the dup-pair-bound family reads no
    * other table. */
  def generateFixedDup(spark: SparkSession, base: String, out: String,
                       factor: Int): Unit = {
    require(!out.startsWith("/root/testdata"), "scratch dir only")
    import spark.implicits._
    val ks = spark.range(factor).select($"id".cast("int").as("k"))
    spark.read.parquet(s"$base/documents.parquet")
      .as[(Long, String, String, String, Long)]
      .crossJoin(ks)
      .as[(Long, String, String, String, Long, Int)]
      .map { case (id, text, lang, source, nChars, k) =>
        val t =
          if (k == 0) text
          else remapPrivate(text.split(" ").filter(_.nonEmpty), k)
            .mkString(" ")
        val n = if (k == 0) nChars else t.length.toLong
        (id + k * Stride, t, lang, source, n)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
  }
}

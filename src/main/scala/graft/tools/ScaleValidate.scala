package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Runs the dedup/similarity/text AND relational/storm families over
  * one or more corpus dirs and prints per-query wall seconds + shuffle
  * MB (the Bench listener discipline) — one JSON line per dir. Feed it the base sf0.1 corpus
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
      "dedup_substring", "dedup_substring_excise", "kmv_distinct",
      "term_rarity_topk", "cross_doc_ngrams", "doc_repetition",
      "winnow_fingerprints", "cooccur_topk", "source_diversity",
      "ngram_novelty")),
    ("sketch-setop", "KMV partials: shuffle ∝ sources × K longs ≪F×; " +
      "pair stage over sources² sketches, corpus-independent", Seq(
      "source_overlap_kmv")),
    ("fixed-point-centroid", "integer partials ∝ labels × 2 × dim per " +
      "partition, corpus-independent ≪F×", Seq("embedding_drift",
      "label_centroid_sim")),
    ("moment-eigen", "decimal moment partials ∝ partitions × d(d+3)/2, " +
      "corpus-independent ≪F×; apply is a zero-shuffle literal " +
      "projection", Seq("embed_pca")),
    ("doc-proportional", "shuffle ∝ docs: ≈F×", Seq(
      "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
      "dedup_clusters", "dedup_cluster_hist", "dedup_apply",
      "lm_buckets", "dataset_card",
      "split_leakfree")),
    ("dup-pair-bound", "shuffle ∝ VERIFIED dup pairs (output-sized): " +
      "on the replica scale corpora pairs grow ∝C(F,2) by construction " +
      "(measured 6.8–10×); ∝ docs at real-world dup densities — CONFIRMED " +
      "r8 on the fixed-dup-rate corpora (generateFixedDup): ≈3.0 for every " +
      "member in the shuffle regime", Seq(
      "dedup_bbit_minhash", "pipeline_funnel", "split_leakage",
      "dedup_weighted_jaccard", "dedup_keep_best", "dedup_by_source",
      "dedup_threshold_curve", "filter_overlap", "dedup_sample_weights",
      "drop_audit", "release_report")),
    ("projection", "shuffle ≈ 0 at any scale", Seq(
      "text_quality", "quality_gopher", "doc_fingerprint",
      "embed_quantize", "train_split", "chunk_documents",
      "media_audio_features", "media_phash", "pii_redact", "pii_scan",
      "media_meta", "media_resize", "media_frame_sample",
      "media_audio_fingerprint", "media_video_fingerprint",
      "readability", "html_extract")),
    ("doc-profile", "one corpus scan, partials ∝ partitions × buckets: " +
      "≪F×", Seq(
      "text_stats", "value_histogram", "source_drift", "lang_id_confusion",
      "split_allocation",
      "profile_numeric", "profile_categorical", "media_histogram",
      "length_buckets", "readability_bands", "source_concentration",
      "seasonal_anomaly", "embed_norm_profile", "boilerplate_ratio",
      "crawl_quality_funnel", "k_anonymity", "k_anon_generalize",
      "k_anon_apply")),
    ("corpus-shaping", "hash-deterministic sample/pack/mix: row shuffle " +
      "∝ selected docs ≈F×, per-group partials ≪F×", Seq(
      "stratified_sample", "sample_per_group", "sample_per_group_agg",
      "mix_weights", "mix_weights_temp", "token_budget_mix", "epoch_cap_mix",
      "negative_pairs", "pack_sequences")),
    ("banded-pairs", "band equi-self-join: shuffle ∝ images × bands ≈F×; " +
      "in-join pairs ∝ Σn_b² over 16-bit band buckets", Seq(
      "media_phash_pairs", "media_phash_pairs_grouped",
      "media_phash_clusters", "dedup_simhash_hamming")),
    ("frame-delta", "decode + SAD fan out in-partition; one id-keyed " +
      "window over ≤ frames−1 rows/clip: ∝ frames ≈F×", Seq(
      "media_scene_changes")),
    ("cdc-chunks", "decode + chunking in-partition; (hash,len) group " +
      "partials ∝ samples/M ≈F×; summary single-row", Seq(
      "cdc_chunks", "cdc_top_chunks")),
    ("vocab-bounded", "shuffle ∝ vocab/partials: ≪F×", Seq(
      "cms_heavy_hitters", "vocab_topk", "bpe_pairs", "bpe_encode",
      "bpe_fertility",
      "unigram_encode", "wordpiece_encode", "pretokenize_counts",
      "token_freq_delta")),
    ("tfidf-keywords", "tf = (doc,term) hash agg ∝ distinct pairs ≈F×; " +
      "df over the tf relation (no second scan), vocab-bounded " +
      "broadcast back; per-doc WindowGroupLimit keeps k rows, " +
      "partitions ≤ one doc's terms", Seq("keyword_tfidf_topk")),
    ("matching-token-bounded",
      "tf shuffle ∝ query-term matches (base-replica-only terms): ≈flat", Seq(
      "bm25_topk", "hybrid_rrf_topk")),
    ("broadcast-side", "shuffle ∝ corpus partials, broadcast fixed: ≤F×", Seq(
      "decontaminate", "decontam_bloom", "ann_cosine_topk",
      "ann_batch_topk", "ann_lsh_buckets", "ann_lsh_topk",
      "ann_lsh_multiprobe", "ivf_topk", "ivf_topk_probeall",
      "ivf_silhouette", "ivf_incremental", "ivf_recall_curve",
      "dedup_embedding_cosine",
      "quality_lm_score", "dsir_weights", "quality_bigram_score",
      "decontam_report", "decontam_semantic", "decontam_semantic_strict",
      "decontam_substring")),
    ("bounded-candidates", "pairs df-capped: ≈F× (dup pairs ∝ docs)", Seq(
      "dedup_shingle_jaccard", "dedup_containment", "source_overlap")),
    ("collapse-first-pairs", "signatures/banding/verify over DISTINCT " +
      "contents (exact-dup groups collapse to one node); member-pair " +
      "expansion in-row, post-shuffle: shuffle ∝ distinct contents + " +
      "rep candidate pairs, NEVER C(group,2)", Seq(
      "dedup_minhash_lsh_grouped")),
    ("prefix-filtered", "t=0.8 prefix join: shuffle ∝ tokens + candidates " +
      "≈F×; array verify never re-expands candidates", Seq(
      "dedup_prefix_jaccard")),
    ("containment-indexed", "prefix(shorter) ⋈ df-capped full index: " +
      "candidates ∝ prefix tokens × df-cap ≈F× (≪ exhaustive Σdf²); " +
      "array verify candidate-bounded", Seq(
      "dedup_containment_indexed")),
    ("snapshot-delta", "batch×index band join: shuffle ∝ docs ≈F× " +
      "(signatures + bands); verify candidate-bounded", Seq(
      "dedup_incremental")),
    ("semantic-dedup", "cell self-join: shuffle ∝ vectors (pairs stay in-join): ≈F×", Seq(
      "semdedup")),
    ("knn-graph", "bucket self-join: shuffle ∝ vectors; in-join pairs ∝ Σn_b² (fixture planes fixed → occupancy ∝F; production grows planes to pin occupancy)", Seq(
      "knn_graph_lsh", "knn_graph_multiprobe")),
    ("knn-graph-ivf", "cell self-join: shuffle ∝ vectors; in-join pairs " +
      "∝ Σn_cell², pinned by the shared nListsFor dial (fixture NLists " +
      "fixed → occupancy ∝F)", Seq("knn_graph_ivf")),
    ("ensemble-cluster", "edges = union of three candidate-bounded pair " +
      "relations (output-sized); CC rounds ∝ component diameter", Seq(
      "dedup_clusters_multi")),
    ("delta-cluster", "maintenance step: delta graph = batch pairs + " +
      "touched-component star edges, shuffle ∝ batch + touched members " +
      "(never corpus); the gate additionally pays the frozen-label " +
      "simulation (old-old CC ∝ old pairs) that production reads from " +
      "storage", Seq("dedup_clusters_delta")),
    ("embedding-cluster", "verified pairs ∝ planted dups ≈F×; CC rounds " +
      "∝ component diameter (tiny), per-round shuffle ∝ edges", Seq(
      "semantic_clusters")),
    ("iterative-graph", "knn build + const iterations × (edges join + " +
      "dst-keyed partials): shuffle ∝ edges ≈F×", Seq(
      "pagerank_knn", "kcore_decomposition", "kcore_tiers",
      "eigencentrality_knn")),
    ("mutual-knn-stats", "mutual edges ≤ K·N, wedge join Σdeg² ≤ K²·N " +
      "(degree capped at K by construction): ≈F×", Seq(
      "knn_triangle_stats", "knn_degree_hist", "knn_components")),
    ("neighborhood-fn", "exact twin: distinct (src, reached) pairs " +
      "∝ Σ|B(v,3)| (component-bounded here; the pair blow-up ANF " +
      "exists to avoid); ANF gate: state ∝ nodes × k masks, per round " +
      "one edges join + bit_or partials ∝ nodes × k ≈F×", Seq(
      "graph_neighborhood", "graph_neighborhood_anf")),
    ("label-prop", "const rounds × (edges⋈labels + (node,label) " +
      "partials), frontier shrinks monotonically: ∝ edges ≈F×", Seq(
      "label_prop_knn", "label_prop_confusion")),
    ("moment-agg", "normal-equation moments: 28 doubles per partition, " +
      "corpus-independent ≪F×; scoring a projection + tiny-bucket rollup", Seq(
      "quality_classifier", "classifier_eval", "classifier_calibration")),
    ("format-roundtrip", "one-time parallel format rewrite (no shuffle) + " +
      "rollup partials ∝ sources ≪F×", Seq(
      "source_orc", "source_jsonl", "source_csv")),
    ("link-extract", "href explode + target-keyed partials, map-side " +
      "combined: bounded target domain here ≪F×; production targets ∝ " +
      "distinct URLs — the standard crawl-frontier shuffle ∝ links", Seq(
      "html_links", "url_canonical")),
    ("bounded-slice", "fixed-id-slice evidence relations: constant rows " +
      "at any scale (the doc_id < K filter pushes to the scan)", Seq(
      "url_canonical_pairs")),
    ("mirror-join", "memoized cluster labels (paid by the dedup tier) " +
      "⋈ URL projection by doc_id, then cluster-keyed rollup: shuffle " +
      "∝ docs (URL side) + clustered docs (labels), output ∝ mirror " +
      "sets; fetch-once adds family-keyed min + host rollups, ∝ docs; " +
      "host-pair matrix expands pairs WITHIN cluster only (sizes " +
      "dedup-bounded), output ≤ hosts²",
      Seq("url_mirror_sets", "url_fetch_once", "url_mirror_hosts")),
    ("model-roundtrip", "artifact write + reload ∝ nLists × dim (model-" +
      "bounded, corpus-independent); the replayed probe query is the " +
      "broadcast-side IVF law; PQ twin: codebook KBs, replayed encode a " +
      "zero-shuffle projection + k-bounded TakeOrdered; BPE twin: " +
      "artifact ∝ merges, re-encode vocab-bounded; assign-delta ingest: " +
      "batch-slice projection + cell-bounded rollup ∝ batch",
      Seq("ivf_model_roundtrip", "ivf_model_assign_delta",
        "pq_model_roundtrip", "bpe_model_roundtrip",
        "quality_model_roundtrip", "pca_model_roundtrip")),
    ("recrawl-delta", "two snapshot extraction scans (pure projections) " +
      "+ two target-keyed rollups + one target equi-join, map-side " +
      "combined: shuffle ∝ distinct targets (domain-bounded here; " +
      "production targets ∝ distinct URLs ≈F×); the schedule adds a " +
      "host-partitioned WindowGroupLimit — ≤ budget rows per host cross " +
      "the final shuffle", Seq("url_recrawl_delta", "crawl_schedule")),
    ("corpus-write", "survivor rows repartitioned by source (write work " +
      "∝ survivors ≈F×, riding the pair-bound funnel tiers); read-back " +
      "manifest partials ∝ sources ≪F×; file count bounded by the " +
      "source domain", Seq("corpus_manifest", "manifest_delta")),
    ("bitext-margin", "query batch collected into ONE broadcast array " +
      "row; candidate scan + in-row y-penalty are zero-shuffle " +
      "projections; the pair explode is |batch| × candidates rows but " +
      "every downstream window is WindowGroupLimit-partial (≤ k rows " +
      "per group per input partition cross the exchange), so shuffle ∝ " +
      "candidates × k ≈F× with batch held fixed — the _ivf regime IS " +
      "the production ANN pruning (pair cost ÷ cells, same plumbing), " +
      "recall-certified per language against the exhaustive miner",
      Seq("bitext_mine", "bitext_lang_stats", "bitext_mine_ivf",
        "bitext_ivf_recall", "bitext_margin_curve",
        "bitext_mine_multiprobe", "bitext_recall_curve",
        "bitext_probe_choice", "bitext_mine_tuned",
        "bitext_threshold_choice", "bitext_mine_calibrated",
        "bitext_choice_roundtrip", "bitext_decontam")),
    ("shard-plan", "two-level prefix sum: block-subtotal partials ∝ " +
      "blocks = docs/BlockDocs ≪F×; placement join carries broadcast-" +
      "side block offsets + per-(source, blk) windows over ≤ BlockDocs " +
      "rows (no source-sized hot key); final rollup ∝ shards; " +
      "train_order is the same pattern keyed by the hash prefix — " +
      "bucket partials ∝ 2^B, within-bucket windows hash-uniform",
      Seq("shard_plan", "train_order")),
    // Relational / storm families (facts ×F, dims fixed — ScaleGen's
    // star-schema growth shape):
    ("scan-agg", "map-side complete: partials ∝ partitions×groups: ≪F×", Seq(
      "q1_pricing_summary", "q6_forecast", "q14_hourly_events",
      "q18_stats", "q12_status_priority_rollup",
      "q19_brand_cube", "q20_event_props", "q23_status_priority_pivot",
      "q25_grouping_sets", "q26_revenue_mom")),
    ("referential-audit", "fact×fact key anti-join: broadcast below " +
      "threshold, ONE key shuffle per side ∝ facts ≈F× beyond it; " +
      "bucketing co-locates both sides at 100 TB", Seq("q17_constraints")),
    ("fact-join", "dims hinted-broadcast, agg partials only: ≪F×", Seq(
      "q3_revenue_by_nation", "q5_segment_nation_revenue",
      "q9_suppliers_heavy_items", "q4_order_priority",
      "q8_customers_without_orders")),
    ("salted-shuffle", "salted repartition moves facts by design: ≈F×", Seq(
      "skew_join_rollup")),
    ("layout-shuffle", "full-relation range repartition by design " +
      "(z-order interleave keys): ≈F×", Seq("zorder_layout")),
    ("keyed-topk", "agg keyed by fixed dim / WindowGroupLimit-capped: ≪F×", Seq(
      "q2_top_customers", "q13_top_events_per_type",
      "q11_first_order_per_customer")),
    ("sweep-line", "two delta rows per order, date-keyed partials; the " +
      "cumulative window runs over the bounded distinct-day relation, " +
      "never facts: ∝ orders ≈F× then domain-bounded", Seq(
      "order_backlog_daily")),
    ("time-align-join", "bucketed equi on time: ∝ events ≈F×", Seq(
      "asof_join", "asof_join_forward", "interval_join", "resample_ffill",
      "attribution_weights")),
    ("user-state", "hash by user, per-key state fixed: ∝ events ≈F×", Seq(
      "q16_sessionize", "q22_rolling_user_stats", "q24_session_window",
      "funnel_stages", "cohort_retention", "q21_sliding_windows",
      "event_transitions", "scd2_build", "ewma_anomaly",
      "user_streaks", "lateness_profile", "session_entry_exit",
      "session_type_pairs")),
    ("greedy-coreset", "K corpus scans, zero shuffle (TakeOrdered " +
      "partials 1 row/partition); center state K·dim on the driver: " +
      "scan ∝F×, shuffle ≈0", Seq("coreset_kcenter")),
    ("pq-codes", "encode: literal-codebook argmin projection, zero " +
      "shuffle; ADC query: TakeOrdered partials k-bounded ≪F×", Seq(
      "pq_encode", "pq_topk")),
    ("basket-pairs", "self-equi-join on order key: shuffle ∝ basket " +
      "items ≈F×; in-join pairs ≤ C(basket, 2) per order, basket size " +
      "domain-bounded; rule table dim²-bounded", Seq("market_basket")),
    ("calibrated-select", "per-source score histograms bounded by the e4 " +
      "score DOMAIN (≤ sources × 10,001 partials, map-side combined) " +
      "broadcast back over the scan: ≪F×; the cap's tie-break window " +
      "partitions the threshold SLICE only, never the domain", Seq(
      "quality_quantile_norm", "domain_caps", "source_ks")),
    ("quartile-score", "custkey agg partials ∝ partitions × customers; " +
      "quartile histograms bounded by value DOMAINS (days / orders / " +
      "dollars), broadcast back: ≪F×", Seq("rfm_segments")),
    ("percentile-pair", "exact ∝ rows vs sketch ∝ partitions×groups", Seq(
      "q15_value_percentiles", "q15_approx_percentiles", "outlier_mad",
      "winsorize_events")),
    ("storm-chain", "enrichment is a projection; rollups ∝ groups: ≪F×", Seq(
      "storm_enrich", "storm_severity_counts")),
    ("storm-validate", "parity = range-repartition sort + index join " +
      "∝ rows: ≈F×; api check = enrich projection + id join ∝ rows: ≈F×, " +
      "violations output-sized", Seq(
      "storm_row_parity", "storm_api_check")),
    ("exact-distinct", "countDistinct partials ∝ distinct (key,id): ≈F×", Seq(
      "storm_bucket_counts", "hll_distinct", "q7_distinct_customers",
      "media_audio_fp_groups", "media_video_fp_groups")))

  def main(rawArgs: Array[String]): Unit = {
    // --no-broadcast pins every stats-decided join to shuffle strategy —
    // the regime ALL relations are in at 100 TB. Comparing runs with and
    // without it separates genuine scaling from the one-time step change
    // when a relation outgrows the 10 MB auto-broadcast threshold.
    val noBroadcast = rawArgs.contains("--no-broadcast")
    // --only=a,b,c restricts to a subset — for re-measuring a single
    // family member after a change without paying the full matrix.
    val only: Set[String] = rawArgs.collectFirst {
      case a if a.startsWith("--only=") =>
        a.stripPrefix("--only=").split(',').toSet
    }.getOrElse(Set.empty)
    val args = rawArgs.filterNot(a => a == "--no-broadcast" || a.startsWith("--only="))
    require(args.nonEmpty,
      "usage: ScaleValidate [--no-broadcast] [--only=q1,q2] <dir> ...")
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

    // Bytes AND records: compressed bytes can scale sublinearly on
    // replica-heavy corpora (duplicate values compress better at larger
    // F), so record counts are the law signal and bytes the memory/
    // network signal. Attribution is exact via job groups (shared
    // ShuffleByGroup listener — same discipline as Bench; keys are
    // dir|name because the same query runs once per corpus dir).
    val shuffle = new graft.ShuffleByGroup
    spark.sparkContext.addSparkListener(shuffle)

    val all = Families.flatMap(_._3)
    val names = if (only.isEmpty) all else all.filter(only)
    args.foreach { dir =>
      val timed = names.map { name =>
        val t0 = System.nanoTime()
        shuffle.measure(spark.sparkContext, s"$dir|$name") {
          try SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[scale] $name on $dir failed: ${e.getMessage}")
          }
        }
        (name, (System.nanoTime() - t0) / 1e9)
      }
      shuffle.drain()
      val qs = timed.map { case (k, sec) =>
        "\"" + k + f"""\":{"sec":$sec%.2f,"shuffle_mb":${shuffle.mbOf(s"$dir|$k")}%.2f,"shuffle_rec":${shuffle.recOf(s"$dir|$k")}%d}"""
      }.mkString("{", ",", "}")
      println(s"""{"dir":"$dir","queries":$qs}""")
    }
    spark.stop()
  }
}

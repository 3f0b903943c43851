package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.dedup.{BbitMinhash, Bloom, ConnectedComponents, DedupQueries,
  IncrementalClusters, PrefixJoin, SnapshotDedup, SubstringDedup} // KnnGraphIvf registers semantic_clusters
import graft.functions.{BottomK, CountMin, Hll, Kmv}
import graft.multimodal.{CdcChunks, Multimodal}
import graft.operators.{AsOfJoin, Attribution, Backlog, Cohort, EventPaths,
  EwmaAnomaly, FilterOverlap, Funnel, FuzzyJoin, IntervalJoin, Lateness,
  MarketBasket, Pipeline, RelationalQueries, ReleaseReport, Resample, Rfm,
  RobustStats, RevenueMom, SeasonalBaseline, SessionEntryExit,
  SessionTypePairs, SkewJoin, Streaks, ZOrder}
import graft.sim.{BitextMine, ChoiceModel, Coreset, EmbedPca, EmbeddingDrift,
  Eigencentrality,
  GraphStats, Neighborhood, NormProfile, Ivf, IvfIncremental, IvfModel, KCore,
  KnnGraphIvf, LabelProp, PageRank, PcaModel, Pq, PqModel, SemDedup,
  SemanticDecontam, SimilarityQueries}
import graft.sources.{CorpusManifest, DropAudit, FormatSources, ShardPlan}
import graft.storm.StormQueries
import graft.text.{Allocation, BigramLm, Bpe, BpeModel, Chunking, Concentration,
  CrawlDedup, DomainCaps,
  Drift, HeavyHitterDelta, HtmlExtract, HybridRetrieval, Keywords, NgramNovelty,
  PiiRedact, Pretokenize, QualityClassifier, QualityModel, QuantileNorm,
  Readability, KAnonymity, Retrieval, Sampling, SourceKs, TextQueries,
  TrainOrder, Unigram, UrlCanonical, Winnow, WordPiece}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  // A def, not a val: some oracle maps are dynamic (Ivf inlines trained
  // centroids, Bpe inlines trained merges), so the SQL must be re-read
  // AFTER the queries have run — Verify dumps oracle_sql.json last.
  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (RevenueMom.queries, RevenueMom.oracles),
      (AsOfJoin.queries, AsOfJoin.oracles),
      (IntervalJoin.queries, IntervalJoin.oracles),
      (Attribution.queries, Attribution.oracles),
      (SkewJoin.queries, SkewJoin.oracles),
      (Funnel.queries, Funnel.oracles),
      (SessionEntryExit.queries, SessionEntryExit.oracles),
      (SessionTypePairs.queries, SessionTypePairs.oracles),
      (Cohort.queries, Cohort.oracles),
      (Backlog.queries, Backlog.oracles),
      (FuzzyJoin.queries, FuzzyJoin.oracles),
      (Rfm.queries, Rfm.oracles),
      (MarketBasket.queries, MarketBasket.oracles),
      (EventPaths.queries, EventPaths.oracles),
      (EwmaAnomaly.queries, EwmaAnomaly.oracles),
      (SeasonalBaseline.queries, SeasonalBaseline.oracles),
      (Streaks.queries, Streaks.oracles),
      (Lateness.queries, Lateness.oracles),
      (RobustStats.queries, RobustStats.oracles),
      (Resample.queries, Resample.oracles),
      (ConnectedComponents.queries, ConnectedComponents.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (ReleaseReport.queries, ReleaseReport.oracles),
      (FilterOverlap.queries, FilterOverlap.oracles),
      (StormQueries.queries, StormQueries.oracles),
      (FormatSources.queries, FormatSources.oracles),
      (CorpusManifest.queries, CorpusManifest.oracles),
      (ShardPlan.queries, ShardPlan.oracles),
      (DropAudit.queries, DropAudit.oracles),
      (TrainOrder.queries, TrainOrder.oracles),
      (KAnonymity.queries, KAnonymity.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (Readability.queries, Readability.oracles),
      (Concentration.queries, Concentration.oracles),
      (QualityClassifier.queries, QualityClassifier.oracles),
      (QualityModel.queries, QualityModel.oracles),
      (QuantileNorm.queries, QuantileNorm.oracles),
      (SourceKs.queries, SourceKs.oracles),
      (DomainCaps.queries, DomainCaps.oracles),
      (PiiRedact.queries, PiiRedact.oracles),
      (HtmlExtract.queries, HtmlExtract.oracles),
      (UrlCanonical.queries, UrlCanonical.oracles),
      (CrawlDedup.queries, CrawlDedup.oracles),
      (Chunking.queries, Chunking.oracles),
      (Sampling.queries, Sampling.oracles),
      (Allocation.queries, Allocation.oracles),
      (Bpe.queries, Bpe.oracles),
      (BpeModel.queries, BpeModel.oracles),
      (Pretokenize.queries, Pretokenize.oracles),
      (Unigram.queries, Unigram.oracles),
      (BigramLm.queries, BigramLm.oracles),
      (WordPiece.queries, WordPiece.oracles),
      (Retrieval.queries, Retrieval.oracles),
      (Keywords.queries, Keywords.oracles),
      (NgramNovelty.queries, NgramNovelty.oracles),
      (HeavyHitterDelta.queries, HeavyHitterDelta.oracles),
      (HybridRetrieval.queries, HybridRetrieval.oracles),
      (Hll.queries, Hll.oracles),
      (Drift.queries, Drift.oracles),
      (Winnow.queries, Winnow.oracles),
      (BottomK.queries, BottomK.oracles),
      (Kmv.queries, Kmv.oracles),
      (CountMin.queries, CountMin.oracles),
      (ZOrder.queries, ZOrder.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (PrefixJoin.queries, PrefixJoin.oracles),
      (BbitMinhash.queries, BbitMinhash.oracles),
      (SnapshotDedup.queries, SnapshotDedup.oracles),
      (IncrementalClusters.queries, IncrementalClusters.oracles),
      (SubstringDedup.queries, SubstringDedup.oracles),
      (Bloom.queries, Bloom.oracles),
      (SimilarityQueries.queries, SimilarityQueries.oracles),
      (Ivf.queries, Ivf.oracles),
      (IvfIncremental.queries, IvfIncremental.oracles),
      (IvfModel.queries, IvfModel.oracles),
      (Pq.queries, Pq.oracles),
      (PqModel.queries, PqModel.oracles),
      (KnnGraphIvf.queries, KnnGraphIvf.oracles),
      (EmbeddingDrift.queries, EmbeddingDrift.oracles),
      (NormProfile.queries, NormProfile.oracles),
      (EmbedPca.queries, EmbedPca.oracles),
      (PcaModel.queries, PcaModel.oracles),
      (SemDedup.queries, SemDedup.oracles),
      (PageRank.queries, PageRank.oracles),
      (GraphStats.queries, GraphStats.oracles),
      (Neighborhood.queries, Neighborhood.oracles),
      (LabelProp.queries, LabelProp.oracles),
      (KCore.queries, KCore.oracles),
      (Eigencentrality.queries, Eigencentrality.oracles),
      (Coreset.queries, Coreset.oracles),
      (SemanticDecontam.queries, SemanticDecontam.oracles),
      (BitextMine.queries, BitextMine.oracles),
      (ChoiceModel.queries, ChoiceModel.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (CdcChunks.queries, CdcChunks.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q3RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}

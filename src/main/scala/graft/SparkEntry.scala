package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers here as an [[operators.Op]];
  * oracle SQL (DuckDB) twins live next to the DataFrame code.
  */
object SparkEntry {

  /** All registered operations, in SURVEY §2 coverage order. */
  def ops: Seq[Op] = Seq(
    Pricing.bestOfDay,
    Pricing.pricingAgg,
    Normalize.snapshotNormalize,
    Normalize.antiJoin,
    Rollup.rollup,
    Rollup.dateWindowAgg,
    Revalue.revalueUsers,
    Revalue.unionTagged,
    Feeds.feedExport,
    Analytics.starJoin,
    Analytics.semiJoin,
    Analytics.topKPerGroup,
    Analytics.jsonExtract,
    Analytics.funnel,
    Analytics.cohortRetention,
    Analytics.anomalyMad,
    Analytics.winsorize,
    TextOps.textQuality,
    TextOps.langIdOp,
    TextOps.docFingerprint,
    TextOps.tfidfTerms,
    TextOps.docChunks,
    TextOps.bigramLm,
    TextOps.bigramNovelty,
    Curation.stratifiedSample,
    Curation.balancedSample,
    Curation.weightedSample,
    Curation.trainTestSplit,
    Curation.piiScrub,
    Curation.repetitionGate,
    Curation.qualityGate,
    Curation.decontaminate,
    Curation.decontaminateFuzzy,
    Curation.mixAssembly,
    Curation.packSequences,
    Curation.cleanCorpus,
    Dedup.dedupExact,
    Dedup.ngramJaccard,
    Dedup.minhashLsh,
    Dedup.simhash,
    Dedup.dedupIncremental,
    Dedup.dedupIncrementalBucketed,
    Spans.spanDedup,
    Spans.spanCoverage,
    GraphOps.dupClusters,
    GraphOps.clusterRep,
    GraphOps.triangleCount,
    GraphOps.pagerank,
    GraphOps.communities,
    TextOps.vocabGrowth,
    TextOps.hashEmbed,
    TextOps.bm25,
    Dedup.fuzzyMatch,
    Dedup.fuzzyBest,
    Similarity.annBruteForce,
    Similarity.embedNearDup,
    Similarity.embedNearDupAnn,
    Similarity.annLsh,
    Similarity.annIvf,
    Similarity.embedOutlier,
    Similarity.quantizeInt8,
    Similarity.annPq,
    Similarity.annPqLloyd,
    Similarity.pqAdc,
    Similarity.pqAdcRefine,
    Similarity.pqAdcTrained,
    Similarity.knnGraph,
    Similarity.semdedup,
    Similarity.hardNegatives,
    Similarity.cleanEmbeddings,
    Windows.tumblingWindow,
    Windows.sessionizeBatch,
    Windows.movingAgg,
    Windows.timeRangeWindow,
    Windows.rollingActiveUsers,
    Windows.gapFill,
    AsOf.asofJoin,
    AsOf.asofNative,
    AsOf.rangeJoin,
    SetPivot.intersectExcept,
    SetPivot.pivotFlags,
    SetPivot.rollupRevenue,
    SetPivot.cubeRevenue,
    SetPivot.ntileDeciles,
    Scale.saltedJoin,
    Scale.colocatedJoin,
    Layout.zorderLayout,
    Layout.compactionPlan,
    Scale.bloomJoin,
    Scale.sqlEntry,
    Scale.heavyHitters,
    Scale.approxDistinct,
    Scale.approxQuantile,
    IngestOps.csvRoundtrip,
    SinkOps.upsertDay,
    SinkOps.upsertKey,
    SinkOps.upsertJdbc,
    SinkOps.txCommit,
    SinkOps.feedFile,
    Scd2.scd2Merge,
    Scd2.cdcApply,
    Introspect.jsonImage,
    Introspect.schemaProbe,
    Introspect.profile,
    Introspect.histogram,
    StreamingOps.streamTumbling,
    StreamingOps.streamDedup,
    StreamingOps.streamBestOfDay,
    StreamingOps.streamJoin,
    StreamingOps.streamSessionize,
    StreamingOps.streamIncrDedup,
    StreamingOps.streamDecontaminate,
    StreamingOps.streamAnnProbe,
    StreamingOps.streamBm25,
    MultimodalOps.multimodalFeatures,
    MultimodalOps.mediaDedup,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pricing.bestOfDay.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.map(op => op.name -> op.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.flatMap(op => op.oracle.map(op.name -> _)).toMap
}

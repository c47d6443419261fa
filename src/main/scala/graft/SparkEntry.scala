package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7. Aggregates every operator
  * module's registered queries into the maps the harness consumes.
  */
object SparkEntry {
  private def modules: Seq[QueryModule] = Seq(
    Relational,
    SetOps,
    MergeOps,
    TextOps,
    Dedup,
    Similarity,
    Clustering,
    Multimodal,
    Extras,
    WindowsAndStats,
    ReshapeOps,
    SkewOps,
    AsofOps,
    RangeOps,
    FuzzyMatch,
    LayoutOps,
    ApiSourceOps,
    graft.sources.FileFormatOps,
    SamplingOps,
    OrderingOps,
    LexiconOps,
    EventLifecycleOps,
    GraphOps,
    ChunkOps,
    CorpusOps,
    ProfilingOps,
    WarehouseOps,
    ModernSqlOps,
    graft.pipeline.PipelineOps,
    graft.streaming.StreamingOps,
  )

  lazy val registry: Seq[RegisteredQuery] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q4SegmentUtil(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(registry.map(q => q.name -> q.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    ListMap(registry.flatMap(q => q.oracle.map(o => q.name -> o)): _*)

  /** The subset graft.Bench times per round. */
  def headlineNames: Seq[String] = registry.filter(_.headline).map(_.name)
}

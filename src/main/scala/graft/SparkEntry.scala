package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Single registry every module contributes to; queries/oracleSql are
    * derived views so names can never drift apart.
    */
  def ops: Seq[Op] =
    graft.operators.Relational.ops ++
      graft.operators.AsOf.ops ++
      graft.operators.TextOps.ops ++
      graft.operators.Corpus.ops ++
      graft.operators.Tokenize.ops ++
      graft.operators.Dedup.ops ++
      graft.plans.NearDupJoin.ops ++
      graft.operators.Similarity.ops ++
      graft.operators.KMeans.ops ++
      graft.operators.Multimodal.ops ++
      graft.operators.Enrich.ops ++
      graft.operators.JsonOps.ops ++
      graft.sinks.TableSink.ops ++
      graft.sinks.VersionedTable.ops ++
      graft.sinks.PartitionTransforms.ops ++
      graft.sinks.CatalogOps.ops ++
      graft.sinks.DeltaInterop.ops ++
      graft.sinks.HudiInterop.ops ++
      graft.sinks.HudiMor.ops ++
      graft.sinks.IcebergInterop.ops ++
      graft.sinks.FormatConvert.ops ++
      graft.streaming.IngestPipeline.ops ++
      graft.streaming.StreamNearDup.ops ++
      graft.streaming.StreamJoin.ops ++
      graft.streaming.EventRollup.ops ++
      graft.streaming.Sessionize.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.map(op => op.name -> op.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.flatMap(op => op.oracle.map(op.name -> _)).toMap
}

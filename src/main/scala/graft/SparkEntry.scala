package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query catalog lives in `graft.queries.*` modules, one per capability
  * area; each contributes a map of named queries and (where
  * SQL-expressible) DuckDB oracle SQL over the same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core computation: per-invoice featurization (A1). */
  def entry(spark: SparkSession): DataFrame =
    InvoiceQueries.invoiceFeatures(spark, "/root/testdata/sf0.001")

  private val catalogs: Seq[(Map[String, QueryUtil.Q], Map[String, String])] = Seq(
    (RelationalQueries.queries, RelationalQueries.oracles),
    (InvoiceQueries.queries, InvoiceQueries.oracles),
    (EventQueries.queries, EventQueries.oracles),
    (TextQueries.queries, TextQueries.oracles),
    (PipelineQueries.queries, PipelineQueries.oracles),
    (StreamQueries.queries, StreamQueries.oracles),
    (SketchQueries.queries, SketchQueries.oracles),
    (IngestQueries.queries, IngestQueries.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    catalogs.iterator.flatMap(_._2).toMap

  /** One-time index builds (bucket tables, persisted models, quantizers)
    * that catalog queries amortize; the bench runs these first and
    * reports their cost separately from query time. */
  def indexBuilds: Map[String, QueryUtil.B] =
    RelationalQueries.builds ++ PipelineQueries.builds ++ IngestQueries.builds ++
      StreamQueries.builds ++ EventQueries.builds
}

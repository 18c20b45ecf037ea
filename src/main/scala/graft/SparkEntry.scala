package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every operator claimed in
  * SURVEY.md §2 has an entry in [[queries]]; SQL-expressible ones also have
  * a DuckDB oracle in [[oracleSql]] with column names aligned to the Spark
  * output.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TeraQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.OpsQueries.queries ++
      graft.queries.StreamQueries.queries ++
      graft.queries.FormatQueries.queries ++
      graft.ops.TemporalJoins.queries ++
      graft.ops.PipelineOps.queries ++
      graft.ops.Sketches.queries ++
      graft.ops.GraphOps.queries ++
      graft.ops.Warehouse.queries ++
      graft.ops.Retrieval.queries ++
      graft.ops.Bm25Index.queries ++
      graft.ops.MlOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.TeraQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.OpsQueries.oracles ++
      graft.queries.StreamQueries.oracles ++
      graft.queries.FormatQueries.oracles ++
      graft.ops.TemporalJoins.oracles ++
      graft.ops.PipelineOps.oracles ++
      graft.ops.Sketches.oracles ++
      graft.ops.GraphOps.oracles ++
      graft.ops.Warehouse.oracles ++
      graft.queries.OpsQueries.retrievalOracles ++
      graft.ops.Bm25Index.oracles ++
      graft.ops.MlOps.oracles
}

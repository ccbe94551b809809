package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator family's `queries`/`oracles` maps:
  *   - [[graft.queries.EventAnalytics]] — Nexmark query semantics over `events`
  *   - [[graft.queries.Relational]]    — join/agg/set-op coverage over TPC-H-ish tables
  *   - [[graft.queries.TextPipeline]]  — dedup + text analysis over `documents`
  *   - [[graft.queries.Similarity]]    — embedding similarity over `embeddings`
  */
object SparkEntry {

  private def all = Seq(
    graft.queries.EventAnalytics,
    graft.queries.Relational,
    graft.queries.TextPipeline,
    graft.queries.Similarity,
    graft.queries.StreamingBench,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.EventAnalytics.hotUsers(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.map(_.oracles).reduce(_ ++ _)
}

package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in `graft.queries.*`, grouped by SURVEY.md §2 area; this
  * object just flattens them into the driver's shape.
  */
object SparkEntry {

  private def registry: Map[String, QueryDef] =
    graft.queries.CoreQueries.defs ++
      graft.queries.RelationalQueries.defs ++
      graft.queries.SimilarityQueries.defs ++
      graft.queries.DedupQueries.defs ++
      graft.queries.EventQueries.defs ++
      graft.queries.EncoderQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * end-to-end token blocking (scan → concat → tokenize → explode →
    * collect_set agg → join). */
  def entry(spark: SparkSession): DataFrame =
    registry("tb_token_blocker").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, d) if d.oracle.isDefined => k -> d.oracle.get }
}

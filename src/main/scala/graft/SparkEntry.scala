package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{AdvancedQueries, CoreQueries, CorpusPrepQueries, DedupQueries, ExtendedQueries, GraftQuery, MultimodalQueries, PipelineQueries, RetrievalQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the catalog in
  * `graft.analytics`: every operator of SURVEY §2 has a named query, and
  * each SQL-expressible one carries DuckDB oracle SQL with identical
  * column aliases (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** The full query catalog. */
  def catalog: Seq[GraftQuery] =
    PipelineQueries.all ++ CoreQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
      ExtendedQueries.all ++ AdvancedQueries.all ++ CorpusPrepQueries.all ++
      RetrievalQueries.all

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. A multi-
    * operator slice: star join + filter + agg + top-k (TPC-H Q5 shape).
    */
  def entry(spark: SparkSession): DataFrame =
    catalog.find(_.name == "q5_nation_revenue").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.build).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver then records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

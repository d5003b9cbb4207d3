package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a DataFrame implementation plus (when the operator
  * is SQL-expressible) the equivalent DuckDB oracle SQL over the same
  * parquet tables. Keeping the pair colocated prevents column-name drift
  * — the driver's compare sorts columns by name before hashing, so both
  * sides must alias identically.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, Some(oracle))

  def noOracle(name: String)(
      build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, None)
}

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

  /** A query whose Spark implementation IS the oracle SQL text: the
    * engine registers the corpus as temp views and runs `spark.sql` on
    * the exact string DuckDB replays — the SQL entry path of the
    * engine, dialect-shared subset only.
    */
  def sameSql(name: String, sql: String): GraftQuery =
    GraftQuery(name, (s, dir) => {
      graft.core.Tables.registerAll(s, dir)
      s.sql(sql)
    }, Some(sql))
}

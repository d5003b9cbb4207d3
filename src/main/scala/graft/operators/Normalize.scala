package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{GraftConf, Model}
import graft.functions.PipelineFunctions._

/** `_normalize_row` as one declarative projection (SURVEY §2.4 F10–F14;
  * Combine_send_to_postgresql.py:81-120): multi-name coalesce, permalink
  * normalization, conditional key derivation, safe int casts, constant
  * defaults. Input: the all-string landing-CSV DataFrame (any header
  * family); output: the 11 DB columns (plus passthrough of the
  * encounter-order columns when present).
  */
object Normalize {

  def apply(df: DataFrame, conf: GraftConf = GraftConf.default): DataFrame = {
    val present = df.columns.toSet
    def c(name: String) =
      if (present(name)) col(name) else lit(null).cast("string")

    val permRaw = firstPresent(c("permalink"), c("url"))
    val permNorm = normPermalink(permRaw)
    val id = firstPresent(c("post_id"), c("id"))
    val thingType = coalesce(nullif(c("thing_type"), lit("")), lit("t3"))
    val out = df.select(
      Seq(
        deriveThingKey(conf.salt, c("thing_key"), thingType, id, permNorm)
          .as("thing_key"),
        thingType.as("thing_type"),
        coalesce(id, lit("")).as("id"),
        coalesce(c("created_at"), lit("")).as("created_at"),
        safeInt(c("score")).as("score"),
        safeInt(c("num_comments")).as("num_comments"),
        coalesce(firstPresent(c("title_sanitized"), c("title")), lit(""))
          .as("title_sanitized"),
        coalesce(c("author_hash"), lit("")).as("author_hash"),
        coalesce(permNorm, lit("")).as("permalink"),
        coalesce(nullif(c("subreddit"), lit("")), lit(conf.subredditDefault))
          .as("subreddit"),
        coalesce(c("flair_text"), lit("")).as("flair_text")) ++
        Seq("file_seq", "row_seq").filter(present).map(col): _*)
    out
  }

  /** Key-present filter (P3, Combine_send_to_postgresql.py:154-156). */
  def keyed(df: DataFrame): DataFrame =
    df.filter(col("thing_key").isNotNull && col("thing_key") =!= "")
}

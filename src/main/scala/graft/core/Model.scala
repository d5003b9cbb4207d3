package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Canonical record of the reddit pipeline (SURVEY §1.3): eleven
  * pipeline-supplied columns + one sink-supplied (`ingested_at`).
  * Column semantics per reference: thing_key is SHA-256(salt ‖ fullname)
  * (/root/reference/dags/Fetch_reddit.py:242), score/num_comments are
  * lossy-cast ints (Combine_send_to_postgresql.py:96-101).
  */
final case class RedditThing(
    thing_key: String,
    thing_type: String,
    id: String,
    created_at: Timestamp,
    score: Int,
    num_comments: Int,
    title_sanitized: String,
    author_hash: String,
    permalink: String,
    subreddit: String,
    flair_text: String)

object Model {

  /** Typed view of a serving-shaped DataFrame (module-boundary type
    * safety, SURVEY §1.5). Extra columns (e.g. `ingested_at`) pass
    * through the encoder untouched.
    */
  def typed(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Dataset[RedditThing] = {
    implicit val enc: org.apache.spark.sql.Encoder[RedditThing] =
      org.apache.spark.sql.Encoders.product[RedditThing]
    df.as[RedditThing]
  }

  /** CSV landing-file column order (Fetch_reddit.py:220-233 and
    * Combine_send_to_postgresql.py:34-46 agree on this list).
    */
  val DbColumns: Seq[String] = Seq(
    "thing_key", "thing_type", "id", "created_at", "score", "num_comments",
    "title_sanitized", "author_hash", "permalink", "subreddit", "flair_text")

  /** Columns updated on upsert conflict in the current loader
    * (Combine_send_to_postgresql.py:243-248); the legacy loader updated
    * all columns (SURVEY §0 discrepancy #5) — configurable via GraftConf.
    */
  val DefaultUpdateColumns: Seq[String] =
    Seq("score", "num_comments", "title_sanitized", "subreddit", "flair_text")

  /** Typed schema at the serving edge (FIXTURES.md §5 DDL). */
  val ThingSchema: StructType = StructType(Seq(
    StructField("thing_key", StringType, nullable = false),
    StructField("thing_type", StringType, nullable = false),
    StructField("id", StringType),
    StructField("created_at", TimestampType),
    StructField("score", IntegerType),
    StructField("num_comments", IntegerType),
    StructField("title_sanitized", StringType),
    StructField("author_hash", StringType),
    StructField("permalink", StringType),
    StructField("subreddit", StringType),
    StructField("flair_text", StringType)))

  /** Nested reddit listing shape consumed by the fetch stage
    * (Fetch_reddit.py:140-166; FIXTURES.md §1).
    */
  val ListingSchema: StructType = {
    val post = StructType(Seq(
      StructField("name", StringType),
      StructField("id", StringType),
      StructField("created_utc", DoubleType),
      StructField("score", LongType),
      StructField("num_comments", LongType),
      StructField("title", StringType),
      StructField("author", StringType),
      StructField("permalink", StringType),
      StructField("subreddit", StringType),
      StructField("link_flair_text", StringType)))
    val child = StructType(Seq(
      StructField("kind", StringType),
      StructField("data", post)))
    StructType(Seq(
      StructField("data", StructType(Seq(
        StructField("children", ArrayType(child)))))))
  }
}

/** Engine configuration (SURVEY §0 discrepancies #1/#3/#4/#5 made explicit).
  *
  * @param salt          single GDPR salt shared by ALL hashing (the
  *                      reference accidentally used two defaults —
  *                      Fetch_reddit.py:34 vs Combine_send_to_postgresql.py:29)
  * @param hashPermalink current profile hashes the permalink
  *                      (Fetch_reddit.py:250); the `legacy` profile keeps
  *                      the raw normalized URL as observed in the real
  *                      table export (redit_table_202509091827.csv)
  * @param fetchLimit    posts per fetch; code default 40 wins over the
  *                      README's 10 (Fetch_reddit.py:23)
  * @param updateColumns columns rewritten on upsert conflict
  * @param subredditDefault default subreddit for rows missing one
  *                      (Combine_send_to_postgresql.py:105)
  */
final case class GraftConf(
    salt: String = "dev-salt-change-me",
    hashPermalink: Boolean = true,
    fetchLimit: Int = 40,
    titleMaxLen: Int = 300,
    updateColumns: Seq[String] = Model.DefaultUpdateColumns,
    subredditDefault: String = "ItalyTravel")

object GraftConf {
  val default: GraftConf = GraftConf()

  /** Reproduces the golden table export (FIXTURES.md §6): raw normalized
    * permalinks, everything else as the current code.
    */
  val legacy: GraftConf = GraftConf(hashPermalink = false)
}

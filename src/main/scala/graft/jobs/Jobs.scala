package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{GraftConf, Model}
import graft.functions.PipelineFunctions._
import graft.operators.{FirstWins, Normalize}
import graft.sinks.{AtomicCsv, Upsert}
import graft.sources.{LandingCsv, ListingSource}

/** The reference's three entry points (SURVEY §3) as Spark jobs. Each
  * `transform` is a pure DataFrame → DataFrame function (unit-testable,
  * no IO); each `run` wires sources and sinks around it.
  */
object FetchJob {

  /** Listing posts → sanitized/hashed landing rows
    * (Fetch_reddit.py:140-171 projection + :220-254 write-time hashing).
    * One narrow codegen stage: explode → project; no shuffle.
    */
  def transform(
      posts: DataFrame,
      conf: GraftConf = GraftConf.default,
      subreddit: String = "italytravel"): DataFrame = {
    val salt = conf.salt
    val name = fullname(col("name"), col("id")) // name or t3_<id> or null
    val absPermalink = when(
      col("permalink").isNotNull && col("permalink") =!= "",
      absolutizePermalink(col("permalink"))) // null when permalink falsy
    posts.select(
      saltedSha256(salt, name).as("thing_key"),
      lit("t3").as("thing_type"),
      saltedSha256(salt, col("id")).as("id"),
      // Python: iso-Z only when created_utc is truthy (0.0 → null)
      when(col("created_utc").isNotNull && col("created_utc") =!= 0.0,
        isoZ(epochToTs(col("created_utc")))).as("created_at"),
      col("score"),
      col("num_comments"),
      coalesce(sanitizeTitle(col("title"), conf.titleMaxLen), lit(""))
        .as("title_sanitized"),
      saltedSha256(salt, col("author")).as("author_hash"),
      (if (conf.hashPermalink) saltedSha256(salt, absPermalink)
       else absPermalink).as("permalink"),
      coalesce(nullif(col("subreddit"), lit("")), lit(subreddit))
        .as("subreddit"),
      col("link_flair_text").as("flair_text"))
  }

  /** Fixture-listing → one atomic landing CSV (S1→F1-F9→S3). */
  def run(
      spark: SparkSession,
      listingPath: String,
      outFile: String,
      conf: GraftConf = GraftConf.default,
      subreddit: String = "italytravel"): Unit = {
    val posts = ListingSource.posts(
      ListingSource.read(spark, listingPath), conf.fetchLimit)
    AtomicCsv.writeFile(
      AtomicCsv.projectTo(transform(posts, conf, subreddit), Model.DbColumns),
      outFile)
  }
}

object CombineJob {

  /** Landing rows (any header family, with encounter order) → normalized,
    * key-filtered, first-wins-deduplicated 11-column batch
    * (Combine_send_to_postgresql.py:122-207). One shuffle: the dedup
    * exchange on thing_key.
    */
  def transform(raw: DataFrame, conf: GraftConf = GraftConf.default): DataFrame =
    AtomicCsv.projectTo(
      FirstWins(Normalize.keyed(Normalize(raw, conf))),
      Model.DbColumns)

  /** @return path of the combined CSV, or None when the landing dir had
    *         no files at all (reference: AirflowSkip, :128-130).
    * @throws IllegalStateException when files existed but no valid rows
    *         survived — after archiving the sources, exactly like
    *         Combine_send_to_postgresql.py:168-176.
    */
  def run(
      spark: SparkSession,
      dataDir: String,
      combinedDir: String,
      loadedDir: String,
      conf: GraftConf = GraftConf.default,
      outName: Option[String] = None): Option[String] = {
    val (rawOpt, used, skipped) = LandingCsv.readAll(spark, dataDir)
    if (rawOpt.isEmpty && used.isEmpty && skipped.isEmpty) return None

    val name = outName.getOrElse {
      val ts = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd'T'HHmmss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now())
      s"italytravel_combined_$ts.csv"
    }
    val outPath = s"$combinedDir/$name"

    // Batch metrics ride the write pass via observe (SURVEY §2.3 A3) —
    // no separate count() job. The empty-batch guard reads the observed
    // row count AFTER the write and retracts the file if it was empty.
    val nRows = rawOpt.map { raw =>
      val obs = new org.apache.spark.sql.Observation(s"combine_$name")
      AtomicCsv.writeFile(transform(raw, conf)
        .observe(obs, count(lit(1)).as("rows_out")), outPath)
      obs.get("rows_out").asInstanceOf[Long]
    }.getOrElse(0L)

    if (nRows == 0) {
      // retract + archive everything so the next batch doesn't re-scan
      // junk, then fail the batch (empty-input guard P6)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new org.apache.hadoop.fs.Path(outPath).toUri,
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(outPath), false)
      AtomicCsv.archive(spark, used ++ skipped, loadedDir)
      throw new IllegalStateException("no valid rows found in input CSVs")
    }
    AtomicCsv.archive(spark, used ++ skipped, loadedDir)
    Some(outPath)
  }
}

/** The full batch pipeline (SURVEY §7.1 item 6): fetch → combine →
  * load composed as the reference's DAG chain, against a parquet
  * serving table. One call = one "day" of the reference's operation.
  */
object PipelineJob {

  def run(
      spark: SparkSession,
      listingPaths: Seq[String],
      workDir: String,
      conf: GraftConf = GraftConf.default): Unit = {
    val dataDir = s"$workDir/data"
    val combinedDir = s"$workDir/combined"
    val loadedDir = s"$workDir/loaded"
    val tableDir = s"$workDir/table"
    listingPaths.zipWithIndex.foreach { case (lp, i) =>
      FetchJob.run(spark, lp, f"$dataDir/italytravel_$i%04d.csv", conf)
    }
    CombineJob.run(spark, dataDir, combinedDir, loadedDir, conf)
      .foreach(combined => LoadJob.run(spark, combined, tableDir, conf))
  }
}

object LoadJob {

  /** Combined-CSV strings → typed serving rows (+ sink-side
    * `ingested_at`, SURVEY §0 discrepancy #2). `try_cast` everywhere:
    * Spark 4 runs ANSI mode, and the reference's loader tolerates bad
    * cells (int() fallback to 0, Combine_send_to_postgresql.py:96-101).
    */
  def typed(df: DataFrame): DataFrame =
    df.select(
      col("thing_key"),
      col("thing_type"),
      col("id"),
      col("created_at").try_cast(TimestampType).as("created_at"),
      coalesce(col("score").try_cast(IntegerType), lit(0)).as("score"),
      coalesce(col("num_comments").try_cast(IntegerType), lit(0)).as("num_comments"),
      col("title_sanitized"),
      col("author_hash"),
      col("permalink"),
      col("subreddit"),
      col("flair_text"))

  /** Load a combined CSV into the parquet serving table via keyed merge
    * (the S7/S8 stage-and-upsert path; [[graft.sinks.Upsert.writeJdbc]]
    * is the Postgres delivery for a real deployment).
    */
  def run(
      spark: SparkSession,
      combinedFile: String,
      tableDir: String,
      conf: GraftConf = GraftConf.default): Unit = {
    val stage = typed(
      spark.read.option("header", "true").csv(combinedFile))
      .withColumn("ingested_at", current_timestamp())
    Upsert.upsertParquetPartitioned(spark, stage, tableDir,
      updateColumns = conf.updateColumns)
  }
}

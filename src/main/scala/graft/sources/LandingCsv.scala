package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Landing-directory CSV source (SURVEY §2.1 S4/S5): prefix/suffix file
  * filter, lexicographic file order, header row, schema-on-read with
  * every column `string` (mirrors `csv.DictReader` — no inferSchema),
  * per-file error tolerance, and a deterministic per-row encounter order
  * `(file_seq, row_seq)` for first-wins dedup (SURVEY §7.4 risk #1).
  *
  * Encounter order at scale: `file_seq` is the rank of the file in the
  * sorted listing (driver-side, one listing RPC — cheap even for 10⁵
  * files); `row_seq` is the in-file row number. `multiLine=true` pins
  * one whole file per task (Spark cannot split multiLine CSV), making
  * `monotonically_increasing_id` strictly row-ordered within each file —
  * landing files are micro-batch-sized (≤100 rows each,
  * /root/reference/dags/Fetch_reddit.py:23,116), so unsplittable reads
  * cost nothing while making the order a guarantee instead of a habit.
  */
object LandingCsv {

  /** Sorted landing files matching `prefix*suffix`
    * (Combine_send_to_postgresql.py:63-73).
    */
  def listFiles(
      spark: SparkSession,
      dir: String,
      prefix: String = "italytravel_",
      suffix: String = ".csv"): Seq[String] = {
    val p = new Path(dir)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p).iterator
        .filter(_.isFile)
        .map(_.getPath)
        .filter(f => f.getName.startsWith(prefix) && f.getName.endsWith(suffix))
        .map(_.toString)
        .toSeq
        .sorted
  }

  /** Newest matching file by modification time (SURVEY §2.6 W2 — the
    * legacy loader's `sorted(glob, key=getmtime, reverse=True)[0]`),
    * optionally bounded to files newer than `notOlderThanMs`.
    */
  def latestByMtime(
      spark: SparkSession,
      dir: String,
      prefix: String = "italytravel_",
      suffix: String = ".csv",
      notOlderThanMs: Long = Long.MinValue): Option[String] = {
    val p = new Path(dir)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else
      fs.listStatus(p).iterator
        .filter(_.isFile)
        .filter(s => s.getPath.getName.startsWith(prefix) &&
          s.getPath.getName.endsWith(suffix) &&
          s.getModificationTime >= notOlderThanMs)
        .toSeq
        .sortBy(s => (-s.getModificationTime, s.getPath.getName))
        .headOption
        .map(_.getPath.toString)
  }

  /** Basename of the URI `input_file_name()` reports. */
  private def basenameCol: org.apache.spark.sql.Column =
    element_at(split(input_file_name(), "/"), -1)

  /** Attach the encounter-order columns (`file_seq`, `row_seq`) shared
    * by the batch read and the streaming `foreachBatch` path — the one
    * copy of the subtle ordering contract: the caller must have read
    * with `multiLine=true` (one file == one task, so
    * `monotonically_increasing_id` is strictly row-ordered within each
    * file); `fileSeqOf` maps file BASENAME → rank. Map-literal lookup,
    * NOT a folded when-chain: one nested CASE per landing file would
    * blow analyzer/codegen stack limits at the 10⁵-file scale this
    * source claims; `element_at` on a map literal is one O(1)-ish
    * expression regardless of file count.
    */
  def attachEncounterOrder(
      df: DataFrame, fileSeqOf: Map[String, Int]): DataFrame = {
    val seqExpr =
      if (fileSeqOf.isEmpty) lit(-1)
      else coalesce(element_at(typedLit(fileSeqOf), col("_fname")), lit(-1))
    val byFile = Window.partitionBy(col("_fname")).orderBy(col("_mono"))
    df
      .withColumn("_fname", basenameCol)
      .withColumn("_mono", monotonically_increasing_id())
      .withColumn("file_seq", seqExpr)
      .withColumn("row_seq", row_number().over(byFile))
      .drop("_mono")
      .drop("_fname")
  }

  /** Read ONE header-family of files as all-string columns with
    * encounter order attached. `fileSeqOf` maps file BASENAME (unique
    * within a landing dir) → rank in the full sorted listing.
    */
  def read(spark: SparkSession, files: Seq[String], fileSeqOf: Map[String, Int]): DataFrame =
    attachEncounterOrder(
      spark.read
        .option("header", "true")
        .option("multiLine", "true") // one file == one task ⇒ stable row order
        .option("mode", "PERMISSIVE")
        .csv(files: _*),
      fileSeqOf)

  /** Read every landing file, tolerating ragged headers (legacy files
    * carry `id,author,title,...` or `post_id,url,...` — FIXTURES.md §3)
    * and skipping unreadable/empty files with a warning, like
    * `_read_csv` (Combine_send_to_postgresql.py:75-79,141-149).
    *
    * Files are grouped by their header line (one Spark read per header
    * family, not per file — at scale the number of *schemas* is tiny
    * even when the number of files is huge), then unioned by name with
    * missing columns null-filled.
    *
    * @return (dataframe with encounter order, used files, skipped files)
    */
  def readAll(
      spark: SparkSession,
      dir: String,
      prefix: String = "italytravel_",
      suffix: String = ".csv"): (Option[DataFrame], Seq[String], Seq[String]) = {
    val files = listFiles(spark, dir, prefix, suffix)
    val fileSeqOf = files.zipWithIndex.map { case (f, i) =>
      new Path(f).getName -> i
    }.toMap

    val fs = FileSystem.get(new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)
    def headerOf(f: String): Option[String] =
      try {
        val in = fs.open(new Path(f))
        try {
          val reader = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, "UTF-8"))
          Option(reader.readLine()).filter(_.trim.nonEmpty)
        } finally in.close()
      } catch { case _: Exception => None }

    val (readable, skipped) = files.partition(f => headerOf(f).isDefined)
    val families = readable.groupBy(f => headerOf(f).get).values.toSeq
    val dfs = families.map(fam => read(spark, fam, fileSeqOf))
    val combined = dfs.reduceOption { (a, b) =>
      a.unionByName(b, allowMissingColumns = true)
    }
    (combined, readable, skipped)
  }
}

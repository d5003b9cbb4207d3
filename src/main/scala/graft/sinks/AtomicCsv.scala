package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Atomic single-file CSV sink (SURVEY §2.1 S3/S6) + archive move (S9).
  *
  * The reference publishes CSVs by writing `.tmp` then `os.replace`
  * (Fetch_reddit.py:235-257, Combine_send_to_postgresql.py:179-184) so
  * readers never observe a torn file. Spark's FileOutputCommitter gives
  * the same guarantee for directory outputs; for the reference's
  * single-FILE contract we write to a task temp dir and rename the part
  * file into place — rename is atomic on HDFS and POSIX.
  *
  * Scale note: single-file output is inherently a 1-task sink — correct
  * for the micro-batch landing contract (≤100 rows per file), never for
  * analytics output. Large results keep the default directory committer
  * (`df.write.csv(dir)`), which commits in parallel.
  */
object AtomicCsv {

  /** Project to exactly `columns` (missing → empty string, like
    * `_normalize_row`'s fixed DB_COLUMNS projection,
    * Combine_send_to_postgresql.py:180-183).
    */
  def projectTo(df: DataFrame, columns: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    df.select(columns.map { c =>
      if (present(c)) coalesce(col(c).cast("string"), lit("")).as(c)
      else lit("").as(c)
    }: _*)
  }

  /** Write `df` as ONE csv file (with header) at `destFile`, atomically:
    * temp dir → rename. Overwrites an existing destination (os.replace
    * semantics).
    */
  def writeFile(df: DataFrame, destFile: String): Unit = {
    val dest = new Path(destFile)
    val fs = FileSystem.get(dest.toUri,
      df.sparkSession.sparkContext.hadoopConfiguration)
    val tmpDir = new Path(dest.getParent, s".${dest.getName}.tmp")
    fs.delete(tmpDir, true)
    df.coalesce(1)
      .write
      .option("header", "true")
      .option("emptyValue", "") // write missing as "" like csv.DictWriter
      .option("nullValue", "")
      // Python's csv.writer never trims cell whitespace; Spark's CSV
      // WRITER does by default (read side doesn't) — disable both.
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .mode("overwrite")
      .csv(tmpDir.toString)
    val part = fs.listStatus(tmpDir)
      .map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".csv"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmpDir"))
    fs.delete(dest, false)
    if (!fs.rename(part, dest))
      throw new IllegalStateException(s"rename $part -> $dest failed")
    fs.delete(tmpDir, true)
  }

  /** Archive-move files into `loadedDir` (exactly-once consumption,
    * Combine_send_to_postgresql.py:186-200): every consumed source —
    * even unusable ones — leaves the scan directory after the batch.
    */
  def archive(spark: org.apache.spark.sql.SparkSession, files: Seq[String],
      loadedDir: String): Unit = {
    val fs = FileSystem.get(new Path(loadedDir).toUri,
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(loadedDir))
    files.foreach { f =>
      val src = new Path(f)
      val dst = new Path(loadedDir, src.getName)
      fs.delete(dst, false)
      fs.rename(src, dst)
    }
  }
}

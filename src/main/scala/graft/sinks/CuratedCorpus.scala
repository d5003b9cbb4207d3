package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curated-corpus layout writer: hive-partitioned, range-clustered,
  * sorted-within-files parquet — the layout a 100 TB training-data
  * corpus wants on disk.
  *
  *  - `partitionBy(partCols)` makes low-cardinality predicates (lang,
  *    source, split) PARTITION-pruning: a `lang = 'en'` read never lists
  *    the other directories.
  *  - `repartitionByRange(numFiles, partCols :+ sortCol)` assigns each
  *    output file a contiguous `sortCol` range *within* its partition
  *    value, so parquet row-group min/max stats prune range predicates
  *    (`doc_id BETWEEN …`) down to single files; the range exchange also
  *    sizes files evenly when a partition value is hot (no single-task
  *    hot-partition write, unlike `repartition(partCols)`).
  *  - `sortWithinPartitions` gives monotone `sortCol` inside every file,
  *    which is what makes those min/max stats tight.
  *
  * At cluster scale `numFiles` is chosen from the corpus size / target
  * file size (512 MB–1 GB parquet); it is the only knob that changes
  * with data volume.
  */
object CuratedCorpus {

  def write(
      df: DataFrame,
      path: String,
      partCols: Seq[String],
      sortCol: String,
      numFiles: Int): Unit = {
    val cluster: Seq[Column] = partCols.map(col) :+ col(sortCol)
    df.repartitionByRange(numFiles, cluster: _*)
      .sortWithinPartitions(cluster: _*)
      .write
      .mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(path)
  }

  /** Two-dimensional clustering: files cut along the Morton curve of
    * (xBucket, yBucket), so every file covers a compact box in BOTH
    * dimensions and parquet min/max stats prune x-only AND y-only
    * predicates (see [[graft.expressions.ZOrder]]). The z key is
    * layout-only and is dropped before writing — the range exchange and
    * the in-file sort both happen on it, and the trailing projection is
    * narrow, so file order is preserved.
    */
  def writeZClustered(
      df: DataFrame,
      path: String,
      xBucket: Column,
      yBucket: Column,
      numFiles: Int): Unit = {
    val z = graft.expressions.ZOrder.zorder2(
      xBucket.cast("long"), yBucket.cast("long"))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(path)
  }
}

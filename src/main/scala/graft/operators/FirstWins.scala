package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic first-wins dedup (SURVEY §2.3 A1 / §2.6 W1).
  *
  * The reference keeps the FIRST occurrence of each `thing_key` in
  * encounter order — sorted filename order, then row order within the
  * file (`seen_keys` set, Combine_send_to_postgresql.py:136,152-161).
  * `dropDuplicates` keeps an *arbitrary* row, so instead: rank rows per
  * key by the `(file_seq, row_seq)` order the source attached and keep
  * rank 1.
  *
  * Scale: one hash exchange on the key (the same exchange any dedup
  * needs); the window sort is per-key and tiny (duplicate count per
  * key), so no skew beyond genuinely hot keys.
  */
object FirstWins {

  def apply(
      df: DataFrame,
      key: String = "thing_key",
      orderCols: Seq[String] = Seq("file_seq", "row_seq")): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(orderCols.map(col): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2.5 J6) as a first-class operator: for every
  * left row, the single most recent right row with
  * `right.ts ≤ left.ts` (inclusive) or `< left.ts` (strict), per key.
  *
  * Implementation is the UNION + window pattern, not a join: both
  * sides are tagged and unioned, one hash exchange on the key sorts
  * each key's timeline, and `last(_, ignoreNulls)` carries the latest
  * right payload forward. At 100 TB this is ONE shuffle of
  * |left|+|right| rows with no join-state blowup — the naive
  * inequality join is a per-key nested loop, and even a range-bucketed
  * join shuffles twice.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param key        equi-key column present on both sides
    * @param leftTs     left timestamp column
    * @param rightTs    right timestamp column
    * @param rightCols  right payload columns to attach (null when no
    *                   right row precedes the left row)
    * @param strict     true → right rows at exactly the left timestamp
    *                   do NOT match (reference must be strictly earlier)
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("_rval") && !leftCols.contains("_side"),
      "reserved column names _rval/_side")

    // at equal timestamps, order decides visibility: inclusive puts the
    // right row first (visible to the left row in the same frame),
    // strict puts it after
    val (rightOrd, leftOrd) = if (strict) (1, 0) else (0, 1)

    val l = left.select(
      (col(key).as("_k") +: col(leftTs).cast("timestamp").as("_ts") +:
        lit(leftOrd).as("_side") +:
        lit(null).cast(structType(right, rightCols)).as("_rval") +:
        leftCols.map(c => col(c).as(s"_l_$c"))): _*)
    val r = right.select(
      (col(key).as("_k") +: col(rightTs).cast("timestamp").as("_ts") +:
        lit(rightOrd).as("_side") +:
        struct(rightCols.map(col): _*).as("_rval") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c"))): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, -1)
    l.unionByName(r)
      .withColumn("_match", last(col("_rval"), ignoreNulls = true).over(w))
      .filter(col("_side") === leftOrd)
      .select(leftCols.map(c => col(s"_l_$c").as(c)) ++
        rightCols.map(c => col("_match").getField(c).as(s"asof_$c")): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => org.apache.spark.sql.types.StructField(c, df.schema(c).dataType)))
}

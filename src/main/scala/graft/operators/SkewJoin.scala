package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the manual companion to AQE's
  * skew-join splitting, for when skew is KNOWN — e.g. the null-key or
  * celebrity-entity rows of a 100 TB fact table).
  *
  * The skewed (large) side gets a random salt in `[0, salts)`; the
  * small side is replicated `salts`× with every salt value; the join
  * key becomes `(key, salt)`, spreading each hot key over `salts`
  * reducers. Replication cost: |right| × salts rows through the
  * exchange — choose `salts` ≈ (hot-key rows / target-partition-rows).
  *
  * AQE (`spark.sql.adaptive.skewJoin`, on by default in GraftSession)
  * already splits skewed SHUFFLE partitions at runtime; this operator
  * is for the cases AQE can't fix: skew concentrated in a SINGLE key
  * value (AQE splits partitions, but one key still hashes to one
  * partition in a regular shuffle join unless salted).
  */
object SkewJoin {

  def saltedInner(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val salted = left.withColumn("_salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key))
      .drop("_salt")
  }

  /** Salted aggregation: two-phase `groupBy` for a skewed grouping key.
    * Phase 1 aggregates `(key, salt)` partials; phase 2 merges per key.
    * Works for algebraic aggregates (sum/count/min/max).
    */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      valueCol: String,
      salts: Int): DataFrame = {
    val salted = df.withColumn("_salt", (rand(seed = 42) * salts).cast("int"))
    salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum"))
  }
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the analytics corpus (repo:TESTDATA.md): one parquet file
  * per table under a scale-factor directory.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The events table carries INT64 TIMESTAMP(NANOS) — a parquet type
    // Spark doesn't model (SPARK-40819). Read nanos as long, then
    // normalize to TimestampType at microsecond precision (`div` keeps
    // the arithmetic in exact integer space; a double division would
    // lose precision above 2^53 ns). DuckDB's CAST(ts_ns AS TIMESTAMP)
    // truncates identically, so oracle parity holds.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.filter(f => f.name == "ts" && f.dataType == LongType)
      .foldLeft(df)((d, f) =>
        d.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000"))))
  }

  /** Register every table as a temp view (for spark.sql use). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

package graft

import org.apache.spark.sql.types._

/** Output-shape contract for every catalog query (the driver's comparator
  * is the ground truth, and it renders certain Spark types differently
  * from its DuckDB-oracle side):
  *
  *  - no DecimalType in a final projection — the driver reads Spark
  *    parquet via pandas (Decimal objects keep scale: '136933.00') but
  *    the oracle via DuckDB .df() (float64: '136933.0'), so any decimal
  *    output hash-mismatches even when values are identical (all 19
  *    round-1 hash-fails);
  *  - no ArrayType — pandas sort_values crashes on array cells
  *    (round-1 q_array_agg driver error);
  *  - no MapType / nested StructType — same unhashable-cell class;
  *  - FloatType is also banned: float32 stringification differs between
  *    numpy float32 (Spark side) and DuckDB's float64 promotion.
  *
  * This spec is the compile-time arm of the guard; tools/check_oracle.py
  * enforces the same contract (plus int-vs-float dtype skew, which needs
  * the oracle side) on the materialized parquet.
  */
class OutputShapeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def banned(dt: DataType): Option[String] = dt match {
    case _: DecimalType => Some(s"DecimalType $dt")
    case _: ArrayType   => Some(s"ArrayType $dt")
    case _: MapType     => Some(s"MapType $dt")
    case _: StructType  => Some(s"StructType $dt")
    case FloatType      => Some("FloatType")
    case _              => None
  }

  test("no catalog query exposes a driver-hostile type in its final schema") {
    val offenders = SparkEntry.catalog.flatMap { q =>
      val schema = q.build(spark, sfDir).schema
      schema.fields.toSeq.flatMap(f =>
        banned(f.dataType).map(why => s"${q.name}.${f.name}: $why"))
    }
    assert(offenders.isEmpty, s"driver-hostile output columns:\n${offenders.mkString("\n")}")
  }
}

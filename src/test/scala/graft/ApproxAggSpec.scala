package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Error bounds for the sketch aggregates behind q_approx_stats: HLL++
  * count-distinct within its configured rsd, approximate percentiles
  * within rank tolerance of the exact answers. (The catalog query now
  * emits sketch-vs-exact BOOLEANS for the driver's hash gate; this spec
  * keeps the numeric bounds.)
  */
class ApproxAggSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 3*rsd of exact") {
    val ev = Tables.load(spark, dir, "events")
    val both = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), rsd = 0.01).as("approx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    both.foreach { case (k, e, a) =>
      assert(math.abs(a - e) / e.toDouble <= 0.03, s"$k: approx $a vs exact $e")
    }
  }

  test("percentile_approx brackets the exact median; p99 above p50") {
    val ev = Tables.load(spark, dir, "events")
    val stats = ev.groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99"))
      .collect()
    stats.foreach { r =>
      val et = r.getString(0)
      val p50 = r.getDouble(1)
      val below = ev.filter(col("event_type") === et && col("value") <= p50).count()
      val total = ev.filter(col("event_type") === et).count()
      val frac = below.toDouble / total
      assert(frac >= 0.45 && frac <= 0.55, s"$et: p50=$p50 covers $frac")
      assert(r.getDouble(2) >= p50) // p99 ≥ p50
    }
  }

  test("q_approx_stats: both sketch-vs-exact gates hold (the oracle asserts TRUE)") {
    val rows = SparkEntry.queries("q_approx_stats")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: approx_ok false")
      assert(r.getBoolean(3), s"${r.getString(0)}: p50_ok false")
    }
  }
}

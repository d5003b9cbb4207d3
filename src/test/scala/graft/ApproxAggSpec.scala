package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Error bounds for the sketch aggregates (q_approx_stats): HLL++
  * count-distinct within its configured rsd, approximate percentiles
  * within rank tolerance of the exact answers.
  */
class ApproxAggSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 3*rsd of exact") {
    val ev = Tables.load(spark, dir, "events")
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q_approx_stats")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, a) =>
      val e = exact(k).toDouble
      assert(math.abs(a - e) / e <= 0.06, s"$k: approx $a vs exact $e")
    }
  }

  test("percentile_approx brackets the exact median") {
    val ev = Tables.load(spark, dir, "events")
    val stats = SparkEntry.queries("q_approx_stats")(spark, dir).collect()
    stats.foreach { r =>
      val et = r.getString(0)
      val p50 = r.getDouble(2)
      val below = ev.filter(col("event_type") === et && col("value") <= p50).count()
      val total = ev.filter(col("event_type") === et).count()
      val frac = below.toDouble / total
      assert(frac >= 0.45 && frac <= 0.55, s"$et: p50=$p50 covers $frac")
      assert(r.getDouble(3) >= p50) // p99 ≥ p50
    }
  }
}

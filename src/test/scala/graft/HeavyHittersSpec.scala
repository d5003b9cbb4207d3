package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.MisraGries

/** Misra–Gries mergeable-summary guarantee: after distributed partial
  * aggregation under ANY partitioning, every key with frequency share
  * above 1/(capacity+1) appears in the summary, and the summary stays
  * within capacity. The candidate SET may vary with partitioning — the
  * catalog query's exact confirm stage is what makes the final answer
  * deterministic — so the spec asserts the guarantee, not set equality.
  */
class HeavyHittersSpec extends SparkSpec {

  test("guarantee: share > 1/(cap+1) keys always surface; size bounded") {
    import spark.implicits._
    val rnd = new Random(11)
    // 30% key 1, 10% key 2, the rest uniform over a 1000-key tail
    val data: Seq[Long] = Seq.fill(6000)(1L) ++ Seq.fill(2000)(2L) ++
      Seq.fill(12000)(100L + rnd.nextInt(1000))
    val shuffled = rnd.shuffle(data)
    for (parts <- Seq(1, 7, 32)) {
      val cands = shuffled.toDS().repartition(parts)
        .select(new MisraGries(16).toColumn)
        .collect().head
      // error bound N/17 ≈ 5.9% — keys 1 (30%) and 2 (10%) must survive
      assert(cands.contains(1L) && cands.contains(2L),
        s"parts=$parts lost a guaranteed heavy hitter: $cands")
      assert(cands.size <= 16, s"summary exceeded capacity: ${cands.size}")
    }
  }

  test("q_heavy_hitters == exact groupBy+HAVING (sketch confirmed, not trusted)") {
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("q_heavy_hitters")(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val events = graft.core.Tables.load(spark, sf, "events")
    val n = events.count()
    val exact = events
      .select(when(col("user_id") % 10 < 4, col("user_id") % 2)
        .otherwise(col("user_id")).cast("long").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .filter(col("n") * 100 > n)
      .orderBy(col("k"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r == exact, s"sketch-confirmed=$r exact=$exact")
    assert(r.map(_._1).toSet.intersect(Set(0L, 1L)) == Set(0L, 1L),
      s"planted hot keys 0/1 must clear the 1% threshold: $r")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{BloomBuild, BloomFilter, BloomHashes}

/** Bloom-filter prefilter semantics: zero false negatives (the property
  * that makes prefilter + exact-confirm return the exact join's
  * answer), measured false-positive selectivity near the analytic rate,
  * and the contamination query equivalence (bloom form == plain form).
  */
class BloomFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def hashed(values: Seq[String]) = {
    import spark.implicits._
    values.toDF("s")
      .withColumn("fp", sha2(col("s"), 256))
      .withColumn("h1", conv(substring(col("fp"), 1, 8), 16, 10).cast(LongType))
      .withColumn("h2", conv(substring(col("fp"), 9, 8), 16, 10).cast(LongType))
  }

  test("no false negatives; FP rate near (1-e^(-kn/m))^k") {
    import spark.implicits._
    val members = (0 until 500).map(i => s"member-$i")
    val others = (0 until 20000).map(i => s"other-$i")
    val bloom = new BloomBuild(BloomFilter.DefaultBits, BloomFilter.DefaultProbes)
    val bloomRow = hashed(members).select(col("h1"), col("h2")).as[BloomHashes]
      .select(bloom.toColumn).toDF("bloom")
    def hits(values: Seq[String]): Long =
      hashed(values).join(broadcast(bloomRow))
        .filter(BloomFilter.mightContain(col("bloom"), col("h1"), col("h2")))
        .count()
    assert(hits(members) == members.size, "bloom dropped a member (false negative)")
    val fp = hits(others)
    // analytic FP at n=500, m=2^16, k=4 is ~1.2e-6 → expect ~0 of 20k;
    // allow generous slack for hash clustering
    assert(fp <= 5, s"false-positive count $fp far above analytic rate")
  }

  test("aggregator merge ORs partial buffers (distributed build == local build)") {
    import spark.implicits._
    val members = (0 until 300).map(i => s"m-$i")
    val bloom = new BloomBuild(BloomFilter.DefaultBits, BloomFilter.DefaultProbes)
    val one = hashed(members).repartition(1).select(col("h1"), col("h2"))
      .as[BloomHashes].select(bloom.toColumn).collect().head
    val many = hashed(members).repartition(7).select(col("h1"), col("h2"))
      .as[BloomHashes].select(bloom.toColumn).collect().head
    assert(one.toSeq == many.toSeq, "bitset depends on partitioning")
  }

  test("q_contamination_bloom == q_contamination (prefilter changes no rows)") {
    val plain = SparkEntry.queries("q_contamination")(spark, sf).collect().toSeq
    val bloom = SparkEntry.queries("q_contamination_bloom")(spark, sf).collect().toSeq
    assert(bloom == plain)
    assert(plain.nonEmpty, "planted cross-split dups should exist")
  }
}

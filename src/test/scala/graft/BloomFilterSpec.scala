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
    val (h1, h2) = BloomFilter.hashColumns(col("fp"))
    values.toDF("s")
      .withColumn("fp", sha2(col("s"), 256))
      .withColumn("h1", h1).withColumn("h2", h2)
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

  test("negative hashes index safely (floorMod, not signed %)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.typedLit
    // hash(), xxhash64() produce negative longs; a signed % would
    // index out of bounds (unsafe read / AIOOBE). floorMod(-5, 64)=59,
    // floorMod(-12, 64)=52 set; the (-6, -7) probe reads 58 and 51.
    val bloom = new BloomBuild(64, 2)
    val bits = Seq(BloomHashes(-5L, -7L)).toDS().select(bloom.toColumn).collect().head
    def probe(h1: Long, h2: Long): Boolean =
      Seq((h1, h2)).toDF("h1", "h2")
        .select(BloomFilter.mightContain(typedLit(bits), col("h1"), col("h2"), 64, 2))
        .collect().head.getBoolean(0)
    assert(probe(-5L, -7L), "member with negative hashes must hit")
    assert(!probe(-6L, -7L), "disjoint negative probe must miss")
  }

  test("q_contamination_bloom == q_contamination (prefilter changes no rows)") {
    val plain = SparkEntry.queries("q_contamination")(spark, sf).collect().toSeq
    val bloom = SparkEntry.queries("q_contamination_bloom")(spark, sf).collect().toSeq
    assert(bloom == plain)
    assert(plain.nonEmpty, "planted cross-split dups should exist")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.analytics.CorpusPrepQueries
import graft.core.Tables

/** DSIR data selection beyond the catalog gate (`q_select_dsir` pins
  * the deterministic top-k end-to-end vs DuckDB): the SAMPLED
  * selection (`dsirGumbelTopK` — the paper's actual draw) must be
  * deterministic per seed, seed-sensitive, and biased toward
  * target-like documents.
  */
class DataSelectionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("Gumbel-top-k: deterministic per seed, seed-sensitive, " +
      "weight-biased") {
    val docs = Tables.load(spark, dir, "documents")
    val w = CorpusPrepQueries
      .dsirWeights(docs, col("source").isin("src0", "src1"))
      .cache()
    val k = 50

    // deterministic: the same (seed, corpus) draws the same sample —
    // the property that makes a distributed "random" selection
    // idempotent under retries and replays
    val s1 = CorpusPrepQueries.dsirGumbelTopK(w, k, "seedA")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val s1again = CorpusPrepQueries.dsirGumbelTopK(w, k, "seedA")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(s1 == s1again, "same seed must reproduce the same sample")
    assert(s1.size == k && s1.distinct.size == k)

    // a different seed draws a (near-surely) different sample
    val s2 = CorpusPrepQueries.dsirGumbelTopK(w, k, "seedB")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(s1 != s2, "independent seeds drew identical samples")

    // importance bias: sampling ∝ 2^w must concentrate on
    // higher-weight docs than a uniform draw — compare the sample's
    // mean weight against the universe's
    val all = w.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val meanAll = all.values.sum / all.size
    def meanOf(ids: Seq[Long]): Double = ids.map(all).sum / ids.size
    assert(meanOf(s1) > meanAll,
      s"sample mean ${meanOf(s1)} not above universe mean $meanAll")
    assert(meanOf(s2) > meanAll,
      s"sample mean ${meanOf(s2)} not above universe mean $meanAll")
    w.unpersist()
  }
}

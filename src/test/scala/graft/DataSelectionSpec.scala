package graft

import org.apache.spark.sql.functions._

import graft.analytics.CorpusPrepQueries
import graft.core.Tables
import graft.streaming.StreamingPipeline

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

  test("incremental DSIR model: appends + merge-compaction reconstruct " +
      "the one-shot weights exactly; replay is a no-op") {
    withTempDir { root =>
      val docs = Tables.load(spark, dir, "documents")
      val isTarget = col("source").isin("src0", "src1")
      val mdl = root.resolve("model").toString
      for (m <- 0 until 3)
        CorpusPrepQueries.appendToDsirModelIdempotent(
          docs.filter(pmod(col("doc_id"), lit(3)) === m), isTarget, mdl,
          m.toLong)
      val oneShot = CorpusPrepQueries.dsirWeights(docs, isTarget)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      def stored(): Map[Long, Double] =
        CorpusPrepQueries.dsirWeightsFromStoredModel(docs, mdl)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // counts are integers summed over a disjoint batch partition, so
      // the maintained model scores BIT-IDENTICALLY to a one-shot train
      assert(stored() == oneShot)
      // merge-compaction preserves the relation (sum-merge == re-sum)
      CorpusPrepQueries.compactDsirModelMinor(spark, mdl)
      assert(stored() == oneShot, "merge-compaction changed the model")
      // a replayed batch — even after its files were absorbed — is a
      // no-op: without the ack guard it would inflate its buckets'
      // counts and shift every log-ratio
      CorpusPrepQueries.appendToDsirModelIdempotent(
        docs.filter(pmod(col("doc_id"), lit(3)) === 1), isTarget, mdl, 1L)
      assert(stored() == oneShot, "replayed batch changed the model")
    }
  }

  test("cheap-hash (xxhash64) weights: deterministic, bias-preserving, " +
      "high selection overlap with the gated sha form") {
    val docs = Tables.load(spark, dir, "documents")
    val isTarget = col("source").isin("src0", "src1")
    def top(w: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
      w.orderBy(col("w").desc, col("doc_id")).limit(k)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val fast = CorpusPrepQueries.dsirWeightsFast(docs, isTarget)
    // deterministic across plans/reruns (hash-derived, no RNG state)
    assert(top(fast, 100) == top(
      CorpusPrepQueries.dsirWeightsFast(docs.repartition(7), isTarget), 100))
    // the two hash families train the same model over different bucket
    // collisions — selections must substantially agree (overlap pinned
    // loose; the exact value is corpus-dependent, reported for the eye)
    val sha100 = top(CorpusPrepQueries.dsirWeights(docs, isTarget), 100).toSet
    val overlap = top(fast, 100).count(sha100.contains) / 100.0
    info(s"top-100 overlap sha vs xxh: $overlap")
    assert(overlap >= 0.6, s"selection overlap $overlap under 0.6")
  }

  test("stored-model scoring with a LAGGING model gives unseen buckets " +
      "the smoothed zero-count log-ratio, not a silent 0") {
    withTempDir { root =>
      import spark.implicits._
      val mdl = root.resolve("model").toString
      // model trained on two docs: target 5 feature instances,
      // non-target 3 → r_n=8, t_n=5 (the totals the smoothed
      // zero-count ratio is built from)
      val seen = Seq(
        (0L, "alpha alpha beta", "src0"),
        (1L, "gamma delta", "src9")).toDF("doc_id", "text", "source")
      CorpusPrepQueries.appendToDsirModelIdempotent(
        seen, col("source") === "src0", mdl, 0L)
      // a later batch scores against the stored model BEFORE its own
      // delta is absorbed — every one of its 5 feature instances lands
      // in a bucket the model never saw
      val late = Seq((7L, "zyzzyva qwertyuiop plugh", "src9"))
        .toDF("doc_id", "text", "source")
      val mdlBuckets = spark.read.parquet(mdl)
        .select("b").collect().map(_.getLong(0)).toSet
      val lateBuckets = CorpusPrepQueries.dsirDeltas(late, lit(false))
        .select("b").collect().map(_.getLong(0)).toSet
      assert(lateBuckets.intersect(mdlBuckets).isEmpty,
        "test tokens collide with model buckets — pick different tokens")
      val w = CorpusPrepQueries
        .dsirWeightsFromStoredModel(seen.unionByName(late), mdl)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // the smoothed unseen log-ratio the Laplace model implies,
      // computed with the engine's own expression chain
      val ulr = spark.range(1).select(
        graft.analytics.TextQueries.quantizeLog2(log2(
          (lit(0.5) / (lit(5.0) + lit(512.0))) /
          (lit(0.5) / (lit(8.0) + lit(512.0)))))).head.getDouble(0)
      assert(ulr != 0.0)
      // 3 unigrams + 2 bigrams, each contributing exactly ulr
      assert(w(7L) == 5 * ulr,
        s"lagging-model weight ${w(7L)} != 5 × smoothed $ulr")
    }
  }

  test("streamed DSIR ingest converges to the one-shot model") {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.Files
    withTempDir { root =>
      val docs = Tables.load(spark, dir, "documents")
        .select("doc_id", "text", "source")
      val isTarget = col("source").isin("src0", "src1")
      val incoming = Files.createDirectory(root.resolve("incoming"))
      val mdl = root.resolve("model").toString
      val ckpt = root.resolve("ckpt").toString
      land(docs.filter(pmod(col("doc_id"), lit(2)) === 0), incoming,
        "b0.parquet")
      StreamingPipeline.startDsirIngest(
        spark, incoming.toString, mdl, ckpt, isTarget,
        Trigger.AvailableNow()).awaitTermination(120000)
      land(docs.filter(pmod(col("doc_id"), lit(2)) === 1), incoming,
        "b1.parquet")
      StreamingPipeline.startDsirIngest(
        spark, incoming.toString, mdl, ckpt, isTarget,
        Trigger.AvailableNow()).awaitTermination(120000)
      val oneShot = CorpusPrepQueries
        .dsirWeights(Tables.load(spark, dir, "documents"), isTarget)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val streamed = CorpusPrepQueries
        .dsirWeightsFromStoredModel(Tables.load(spark, dir, "documents"), mdl)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed == oneShot)
    }
  }
}

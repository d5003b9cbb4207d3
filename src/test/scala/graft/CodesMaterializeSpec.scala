package graft

import org.apache.spark.sql.functions._

import graft.analytics.SimilarityQueries
import graft.core.Tables
import graft.operators.CodebookTrainer

/** The stored-index ANN serving path: phase 1 writes the (vec_id, cell,
  * codes) table ONCE, partitioned by IVF cell — SCALING.md's "codes
  * materialized as 1-byte arrays" shape; phase 2 serves queries reading
  * ONLY that table for candidate generation (exact re-rank then fetches
  * full vectors for the handful of survivors). Mirrors
  * SignatureMaterializeSpec for the lexical pipeline: (a) end-to-end
  * results identical to the in-query index, (b) the serve plan contains
  * no corpus-side encode/assign kernel work, (c) the scan prunes to the
  * probed cells.
  */
class CodesMaterializeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stored codes table: identical serve results, zero encode work, cell pruning") {
    withTempDir { dir =>
      val e = Tables.load(spark, sf, "embeddings")
      // q_ann_ivfpq's pinned codebook, in both the IVF and PQ roles
      val cb = CodebookTrainer.initCodebook(e, 16, normalize = false)

      SimilarityQueries.codesTable(e, cb, cb)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
      val codes = spark.read.parquet(s"$dir/codes")

      // (a) serving from the stored index reproduces the in-query
      // composition exactly (ivfPqPipeline is the reference form now
      // that q_ann_ivfpq itself serves from the stored index)
      val served = SimilarityQueries.ivfPqServeFromCodes(e, codes, cb, cb, 10)
        .collect().toSeq
      val inQuery = SimilarityQueries.ivfPqPipeline(e, cb, cb, 10)
        .collect().toSeq
      assert(served == inQuery,
        s"served=${served.take(3)} inQuery=${inQuery.take(3)}")

      // (b)+(c) the candidate stage reads ONLY the codes table: probes
      // arrive as data (materialized, as a query service would send
      // them), so the plan must contain no PqEncode / NearestCell(s)
      // kernel — the per-corpus-vector index work was paid at build
      // time — and must prune the scan to the probed cells
      val probes = SimilarityQueries.probeTable(
        e.filter(col("vec_id") < 10), cb, cb, 2)
      val probeRows = probes.collect()
      val probesLocal = spark.createDataFrame(
        spark.sparkContext.parallelize(probeRows.toSeq), probes.schema)
      val cells = probeRows.map(_.getInt(1)).distinct.toSeq
      val cand = SimilarityQueries.adcCandidatesFromCodes(
        codes, probesLocal, cells)

      val plan = cand.queryExecution.executedPlan.toString
      assert(!plan.contains("pq_encode"), plan.take(2000))
      assert(!plan.contains("nearest_cell"), plan.take(2000))
      assert(plan.contains("adc_score"), plan.take(2000)) // ADC itself serves
      val scanLine = plan.linesIterator
        .find(_.contains("PartitionFilters")).getOrElse("")
      assert(scanLine.contains("cell"), s"no cell pruning: $scanLine")
      assert(scanLine.contains("INSET") || scanLine.contains("IN ") ||
        scanLine.contains("in("),
        s"probed-cell IN filter missing: $scanLine")
      // column pruning: candidates never read raw embeddings (the 16x
      // scan-IO cut the stored index exists for)
      val read = plan.linesIterator
        .find(_.contains("ReadSchema")).getOrElse("")
      assert(!read.contains("embedding"), read)

      // the candidate output itself is sane: 10 queries x topC
      val n = cand.count()
      assert(n > 0 && n <= 10 * 8, s"candidates=$n")
    }
  }

  test("cell pruning skips unprobed partitions on disk") {
    withTempDir { dir =>
      val e = Tables.load(spark, sf, "embeddings")
      val cb = CodebookTrainer.initCodebook(e, 16, normalize = false)
      SimilarityQueries.codesTable(e, cb, cb)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
      val allCells = new java.io.File(s"$dir/codes").listFiles()
        .map(_.getName).filter(_.startsWith("cell=")).map(_.drop(5).toInt)
      assert(allCells.length > 2, s"corpus collapsed to ${allCells.toSeq}")
      val probed = allCells.sorted.take(2)
      val pruned = spark.read.parquet(s"$dir/codes")
        .filter(col("cell").isin(probed.map(Int.box): _*))
      // the static filter prunes at the file-listing level: only the
      // probed cells' rows are ever read
      val got = pruned.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(got == probed.toSeq)
      val plan = pruned.queryExecution.executedPlan.toString
      val scanLine = plan.linesIterator
        .find(_.contains("PartitionFilters")).getOrElse("")
      assert(scanLine.contains("cell"), scanLine)
    }
  }

  test("derived-state memo keys fold in the corpus content fingerprint: " +
      "mutating a corpus dir invalidates, not serves stale") {
    withTempDir { dir =>
      // a private corpus copy this test is free to mutate
      val e = Tables.load(spark, sf, "embeddings")
      e.write.parquet(s"$dir/embeddings.parquet")
      val k1 = Tables.derivedStateKey(spark, dir.toString, "embeddings")
      assert(k1 == Tables.derivedStateKey(spark, dir.toString, "embeddings"),
        "fingerprint must be stable across calls on an unchanged corpus")

      // in-session mutation: a batch lands in the corpus dir
      e.limit(7).write.mode("append").parquet(s"$dir/embeddings.parquet")
      val k2 = Tables.derivedStateKey(spark, dir.toString, "embeddings")
      assert(k1 != k2,
        "corpus mutated but the memo key did not change — downstream " +
          "memos (codebooks, stored codes, signatures) would serve stale")
    }
  }
}

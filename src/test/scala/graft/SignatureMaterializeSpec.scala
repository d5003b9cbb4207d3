package graft

import org.apache.spark.sql.functions._

import graft.analytics.DedupQueries
import graft.core.Tables

/** The two-phase 100 TB dedup pipeline: phase 1 (tokenize → shingle →
  * SHA → MinHash signature — the expensive full-corpus pass) writes the
  * signature table to parquet ONCE; phase 2 (band self-join) and every
  * later consumer read it back. Proves (a) the reload path yields
  * byte-identical candidate pairs, and (b) its plan contains NO
  * SHA/signature recomputation — the scan reads stored columns only.
  */
class SignatureMaterializeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("materialized signature table: identical candidates, zero recompute on reload") {
    withTempDir { dir =>
      val docs = Tables.load(spark, sf, "documents")
      DedupQueries.signatureTable(docs)
        .write.mode("overwrite").parquet(s"$dir/signatures")

      val reloaded = spark.read.parquet(s"$dir/signatures")
      val fromDisk = DedupQueries.candidatePairsFromSignatures(reloaded, Seq("sg"))

      // (a) same candidates as the one-shot in-memory pipeline
      val inMem = SparkEntry.queries("q_dedup_minhash")(spark, sf)
        .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val disk = fromDisk.select(col("doc_id_a"), col("doc_id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(disk == inMem, s"disk=${disk.size} mem=${inMem.size}")

      // (b) the phase-2 plan never re-runs phase 1: no SHA, no minhash
      // kernel, no tokenizer regex — just the parquet scan of
      // (doc_id, sg) plus the band join
      val p = fromDisk.queryExecution.executedPlan.toString
      assert(!p.contains("sha2"), p.take(2000))
      assert(!p.contains("minhash"), p.take(2000))
      assert(!p.contains("regexp"), p.take(2000))
      assert(p.contains("Parquet"), p.take(2000))

      // (c) column pruning: candidates carrying only `sg` must not read
      // the (large) shingle-set column from storage
      val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!read.contains("shs"), read)

      // (d) a signature table STORED without the shingle column — the
      // realistic compact layout — still feeds the candidate join
      val sgOnly = DedupQueries.candidatePairsFromSignatures(
        reloaded.select("doc_id", "sg"), Seq.empty)
      assert(sgOnly.count() == disk.size, "shs-free signature table must work")
    }
  }

  test("incremental ingest: corpus-self + cross-batch + batch-self == full recompute") {
    val docs = Tables.load(spark, sf, "documents")
    val sig = DedupQueries.signatureTable(docs).cache()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("doc_id_a"), col("doc_id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // the stored corpus vs a newly arriving batch (disjoint id sets)
      val corpus = sig.filter(col("doc_id") % 5 =!= 3)
      val batch = sig.filter(col("doc_id") % 5 === 3)
      val full = pairs(DedupQueries.candidatePairsFromSignatures(sig, Seq.empty))
      val incremental =
        pairs(DedupQueries.candidatePairsFromSignatures(corpus, Seq.empty)) ++
          pairs(DedupQueries.crossBatchCandidatePairs(batch, corpus)) ++
          pairs(DedupQueries.candidatePairsFromSignatures(batch, Seq.empty))
      assert(incremental == full,
        s"incremental=${incremental.size} full=${full.size} " +
          s"missing=${(full -- incremental).take(5)} extra=${(incremental -- full).take(5)}")
      assert(pairs(DedupQueries.crossBatchCandidatePairs(batch, corpus)).nonEmpty,
        "cross-batch candidates should exist (planted dups straddle the split)")
    } finally sig.unpersist()
  }
}

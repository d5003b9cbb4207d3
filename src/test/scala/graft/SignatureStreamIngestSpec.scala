package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.analytics.DedupQueries
import graft.core.Tables
import graft.streaming.StreamingPipeline

/** Streaming lexical-dedup index ingest end-to-end — the signature
  * table mirror of CodesStreamIngestSpec: document batches arrive as
  * parquet files, each micro-batch is signatured and appended into the
  * bucketed incremental signature table, and post-batch candidate
  * serving sees the union of everything landed — with exactly-once
  * table state under foreachBatch replay and compaction that cannot
  * race a replay into duplicates (both protocols shared with the codes
  * table via IncrementalParquet).
  */
class SignatureStreamIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("doc_id_a"), col("doc_id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("two micro-batches append signatures; candidates see the union") {
    withTempDir { root =>
      val incoming = Files.createDirectory(root.resolve("incoming"))
      val sig = root.resolve("sig").toString
      val ckpt = root.resolve("ckpt").toString

      // the index starts from a base build over a third of the corpus —
      // THROUGH the append machinery, so the newborn table gets its
      // layout pin (a raw unpinned write + later appends is exactly the
      // adopt-or-fail case LayoutPinSpec (c) pins)
      // base batchId far above the stream's (which starts at 0): the
      // ack marker is id-scoped, and a collision would make the
      // stream's first micro-batch a silent replay no-op
      DedupQueries.appendToSignaturesIdempotent(
        docs.filter(col("doc_id") % 3 === 0), sig, 1000000L)

      land(docs.filter(col("doc_id") % 3 === 1), incoming, "batch1.parquet")
      val q1 = StreamingPipeline.startSignaturesIngest(
        spark, incoming.toString, sig, ckpt, Trigger.AvailableNow())
      q1.awaitTermination(120000)

      land(docs.filter(col("doc_id") % 3 === 2), incoming, "batch2.parquet")
      val q2 = StreamingPipeline.startSignaturesIngest(
        spark, incoming.toString, sig, ckpt, Trigger.AvailableNow())
      q2.awaitTermination(120000)

      // stored-table rows == a one-shot raw signature pass
      val stored = spark.read.parquet(sig)
        .select(col("doc_id"), col("sg")).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
      val oneShot = DedupQueries.rawSignatures(docs)
        .select(col("doc_id"), col("sg")).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
      assert(stored == oneShot)

      // candidate serving from the stored table == one-shot candidates
      val served = pairSet(DedupQueries.candidatePairsFromStored(spark, sig))
      val expect = pairSet(DedupQueries.candidatePairsFromSignatures(
        DedupQueries.rawSignatures(docs).repartition(col("doc_id")), Seq.empty))
      assert(served == expect && served.nonEmpty)
    }
  }

  test("incrementally-built sign-bucket table == one-shot build") {
    // pins the REAL builder the catalog serves from (memo key, parity
    // split, append batch, compact — all inside incrementalSignBucketsPath),
    // not a hand-rolled re-enactment of its steps
    val e = Tables.load(spark, sf, "embeddings")
    val sb = DedupQueries.incrementalSignBucketsPath(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("band"), col("bucket"), col("nrm"))
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(spark.read.parquet(sb)) ==
      rows(DedupQueries.signBucketTable(e)))
    // the builder memoizes: a second call serves the same path
    assert(DedupQueries.incrementalSignBucketsPath(spark, sf) == sb)
  }

  test("replayed signature batch converges (exactly-once), compaction safe") {
    withTempDir { root =>
      val sig = root.resolve("sig").toString
      // base through the append path: newborn → pinned (see above)
      DedupQueries.appendToSignaturesIdempotent(
        docs.filter(col("doc_id") % 2 === 0), sig, 0L)
      val batch = docs.filter(col("doc_id") % 2 === 1)
      DedupQueries.appendToSignaturesIdempotent(batch, sig, 7L)
      val n = docs.count()
      assert(spark.read.parquet(sig).count() == n)

      // acked replay: no-op via the marker fast path
      DedupQueries.appendToSignaturesIdempotent(batch, sig, 7L)
      assert(spark.read.parquet(sig).count() == n)

      // unacked replay (crash between install and ack), fewer shards
      Files.delete(Paths.get(sig, "_ingested", "b7"))
      DedupQueries.appendToSignaturesIdempotent(batch.coalesce(1), sig, 7L)
      assert(spark.read.parquet(sig).count() == n)

      // unacked batch blocks compaction of its buckets; after re-ack
      // (the replay above acked), compaction rewrites fragmented
      // buckets to one file and changes no rows or candidates
      val before = pairSet(DedupQueries.candidatePairsFromStored(spark, sig))
      assert(DedupQueries.compactSignatures(spark, sig) > 0)
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(sig)).iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("bkt="))
        .foreach { p =>
          val files = Files.list(p).iterator().asScala
            .map(_.getFileName.toString)
            .filter(f => !f.startsWith("_") && !f.startsWith(".")).toSeq
          assert(files.size == 1, s"${p.getFileName}: $files")
        }
      assert(spark.read.parquet(sig).count() == n)
      assert(pairSet(DedupQueries.candidatePairsFromStored(spark, sig)) == before)

      // replay of an acked batch AFTER compaction absorbed its files
      // (the codes-table race, same shared protocol): marker blocks it
      DedupQueries.appendToSignaturesIdempotent(batch, sig, 7L)
      assert(spark.read.parquet(sig).count() == n)
    }
  }
}

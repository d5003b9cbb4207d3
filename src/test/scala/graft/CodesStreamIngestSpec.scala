package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.analytics.SimilarityQueries
import graft.core.Tables
import graft.operators.CodebookTrainer
import graft.streaming.StreamingPipeline

/** Streaming ANN index ingest end-to-end (the embedding analog of
  * StreamingSpec's fetch→combine→load chain): embedding batches arrive
  * as parquet files, each micro-batch is encoded and appended into the
  * stored codes table, and a post-batch serve sees the union of
  * everything landed — with exactly-once table state under foreachBatch
  * replay, which delivers at-least-once.
  */
class CodesStreamIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("two micro-batches append to the codes table; serve sees the union") {
    withTempDir { root =>
      val e = Tables.load(spark, sf, "embeddings")
      val cb = CodebookTrainer.initCodebook(e, 16, normalize = false)
      val incoming = Files.createDirectory(root.resolve("incoming"))
      val codes = root.resolve("codes").toString
      val ckpt = root.resolve("ckpt").toString

      // the index starts from a batch build over a third of the corpus
      SimilarityQueries.codesTable(e.filter(col("vec_id") % 3 === 0), cb, cb)
        .write.mode("overwrite").partitionBy("cell").parquet(codes)
      SimilarityQueries.adoptBooks(spark, codes, cb, cb)

      // two embedding batches arrive as files; one streaming run drains
      // them (maxFilesPerTrigger=4 → they may share or split batches —
      // either way the table must converge to the full corpus)
      land(e.filter(col("vec_id") % 3 === 1), incoming, "batch1.parquet")
      val q1 = StreamingPipeline.startCodesIngest(
        spark, incoming.toString, codes, ckpt, cb, cb, Trigger.AvailableNow())
      q1.awaitTermination(120000)

      land(e.filter(col("vec_id") % 3 === 2), incoming, "batch2.parquet")
      val q2 = StreamingPipeline.startCodesIngest(
        spark, incoming.toString, codes, ckpt, cb, cb, Trigger.AvailableNow())
      q2.awaitTermination(120000)

      // serve from the streamed-into table == serve from a one-shot
      // full build (row-identical, transitively q_ann_ivfpq's result)
      val served = SimilarityQueries.ivfPqServeFromCodes(
        e, spark.read.parquet(codes), cb, cb, 10).collect().toSeq
      assert(served == SparkEntry.queries("q_ann_ivfpq")(spark, sf)
        .collect().toSeq)
    }
  }

  test("residual codes stream ingest: streamed table serves == the " +
      "one-shot catalog build (q_ann_ivfpq_residual)") {
    withTempDir { root =>
      val e = Tables.load(spark, sf, "embeddings")
      val key = Tables.derivedStateKey(spark, sf, "embeddings")
      val cbIvf = CodebookTrainer.cachedSphericalIvf(e, key, 16, 64, 2)
      val means = SimilarityQueries.cachedCellMeans(e, key, cbIvf)
      val cbPqRes = CodebookTrainer.cachedPq(
        SimilarityQueries.residualFrame(e, cbIvf, means),
        s"$key/residual", 8, 8, 16, 2)
      val incoming = Files.createDirectory(root.resolve("incoming"))
      val codes = root.resolve("rescodes").toString
      val ckpt = root.resolve("ckpt").toString

      SimilarityQueries
        .residualCodesTable(e.filter(col("vec_id") % 3 === 0),
          cbIvf, means, cbPqRes)
        .write.mode("overwrite").partitionBy("cell").parquet(codes)
      SimilarityQueries.adoptBooks(spark, codes, cbIvf, means, cbPqRes)

      // two arriving batches drain through the residual wiring; the
      // crash/replay/compaction matrix is the raw family's (shared
      // IncrementalParquet machinery, pinned by the sibling tests) —
      // this pins the residual ENCODE-side wiring end to end
      land(e.filter(col("vec_id") % 3 === 1), incoming, "batch1.parquet")
      StreamingPipeline.startResidualCodesIngest(
        spark, incoming.toString, codes, ckpt, cbIvf, means, cbPqRes,
        Trigger.AvailableNow()).awaitTermination(120000)
      land(e.filter(col("vec_id") % 3 === 2), incoming, "batch2.parquet")
      StreamingPipeline.startResidualCodesIngest(
        spark, incoming.toString, codes, ckpt, cbIvf, means, cbPqRes,
        Trigger.AvailableNow()).awaitTermination(120000)

      val served = SimilarityQueries.ivfPqResidualServeFromCodes(
        e, spark.read.parquet(codes), cbIvf, means, cbPqRes, 10)
        .collect().toSeq
      assert(served == SparkEntry.queries("q_ann_ivfpq_residual")(spark, sf)
        .collect().toSeq)
    }
  }

  test("replayed micro-batch converges to the same table state (exactly-once)") {
    withTempDir { root =>
      val e = Tables.load(spark, sf, "embeddings")
      val cb = CodebookTrainer.initCodebook(e, 16, normalize = false)
      val codes = root.resolve("codes").toString
      SimilarityQueries.codesTable(e.filter(col("vec_id") % 2 === 0), cb, cb)
        .write.mode("overwrite").partitionBy("cell").parquet(codes)
      SimilarityQueries.adoptBooks(spark, codes, cb, cb)

      val batch = e.filter(col("vec_id") % 2 === 1)
      SimilarityQueries.appendToCodesIdempotent(batch, codes, 7L, cb, cb)

      def census(): Map[String, Seq[String]] = {
        import scala.jdk.CollectionConverters._
        Files.list(Paths.get(codes)).iterator().asScala
          .filter(p => Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("cell="))
          .map(p => p.getFileName.toString -> Files.list(p).iterator().asScala
            .map(_.getFileName.toString)
            .filter(n => !n.startsWith("_") && !n.startsWith("."))
            .toSeq.sorted)
          .toMap
      }
      val before = census()
      val servedBefore = SimilarityQueries.ivfPqServeFromCodes(
        e, spark.read.parquet(codes), cb, cb, 10).collect().toSeq

      // foreachBatch redelivers the SAME batchId after a crash between
      // sink write and checkpoint commit. Case 1 — ACKED batch (crash
      // after the marker): replays are no-ops via the marker fast path
      SimilarityQueries.appendToCodesIdempotent(batch, codes, 7L, cb, cb)
      assert(census() == before, "acked replay touched the table")

      // Case 2 — UNACKED batch (crash between install and ack): the
      // replay, even one sharding into FEWER files, prefix-clears and
      // reinstalls without duplicating
      Files.delete(Paths.get(codes, "_ingested", "b7"))
      SimilarityQueries.appendToCodesIdempotent(
        batch.coalesce(1), codes, 7L, cb, cb)

      val after = census()
      assert(after.keySet == before.keySet, "replay changed the cell set")
      val servedAfter = SimilarityQueries.ivfPqServeFromCodes(
        e, spark.read.parquet(codes), cb, cb, 10).collect().toSeq
      assert(servedAfter == servedBefore, "replay changed served rows")
      // rows are what matters; the file census may only SHRINK (fewer
      // shards on replay), never grow
      after.foreach { case (cell, files) =>
        assert(files.size <= before(cell).size, s"$cell grew: $files")
      }
      // and the batch's rows appear exactly once: total row count
      // equals the full corpus
      assert(spark.read.parquet(codes).count() == e.count())
    }
  }

  test("compaction between a crashed batch and its replay cannot duplicate") {
    withTempDir { root =>
      val e = Tables.load(spark, sf, "embeddings")
      val cb = CodebookTrainer.initCodebook(e, 16, normalize = false)
      def freshTable(name: String): String = {
        val codes = root.resolve(name).toString
        SimilarityQueries.codesTable(e.filter(col("vec_id") % 2 === 0), cb, cb)
          .write.mode("overwrite").partitionBy("cell").parquet(codes)
        SimilarityQueries.adoptBooks(spark, codes, cb, cb)
        codes
      }
      val batch = e.filter(col("vec_id") % 2 === 1)

      // (a) batch installed + ACKED, checkpoint commit crashed, then
      // maintenance compaction absorbs the batch's files (erasing the
      // b9-* names), then the stream restarts and replays batchId 9 —
      // the ack marker is what prevents a double append
      val t1 = freshTable("t1")
      SimilarityQueries.appendToCodesIdempotent(batch, t1, 9L, cb, cb)
      assert(SimilarityQueries.compactCodes(spark, t1) > 0)
      SimilarityQueries.appendToCodesIdempotent(batch, t1, 9L, cb, cb)
      assert(spark.read.parquet(t1).count() == e.count(),
        "replay after compaction duplicated the batch")

      // (b) batch installed but UNACKED (crash between install and
      // ack): its b9-* files are still live, and compaction must SKIP
      // their cells so the replay's name-overwrite discipline works
      val t2 = freshTable("t2")
      SimilarityQueries.appendToCodesIdempotent(batch, t2, 9L, cb, cb)
      Files.delete(Paths.get(t2, "_ingested", "b9")) // crash before ack
      assert(SimilarityQueries.compactCodes(spark, t2) == 0,
        "compaction absorbed files of an unacked (replayable) batch")
      SimilarityQueries.appendToCodesIdempotent(batch, t2, 9L, cb, cb)
      assert(spark.read.parquet(t2).count() == e.count(),
        "unacked replay duplicated the batch")
      // once re-acked, the next maintenance pass compacts normally
      assert(SimilarityQueries.compactCodes(spark, t2) > 0)
      assert(spark.read.parquet(t2).count() == e.count())
    }
  }

  test("in-loop MINOR compaction fires on the cell-partitioned codes table") {
    withTempDir { root =>
      val e = Tables.load(spark, sf, "embeddings")
      val cb = CodebookTrainer.initCodebook(e, 16, normalize = false)
      val incoming = Files.createDirectory(root.resolve("incoming"))
      val codes = root.resolve("codes").toString
      val ckpt = root.resolve("ckpt").toString

      // four quarters land as one file per stream restart (batchIds
      // 0..3); compactEvery = 2 fires the minor absorption INSIDE the
      // stream after batches 1 and 3 — the first cadence coverage for
      // the `cell` partition column (MinorCompactSpec drives `bkt`)
      for (w <- 0 until 4) {
        land(e.filter(col("vec_id") % 4 === w), incoming, f"b$w%02d.parquet")
        StreamingPipeline.startCodesIngest(
          spark, incoming.toString, codes, ckpt, cb, cb,
          Trigger.AvailableNow(), compactEvery = 2).awaitTermination(120000)
      }

      // the last firing (batch 3) absorbed every acked batch file:
      // each cell holds only its base ladder (≤ one c<g> per firing)
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(codes)).iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("cell="))
        .foreach { p =>
          val fs = Files.list(p).iterator().asScala
            .map(_.getFileName.toString)
            .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSeq
          assert(fs.forall(_.matches("^c\\d+-.*")),
            s"${p.getFileName}: unabsorbed batch files in $fs")
          assert(fs.size <= 2, s"${p.getFileName}: $fs")
        }

      // the streamed-and-minor-compacted table serves identically to
      // the catalog's one-shot build
      val served = SimilarityQueries.ivfPqServeFromCodes(
        e, spark.read.parquet(codes), cb, cb, 10).collect().toSeq
      assert(served == SparkEntry.queries("q_ann_ivfpq")(spark, sf)
        .collect().toSeq)

      // a replay of a batch whose files the minor firing absorbed is
      // still a no-op (ack markers outlive absorption)
      SimilarityQueries.appendToCodesIdempotent(
        e.filter(col("vec_id") % 4 === 1), codes, 1L, cb, cb)
      assert(SimilarityQueries.ivfPqServeFromCodes(
        e, spark.read.parquet(codes), cb, cb, 10).collect().toSeq == served,
        "post-absorption replay changed the codes table")
    }
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.analytics.SimilarityQueries
import graft.core.Tables
import graft.operators.CodebookTrainer

/** Staged codebook rebuild + atomic swap — the drift answer SCALING.md
  * promises (monitor, rebuild alongside, swap; never per-batch
  * retraining), now implemented: a serving codes table ingests under
  * its FROZEN books, a drifted generation triggers a full staged
  * rebuild under NEW (trained) books, and the swap installs it without
  * losing replay protection or ever leaving the table unserveable.
  */
class CodebookRebuildSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def census(dir: String): Map[String, Seq[String]] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("cell="))
      .map(p => p.getFileName.toString -> Files.list(p).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
        .toSeq.sorted)
      .toMap
  }

  test("ingest under old books -> staged rebuild under trained books -> " +
      "swap: serves green before/during/after, replay stays a no-op, " +
      "old-book appends fail loudly") {
    withTempDir { root =>
      val e = Tables.load(spark, sf, "embeddings")
      val key = Tables.derivedStateKey(spark, sf, "embeddings")
      val cbOld = CodebookTrainer.initCodebook(e, 16, normalize = false)
      val codes = root.resolve("codes").toString

      // generation 1: base build + one streamed-in batch under cbOld
      SimilarityQueries.appendToCodesIdempotent(
        e.filter(col("vec_id") % 2 === 0), codes, 0L, cbOld, cbOld)
      SimilarityQueries.appendToCodesIdempotent(
        e.filter(col("vec_id") % 2 =!= 0), codes, 1L, cbOld, cbOld)

      // BEFORE: the old generation serves (checksum baseline)
      def serve(cbI: Array[Double], cbP: Array[Double]) =
        SimilarityQueries.ivfPqServeFromCodes(
          e, SimilarityQueries.codesForServe(spark, codes, cbI, cbP),
          cbI, cbP, 10).collect().toSeq
      val servedOld = serve(cbOld, cbOld)
      assert(servedOld.nonEmpty)

      // DURING: the rebuild's long part writes a sibling staging dir —
      // the serving table's bytes are untouched while it runs, so a
      // mid-rebuild serve equals the BEFORE serve byte-for-byte. Pin
      // that by snapshotting the live census inside the build lambda.
      val cbNew = CodebookTrainer.cachedSphericalIvf(e, key, 16, 64, 2)
      val cbPqNew = CodebookTrainer.cachedPq(e, key, 8, 8, 16, 2)
      var censusDuring: Map[String, Seq[String]] = null
      var servedDuring: Seq[org.apache.spark.sql.Row] = null
      graft.sinks.IncrementalParquet.rebuildSwap(spark, codes, "cell") {
        stage => // = stagedRebuildCodes's build lambda + the two probes
          SimilarityQueries.codesTable(e, cbNew, cbPqNew)
            .write.mode("overwrite").partitionBy("cell").parquet(stage)
          SimilarityQueries.adoptBooks(spark, stage, cbNew, cbPqNew)
          censusDuring = census(codes)
          servedDuring = serve(cbOld, cbOld)
      }
      assert(censusDuring != null && servedDuring == servedOld,
        "mid-rebuild serve drifted from the pre-rebuild serve")

      // AFTER: the new generation serves under the NEW books and equals
      // a one-shot build + serve under those books (the identity that
      // makes the swap invisible to correctness)
      val servedNew = serve(cbNew, cbPqNew)
      val oneShot = SimilarityQueries.ivfPqServeFromCodes(
        e, SimilarityQueries.codesTable(e, cbNew, cbPqNew).localCheckpoint(),
        cbNew, cbPqNew, 10).collect().toSeq
      assert(servedNew == oneShot,
        "post-swap serve != one-shot build under the new books")

      // replay protection survived the swap: the carried ack markers
      // make a replay of a pre-swap batch a no-op on the new bytes
      val beforeReplay = census(codes)
      SimilarityQueries.appendToCodesIdempotent(
        e.filter(col("vec_id") % 2 =!= 0), codes, 1L, cbOld, cbOld)
      assert(census(codes) == beforeReplay,
        "pre-swap batch replay appended into the new generation")

      // a NEW batch under the OLD books is the silent-wrong mixed-
      // generation write — it must fail loudly at the pin
      val boom = intercept[IllegalStateException] {
        SimilarityQueries.appendToCodesIdempotent(
          e.limit(5), codes, 2L, cbOld, cbOld)
      }
      assert(boom.getMessage.contains("layout pin mismatch"), boom.getMessage)
      // and serving under the old books is refused the same way
      intercept[IllegalArgumentException] {
        SimilarityQueries.codesForServe(spark, codes, cbOld, cbOld)
      }
      // while a new-book append continues the lifecycle normally
      SimilarityQueries.appendToCodesIdempotent(
        e.limit(0), codes, 2L, cbNew, cbPqNew)
    }
  }

  test("swap crash recovery: every crash point leaves a complete " +
      "generation serveable") {
    withTempDir { root =>
      val e = Tables.load(spark, sf, "embeddings")
      val cbOld = CodebookTrainer.initCodebook(e, 16, normalize = false)
      val key = Tables.derivedStateKey(spark, sf, "embeddings")
      val cbNew = CodebookTrainer.cachedSphericalIvf(e, key, 16, 64, 2)
      val codes = root.resolve("codes").toString
      SimilarityQueries.appendToCodesIdempotent(e, codes, 0L, cbOld, cbOld)
      val servedOld = SimilarityQueries.ivfPqServeFromCodes(
        e, SimilarityQueries.codesForServe(spark, codes, cbOld, cbOld),
        cbOld, cbOld, 10).collect().toSeq

      val stage = root.resolve(".codes.rebuild")
      val parked = root.resolve(".codes.rebuild-retired")

      // crash 1: mid-build (stage exists, NOT ready-marked) — the
      // SERVE-SAFE recovery leaves the stage alone (a serve cannot
      // tell a crashed half-build from the in-flight build running
      // right now); the old generation keeps serving untouched, and
      // the next WRITER rebuild clears the scratch in its preamble
      Files.createDirectories(stage.resolve("cell=0"))
      graft.sinks.IncrementalParquet.recoverRebuildSwap(spark, codes)
      assert(Files.exists(stage),
        "serve-safe recovery deleted a possibly-in-flight stage")
      assert(SimilarityQueries.ivfPqServeFromCodes(
        e, SimilarityQueries.codesForServe(spark, codes, cbOld, cbOld),
        cbOld, cbOld, 10).collect().toSeq == servedOld)
      // the writer's own preamble (single-writer: no build in flight)
      // treats it as scratch — exercised via the real rebuild below,
      // whose first step deletes it
      assert(Files.list(stage).count() > 0)

      // crash 2: between the two renames (live ABSENT, parked = old,
      // stage ready-marked = complete new generation) — recovery rolls
      // FORWARD: the new generation installs, the parked old is retired
      SimilarityQueries.codesTable(e, cbNew, cbNew)
        .write.mode("overwrite").partitionBy("cell").parquet(stage.toString)
      graft.sinks.IncrementalParquet.adoptLayout(spark, stage.toString,
        Map("books" -> "newgen"))
      Files.createFile(stage.resolve("_swap_ready"))
      Files.move(Paths.get(codes), parked)
      graft.sinks.IncrementalParquet.recoverRebuildSwap(spark, codes)
      assert(Files.exists(Paths.get(codes)) && !Files.exists(parked) &&
        !Files.exists(stage), "roll-forward did not settle the swap")
      assert(!Files.exists(Paths.get(codes, "_swap_ready")))
      assert(graft.sinks.IncrementalParquet.readLayout(spark, codes)
        .get("books").contains("newgen"), "rolled-forward pin lost")
      val servedNew = SimilarityQueries.ivfPqServeFromCodes(
        e, spark.read.parquet(codes), cbNew, cbNew, 10).collect().toSeq
      assert(servedNew == SimilarityQueries.ivfPqServeFromCodes(
        e, SimilarityQueries.codesTable(e, cbNew, cbNew).localCheckpoint(),
        cbNew, cbNew, 10).collect().toSeq)

      // crash 3: after install, before the parked delete (live = new,
      // parked = old survivor) — recovery retires the parked copy
      Files.createDirectories(parked.resolve("cell=0"))
      graft.sinks.IncrementalParquet.recoverRebuildSwap(spark, codes)
      assert(!Files.exists(parked), "stale parked generation survived")
    }
  }

  test("residual family: staged rebuild under a fresh frozen triple " +
      "serves == one-shot build; stale-triple appends fail loudly") {
    withTempDir { root =>
      val e = Tables.load(spark, sf, "embeddings")
      val key = Tables.derivedStateKey(spark, sf, "embeddings")
      val cbOld = CodebookTrainer.initCodebook(e, 16, normalize = false)
      val meansOld = SimilarityQueries.cellMeans(e, cbOld)
      val cbResOld = CodebookTrainer.initCodebook(e, 16, normalize = false)
      val codes = root.resolve("rescodes").toString
      SimilarityQueries.appendToResidualCodesIdempotent(
        e, codes, 0L, cbOld, meansOld, cbResOld)

      // the drifted-generation rebuild: trained coarse books, their
      // cell means, residual sub-quantizers trained on the residuals
      val cbNew = CodebookTrainer.cachedSphericalIvf(e, key, 16, 64, 2)
      val meansNew = SimilarityQueries.cachedCellMeans(e, key, cbNew)
      val cbResNew = CodebookTrainer.cachedPq(
        SimilarityQueries.residualFrame(e, cbNew, meansNew),
        s"$key/residual", 8, 8, 16, 2)
      SimilarityQueries.stagedRebuildResidualCodes(
        e, codes, cbNew, meansNew, cbResNew)

      val served = SimilarityQueries.ivfPqResidualServeFromCodes(
        e, SimilarityQueries.codesForServe(
          spark, codes, cbNew, meansNew, cbResNew),
        cbNew, meansNew, cbResNew, 10).collect().toSeq
      assert(served == SimilarityQueries.ivfPqResidualPipeline(
        e, cbNew, meansNew, cbResNew, 10).collect().toSeq,
        "post-swap residual serve != in-query reference under new triple")

      // an append under the RETIRED triple is the mixed-frame write
      val boom = intercept[IllegalStateException] {
        SimilarityQueries.appendToResidualCodesIdempotent(
          e.limit(5), codes, 1L, cbOld, meansOld, cbResOld)
      }
      assert(boom.getMessage.contains("layout pin mismatch"), boom.getMessage)
    }
  }

  test("rebuildSwap refuses a table with unacked (replayable) batch files") {
    withTempDir { root =>
      val e = Tables.load(spark, sf, "embeddings")
      val cb = CodebookTrainer.initCodebook(e, 16, normalize = false)
      val codes = root.resolve("codes").toString
      SimilarityQueries.appendToCodesIdempotent(e, codes, 0L, cb, cb)
      Files.delete(Paths.get(codes, "_ingested", "b0")) // torn ingest
      val boom = intercept[IllegalArgumentException] {
        SimilarityQueries.stagedRebuildCodes(e, codes, cb, cb)
      }
      assert(boom.getMessage.contains("unacked"), boom.getMessage)
    }
  }
}

package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{DedupQueries, SimilarityQueries, TextQueries}
import graft.streaming.StreamingPipeline

/** ALL the maintenance loops running CONCURRENTLY against one shared
  * batch cadence — the composed-deployment probe (round-12; the
  * round-11 verdict's integration ask). Every family so far was
  * measured SOLO: each loop's per-trigger wall is its own job floor +
  * its own scan mass on an otherwise idle driver. A real continuous
  * curation pipeline runs them against the same arrivals in one
  * session, where they share the driver, the scheduler, the listing
  * path and the compaction cadence — fixed floors that ADD when the
  * loops serialize and overlap when they don't. This probe feeds B
  * batches; each trigger fans the arrivals to all SEVEN maintained
  * families as concurrent futures on disjoint state dirs:
  *
  *   docs  (near-copy corpus) → lexical clusters, span windows
  *   zdocs (Zipf corpus)      → LM counts, term statistics
  *   vecs  (near-copy 64-dim) → embed clusters, PQ codes, SemDeDup cells
  *
  * Each family keeps its isolated probe's exact configuration and
  * generator (so per-loop walls and end-state checksums are directly
  * comparable with the solo MaintenanceProbe series), including its
  * every-4-batches minor-compaction cadence inside the timed body.
  * Per trigger it prints each family's wall and the trigger's total
  * (total < Σ per-loop ⇔ the composition overlaps; total ≈ max ⇔
  * fully concurrent); at series end it prints each family's
  * output-identity checksum — the assertion that CONCURRENCY CHANGED
  * NOTHING: same values as the isolated runs, and (for the five
  * families with tractable one-shots) equal to a from-scratch
  * recompute over the identical corpus, computed in-probe.
  *
  * `args`: [batches] [batchSize] — default 16 × 20000 (the solo
  * series' config: 320k docs + 320k Zipf docs + 320k vectors).
  */
object CombinedLoopsProbe {

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 16
    val m = if (args.length > 1) args(1).toLong else 20000L
    val compactEvery = 4
    val semanticK = 128
    val spark = graft.core.GraftSession.local("combined-loops", 32)
    spark.range(1).count()
    val root = java.nio.file.Files.createTempDirectory("combined")
    def dir(n: String) = root.resolve(n).toString
    val (lexIdx, lexLabels) = (dir("lex-index"), dir("lex-labels"))
    val (sbIdx, embLabels, vectors) =
      (dir("sign-buckets"), dir("emb-labels"), dir("vectors"))
    val (win, spans) = (dir("win"), dir("spans"))
    val (bg, uni) = (dir("lm-bg"), dir("lm-uni"))
    val (dfDir, cntDir) = (dir("terms-df"), dir("terms-cnt"))
    val codesDir = dir("codes")
    val (cells, verdicts) = (dir("cells"), dir("verdicts"))

    // train-once FIXED codebooks (the stored-codes discipline), from
    // the first arrival — exactly how the solo probes and the catalog
    // queries hold them
    val vecs0 = MaintenanceProbe.batchVecs(spark, 0, m).localCheckpoint()
    val cbIvf = graft.operators.CodebookTrainer.trainSphericalIvf(vecs0, 16, 64, 2)
    val cbPq = graft.operators.CodebookTrainer.trainPq(vecs0, 8, 8, 16, 2)
    val cbSem = graft.operators.CodebookTrainer.trainSphericalIvf(
      vecs0, semanticK, 64, 2)

    val families = Seq("lex", "embed", "span", "lm", "terms", "codes",
      "semantic")
    val totals = scala.collection.mutable.Map(
      families.map(_ -> 0.0): _*)
    for (b <- 0 until batches) {
      // arrivals generated untimed, shared cadence
      val docs = MaintenanceProbe.batchDocs(spark, b, m).localCheckpoint()
      val zdocs = MaintenanceProbe.batchZipfDocs(spark, b, m).localCheckpoint()
      val vecs = if (b == 0) vecs0
        else MaintenanceProbe.batchVecs(spark, b, m).localCheckpoint()
      val compactNow = b % compactEvery == compactEvery - 1
      val bodies: Seq[(String, () => Unit)] = Seq(
        "lex" -> (() => {
          StreamingPipeline.maintainClusters(spark, lexIdx, lexLabels,
            docs, b.toLong)
          if (compactNow) DedupQueries.compactSignaturesMinor(spark, lexIdx)
        }),
        "embed" -> (() => {
          StreamingPipeline.maintainEmbedClusters(spark, sbIdx, embLabels,
            vectors, vecs, b.toLong, threshold = 0.8, bands = 4, bits = 16)
          if (compactNow) {
            DedupQueries.compactSignaturesMinor(spark, sbIdx)
            DedupQueries.compactSignaturesMinor(spark, vectors)
          }
        }),
        "span" -> (() => {
          DedupQueries.appendToWindowsIdempotent(docs, win, b.toLong)
          DedupQueries.batchSpanPairs(spark, win, docs)
            .write.mode("append").parquet(spans)
          if (compactNow) DedupQueries.compactSignaturesMinor(spark, win)
        }),
        "lm" -> (() => {
          TextQueries.appendToLmModelIdempotent(zdocs, bg, uni, b.toLong)
          if (compactNow) TextQueries.compactLmModelMinor(spark, bg, uni)
        }),
        "terms" -> (() => {
          TextQueries.appendToTermStatsIdempotent(zdocs, dfDir, cntDir,
            b.toLong)
          if (compactNow) TextQueries.compactTermStatsMinor(spark, dfDir,
            cntDir)
        }),
        "codes" -> (() => {
          SimilarityQueries.appendToCodesIdempotent(vecs, codesDir,
            b.toLong, cbIvf, cbPq)
          if (compactNow) SimilarityQueries.compactCodesMinor(spark, codesDir)
        }),
        "semantic" -> (() => {
          SimilarityQueries.appendToCellsIdempotent(vecs, cells, b.toLong,
            cbSem)
          graft.sinks.IncrementalParquet.appendIdempotent(
            spark, verdicts, "cell", b.toLong)(
            SimilarityQueries.batchSemanticVerdicts(spark, cells, vecs,
              cbSem, 0.8))
          if (compactNow) SimilarityQueries.compactCellsMinor(spark, cells)
        }))
      val t0 = System.nanoTime()
      val walls = bodies.map { case (name, body) =>
        Future { (name, timed(body())._2) }
      }
      // collect ALL outcomes before failing (no orphaned writers
      // outlive a failed trigger — same rule as maintainEmbedClusters)
      val done = walls.map(f => Await.ready(f, Duration.Inf).value.get)
      val total = (System.nanoTime() - t0) / 1e9
      done.collectFirst { case scala.util.Failure(e) => throw e }
      val perLoop = done.collect { case scala.util.Success((n, w)) => n -> w }
      perLoop.foreach { case (n, w) => totals(n) += w }
      println(f"COMBINED batch=$b corpus=${(b + 1) * m} total_s=$total%.1f " +
        f"sum_s=${perLoop.map(_._2).sum}%.1f " +
        perLoop.map { case (n, w) => f"$n=$w%.1f" }.mkString(" "))
      // drop the trigger's checkpointed batch blocks NOW: 32 batches ×
      // 3 streams of retained localCheckpoint blocks OOMed the 640k
      // run's epilogue when left to the async ContextCleaner
      Seq(docs, zdocs, vecs).filter(_ ne vecs0).foreach(_.unpersist())
    }
    println("COMBINED-TOTALS " + families.map(f =>
      f"$f=${totals(f)}%.1f").mkString(" "))

    // ---- output identity: concurrency must have changed NOTHING ----
    // lex / embed label sums compare against the SOLO series' values
    // (SCALING.md); the other five verify in-probe against a one-shot
    // recompute over the identical corpus.
    println("COMBINED-SUMS " +
      s"lex=${MaintenanceProbe.labelsChecksum(spark, lexLabels)} " +
      s"embed=${MaintenanceProbe.labelsChecksum(spark, embLabels)} " +
      s"span=${MaintenanceProbe.spanChecksum(spark.read.parquet(spans))} " +
      s"lm=${MaintenanceProbe.modelChecksum(
        TextQueries.lmModelFromStored(spark, bg, uni))} " +
      s"semantic=${MaintenanceProbe.verdictChecksum(
        spark.read.parquet(verdicts))}")
    // one-shot inputs re-generated PARQUET-BACKED, not as a union of B
    // driver-local relations: at 32×20000 the in-memory unions (3 ×
    // 640k rows of local data cloned into every plan that references
    // them) OOMed the LM retrain epilogue
    def oneShot(name: String, gen: Long => DataFrame): DataFrame = {
      val dir = root.resolve(s"oneshot-$name").toString
      (0 until batches).foreach(b =>
        gen(b.toLong).write.mode("append").parquet(dir))
      spark.read.parquet(dir)
    }
    val allDocs = oneShot("docs", MaintenanceProbe.batchDocs(spark, _, m))
    val allZ = oneShot("zdocs", MaintenanceProbe.batchZipfDocs(spark, _, m))
    val allVecs = oneShot("vecs", MaintenanceProbe.batchVecs(spark, _, m))
    val spanInc = MaintenanceProbe.spanChecksum(spark.read.parquet(spans))
    val spanOne = MaintenanceProbe.spanChecksum(DedupQueries.spanPipeline(
      DedupQueries.explodedSpanWindows(allDocs), None))
    println(s"SPAN-IDENTITY incremental_sum=$spanInc oneshot_sum=$spanOne " +
      s"match=${spanInc == spanOne}")
    val lmInc = MaintenanceProbe.modelChecksum(
      TextQueries.lmModelFromStored(spark, bg, uni))
    val lmOne = MaintenanceProbe.modelChecksum(TextQueries.trainLmModel(allZ))
    println(s"LM-IDENTITY incremental_sum=$lmInc oneshot_sum=$lmOne " +
      s"match=${lmInc == lmOne}")
    val (dfT, nD) = TextQueries.termStatsFromStored(spark, dfDir, cntDir)
    val dfInc = MaintenanceProbe.dfChecksum(dfT)
    val dfOne = MaintenanceProbe.dfChecksum(
      TextQueries.dfDeltas(allZ, 1).select(col("term"), col("df")))
    val nInc = nD.collect().head.getLong(0)
    println(s"TERMS-IDENTITY incremental_sum=$dfInc oneshot_sum=$dfOne " +
      s"match=${dfInc == dfOne} n_docs=$nInc n_match=${nInc == batches * m}")
    val semInc = MaintenanceProbe.verdictChecksum(
      spark.read.parquet(verdicts))
    val semOne = MaintenanceProbe.verdictChecksum(
      SimilarityQueries.semanticPipeline(allVecs, cbSem, 0.8))
    println(s"SEMANTIC-IDENTITY incremental_sum=$semInc " +
      s"oneshot_sum=$semOne match=${semInc == semOne}")
    val codeSum = (df: DataFrame) =>
      df.select(pmod(xxhash64(col("vec_id"), col("cell"),
          to_json(struct(col("cl")))), lit(1L << 31)).as("h"))
        .agg(coalesce(sum(col("h")), lit(0L))).collect().head.getLong(0)
    val codesInc = codeSum(spark.read.parquet(codesDir))
    val codesOne = codeSum(SimilarityQueries.codesTable(allVecs, cbIvf, cbPq))
    println(s"CODES-IDENTITY incremental_sum=$codesInc " +
      s"oneshot_sum=$codesOne match=${codesInc == codesOne}")
    spark.stop()
  }
}

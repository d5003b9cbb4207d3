package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamingPipeline

/** The FOURTEEN streaming maintenance wirings running concurrently in
  * one session — the literal-deployment sibling of
  * [[CombinedLoopsProbe]] (which fans direct maintenance calls). Here
  * each family is its actual `StreamingQuery`: fourteen `start*` wirings
  * with their own checkpoints and AvailableNow triggers, reading three
  * shared incoming dirs of landed parquet files (docs → signatures
  * ingest, span ingest, full lexical dedup maintenance, DSIR model
  * ingest, inverted-postings ingest, diversity-state ingest; Zipf docs
  * → LM ingest, term-stats ingest; vectors → codes ingest, residual
  * codes ingest, SemDeDup ingest, full embed dedup maintenance —
  * round 13 added the residual and DSIR members, round 14 the BM25
  * postings index and the diversity state, round 15 the positional
  * bigram phrase index, round 17 the takedown maintainer — the
  * deletion lifecycle running CONCURRENTLY with the ingest of the
  * very tables it tombstones).
  * This exercises the machinery the future-based probe cannot: concurrent file-source listing and
  * checkpointing, foreachBatch scheduling across streams, and the
  * per-table single-writer protocols under real stream concurrency.
  *
  * The probe runs the same landed files through fresh state dirs TWICE
  * — all streams SERIAL (start, await, next), then all
  * CONCURRENT (start all, await all) — and prints both walls plus an
  * order-insensitive checksum of every family's stored output in each
  * mode. The assertion is printed as `match=`: stream concurrency must
  * change NOTHING in any stored table.
  *
  * `args`: [batches] [batchSize] — default 8 × 10000.
  */
object CombinedStreamsProbe {

  private def sumHash(df: DataFrame): Long =
    df.select(pmod(xxhash64(to_json(struct(df.columns.map(col): _*))),
        lit(1L << 31)).as("h"))
      .agg(coalesce(sum(col("h")), lit(0L))).head.getLong(0)

  /** Land `df` as ONE parquet file (the arrival protocol of the ingest
    * suites — a producer dropping one complete file per batch).
    */
  private def land(df: DataFrame, dir: java.nio.file.Path, name: String): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("land")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = java.nio.file.Files.list(tmp)
    val part =
      try listing.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally listing.close()
    java.nio.file.Files.move(part, dir.resolve(name))
  }

  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 8
    val m = if (args.length > 1) args(1).toLong else 10000L
    val spark = graft.core.GraftSession.local("combined-streams", 32)
    spark.range(1).count()
    val root = java.nio.file.Files.createTempDirectory("cstreams")
    val (docsIn, zIn, vecsIn) = (root.resolve("in-docs"),
      root.resolve("in-z"), root.resolve("in-vecs"))
    Seq(docsIn, zIn, vecsIn).foreach(p => java.nio.file.Files.createDirectory(p))
    for (b <- 0 until batches) {
      // the landed doc files carry a source column for the diversity
      // maintainer; every other doc stream's fixed read schema
      // projects it away
      land(MaintenanceProbe.batchDocs(spark, b, m)
        .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(4)))),
        docsIn, f"b$b%02d.parquet")
      land(MaintenanceProbe.batchZipfDocs(spark, b, m), zIn, f"b$b%02d.parquet")
      land(MaintenanceProbe.batchVecs(spark, b, m), vecsIn, f"b$b%02d.parquet")
    }
    val vecs0 = MaintenanceProbe.batchVecs(spark, 0, m).localCheckpoint()
    val cbIvf = graft.operators.CodebookTrainer.trainSphericalIvf(vecs0, 16, 64, 2)
    val cbPq = graft.operators.CodebookTrainer.trainPq(vecs0, 8, 8, 16, 2)
    val cbSem = graft.operators.CodebookTrainer.trainSphericalIvf(vecs0, 128, 64, 2)
    val means = graft.analytics.SimilarityQueries.cellMeans(vecs0, cbIvf)
    val cbPqRes = graft.operators.CodebookTrainer.trainPq(
      graft.analytics.SimilarityQueries.residualFrame(vecs0, cbIvf, means),
      8, 8, 16, 2)

    /** The fourteen wirings against a fresh state root; returns
      * (family name, start thunk, checksum thunk) triples.
      */
    def wirings(mode: String): Seq[(String, () => StreamingQuery, () => Long)] = {
      val s = root.resolve(mode)
      java.nio.file.Files.createDirectory(s)
      def d(n: String) = s.resolve(n).toString
      Seq(
        ("signatures",
          () => StreamingPipeline.startSignaturesIngest(
            spark, docsIn.toString, d("sig"), d("ck-sig")),
          () => sumHash(spark.read.parquet(d("sig")))),
        ("spans",
          () => StreamingPipeline.startSpanIngest(
            spark, docsIn.toString, d("win"), d("ck-win")),
          () => sumHash(spark.read.parquet(d("win")))),
        ("lex-maint",
          () => StreamingPipeline.startDedupMaintenance(
            spark, docsIn.toString, d("msig"), d("mlabels"), d("ck-m")),
          () => MaintenanceProbe.labelsChecksum(spark, d("mlabels"))),
        ("lm",
          () => StreamingPipeline.startLmIngest(
            spark, zIn.toString, d("bg"), d("uni"), d("ck-lm")),
          () => MaintenanceProbe.modelChecksum(
            graft.analytics.TextQueries.lmModelFromStored(spark, d("bg"), d("uni")))),
        ("terms",
          () => StreamingPipeline.startTermStatsIngest(
            spark, zIn.toString, d("df"), d("cnt"), d("ck-t")),
          () => {
            val (dfT, nD) = graft.analytics.TextQueries
              .termStatsFromStored(spark, d("df"), d("cnt"))
            MaintenanceProbe.dfChecksum(dfT) + nD.head.getLong(0)
          }),
        ("codes",
          () => StreamingPipeline.startCodesIngest(
            spark, vecsIn.toString, d("codes"), d("ck-c"), cbIvf, cbPq),
          () => sumHash(spark.read.parquet(d("codes")))),
        ("semantic",
          () => StreamingPipeline.startSemanticIngest(
            spark, vecsIn.toString, d("cells"), d("verdicts"), d("ck-s"),
            cbSem, 0.8),
          () => MaintenanceProbe.verdictChecksum(
            spark.read.parquet(d("verdicts")))),
        ("rescodes",
          () => StreamingPipeline.startResidualCodesIngest(
            spark, vecsIn.toString, d("rescodes"), d("ck-rc"),
            cbIvf, means, cbPqRes),
          () => sumHash(spark.read.parquet(d("rescodes")))),
        ("postings",
          () => StreamingPipeline.startPostingsIngest(
            spark, docsIn.toString, d("pst"), d("pdl"), d("ck-p")),
          () => sumHash(spark.read.parquet(d("pst"))
              .select(col("doc_id"), col("term"), col("tf"))) +
            sumHash(spark.read.parquet(d("pdl"))
              .select(col("doc_id"), col("dl")))),
        ("phrase",
          () => StreamingPipeline.startPhraseIngest(
            spark, docsIn.toString, d("bpst"), d("ck-ph")),
          () => sumHash(spark.read.parquet(d("bpst"))
            .select(col("doc_id"), col("bigram"), col("pos")))),
        ("diversity",
          () => StreamingPipeline.startDiversityIngest(
            spark, docsIn.toString, d("duni"), d("dbi"), d("dcnt"),
            d("dskt"), d("ck-dv")),
          () => sumHash(spark.read.parquet(d("duni"))
              .select(col("source"), col("term")).distinct()) +
            sumHash(spark.read.parquet(d("dbi"))
              .select(col("source"), col("term")).distinct()) +
            sumHash(spark.read.parquet(d("dcnt")).groupBy(col("source"))
              .agg(sum(col("n_docs")).as("d"), sum(col("n_tokens")).as("t"),
                sum(col("n_bigrams")).as("b")))),
        ("dsir",
          () => StreamingPipeline.startDsirIngest(
            spark, docsIn.toString, d("dsm"), d("ck-d"),
            pmod(col("doc_id"), lit(10)) === 0),
          () => sumHash(spark.read.parquet(d("dsm")).groupBy(col("b"))
            .agg(sum(col("rcnt")).as("r"), sum(col("tcnt")).as("t")))),
        ("embed-maint",
          () => StreamingPipeline.startEmbedDedupMaintenance(
            spark, vecsIn.toString, d("buckets"), d("vecs"), d("elabels"),
            d("ck-e"), threshold = 0.8, bands = 4, bits = 16),
          () => MaintenanceProbe.labelsChecksum(spark, d("elabels"))),
        // the deletion lifecycle's maintainer: takedown requests
        // tombstone the SAME postings tables the postings stream is
        // appending into — tombstone appends touch only the
        // `_tombstones` siblings, so the two writers compose; the
        // checksum is the tombstone-FILTERED serve state, which must
        // be mode-invariant once both streams drain
        ("takedown",
          () => {
            val tin = s.resolve("in-takedown")
            java.nio.file.Files.createDirectory(tin)
            land(spark.range(100)
              .select((col("id") * 13L).as("doc_id")), tin, "t0.parquet")
            StreamingPipeline.startTakedownIngest(
              spark, tin.toString, d("pst"), d("pdl"), d("ck-tk"))
          },
          () => sumHash(graft.sinks.IncrementalParquet.applyTombstones(
              spark, d("pst"), "doc_id")(spark.read.parquet(d("pst")))
              .select(col("doc_id"), col("term"), col("tf"))) +
            sumHash(graft.sinks.IncrementalParquet.applyTombstones(
              spark, d("pdl"), "doc_id")(spark.read.parquet(d("pdl")))
              .select(col("doc_id"), col("dl")))))
    }

    // SERIAL: each stream drains the whole incoming dir alone
    val serial = wirings("serial")
    val tS = System.nanoTime()
    val serialWalls = serial.map { case (name, start, _) =>
      val t0 = System.nanoTime()
      start().awaitTermination()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val serialTotal = (System.nanoTime() - tS) / 1e9
    println(f"STREAMS mode=serial corpus=${batches * m} total_s=$serialTotal%.1f " +
      serialWalls.map { case (n, w) => f"$n=$w%.1f" }.mkString(" "))

    // CONCURRENT: all fourteen streams live at once
    val conc = wirings("conc")
    val tC = System.nanoTime()
    val queries = conc.map { case (name, start, _) => (name, start()) }
    val concWalls = queries.map { case (name, q) =>
      Future { q.awaitTermination(); name -> (System.nanoTime() - tC) / 1e9 }
    }.map(Await.result(_, Duration.Inf))
    val concTotal = (System.nanoTime() - tC) / 1e9
    println(f"STREAMS mode=concurrent corpus=${batches * m} total_s=$concTotal%.1f " +
      concWalls.map { case (n, w) => f"$n=$w%.1f" }.mkString(" "))

    // identity: stream concurrency changed NOTHING in any stored table
    serial.zip(conc).foreach { case ((name, _, sSum), (_, _, cSum)) =>
      val (a, b) = (sSum(), cSum())
      println(s"STREAMS-IDENTITY $name serial=$a concurrent=$b match=${a == b}")
    }

    // CHAOS: all fourteen live again, but one maintainer — the richest
    // wiring, the lexical dedup maintainer with its three coupled
    // stores and batch-scoped delta persistence — is KILLED mid-run
    // while the other thirteen keep draining, then restarted from its
    // checkpoint. The per-family recovery preambles + exactly-once
    // appends must converge every stored table to the serial
    // checksums anyway: a crash of one member of the composed
    // deployment is survivable without touching the other thirteen.
    val chaos = wirings("chaos")
    val victim = "lex-maint"
    val tK = System.nanoTime()
    val running = chaos.map { case (name, start, _) => (name, start()) }
    val vq = running.find(_._1 == victim).get._2
    val killer = Future {
      Thread.sleep(15000) // mid-drain (concurrent victim wall ~46 s)
      val at = Option(vq.lastProgress).map(_.batchId).getOrElse(-1L)
      vq.stop() // interrupts the in-flight foreachBatch mid-write
      at
    }
    running.foreach { case (name, q) =>
      try q.awaitTermination()
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          if (name != victim) throw e // victim may die loudly; others not
      }
    }
    val killedAt = Await.result(killer, Duration.Inf)
    // restart from the same checkpoint: the uncommitted trigger replays,
    // recovery preambles heal any torn upsert state first
    chaos.find(_._1 == victim).get._2().awaitTermination()
    val chaosTotal = (System.nanoTime() - tK) / 1e9
    // last_committed=-1 means the stop landed INSIDE the first
    // in-flight trigger (no batch had committed) — the strongest
    // window: an uncommitted foreachBatch interrupted mid-write
    println(f"STREAMS mode=chaos corpus=${batches * m} total_s=$chaosTotal%.1f " +
      s"victim=$victim last_committed_batch_at_kill=$killedAt restarted=true")
    serial.zip(chaos).foreach { case ((name, _, sSum), (_, _, cSum)) =>
      val (a, b) = (sSum(), cSum())
      println(s"STREAMS-CHAOS-IDENTITY $name serial=$a chaos=$b match=${a == b}")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingPipeline

/** Phase-level decomposition of ONE maintenance-loop trigger against
  * an EXISTING stored corpus (a `MaintenanceProbe` run's temp dir) —
  * the instrument behind SCALING.md's per-trigger cost attribution.
  * The round-9 epilogue argued "tiny-batch wall ≈ corpus-proportional
  * scan mass", but the round-10 input meter showed a 640k-vector
  * epilogue reads only ~33 MB — so the attribution needed phase walls,
  * not file censuses. Phases mirror
  * [[StreamingPipeline.maintainEmbedClusters]]'s internals: the two
  * idempotent appends, the candidate probe + cosine verify
  * ([[graft.analytics.DedupQueries.batchVerifiedEmbedPairs]]), the
  * incremental CC delta, and the persisted-delta + partitioned-upsert
  * epilogue. Usage:
  *
  *   runMain graft.TriggerProfile <maint-root-dir> [batchSize] [warmTriggers]
  *
  * where `<maint-root-dir>` holds `index/`, `vectors/`, `labels/` from
  * a prior `MaintenanceProbe embed` run. The trigger uses a fresh huge
  * batchId so append/delta idempotence never short-circuits it.
  */
object TriggerProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TriggerProfile <maint-root> [batchSize]")
    val src = args(0)
    val m = if (args.length > 1) args(1).toLong else 100L
    val spark = graft.core.GraftSession.local("trigger-profile", 32)
    spark.range(1).count()
    // work on a COPY: the profile appends into the tables, and the
    // source dir must stay reusable across profile runs
    val root = java.nio.file.Files.createTempDirectory("trigprof").toString
    for (t <- Seq("index", "vectors", "labels"))
      copyDir(java.nio.file.Paths.get(src, t),
        java.nio.file.Paths.get(root, t))
    val index = s"$root/index"
    val vectors = s"$root/vectors"
    val labels = s"$root/labels"
    // id block far above any probe corpus (b·m = 9000·20000 would be
    // 180M): colliding with stored vec_ids would alias fresh random
    // content onto existing ids and corrupt the probe's joins
    def freshBatch(b: Long) =
      MaintenanceProbe.batchVecs(spark, b, m).localCheckpoint()

    // WARM triggers first (full loop passes, own batches + ids): the
    // phase walls below must measure the loop's steady state, not
    // first-trigger JIT / codegen / classloading — one pass leaves
    // visible JIT residue in the measured trigger (round-11 calib)
    val warm = if (args.length > 2) args(2).toInt else 3
    for (i <- 0 until warm)
      StreamingPipeline.maintainEmbedClusters(spark, index, labels,
        vectors, freshBatch((8000000L + i * 100000L) / m), 2000000L + i,
        threshold = 0.8, bands = 4, bits = 16)

    val batchId = 2100000L // above every warm trigger's id
    val batch = freshBatch(9000000L / m)

    // per-job walls inside each phase: the floor being hunted is JOB
    // COUNT × fixed overhead, so the phase table needs to show which
    // jobs a phase issues and what each costs
    @volatile var curPhase = "warmup"
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobStart.put(j.jobId, (s"$curPhase [$site]", System.nanoTime()))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStart.remove(j.jobId)
          if (s != null && !s._1.startsWith("warmup"))
            println(f"  JOB id=${j.jobId} " +
              f"wall_s=${(System.nanoTime() - s._2) / 1e9}%.2f ${s._1}")
        }
      })

    def phase[A](name: String)(body: => A): A = {
      curPhase = name
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name wall_s=${(System.nanoTime() - t0) / 1e9}%.2f")
      curPhase = "warmup"
      r
    }

    val total0 = System.nanoTime()
    phase("append_both") {
      // concurrent like the loop itself (maintainEmbedClusters):
      // disjoint tables, overlapping fixed write costs
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val fSb = Future {
        graft.analytics.DedupQueries.appendToSignBucketsIdempotent(
          batch, index, batchId, bands = 4, bits = 16)
      }
      val fVec = Future {
        graft.analytics.DedupQueries.appendToVectorsIdempotent(
          batch, vectors, batchId)
      }
      Await.result(fSb, Duration.Inf)
      Await.result(fVec, Duration.Inf)
    }
    phase("recover_labels") {
      graft.sinks.Upsert.recoverParquetPartitioned(spark, labels)
    }
    val edges = phase("pairs_probe_verify") {
      graft.analytics.DedupQueries.batchVerifiedEmbedPairs(
        spark, index, batch, vectors, threshold = 0.8,
        broadcastBatch = true, bands = 4, bits = 16).localCheckpoint()
    }
    val delta = phase("cc_delta") {
      graft.operators.ConnectedComponents.incrementalDelta(
        StreamingPipeline.clusterLabels(spark, labels), edges,
        "id_a", "id_b", broadcastNew = true).localCheckpoint()
    }
    phase("delta_persist_upsert") {
      val (stored, n) = graft.sinks.IncrementalParquet
        .batchScopedResultCounted(spark, s"$root/.labels.delta", batchId)(delta)
      if (n > 0)
        graft.sinks.Upsert.upsertParquetPartitioned(spark, stored, labels,
          key = "id", updateColumns = Seq("component"), numBuckets = 16)
    }
    println(f"PHASE total wall_s=${(System.nanoTime() - total0) / 1e9}%.2f " +
      f"edges=${edges.count()} delta=${delta.count()}")
    spark.stop()
  }

  private def copyDir(
      src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(src)) return
    val s = java.nio.file.Files.walk(src)
    try s.iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    } finally s.close()
  }
}

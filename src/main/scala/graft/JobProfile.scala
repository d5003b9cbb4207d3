package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-query execution-shape profile: #jobs, #stages, #tasks, summed
  * task run time vs wall — separates "planning/scheduling-floor-bound"
  * (wall >> task time / cores) from "compute-bound" (wall ~ task
  * time / cores). With SPARK_GRAFT_PROFILE_JOBS=1 additionally prints
  * one line per job (wall, tasks, task seconds, callsite) for the
  * median-wall rep. The round-17 optimization triage tool.
  * Usage: runMain graft.JobProfile [reps] q [q ...]; SPARK_GRAFT_SF_DIR.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val (reps, names) = args.headOption.flatMap(_.toIntOption) match {
      case Some(r) => (r, args.drop(1).toSeq)
      case None => (3, args.toSeq)
    }
    val perJob = sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("graft-jobprofile")
    final case class J(var t0: Long = 0L, var t1: Long = 0L,
      var tasks: Int = 0, var taskMs: Long = 0L, var site: String = "")
    val jobsM = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var stages = 0
    @volatile var gcMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val rec = new J(t0 = j.time,
          site = Option(j.properties)
            .map(_.getProperty("callSite.short", "")).getOrElse(""))
        jobsM.put(j.jobId, rec)
        j.stageIds.foreach(s => stageJob.put(s, j.jobId))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val rec = jobsM.get(j.jobId); if (rec != null) rec.t1 = j.time
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val jid = stageJob.get(t.stageId)
        val rec = jobsM.get(jid)
        if (rec != null && t.taskMetrics != null) {
          rec.tasks += 1
          rec.taskMs += t.taskMetrics.executorRunTime
        }
        if (t.taskMetrics != null) gcMs += t.taskMetrics.jvmGCTime
      }
    })
    graft.core.Tables.load(spark, sfDir, "documents").count()
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      Bench.materialize(fn(spark, sfDir)) // warmup + one-time builds
      // Janino compile activity per rep (JVM-wide Dropwizard histogram
      // count — monotonic): a warm codegen cache adds ~0 compilations
      def compiles: Long = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
      val reps0 = (0 until reps).map { _ =>
        jobsM.clear(); stageJob.clear(); stages = 0; gcMs = 0L
        val c0 = compiles
        val t0 = System.nanoTime()
        Bench.materialize(fn(spark, sfDir))
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let the listener bus drain
        import scala.jdk.CollectionConverters._
        (wall, jobsM.asScala.toVector.sortBy(_._1), stages, gcMs, compiles - c0)
      }
      val (wall, jobs, st, gc, comp) = reps0.sortBy(_._1).apply(reps0.size / 2)
      val tasks = jobs.map(_._2.tasks).sum
      val taskSec = jobs.map(_._2.taskMs).sum / 1000.0
      println(f"PROFILE $name wall=$wall%.2f jobs=${jobs.size} stages=$st " +
        f"tasks=$tasks taskSec=$taskSec%.2f gcSec=${gc / 1000.0}%.2f " +
        f"compiles=$comp")
      if (perJob) jobs.foreach { case (id, j) =>
        println(f"  JOB $id%3d wall=${(j.t1 - j.t0) / 1000.0}%6.2f " +
          f"tasks=${j.tasks}%4d taskSec=${j.taskMs / 1000.0}%6.2f  ${j.site}")
      }
    }
    spark.stop()
  }
}

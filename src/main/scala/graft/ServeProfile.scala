package graft

import org.apache.spark.sql.functions._

/** Job-level decomposition of ONE warm stored-codes ANN serve — the
  * instrument behind the round-12 `q_ann_ivfpq_trained` drift
  * adjudication. The round-11 verdict reproduced an isolated ~0.7–0.8 s
  * wall against the sidecar's 0.49–0.55 and asked for the term to be
  * named; this probe shows WHICH jobs a warm serve issues and what each
  * costs (the round-11 trigger work established that tiny-input walls
  * are job-count × fixed-overhead floors, not data terms). Usage:
  *
  *   runMain graft.ServeProfile [q_name] [reps]
  *
  * Reads SPARK_GRAFT_SF_DIR like Bench (default sf0.1).
  */
object ServeProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_ann_ivfpq_trained")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("serve-profile")
    graft.core.Tables.load(spark, sfDir, "documents").count()
    val fn = SparkEntry.queries(name)
    // warmup: pays training + stored-index build + JIT
    Bench.materialize(fn(spark, sfDir))
    Bench.materialize(fn(spark, sfDir))

    @volatile var rep = -1
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Int, (Int, String, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          val stages = j.stageInfos.size
          val tasks = j.stageInfos.map(_.numTasks).sum
          jobStart.put(j.jobId,
            (rep, s"stages=$stages tasks=$tasks [$site]", System.nanoTime()))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStart.remove(j.jobId)
          if (s != null && s._1 >= 0)
            println(f"  JOB rep=${s._1} id=${j.jobId} " +
              f"wall_s=${(System.nanoTime() - s._3) / 1e9}%.3f ${s._2}")
        }
      })

    for (r <- 0 until reps) {
      rep = r
      val t0 = System.nanoTime()
      Bench.materialize(fn(spark, sfDir))
      rep = -1
      println(f"SERVE $name rep=$r wall_s=${(System.nanoTime() - t0) / 1e9}%.3f")
      Thread.sleep(200) // let stragglers' onJobEnd land in this rep
    }
    spark.stop()
  }
}

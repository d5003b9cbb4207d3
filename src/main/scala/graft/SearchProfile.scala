package graft

import org.apache.spark.sql.functions.col

/** Job-level decomposition of the EXTERNAL search entries' warm
  * 1-query walls (bm25SearchText / phraseSearchText / annSearchVectors
  * / mmrSearchVectors / hybridSearch) — the round-16 planning-floor
  * instrument. SCALING round 15 measured 5.07 s for a 1-query
  * hybridSearch at sf0.1, flat across corpus scale: a per-invocation
  * job-count × planning floor, not a data term (the round-12
  * ServeProfile lesson). This probe names the jobs so the floor can be
  * cut, and re-measures after.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.SearchProfile [reps]
  */
object SearchProfile {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("search-profile")
    val qtext = graft.core.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") === 7).select("text").head.getString(0)
    val qvec = graft.core.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") === 7).select("embedding")
      .head.getSeq[Float](0).toArray
    // same derivation as the q_phrase_text_n4 gate: leading
    // whitespace must not inject an empty token (a 3-gram would
    // measure a cheaper walk than the 4-gram this labels)
    val phrase = qtext.trim.split("\\s+").filter(_.nonEmpty)
      .take(4).mkString(" ")
    val entries: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "bm25SearchText" -> (() =>
        graft.analytics.RetrievalQueries.bm25SearchText(
          spark, sfDir, Seq(qtext))),
      "phraseSearchText" -> (() =>
        graft.analytics.RetrievalQueries.phraseSearchText(
          spark, sfDir, Seq(phrase))),
      "annSearchVectors" -> (() =>
        graft.analytics.SimilarityQueries.annSearchVectors(
          spark, sfDir, Seq(qvec))),
      "mmrSearchVectors" -> (() =>
        graft.analytics.RetrievalQueries.mmrSearchVectors(
          spark, sfDir, Seq(qvec))),
      "hybridSearch" -> (() =>
        graft.analytics.RetrievalQueries.hybridSearch(
          spark, sfDir, Seq((qtext, qvec)))),
      "searchDiversified" -> (() =>
        graft.analytics.RetrievalQueries.searchDiversified(
          spark, sfDir, Seq((qtext, qvec)))))

    // warm: one-time index builds + JIT, untimed
    entries.foreach { case (_, f) => Bench.materialize(f()); () }

    @volatile var label: String = null
    @volatile var verbose = false
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          if (label != null) {
            jobCount.incrementAndGet()
            val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
            val tasks = j.stageInfos.map(_.numTasks).sum
            jobStart.put(j.jobId, (s"tasks=$tasks [$site]", System.nanoTime()))
          }
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStart.remove(j.jobId)
          if (s != null && verbose)
            println(f"  JOB id=${j.jobId} " +
              f"wall_s=${(System.nanoTime() - s._2) / 1e9}%.3f ${s._1}")
        }
      })

    for ((name, f) <- entries) {
      val walls = (0 until reps).map { r =>
        label = name; verbose = r == 0
        jobCount.set(0)
        val t0 = System.nanoTime()
        Bench.materialize(f())
        val w = (System.nanoTime() - t0) / 1e9
        // listener events deliver asynchronously: let the bus drain
        // BEFORE clearing the label, or the rep's last jobs are
        // skipped by the guard and jobs= undercounts — the number
        // this instrument exists to report
        Thread.sleep(150)
        label = null; verbose = false
        (w, jobCount.get())
      }
      val med = walls.map(_._1).sorted.apply(walls.size / 2)
      println(f"SEARCH $name median_s=$med%.2f jobs=${walls.head._2} all=" +
        walls.map(w => f"${w._1}%.2f").mkString(","))
    }
    spark.stop()
  }
}

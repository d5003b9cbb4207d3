package graft

import java.util.concurrent.atomic.LongAdder

/** A/B of [[graft.analytics.SimilarityQueries]]' exact re-rank fetch
  * arms — the round-13 verdict's top item: the FUSED arm full-scans the
  * embeddings table as the probe side of a BroadcastHashJoin to fetch
  * ≤ topC×nQueries candidate vectors (an O(corpus) IO term in every
  * stored-index serve), the POINT arm collects the driver-sized
  * candidate set and fetches via an isin pushed to parquet row-group
  * stats. Times the warm stored-codes serve under each arm (conf-forced
  * via `graft.ann.rerankFetchBytes`) and reports median wall + bytes
  * actually read from the scan, so the crossover that sets the default
  * threshold is a measurement, not a guess (the DSIR plan-shape
  * discipline). Run:
  *
  *   SPARK_GRAFT_SF_DIR=<dir> runMain graft.ReRankProbe [nQueries] [reps]
  */
object ReRankProbe {
  def main(args: Array[String]): Unit = {
    import graft.core.Tables
    import graft.operators.CodebookTrainer
    import graft.analytics.SimilarityQueries
    val nq = args.headOption.map(_.toInt).getOrElse(10)
    val reps = if (args.length > 1) args(1).toInt else 5
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("rerank-probe")

    val bytesRead = new LongAdder
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            bytesRead.add(t.taskMetrics.inputMetrics.bytesRead)
      })

    val e = Tables.load(spark, dir, "embeddings")
    val key = Tables.derivedStateKey(spark, dir, "embeddings")
    val cbIvf = CodebookTrainer.cachedSphericalIvf(e, key, 16, 64, 2)
    val cbPq = CodebookTrainer.cachedPq(e, key, 8, 8, 16, 2)
    // the stored table, not a checkpoint: the point arm's win is the
    // row-group skip over the PERSISTED vec_id-clustered layout
    val codes = Tables.parquetCachedSchema(spark,
      SimilarityQueries.incrementalCodesPath(spark, dir, cbIvf, cbPq))

    def serve() = Bench.materialize(
      SimilarityQueries.ivfPqServeFromCodes(e, codes, cbIvf, cbPq, nq))

    for ((arm, conf) <- Seq(
        "fused" -> Long.MaxValue.toString, "point" -> "0")) {
      spark.conf.set(SimilarityQueries.ReRankFetchBytesKey, conf)
      serve(); serve() // warm: JIT + shuffle files + page cache
      val runs = (0 until reps).map { _ =>
        bytesRead.reset()
        val t0 = System.nanoTime()
        serve()
        ((System.nanoTime() - t0) / 1e9, bytesRead.sum())
      }
      val walls = runs.map(_._1).sorted
      val mb = runs.map(_._2).min / 1e6
      println(f"RERANK sf=$dir arm=$arm nq=$nq median=${walls(reps / 2)}%.3f" +
        f" all=${walls.map(w => f"$w%.2f").mkString(",")} read_mb=$mb%.1f")
    }
    spark.stop()
  }
}

package graft

/** BM25 stored-index query-batch amortization — the question answered
  * for the ANN serve in round 13 (ProbeCurve batch mode), asked of the
  * lexical serve: how does the per-query cost of
  * [[graft.analytics.RetrievalQueries.bm25ServedTopK]] fall as the
  * query batch grows? The posting-list semi-join, the doc-stats scalar
  * aggregation and the per-candidate scoring pass are paid once per
  * BATCH; only the per-query term selection and the final per-query
  * rank grow with the batch. Run:
  * `SPARK_GRAFT_SF_DIR=<dir> runMain graft.RetrievalProbe` — prints
  * one line per batch size (warm medians over `reps`).
  */
object RetrievalProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("retrieval-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length > 0) args(0).toInt else 3
    // pay the one-time index build + JVM warmup outside the timings
    Bench.materialize(
      graft.analytics.RetrievalQueries.bm25ServedTopK(spark, dir, 5))
    for (nq <- Seq(5, 50, 500)) {
      val walls = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        Bench.materialize(
          graft.analytics.RetrievalQueries.bm25ServedTopK(spark, dir, nq))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = walls(walls.size / 2)
      println(f"RETRIEVAL-BATCH nq=$nq%4d median_s=$med%.2f " +
        f"per_query_ms=${med / nq * 1000}%.1f all=" +
        walls.map(w => f"$w%.2f").mkString(","))
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** A/B of [[graft.analytics.RetrievalQueries]]' stored-index BM25
  * fetch arms over a synthetic LARGE-VOCABULARY corpus — the catalog
  * corpus's 31-word vocabulary can never stress the literal arm (its
  * cost grows with the DISTINCT query-term count, which a tiny
  * vocabulary caps), so the probe builds its own: `ndocs` documents of
  * 40 tokens drawn deterministically from a 100k-term vocabulary, then
  * times the serve at query-batch sizes whose term bounds straddle the
  * arms (15 / 1.5k / 45k terms), each arm conf-forced via
  * `graft.bm25.pushdownTermsMax`. The LITERAL arm collects the term
  * set and plans bkt/term In-filters (partition + row-group pruning —
  * the interactive plan); the JOIN arm broadcast-semi-joins the term
  * frame against one postings pass (the offline bulk-query plan). The
  * crossover sets [[graft.analytics.RetrievalQueries
  * .PushdownTermsMaxDefault]] — a measurement, not a guess (the
  * ReRankProbe discipline). Run:
  *
  *   runMain graft.Bm25ArmsProbe [ndocs] [reps] [nq...]
  */
object Bm25ArmsProbe {
  def main(args: Array[String]): Unit = {
    import graft.analytics.RetrievalQueries
    val ndocs = args.headOption.map(_.toInt).getOrElse(200000)
    val reps = if (args.length > 1) args(1).toInt else 5
    val batches =
      if (args.length > 2) args.drop(2).toSeq.map(_.toInt)
      else Seq(5, 500, 15000)
    val spark = graft.core.GraftSession.local("bm25-arms-probe")
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-arms").toString
    // 40 tokens per doc over a 100k-term vocabulary, deterministic in
    // (doc_id, position) — posting lists ~ ndocs·40/100k docs long
    spark.range(ndocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(40)), i =>
          concat(lit("t"),
            pmod(hash(col("id") * 41 + i), lit(100000))))).as("text"))
      .repartition(8)
      .write.parquet(s"$dir/documents.parquet")

    // one-time index build + JVM warm, outside the timings
    Bench.materialize(RetrievalQueries.bm25ServedTopK(spark, dir, 5))

    for (nq <- batches) {
      for ((arm, conf) <- Seq(
          "literal" -> Long.MaxValue.toString, "join" -> "0")) {
        spark.conf.set(RetrievalQueries.PushdownTermsMaxKey, conf)
        Bench.materialize(RetrievalQueries.bm25ServedTopK(spark, dir, nq))
        val walls = (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          Bench.materialize(RetrievalQueries.bm25ServedTopK(spark, dir, nq))
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"BM25-ARMS nq=$nq%5d terms<=${nq * 3}%5d arm=$arm%-7s " +
          f"median=${walls(reps / 2)}%.2f all=" +
          walls.map(w => f"$w%.2f").mkString(","))
      }
      spark.conf.unset(RetrievalQueries.PushdownTermsMaxKey)
    }
    spark.stop()
  }
}

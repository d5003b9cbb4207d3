package graft

import graft.analytics.RetrievalQueries

/** Forced-arm wall-clock comparison of the diversified family's two
  * greedy/fetch arms (driver collect+literal vs distributed
  * join+mapGroups) across offline query-batch sizes — the round-17
  * instrument that sets [[RetrievalQueries.MmrBulkQueriesMinKey]]'s
  * default from a measurement instead of a guess. The corpus pool is
  * forced to the stored-codes indexed tier (the bulk shape: nobody
  * runs exact full-corpus cosine at bulk batch sizes).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.MmrBulkProfile
  *   [sizes-csv] [reps]
  */
object MmrBulkProfile {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args(0).split(",").map(_.trim.toInt).toSeq
      else Seq(1000, 10000)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse(
      "SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1")
    val spark = graft.core.GraftSession.local("mmr-bulk-profile")
    val rnd = new scala.util.Random(17)
    def vecs(n: Int): Seq[Array[Float]] =
      Seq.fill(n)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    // bulk batches always pool from the stored codes
    spark.conf.set(RetrievalQueries.MmrExactMaxBytesKey, "0")
    // warm: index build + JIT, untimed
    Bench.materialize(
      RetrievalQueries.mmrSearchVectors(spark, sfDir, vecs(8)))
    for (n <- sizes) {
      val batch = vecs(n)
      for (arm <- Seq("driver", "bulk")) {
        spark.conf.set(RetrievalQueries.MmrBulkQueriesMinKey,
          if (arm == "driver") Long.MaxValue.toString else "0")
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime
          Bench.materialize(
            RetrievalQueries.mmrSearchVectors(spark, sfDir, batch))
          (System.nanoTime - t0) / 1e9
        }.sorted
        println(f"MMRBULK sf=$sfDir n=$n arm=$arm " +
          f"median=${times(reps / 2)}%.2f all=${times.map(t => f"$t%.2f")}")
      }
    }
    spark.stop()
  }
}

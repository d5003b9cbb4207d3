package graft

import org.apache.spark.sql.functions._

/** Wall A/B of the DSIR bucket hash — the gated sha-prefix form
  * (cross-engine derivable, ~2 sha256 per token) vs the cheap
  * xxhash64 library variant ([[graft.analytics.CorpusPrepQueries
  * .dsirWeightsFast]]). The sha term was attributed as ~80% of
  * q_select_dsir's sf10 wall in the round-13 plan audit; this probe
  * measures what the cheap hash buys and what the selections share.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> runMain graft.DsirHashProbe [reps] [buckets]
  */
object DsirHashProbe {
  def main(args: Array[String]): Unit = {
    import graft.analytics.CorpusPrepQueries
    import graft.core.Tables
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val buckets = if (args.length > 1) args(1).toInt else 1024
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("dsir-hash-probe")
    val docs = Tables.load(spark, dir, "documents")
    val isTarget = col("source").isin("src0", "src1")

    def topIds(w: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
      w.orderBy(col("w").desc, col("doc_id")).limit(k)
        .select("doc_id").collect().map(_.getLong(0)).toSeq

    var shared = -1.0
    for ((arm, weights) <- Seq(
        "sha" -> (() => CorpusPrepQueries.dsirWeights(docs, isTarget, buckets)),
        "xxh" -> (() => CorpusPrepQueries.dsirWeightsFast(docs, isTarget, buckets)))) {
      Bench.materialize(weights()) // warm
      val walls = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        Bench.materialize(weights())
        (System.nanoTime() - t0) / 1e9
      }.sorted
      if (arm == "xxh") {
        val a = topIds(CorpusPrepQueries.dsirWeights(docs, isTarget, buckets), 100).toSet
        val b = topIds(
          CorpusPrepQueries.dsirWeightsFast(docs, isTarget, buckets), 100).toSet
        shared = a.intersect(b).size / 100.0
      }
      println(f"DSIRHASH sf=$dir buckets=$buckets arm=$arm median=${walls(reps / 2)}%.2f " +
        f"all=${walls.map(w => f"$w%.2f").mkString(",")}" +
        (if (shared >= 0 && arm == "xxh") f" top100_overlap=$shared%.2f" else ""))
    }
    spark.stop()
  }
}

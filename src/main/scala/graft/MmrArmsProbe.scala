package graft

import org.apache.spark.sql.functions._

/** A/B of [[graft.analytics.RetrievalQueries.mmrSearchVectors]]' exact
  * vs indexed candidate-pool arms at corpus scales where the EXACT
  * arm's full-corpus cosine scan dominates — the measurement verdict
  * r16 asked for: the 64 MB default was extrapolated from a box where
  * the indexed arm's job floor dominates, and on a real cluster the
  * scan term grows with IO while the indexed serve stays candidate-
  * bounded, moving the true crossover DOWN. Each arm is conf-forced
  * via `graft.mmr.exactMaxBytes` (the same dial a deployment pins
  * after running this probe on its own corpus); query vectors are
  * stored embeddings re-issued as external vectors, the user-facing
  * shape. One-time index build + JVM warm run per arm sit outside the
  * timings. Run:
  *
  *   runMain graft.MmrArmsProbe <corpusDir> [reps] [nq...]
  */
object MmrArmsProbe {
  def main(args: Array[String]): Unit = {
    import graft.analytics.RetrievalQueries
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val batches =
      if (args.length > 2) args.drop(2).toSeq.map(_.toInt) else Seq(1, 10)
    val spark = graft.core.GraftSession.local("mmr-arms-probe")
    spark.sparkContext.setLogLevel("WARN")

    val bytes = graft.core.Tables.load(spark, dir, "embeddings")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"MMR-ARMS corpus=$dir bytes=$bytes")
    val vecs = graft.core.Tables.load(spark, dir, "embeddings")
      .orderBy(col("vec_id")).limit(batches.max)
      .collect().map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray)

    for (nq <- batches) {
      val q = vecs.take(nq).toSeq
      for ((arm, conf) <- Seq(
          "exact" -> Long.MaxValue.toString, "indexed" -> "0")) {
        spark.conf.set(RetrievalQueries.MmrExactMaxBytesKey, conf)
        Bench.materialize(RetrievalQueries.mmrSearchVectors(spark, dir, q))
        val walls = (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          Bench.materialize(RetrievalQueries.mmrSearchVectors(spark, dir, q))
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"MMR-ARMS nq=$nq%4d arm=$arm%-8s " +
          f"median=${walls(reps / 2)}%.2f all=" +
          walls.map(w => f"$w%.2f").mkString(","))
      }
      spark.conf.unset(RetrievalQueries.MmrExactMaxBytesKey)
    }
    spark.stop()
  }
}

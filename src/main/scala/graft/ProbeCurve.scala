package graft

/** Filtered-ANN dial sweep — reproduces the recall-vs-(nprobe, topC)
  * curve behind [[graft.analytics.SimilarityQueries.filteredServeFromCodes]]'s
  * probe-widening guidance (and AnnRecallSpec's pinned floor): ground
  * truth is the exact pre-filtered search (q_ann_filtered), the serve
  * under test is the stored-codes path with the lang='en' semi-join.
  * Run: `runMain graft.ProbeCurve` (sf0.01). Round-13 measurement:
  * recall 0.37 at the unfiltered defaults (2, 8); widening nprobe
  * alone peaks at 0.60 (nprobe=8) then FALLS to 0.47 (16) as extra
  * cells' candidates crowd the fixed ADC budget; widening both gives
  * 0.73–0.77 at nprobe=8..12 × topC=24.
  */
object ProbeCurve {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("batch")) { batchMode(); return }
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    import graft.operators.CodebookTrainer
    import graft.analytics.SimilarityQueries
    val spark = graft.core.GraftSession.local("probe-curve")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = Tables.load(spark, dir, "embeddings")
    val key = Tables.derivedStateKey(spark, dir, "embeddings")
    val cbIvf = CodebookTrainer.cachedSphericalIvf(e, key, 16, 64, 2)
    val cbPq = CodebookTrainer.cachedPq(e, key, 8, 8, 16, 2)
    val codes = SimilarityQueries.codesTable(e, cbIvf, cbPq)
      .localCheckpoint() // pay the encode once; the sweep measures recall
    val allowed = Tables.load(spark, dir, "documents")
      .filter(col("lang") === "en").select(col("doc_id"))
    val exact = SparkEntry.queries("q_ann_filtered")(spark, dir)
      .select("q_id", "n_id").collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    for (np <- Seq(5, 8, 10, 12, 16); tc <- Seq(8, 16, 24)) {
      val served = SimilarityQueries.filteredServeFromCodes(
        e, codes, allowed, cbIvf, cbPq, 10, np, tc)
        .select("q_id", "n_id").collect()
      val approx = served.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val qs = exact.keySet
      val recall = qs.toSeq.map(q => approx.getOrElse(q, Set.empty[Long])
        .count(exact(q).contains)).sum.toDouble / (3.0 * qs.size)
      println(f"CURVE nprobe=$np topC=$tc recall=$recall%.3f")
    }
    spark.stop()
  }

  /** `runMain graft.ProbeCurve batch` — serve wall vs QUERY-BATCH size
    * on the stored-codes path (sf0.1): the collect-once design claims
    * the query side stays driver-sized, so the wall should grow far
    * sublinearly in nQueries until the broadcast side stops being
    * small. Round-13 measurement at 2k vectors: see SCALING.md.
    */
  private def batchMode(): Unit = {
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    import graft.operators.CodebookTrainer
    import graft.analytics.SimilarityQueries
    val spark = graft.core.GraftSession.local("probe-batch")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = Tables.load(spark, dir, "embeddings")
    val key = Tables.derivedStateKey(spark, dir, "embeddings")
    val cbIvf = CodebookTrainer.cachedSphericalIvf(e, key, 16, 64, 2)
    val cbPq = CodebookTrainer.cachedPq(e, key, 8, 8, 16, 2)
    val codes = SimilarityQueries.codesTable(e, cbIvf, cbPq)
      .localCheckpoint() // pay the encode once; measure the serve only
    for (nq <- Seq(10, 50, 100, 200, 400)) {
      Bench.materialize(SimilarityQueries
        .ivfPqServeFromCodes(e, codes, cbIvf, cbPq, nq)) // warm
      val walls = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        Bench.materialize(SimilarityQueries
          .ivfPqServeFromCodes(e, codes, cbIvf, cbPq, nq))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"BATCH nQueries=$nq median=${walls(1)}%.3f all=" +
        walls.map(w => f"$w%.2f").mkString(","))
    }
    spark.stop()
  }
}

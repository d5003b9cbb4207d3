package graft

/** Time a handful of NAMED catalog queries in isolation — the
  * diagnosis companion of [[Bench]] (which times the whole catalog and
  * so can't separate a query's own drift from catalog-growth
  * contention). Each query runs `reps` times after one untimed warmup;
  * min/median walls print per query. Usage:
  *
  *   runMain graft.QueryTimer [reps] q_name [q_name ...]
  *
  * Reads SPARK_GRAFT_SF_DIR (default sf0.1) like Bench.
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val (reps, names) = args.headOption.flatMap(_.toIntOption) match {
      case Some(r) => (r, args.drop(1).toSeq)
      case None => (3, args.toSeq)
    }
    require(names.nonEmpty, "usage: QueryTimer [reps] q_name [q_name ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("graft-qtimer")
    // documents, not region: the partial up-sampled corpora
    // (testdata-sf10) carry only the LLM-pipeline tables
    graft.core.Tables.load(spark, sfDir, "documents").count()
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      Bench.materialize(fn(spark, sfDir)) // warmup (also pays one-time index builds)
      val walls = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        Bench.materialize(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"TIMER $name reps=$reps min=${walls.head}%.2f " +
        f"median=${walls(walls.size / 2)}%.2f all=" +
        walls.map(w => f"$w%.2f").mkString(","))
    }
    spark.stop()
  }
}

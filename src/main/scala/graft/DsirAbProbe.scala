package graft

/** Same-JVM interleaved A/B of the DSIR weight-pass variants — the
  * measurement discipline for a host whose multi-core throughput
  * swings ~1.5x between runs (round-17 baseline observation): every
  * variant runs once per ROUND, rounds repeat, and the per-variant
  * median compares walls that shared the same contention windows.
  * Usage: runMain graft.DsirAbProbe [rounds]; reads SPARK_GRAFT_SF_DIR.
  */
object DsirAbProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("graft-dsir-ab")
    val variants = graft.analytics.CorpusPrepQueries.dsirAbVariants(spark, sfDir)
    variants.foreach { case (_, fn) => Bench.materialize(fn()) } // warmup
    val walls = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 0 until rounds; (name, fn) <- variants) {
      val t0 = System.nanoTime()
      Bench.materialize(fn())
      walls(name) = walls(name) :+ (System.nanoTime() - t0) / 1e9
    }
    for ((name, _) <- variants) {
      val w = walls(name).sorted
      println(f"ABPROBE $name rounds=$rounds min=${w.head}%.2f " +
        f"median=${w(w.size / 2)}%.2f all=" +
        w.map(x => f"$x%.2f").mkString(","))
    }
    spark.stop()
  }
}

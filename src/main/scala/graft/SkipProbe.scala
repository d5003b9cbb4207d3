package graft

import org.apache.spark.sql.functions._

/** Row-group skipping engagement vs corpus size — the SCALING.md
  * evidence for the round-10 probe-pruning mechanism. The maintenance
  * probes' pushed `In` filters (DedupQueries.keyPruned) skip at
  * parquet ROW-GROUP granularity, so the skip ratio for a fixed
  * key-set is ~ keys × rowsPerGroup / tableRows: invisible at the
  * 640k-vector probe scale (2.56M index rows, ~20-26k-row groups —
  * every group contains some key) and decisive at deployment scale
  * (rows-per-key ≫ group size ⇒ a probe reads ≈ its key count of
  * groups). This probe makes that curve MEASURED instead of argued:
  * it writes sign-bucket-shaped sorted tables at three sizes with the
  * index tables' exact write options, probes each with the same
  * 400-key pushed `In` (a 100-vector batch × 4 bands), and prints
  * rows actually materialized (task input metrics) + bytes + wall.
  *
  * Usage: runMain graft.SkipProbe [maxRows]  (default 160M)
  */
object SkipProbe {
  def main(args: Array[String]): Unit = {
    val maxRows = if (args.nonEmpty) args(0).toLong else 160000000L
    val spark = graft.core.GraftSession.local("skip-probe", 32)
    spark.range(1).count()
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)

    // fixed probe: the keys a 100-vector batch contributes at the
    // embed probe's 4×16-bit config (distinct splitmix buckets)
    val keys: Seq[Long] = (0 until 400)
      .map(i => math.floorMod(mix(i * 7919L + 13), 65536).toLong)
      .distinct

    for (n <- Seq(2560000L, 25600000L, maxRows).filter(_ <= maxRows)) {
      val dir = s"/tmp/skipprobe-$n"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir))) {
        // sign-bucket row shape: (vec_id, nrm, band, bucket), sorted by
        // (bucket, band) like the stored table, same write options as
        // IncrementalParquet.clusteredWriteOpts
        spark.range(n)
          .select(col("id").as("vec_id"),
            (col("id") % 1000 / 1000.0).as("nrm"),
            (col("id") % 4).cast("int").as("band"),
            pmod(xxhash64(col("id")), lit(65536L)).as("bucket"))
          .repartition(16)
          .sortWithinPartitions(col("bucket"), col("band"))
          .write.mode("overwrite")
          .option("parquet.block.size", (256 * 1024).toString)
          .option("parquet.page.row.count.limit", "4096")
          .parquet(dir)
      }
      val t = spark.read.parquet(dir)
      t.filter(col("bucket").isInCollection(keys)).count() // warm
      Thread.sleep(200)
      val (b0, r0) = (meter.bytes.get(), meter.records.get())
      val t0 = System.nanoTime()
      val hits = t.filter(col("bucket").isInCollection(keys)).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val rowsRead = meter.records.get() - r0
      val mb = (meter.bytes.get() - b0) / 1e6
      println(f"SKIP rows=$n keys=${keys.size} hits=$hits " +
        f"rows_read=$rowsRead frac=${rowsRead.toDouble / n}%.3f " +
        f"mb=$mb%.1f wall_s=$wall%.2f")
    }
    spark.stop()
  }

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private final class Meter
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val records = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.inputMetrics.bytesRead)
        records.addAndGet(m.inputMetrics.recordsRead)
      }
    }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingPipeline

/** Continuous-dedup maintenance probe — the SCALING.md evidence for the
  * loop's central claim: per-batch cost is O(batch), not O(corpus so
  * far). Feeds B equal word-soup batches through
  * [[StreamingPipeline.maintainClusters]] (append → pairs touching the
  * batch → incremental label fold) and prints the wall of EACH batch as
  * the stored corpus grows behind it. If any stage secretly
  * re-self-joined the corpus or re-ran the closure from scratch, the
  * per-batch wall would climb with batch index; the O(batch) design
  * predicts a near-flat series (the only corpus-growing pieces are the
  * batch-vs-stored band join's collider fan-out and the relabel join's
  * full-table scan, both sublinear at these scales).
  *
  * Docs are deterministic splitmix-derived token soups (40 tokens from
  * a 50k vocab). Every 7th doc is a near-copy of its same-offset doc in
  * batch 0 with 2 of 40 tokens replaced (post-shingling Jaccard ≈ 0.8,
  * well above the 0.5 verify bar) — so every batch after the first
  * produces real cross-batch edges and the fold must MERGE into
  * clusters discovered by earlier batches (the batch-0 base's cluster
  * grows by one doc per batch), not just label fresh nodes.
  */
object MaintenanceProbe {

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Batch `b` of `m` docs: doc_id = b*m+k. Token j of a base doc is
    * `w<mix(id-seed)>`; a near-copy doc reuses the BATCH-0 same-offset
    * doc's seeds except tokens 0 and 20. Copies must reference a BASE
    * doc (one whose displayed tokens are its own seeds): copying the
    * previous batch's doc by id-seed would reproduce tokens a chained
    * copy does not actually display, yielding zero true pairs.
    */
  def batchDocs(spark: SparkSession, b: Long, m: Long): DataFrame = {
    import spark.implicits._
    (0L until m).map { k =>
      val id = b * m + k
      val copyOf = if (b > 0 && k % 7 == 0) k else id // batch-0 base
      val text = (0 until 40).map { j =>
        val seed =
          if (copyOf != id && j != 0 && j != 20) mix(copyOf * 97 + j)
          else mix(id * 97 + j)
        s"w${math.floorMod(seed, 50000)}"
      }.mkString(" ")
      (id, text)
    }.toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 8
    val m = if (args.length > 1) args(1).toLong else 20000L
    val spark = graft.core.GraftSession.local("maint-probe", 32)
    spark.range(1).count()
    val root = java.nio.file.Files.createTempDirectory("maint")
    val sig = root.resolve("sig").toString
    val labels = root.resolve("labels").toString

    for (b <- 0 until batches) {
      val docs = batchDocs(spark, b, m).localCheckpoint() // gen not timed
      val t0 = System.nanoTime()
      StreamingPipeline.maintainClusters(spark, sig, labels, docs, b)
      val wall = (System.nanoTime() - t0) / 1e9
      val nLabels = StreamingPipeline.clusterLabels(spark, labels).count()
      println(f"MAINT batch=$b corpus_docs=${(b + 1) * m} " +
        f"wall_s=$wall%.1f labeled_nodes=$nLabels")
    }
    spark.stop()
  }
}

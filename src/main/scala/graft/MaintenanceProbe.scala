package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingPipeline

/** Continuous-dedup maintenance probe — the SCALING.md evidence for the
  * loop's central claim: per-batch cost is O(batch), not O(corpus so
  * far). Feeds B equal batches through the maintenance loop (append →
  * pairs touching the batch → incremental label fold) and prints the
  * wall of EACH batch as the stored corpus grows behind it, plus the
  * stored-table data-file count (the small-file axis the in-loop
  * compaction cadence bounds). If any stage secretly re-self-joined the
  * corpus or re-ran the closure from scratch, the per-batch wall would
  * climb with batch index; the O(batch) design predicts a near-flat
  * series (the only corpus-growing pieces are scans: the candidate
  * probe's (id, sg) columns, the bucket-pruned shingle fetch, and the
  * relabel join — all sublinear-in-wall at these scales).
  *
  * `args`: [lex|embed] [batches] [batchSize] — default `lex 16 20000`
  * (embed default 16 × 20000 vectors). Compaction fires every 4
  * batches, mirroring the stream wiring's cadence hook.
  *
  * LEXICAL docs are deterministic splitmix-derived token soups (40
  * tokens from a 50k vocab). Every 7th doc is a near-copy of its
  * same-offset doc in batch 0 with 2 of 40 tokens replaced
  * (post-shingling Jaccard ≈ 0.8, well above the 0.5 verify bar) — so
  * every batch after the first produces real cross-batch edges and the
  * fold must MERGE into clusters discovered by earlier batches (the
  * batch-0 base's cluster grows by one doc per batch), not just label
  * fresh nodes.
  *
  * EMBED vectors are splitmix-derived 64-dim floats; every 7th vector
  * of batches > 0 is its batch-0 same-offset vector with one
  * coordinate nudged (cosine ≈ 0.999, far above the 0.4 catalog
  * threshold), so the embedding fold merges cross-batch clusters the
  * same way.
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

  /** Batch `b` of `m` 64-dim vectors, embedding mirror of [[batchDocs]]:
    * near-copies perturb ONE coordinate of their batch-0 base by +0.05
    * (cosine stays ≈ 1), everything else is independent splitmix noise.
    *
    * Random 64-dim geometry forces the probe OFF the catalog defaults
    * (threshold 0.4, 4×8 bands): random cosines are ~N(0, 1/64), so
    * 0.4 is a 3.2σ cut — ~7e-4 of the ~10¹⁰ probe pairs land above it
    * and the labels graph percolates (the first probe attempt OOMed in
    * CC by batch 3 with 57k spurious labels; SCALING.md's sf1 section
    * documents the same percolation on the up-sampled embeddings
    * table). A REAL embedding corpus puts its near-dup threshold many
    * σ above the random-cosine floor, so the probe models that
    * regime the way a production deployment would tune it: threshold
    * 0.8 (≈6.4σ, P[false verify] ≈ 1e-14) and 4×16-bit bands
    * (candidate noise bands·n·|batch|/2^bits stays ≪ |batch| across
    * all 16 batches, where 8-bit bands would feed the verify ~100M
    * noise candidates per trigger by the last batch).
    */
  def batchVecs(spark: SparkSession, b: Long, m: Long): DataFrame = {
    import spark.implicits._
    (0L until m).map { k =>
      val id = b * m + k
      val copyOf = if (b > 0 && k % 7 == 0) k else id
      val v = Array.tabulate(64) { j =>
        // uniform in [-1, 1) from the base vector's seed
        (math.floorMod(mix(copyOf * 131 + j), 1000000) / 500000f) - 1f
      }
      if (copyOf != id) v(b.toInt % 64) += 0.05f
      (id, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def dataFiles(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count { p =>
          // EVERY path component must be non-hidden, or the census
          // counts ack/commit markers (_ingested/b<N>, _compact/c<g> —
          // leaf names without a '_' prefix) as data files: one
          // phantom "file" per batch forever, exactly the linear
          // growth the probe exists to rule out
          java.nio.file.Files.isRegularFile(p) &&
            root.relativize(p).iterator().asScala.forall { c =>
              val n = c.toString
              !n.startsWith("_") && !n.startsWith(".")
            }
        }.toLong
      } finally s.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.length > 0) args(0) else "lex"
    val batches = if (args.length > 1) args(1).toInt else 16
    val m = if (args.length > 2) args(2).toLong else 20000L
    val compactEvery = 4
    val spark = graft.core.GraftSession.local("maint-probe", 32)
    spark.range(1).count()
    val root = java.nio.file.Files.createTempDirectory("maint")
    val index = root.resolve("index").toString // signatures | sign buckets
    val labels = root.resolve("labels").toString
    val vectors = root.resolve("vectors") // embed loop's bucketed vector table
    if (mode == "embed") java.nio.file.Files.createDirectory(vectors)

    for (b <- 0 until batches) {
      val wall = mode match {
        case "embed" =>
          val vecs = batchVecs(spark, b, m).localCheckpoint() // gen untimed
          val t1 = System.nanoTime()
          // threshold + band width sized for random 64-dim geometry —
          // rationale at [[batchVecs]]; the loop owns the bucketed
          // vector table, so its append is part of the timed trigger
          StreamingPipeline.maintainEmbedClusters(spark, index, labels,
            vectors.toString, vecs, b.toLong, threshold = 0.8,
            bands = 4, bits = 16)
          if (b % compactEvery == compactEvery - 1) {
            graft.analytics.DedupQueries.compactSignaturesMinor(spark, index)
            graft.analytics.DedupQueries
              .compactSignaturesMinor(spark, vectors.toString)
          }
          (System.nanoTime() - t1) / 1e9
        case _ =>
          val docs = batchDocs(spark, b, m).localCheckpoint() // gen untimed
          val t1 = System.nanoTime()
          StreamingPipeline.maintainClusters(spark, index, labels, docs,
            b.toLong)
          if (b % compactEvery == compactEvery - 1)
            graft.analytics.DedupQueries.compactSignaturesMinor(spark, index)
          (System.nanoTime() - t1) / 1e9
      }
      val nLabels = StreamingPipeline.clusterLabels(spark, labels).count()
      println(f"MAINT mode=$mode batch=$b corpus=${(b + 1) * m} " +
        f"wall_s=$wall%.1f labeled_nodes=$nLabels " +
        f"index_files=${dataFiles(index)} labels_files=${dataFiles(labels)}")
    }
    spark.stop()
  }
}

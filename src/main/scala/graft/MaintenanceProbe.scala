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
  * `args`: [lex|embed|span|lm|terms|semantic|backfill] [batches]
  * [batchSize] [buckets(lex/embed) | k(semantic)] [bits] —
  * default `lex 16 20000` (embed default 16 × 20000 vectors, 4×16-bit
  * bands). Compaction fires every 4 batches, mirroring the stream
  * wiring's cadence hook.
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

  /** Batch `b` of `m` docs with ZIPF-drawn tokens (p(rank) ∝ 1/rank
    * over a 10k vocab via log-uniform inverse CDF) — the LM probe's
    * corpus. [[batchDocs]]' near-copy corpus draws ~uniform over 50k
    * seeds, so its bigrams are mostly unique and a count-merge would
    * be vacuous; natural text is Zipfian, which is exactly what makes
    * the maintained count table sublinear in the corpus (Heaps' law)
    * and the sum-merge collapse real.
    */
  def batchZipfDocs(spark: SparkSession, b: Long, m: Long): DataFrame = {
    import spark.implicits._
    val lnV = math.log(10000.0)
    (0L until m).map { k =>
      val id = b * m + k
      val text = (0 until 40).map { j =>
        val u = math.floorMod(mix(id * 97 + j), 1000000) / 1000000.0
        val rank = math.min(9999L, math.exp(u * lnV).toLong)
        s"z$rank"
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

  /** Data files under ONLY the given bucket partitions — the
    * partition-pruned read cost of a trigger whose batch hashes into
    * `buckets` (partition pruning reads exactly those dirs' files).
    * Compared against [[dataFiles]] this is the engagement evidence
    * for the bucket-count knob: at 16 buckets any ≳16-id batch touches
    * every bucket (read_files == index_files); at 256 a small batch's
    * reads shrink to ~|batch|/256 of the table.
    */
  private def bucketFiles(dir: String, buckets: Seq[Int]): Long =
    buckets.map(b => dataFiles(s"$dir/bkt=$b")).sum

  private def batchBuckets(df: DataFrame, idCol: String): Seq[Int] = {
    val n = graft.analytics.DedupQueries.signatureBuckets(df.sparkSession)
    df.select(pmod(hash(col(idCol)), lit(n)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
  }

  /** Order-insensitive checksum of the labels table — the cheap
    * output-identity witness for cross-run comparisons (16 vs 256
    * buckets, broadcast vs shuffled backfill plans).
    */
  private[graft] def labelsChecksum(spark: SparkSession, labelsDir: String): Long =
    StreamingPipeline.clusterLabels(spark, labelsDir)
      // mod-reduce per row: a raw sum of full-range xxhash64 values
      // overflows long (ANSI arithmetic aborts the job) within ~2 rows
      // worst-case; 31-bit residues keep the sum exact to ~4e9 rows
      .select(pmod(xxhash64(col("id"), col("component")),
        lit(1L << 31)).as("h"))
      .agg(coalesce(sum(col("h")), lit(0L))).collect().head.getLong(0)

  private[graft] def dataFiles(dir: String): Long = {
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

  /** Order-insensitive checksum of a SemDeDup verdict set — the
    * semantic loop's output-identity witness (same mod-reduce
    * rationale as [[labelsChecksum]]).
    */
  private[graft] def verdictChecksum(df: DataFrame): Long =
    df.select(pmod(xxhash64(col("vec_id"), col("cell").cast("int"),
        col("keep")), lit(1L << 31)).as("h"))
      .agg(coalesce(sum(col("h")), lit(0L))).collect().head.getLong(0)

  /** Continuous SemDeDup probe (round 12) — the cell-table member of
    * the incremental family, measured like its span/LM/terms siblings:
    * per batch, append the batch's (vector, norm, cell) rows
    * exactly-once into the cell-partitioned member table and derive
    * the batch's verdicts from stored state
    * ([[graft.analytics.SimilarityQueries.batchSemanticVerdicts]] —
    * the corpus is never re-self-joined). UNLIKE the LSH loops, this
    * family's per-trigger cost has a NAMED growth term at fixed k:
    * a new doc must dot-product every lower-id member of its cell, so
    * per-trigger pair mass = |batch| × corpus/k — linear in the corpus
    * until k is retrained upward (the paper's dial: k ∝ corpus, 50k
    * cells at 5B docs). The probe prints `pairs` (the analytic mass)
    * next to each wall so the series' slope is attributable to it,
    * and the k knob (args(3), ≤ the trainer's 128-id init pool) lets
    * a second series show wall ∝ 1/k at the same corpus. The verdict
    * fold is exact under the loop's id-monotone arrival; the identity
    * check replays the SAME full corpus through the one-shot
    * [[graft.analytics.SimilarityQueries.semanticPipeline]].
    */
  private def semanticProbe(
      spark: SparkSession, batches: Int, m: Long, k: Int): Unit = {
    val compactEvery = 4
    val thr = 0.8 // random 64-dim geometry — rationale at [[batchVecs]]
    val root = java.nio.file.Files.createTempDirectory("maintsem")
    val cells = root.resolve("cells").toString
    val verdicts = root.resolve("verdicts").toString
    val input = new InputMeter
    spark.sparkContext.addSparkListener(input)
    import graft.analytics.SimilarityQueries
    // train-once FIXED codebook (the stored-codes discipline): trained
    // on the first arrival, held for the run — retraining mid-stream
    // would reassign stored members' cells and invalidate the fold
    val b0 = batchVecs(spark, 0, m).localCheckpoint()
    val cb = graft.operators.CodebookTrainer.trainSphericalIvf(b0, k, 64, 2)
    for (b <- 0 until batches) {
      val vecs =
        if (b == 0) b0
        else batchVecs(spark, b, m).localCheckpoint() // gen untimed
      val (inB0, inR0) = (input.bytes.get(), input.records.get())
      val t1 = System.nanoTime()
      SimilarityQueries.appendToCellsIdempotent(vecs, cells, b.toLong, cb)
      graft.sinks.IncrementalParquet.appendIdempotent(
        spark, verdicts, "cell", b.toLong)(
        SimilarityQueries.batchSemanticVerdicts(spark, cells, vecs, cb, thr))
      if (b % compactEvery == compactEvery - 1)
        SimilarityQueries.compactCellsMinor(spark, cells)
      val w = (System.nanoTime() - t1) / 1e9
      Thread.sleep(100) // listener bus is async; let stage metrics land
      val (inMb, inRows) =
        ((input.bytes.get() - inB0) / 1e6, input.records.get() - inR0)
      println(f"MAINT mode=semantic batch=$b corpus=${(b + 1) * m} k=$k " +
        f"wall_s=$w%.1f pairs=${m * b * m / k} " + // |batch| × stored/cell × cells touched
        f"cells_files=${dataFiles(cells)} in_mb=$inMb%.1f in_rows=$inRows")
    }
    // tiny-batch epilogue BEFORE the identity check (the identity run
    // must cover it too); ids CEIL past batches*m — same collision
    // rationale as the span probe
    val tinyM = math.max(m / 200L, 1L)
    val tiny = batchVecs(spark, (batches * m + tinyM - 1) / tinyM, tinyM)
      .localCheckpoint()
    Thread.sleep(200)
    val (tinyB0, tinyR0) = (input.bytes.get(), input.records.get())
    val t1 = System.nanoTime()
    SimilarityQueries.appendToCellsIdempotent(tiny, cells, batches.toLong, cb)
    graft.sinks.IncrementalParquet.appendIdempotent(
      spark, verdicts, "cell", batches.toLong)(
      SimilarityQueries.batchSemanticVerdicts(spark, cells, tiny, cb, thr))
    val tinyWall = (System.nanoTime() - t1) / 1e9
    Thread.sleep(100)
    println(f"MAINT-TINY mode=semantic batch=$batches corpus=${batches * m} " +
      f"batch_size=$tinyM wall_s=$tinyWall%.1f " +
      f"in_mb=${(input.bytes.get() - tinyB0) / 1e6}%.1f " +
      f"in_rows=${input.records.get() - tinyR0}")
    // identity: accumulated incremental verdicts == one-shot SemDeDup
    // over the same full corpus (batches 0..B plus the tiny batch)
    val all = ((0 until batches).map(b => batchVecs(spark, b.toLong, m)) :+
      tiny).reduce(_ unionByName _)
    val inc = verdictChecksum(spark.read.parquet(verdicts))
    val one = verdictChecksum(SimilarityQueries.semanticPipeline(all, cb, thr))
    println(s"SEMANTIC-IDENTITY incremental_sum=$inc oneshot_sum=$one " +
      s"match=${inc == one}")
  }

  /** Order-insensitive checksum of a maximal-span set — the span
    * loop's output-identity witness (same mod-reduce rationale as
    * [[labelsChecksum]]).
    */
  private[graft] def spanChecksum(df: DataFrame): Long =
    df.select(pmod(xxhash64(col("doc_a"), col("doc_b"), col("start_a"),
        col("start_b"), col("span_len")), lit(1L << 31)).as("h"))
      .agg(coalesce(sum(col("h")), lit(0L))).collect().head.getLong(0)

  /** Continuous SPAN-dedup probe (round 11) — the window-table member
    * of the incremental-index trio, measured the way the lexical and
    * embed loops are: per batch, append the batch's window
    * fingerprints exactly-once into the fp-bucketed incremental table,
    * derive the spans TOUCHING the batch from the stored table
    * ([[graft.analytics.DedupQueries.batchSpanPairs]] — cost
    * |batch windows| × colliders, never corpus²), and append them to a
    * spans store. Every cross-doc pair is derived exactly once — when
    * the batch holding its LATER doc lands, the earlier doc is already
    * stored — so the accumulated store must equal a one-shot
    * [[graft.analytics.DedupQueries.spanPipeline]] over the full
    * corpus; the epilogue prints both checksums. Span mass per batch
    * GROWS by design (each near-copy pairs with every prior version of
    * its base — the same Σ|group|² term the cluster loops carry), so
    * the flatness claim is wall vs corpus at fixed batch mass, not
    * wall vs batch index. The tiny epilogue batch drops under
    * ProbeKeyCap distinct fingerprints, so it exercises the pushed-In
    * serving arm the streaming cadence runs at.
    */
  private def spanProbe(spark: SparkSession, batches: Int, m: Long): Unit = {
    val compactEvery = 4
    val root = java.nio.file.Files.createTempDirectory("maintspan")
    val win = root.resolve("win").toString
    val spansDir = root.resolve("spans").toString
    val input = new InputMeter
    spark.sparkContext.addSparkListener(input)
    import graft.analytics.DedupQueries
    for (b <- 0 until batches) {
      val docs = batchDocs(spark, b, m).localCheckpoint() // gen untimed
      val (inB0, inR0) = (input.bytes.get(), input.records.get())
      val t1 = System.nanoTime()
      DedupQueries.appendToWindowsIdempotent(docs, win, b.toLong)
      DedupQueries.batchSpanPairs(spark, win, docs)
        .write.mode("append").parquet(spansDir)
      if (b % compactEvery == compactEvery - 1)
        DedupQueries.compactSignaturesMinor(spark, win)
      val w = (System.nanoTime() - t1) / 1e9
      Thread.sleep(100) // listener bus is async; let stage metrics land
      val (inMb, inRows) =
        ((input.bytes.get() - inB0) / 1e6, input.records.get() - inR0)
      println(f"MAINT mode=span batch=$b corpus=${(b + 1) * m} " +
        f"wall_s=$w%.1f spans_rows=${spark.read.parquet(spansDir).count()} " +
        f"win_files=${dataFiles(win)} in_mb=$inMb%.1f in_rows=$inRows")
    }
    // tiny-batch epilogue BEFORE the identity check (the identity run
    // must cover it too): streaming-cadence scale, pushed-In arm.
    // Batch index CEIL-scaled so tiny ids start AT OR ABOVE batches*m —
    // batchDocs strides ids by ITS batch size, so passing (batches,
    // tinyM) would re-issue ids the full batches already own and the
    // one-shot side would see two texts under one doc_id; floor
    // division (the round-11 form) had the same collision whenever
    // tinyM does not divide m, e.g. m=1001 → tiny ids from batches*1000
    val tinyM = math.max(m / 200L, 1L)
    val tiny = batchDocs(spark, (batches * m + tinyM - 1) / tinyM, tinyM)
      .localCheckpoint()
    Thread.sleep(200)
    val (tinyB0, tinyR0) = (input.bytes.get(), input.records.get())
    val t1 = System.nanoTime()
    DedupQueries.appendToWindowsIdempotent(tiny, win, batches.toLong)
    DedupQueries.batchSpanPairs(spark, win, tiny)
      .write.mode("append").parquet(spansDir)
    val tinyWall = (System.nanoTime() - t1) / 1e9
    Thread.sleep(100)
    println(f"MAINT-TINY mode=span batch=$batches corpus=${batches * m} " +
      f"batch_size=$tinyM wall_s=$tinyWall%.1f " +
      f"in_mb=${(input.bytes.get() - tinyB0) / 1e6}%.1f " +
      f"in_rows=${input.records.get() - tinyR0}")
    // identity: accumulated incremental store == one-shot recompute
    // over the same full corpus (batches 0..B plus the tiny batch)
    val all = ((0 until batches).map(b => batchDocs(spark, b.toLong, m)) :+
      tiny).reduce(_ unionByName _)
    val inc = spanChecksum(spark.read.parquet(spansDir))
    val one = spanChecksum(DedupQueries.spanPipeline(
      DedupQueries.explodedSpanWindows(all), None))
    println(s"SPAN-IDENTITY incremental_sum=$inc oneshot_sum=$one " +
      s"match=${inc == one}")
  }

  /** Order-insensitive checksum of a model relation — the LM loop's
    * output-identity witness (same mod-reduce rationale as
    * [[labelsChecksum]]).
    */
  private[graft] def modelChecksum(df: DataFrame): Long =
    df.select(pmod(xxhash64(col("bigram"), col("w1"), col("c12"),
        col("c1"), col("v")), lit(1L << 31)).as("h"))
      .agg(coalesce(sum(col("h")), lit(0L))).collect().head.getLong(0)

  /** Continuous LM-model probe (round 11) — measures the
    * aggregate-on-compact claim instead of arguing it: per batch,
    * append the batch's bigram/unigram count deltas exactly-once and
    * sum-merge the tiers on the compaction cadence. `stored_rows`
    * must track the corpus's DISTINCT-bigram count (Zipf/Heaps-
    * bounded, sublinear) while `delta_rows` — the running sum of
    * per-batch delta sizes, i.e. what a merge-less tier pile would
    * hold — grows linearly, so `collapse` = delta_rows/stored_rows
    * rises with the series. The epilogue scores a tiny arriving batch
    * against the maintained model (the perplexityGate serve shape)
    * and checks the reconstructed model equals a one-shot retrain
    * over the identical corpus.
    */
  private def lmProbe(spark: SparkSession, batches: Int, m: Long): Unit = {
    val compactEvery = 4
    val root = java.nio.file.Files.createTempDirectory("maintlm")
    val bg = root.resolve("bg").toString
    val uni = root.resolve("uni").toString
    val input = new InputMeter
    spark.sparkContext.addSparkListener(input)
    import graft.analytics.TextQueries
    var deltaRows = 0L
    for (b <- 0 until batches) {
      val docs = batchZipfDocs(spark, b, m).localCheckpoint() // gen untimed
      val inB0 = input.bytes.get()
      val t1 = System.nanoTime()
      TextQueries.appendToLmModelIdempotent(docs, bg, uni, b.toLong)
      if (b % compactEvery == compactEvery - 1)
        TextQueries.compactLmModelMinor(spark, bg, uni)
      val w = (System.nanoTime() - t1) / 1e9
      deltaRows += TextQueries.bigramDeltas(docs, 1).count() // untimed census
      Thread.sleep(100) // listener bus is async; let stage metrics land
      val stored = spark.read.parquet(bg).count()
      println(f"MAINT mode=lm batch=$b corpus=${(b + 1) * m} " +
        f"wall_s=$w%.1f stored_rows=$stored delta_rows=$deltaRows " +
        f"collapse=${deltaRows.toDouble / stored}%.2f " +
        f"bg_files=${dataFiles(bg)} " +
        f"in_mb=${(input.bytes.get() - inB0) / 1e6}%.1f")
    }
    // serve epilogue: score a tiny arriving batch against the
    // maintained model (reconstruction + stream-static join), the
    // per-trigger cost a perplexity gate pays at this corpus size
    val tiny = batchZipfDocs(spark, batches.toLong, math.max(m / 200L, 1L))
      .localCheckpoint()
    val model = TextQueries.lmModelFromStored(spark, bg, uni)
      .localCheckpoint(eager = true) // reconstruction timed separately below
    val t2 = System.nanoTime()
    val n = TextQueries.scoreBitsPerBigram(tiny, model).count()
    val serveWall = (System.nanoTime() - t2) / 1e9
    println(f"MAINT-TINY mode=lm corpus=${batches * m} scored=$n " +
      f"serve_wall_s=$serveWall%.1f")
    // identity: reconstructed maintained model == one-shot retrain
    val all = (0 until batches).map(b => batchZipfDocs(spark, b.toLong, m))
      .reduce(_ unionByName _)
    val inc = modelChecksum(TextQueries.lmModelFromStored(spark, bg, uni))
    val one = modelChecksum(TextQueries.trainLmModel(all))
    println(s"LM-IDENTITY incremental_sum=$inc oneshot_sum=$one " +
      s"match=${inc == one}")
  }

  /** Order-insensitive checksum of a (term, df) relation — the
    * term-stats loop's output-identity witness.
    */
  private[graft] def dfChecksum(df: DataFrame): Long =
    df.select(pmod(xxhash64(col("term"), col("df")), lit(1L << 31)).as("h"))
      .agg(coalesce(sum(col("h")), lit(0L))).collect().head.getLong(0)

  /** Continuous term-statistics probe (round 11) — aggregate-on-
    * compact's second user measured the way the LM loop is. The
    * maintained state is the document-frequency table + doc count; the
    * sharper claim vs the LM probe: df state is VOCAB-bounded, not
    * merely Heaps-sublinear — each batch's delta is ≤|vocab| rows
    * whatever the batch size, so `collapse` (delta pile ÷ stored)
    * rises ~linearly in batch count and the stored table PLATEAUS at
    * the vocabulary. The serve epilogue runs the q_top_terms shape
    * for a tiny arriving batch — per-doc tf scan-stage on the batch
    * alone, df/n_docs broadcast from the maintained tables — i.e. the
    * cost of salient-term extraction for new docs never re-touches
    * the corpus.
    */
  private def termsProbe(spark: SparkSession, batches: Int, m: Long): Unit = {
    val compactEvery = 4
    val root = java.nio.file.Files.createTempDirectory("maintterms")
    val dfDir = root.resolve("df").toString
    val cntDir = root.resolve("cnt").toString
    val input = new InputMeter
    spark.sparkContext.addSparkListener(input)
    import graft.analytics.TextQueries
    var deltaRows = 0L
    for (b <- 0 until batches) {
      val docs = batchZipfDocs(spark, b, m).localCheckpoint() // gen untimed
      val inB0 = input.bytes.get()
      val t1 = System.nanoTime()
      TextQueries.appendToTermStatsIdempotent(docs, dfDir, cntDir, b.toLong)
      if (b % compactEvery == compactEvery - 1)
        TextQueries.compactTermStatsMinor(spark, dfDir, cntDir)
      val w = (System.nanoTime() - t1) / 1e9
      deltaRows += TextQueries.dfDeltas(docs, 1).count() // untimed census
      Thread.sleep(100) // listener bus is async; let stage metrics land
      val stored = spark.read.parquet(dfDir).count()
      println(f"MAINT mode=terms batch=$b corpus=${(b + 1) * m} " +
        f"wall_s=$w%.1f stored_rows=$stored delta_rows=$deltaRows " +
        f"collapse=${deltaRows.toDouble / stored}%.2f " +
        f"df_files=${dataFiles(dfDir)} " +
        f"in_mb=${(input.bytes.get() - inB0) / 1e6}%.1f")
    }
    // serve epilogue: salient terms for a tiny arriving batch against
    // the maintained corpus state (tf is scan-stage on the batch; df +
    // n_docs broadcast from the stored tables)
    val tiny = batchZipfDocs(spark, batches.toLong, math.max(m / 200L, 1L))
      .localCheckpoint()
    val (dfT, nD) = TextQueries.termStatsFromStored(spark, dfDir, cntDir)
    val (dfC, nC) = (dfT.localCheckpoint(eager = true),
      nD.localCheckpoint(eager = true)) // reconstruction untimed, as lmProbe
    val t2 = System.nanoTime()
    val tf = tiny
      .select(col("doc_id"), explode(
        graft.functions.TextFunctions.tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    val served = tf.join(broadcast(dfC.join(broadcast(nC))
        .filter(col("df") * 10 < col("n_docs") * 9).select("term", "df")), "term")
      .select(col("doc_id"), row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 3).count()
    val serveWall = (System.nanoTime() - t2) / 1e9
    println(f"MAINT-TINY mode=terms corpus=${batches * m} served=$served " +
      f"serve_wall_s=$serveWall%.1f")
    // identity: maintained state == one-shot recount over the corpus
    val all = (0 until batches).map(b => batchZipfDocs(spark, b.toLong, m))
      .reduce(_ unionByName _)
    val inc = dfChecksum(dfT)
    val one = dfChecksum(
      TextQueries.dfDeltas(all, 1).select(col("term"), col("df")))
    val nInc = nD.collect().head.getLong(0)
    println(s"TERMS-IDENTITY incremental_sum=$inc oneshot_sum=$one " +
      s"match=${inc == one} n_docs=$nInc n_expected=${batches * m} " +
      s"n_match=${nInc == batches * m}")
  }

  /** Backfill-path probe (round-9 verdict #3): build a stored corpus
    * through `warm` streaming-sized batches, then push ONE
    * corpus-sized batch through the loop under BOTH plan shapes —
    * `broadcastBatch = true` (the streaming default: id sets and
    * batch-bounded frames broadcast) and `false` (the backfill escape
    * hatch: shuffled joins, nothing corpus-scaled on the driver) —
    * into separately-cloned table dirs, and print wall + shuffle
    * bytes + the labels checksum for each. Output parity is already
    * spec-pinned (MinorCompactSpec); this measures that the shuffled
    * shape BEHAVES at a batch size where the broadcast hint is the
    * thing being escaped.
    */
  private def backfillProbe(spark: SparkSession, warm: Int, m: Long): Unit = {
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val root = java.nio.file.Files.createTempDirectory("backfill")
    val baseSig = root.resolve("sig-base").toString
    val baseLab = root.resolve("lab-base").toString
    for (b <- 0 until warm)
      StreamingPipeline.maintainClusters(spark, baseSig, baseLab,
        batchDocs(spark, b, m).localCheckpoint(), b.toLong)
    val big = batchDocs(spark, warm.toLong, warm * m) // corpus-sized
      .localCheckpoint()
    for (bc <- Seq(true, false)) {
      val sig = root.resolve(s"sig-$bc")
      val lab = root.resolve(s"lab-$bc")
      copyDir(java.nio.file.Paths.get(baseSig), sig)
      copyDir(java.nio.file.Paths.get(baseLab), lab)
      val shuffle0 = meter.bytes.get()
      val t0 = System.nanoTime()
      StreamingPipeline.maintainClusters(spark, sig.toString, lab.toString,
        big, warm.toLong, broadcastBatch = bc)
      val wall = (System.nanoTime() - t0) / 1e9
      val mb = (meter.bytes.get() - shuffle0) / 1e6
      println(f"BACKFILL broadcastBatch=$bc warm=$warm batch=${warm * m} " +
        f"wall_s=$wall%.1f shuffle_mb=$mb%.1f " +
        f"labels=${StreamingPipeline.clusterLabels(spark, lab.toString).count()} " +
        f"labels_sum=${labelsChecksum(spark, lab.toString)}")
    }
  }

  private def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(src)) return
    val s = java.nio.file.Files.walk(src)
    try s.iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    } finally s.close()
  }

  /** Total shuffle bytes written across completed stages — the
    * exchange-shape axis of the backfill comparison (a plan that
    * re-shuffles the corpus shows up here, whatever its wall).
    */
  private final class ShuffleMeter
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  /** Cumulative input bytes/records actually READ across completed
    * stages — the row-group/page-skipping evidence axis (round-10):
    * file-count censuses show what a pruned read COULD touch, but only
    * task input metrics show what the pushed `In` filters + sorted
    * files actually skipped. Per-batch deltas are printed as
    * `in_mb`/`in_rows`.
    */
  private final class InputMeter
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

  def main(args: Array[String]): Unit = {
    val mode = if (args.length > 0) args(0) else "lex"
    val batches = if (args.length > 1) args(1).toInt else 16
    val m = if (args.length > 2) args(2).toLong else 20000L
    val compactEvery = 4
    val spark = graft.core.GraftSession.local("maint-probe", 32)
    if (args.length > 3) // bucket-count knob (round-9 verdict #4)
      spark.conf.set("graft.dedup.buckets", args(3).toInt.toString)
    // band-width knob (embed only): candidate noise per trigger is
    // bands·n·|batch|/2^bits, so at 1000:1 corpus:batch ratios the
    // CANDIDATE set (not the batch) is what drives the verify fetch
    // and the probe-pushdown key count — a deployment sizes bits so
    // noise ≪ batch. Labels are bits-INVARIANT here (true pairs
    // verify at any width; chance cosines never reach 0.8), so the
    // checksum pins output identity across the knob.
    val bits = if (args.length > 4) args(4).toInt else 16
    spark.range(1).count()
    if (mode == "backfill") {
      backfillProbe(spark, batches, m)
      spark.stop()
      return
    }
    if (mode == "span") {
      spanProbe(spark, batches, m)
      spark.stop()
      return
    }
    if (mode == "lm") {
      lmProbe(spark, batches, m)
      spark.stop()
      return
    }
    if (mode == "terms") {
      termsProbe(spark, batches, m)
      spark.stop()
      return
    }
    if (mode == "semantic") {
      // args(3) is the k (cell count) knob here, not the bucket knob —
      // capped by the trainer's 128-id init pool
      semanticProbe(spark, batches, m,
        if (args.length > 3) args(3).toInt else 128)
      spark.stop()
      return
    }
    val root = java.nio.file.Files.createTempDirectory("maint")
    val index = root.resolve("index").toString // signatures | sign buckets
    val labels = root.resolve("labels").toString
    val vectors = root.resolve("vectors") // embed loop's bucketed vector table
    if (mode == "embed") java.nio.file.Files.createDirectory(vectors)
    val input = new InputMeter
    spark.sparkContext.addSparkListener(input)

    for (b <- 0 until batches) {
      var readFiles = -1L
      val (inB0, inR0) = (input.bytes.get(), input.records.get())
      val wall = mode match {
        case "embed" =>
          val vecs = batchVecs(spark, b, m).localCheckpoint() // gen untimed
          val t1 = System.nanoTime()
          // threshold + band width sized for random 64-dim geometry —
          // rationale at [[batchVecs]]; the loop owns the bucketed
          // vector table, so its append is part of the timed trigger
          StreamingPipeline.maintainEmbedClusters(spark, index, labels,
            vectors.toString, vecs, b.toLong, threshold = 0.8,
            bands = 4, bits = bits)
          if (b % compactEvery == compactEvery - 1) {
            graft.analytics.DedupQueries.compactSignaturesMinor(spark, index)
            graft.analytics.DedupQueries
              .compactSignaturesMinor(spark, vectors.toString)
          }
          val w = (System.nanoTime() - t1) / 1e9
          // pruned-read census AFTER the trigger (untimed): the index +
          // vector files this batch's bucket-pruned reads could touch
          // (round-9 verdict #4 asked for this column on the embed loop)
          val bks = batchBuckets(vecs, "vec_id")
          readFiles = bucketFiles(index, bks) +
            bucketFiles(vectors.toString, bks)
          w
        case _ =>
          val docs = batchDocs(spark, b, m).localCheckpoint() // gen untimed
          val t1 = System.nanoTime()
          StreamingPipeline.maintainClusters(spark, index, labels, docs,
            b.toLong)
          if (b % compactEvery == compactEvery - 1)
            graft.analytics.DedupQueries.compactSignaturesMinor(spark, index)
          val w = (System.nanoTime() - t1) / 1e9
          // pruned-read census AFTER the trigger (untimed): the files
          // this batch's bucket-pruned fetches could touch
          readFiles = bucketFiles(index, batchBuckets(docs, "doc_id"))
          w
      }
      Thread.sleep(100) // listener bus is async; let stage metrics land
      val (inMb, inRows) =
        ((input.bytes.get() - inB0) / 1e6, input.records.get() - inR0)
      val nLabels = StreamingPipeline.clusterLabels(spark, labels).count()
      println(f"MAINT mode=$mode batch=$b corpus=${(b + 1) * m} " +
        f"wall_s=$wall%.1f labeled_nodes=$nLabels " +
        f"index_files=${dataFiles(index)} labels_files=${dataFiles(labels)}" +
        (if (readFiles >= 0) f" read_files=$readFiles" else "") +
        f" in_mb=$inMb%.1f in_rows=$inRows" +
        (if (b == batches - 1)
          f" labels_sum=${labelsChecksum(spark, labels)}" else ""))
    }
    // decomposition epilogue: one trigger with a ~tiny batch at FULL
    // corpus. Its wall is almost purely the corpus-proportional
    // per-trigger term (stored-table scan mass at saturated bucket
    // pruning); wall(normal) − wall(tiny) isolates the batch-
    // proportional term. This is what attributes any drift in the
    // series above to scans vs joins.
    val tinyM = math.max(m / 200L, 1L)
    Thread.sleep(200)
    val (tinyB0, tinyR0) = (input.bytes.get(), input.records.get())
    val tinyWall = mode match {
      case "embed" =>
        val vecs = batchVecs(spark, batches.toLong, tinyM).localCheckpoint()
        val t1 = System.nanoTime()
        StreamingPipeline.maintainEmbedClusters(spark, index, labels,
          vectors.toString, vecs, batches.toLong, threshold = 0.8,
          bands = 4, bits = bits)
        (System.nanoTime() - t1) / 1e9
      case _ =>
        val docs = batchDocs(spark, batches.toLong, tinyM).localCheckpoint()
        val t1 = System.nanoTime()
        StreamingPipeline.maintainClusters(spark, index, labels, docs,
          batches.toLong)
        (System.nanoTime() - t1) / 1e9
    }
    Thread.sleep(100)
    println(f"MAINT-TINY mode=$mode batch=$batches corpus=${batches * m} " +
      f"batch_size=$tinyM wall_s=$tinyWall%.1f " +
      f"in_mb=${(input.bytes.get() - tinyB0) / 1e6}%.1f " +
      f"in_rows=${input.records.get() - tinyR0}")
    spark.stop()
  }
}

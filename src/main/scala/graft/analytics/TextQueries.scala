package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Text-analysis surface for training-data pipelines: token statistics,
  * BPE-ish subword counting, n-gram heuristic language ID and quality
  * scoring — all over the `documents` table, all pure Catalyst
  * expressions that run in the scan stage (no UDFs, no shuffle beyond
  * the final ORDER BY the oracle needs).
  *
  * DuckDB mirrors: `regexp_count` ≙ `len(regexp_extract_all(...))`;
  * Java and RE2 agree on every pattern used here (`\S`, `\b`,
  * char classes, alternation).
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** DuckDB count-of-matches fragment. */
  private def reCount(expr: String, pat: String): String =
    s"len(regexp_extract_all($expr, '$pat'))"

  private val langScoreSql: Seq[(String, String)] =
    LangStopwords.map { case (l, ws) =>
      l -> reCount("lower(text)", ws.mkString("\\b(", "|", ")\\b"))
    }

  // ---------------------------------------------------------- LM model
  // The CCNet-style bigram model behind q_lm_score and the streaming
  // perplexity gate. Train-once memoized on the corpus fingerprint
  // (the codebook discipline — see SimilarityQueries.corpusKey): the
  // stored table is the MODEL PARAMETER a production pipeline ships,
  // orders of magnitude smaller than the corpus (Zipf-bounded bigram
  // count table), and scoring any batch — the corpus itself, an sf10
  // probe, or arriving streaming docs — is one equi-join pass against
  // it, with no per-run retraining.

  /** Position-ordered bigram explode over `(doc_id, ts)` rows: one row
    * per adjacent token pair, `pos` 1-based. Shared by training and
    * scoring so the bigram formation cannot drift between them.
    */
  private def lmBigrams(tk: DataFrame): DataFrame =
    tk.filter(size(col("ts")) >= 2)
      .select(col("doc_id"),
        posexplode(zip_with(
          slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1),
          (a, b) => concat(a, lit(" "), b))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        col("col").as("bigram"))

  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(lower(col("text"))).as("ts"))

  /** Train the add-k bigram model: one row per distinct corpus bigram
    * with its count `c12`, its left-token count `c1`, and the vocab
    * size `v` (constant, denormalized so the table is self-contained).
    * Two aggregations + one small self-join — all over the Zipf-bounded
    * distinct-bigram table, not the corpus.
    */
  private[graft] def trainLmModel(docs: DataFrame): DataFrame = {
    val tk = tokenized(docs)
    val model = lmBigrams(tk).groupBy(col("bigram"))
      .agg(count(lit(1)).as("c12"))
    val lefts = model
      .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val vocab = tk.select(explode(col("ts")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    model
      .join(lefts, substring_index(col("bigram"), " ", 1) === col("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("bigram"), col("w1"), col("c12"), col("c1"), col("v"))
  }

  private val storedLmModel =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Stored model table for this corpus — built once per corpus
    * fingerprint via the shared parquet memo. The table lives in a
    * `model/` subdir (the memo pre-creates its temp dir, and a parquet
    * write refuses an existing path).
    */
  private[graft] def lmModelPath(s: SparkSession, dir: String): String =
    Tables.memoizedParquet(storedLmModel,
      Tables.derivedStateKey(s, dir, "documents") + "|lm",
      "graft-lm-model") { out =>
      trainLmModel(t(s, dir, "documents")).write.parquet(s"$out/model")
    } + "/model"

  /** Score docs against a trained model: per doc, the average negative
    * log₂ smoothed bigram probability in bits ("bits_per_bigram"),
    * folded in POSITION order so the float sum is deterministic.
    * Unseen bigrams smooth to (0+½)/(c1+½V); unseen left tokens to
    * ½/(½V) — so the gate scores ARRIVING docs the model never saw.
    * Docs with fewer than 2 tokens have no bigrams and are not
    * emitted (nothing to score). `v` is read off the model table
    * driver-side (one scalar — the model IS the small side).
    *
    * Cross-engine determinism (CLOSED, round 10): each per-bigram
    * `logp` is quantized to the DYADIC grid 2⁻³⁰ (≈ 9.3e-10) BEFORE
    * the position-ordered fold, on both engines — `floor(x · 2³⁰) /
    * 2³⁰`, where the scale and unscale are exact IEEE-754 exponent
    * shifts (a decimal 1e-9 grid would reintroduce rounding inside
    * the quantizer itself). A ~1-ulp libm `log2` difference between
    * engines therefore vanishes at the quantizer unless the value
    * sits within 1 ulp of a grid boundary (≤ ~4e-7 of the grid step,
    * vs the pre-round-10 shape where EVERY doc's final N-term sum ran
    * the floor(x·1000) boundary risk); the summed values are then
    * bit-identical and the final floor runs on identical doubles.
    * [[PipelineFunctionsSpec]] pins the 1-ulp-invariance at the
    * quantizer boundary.
    */
  private[graft] val Log2Grid = 1073741824.0d // 2^30: exact dyadic scale

  private[graft] def quantizeLog2(x: Column): Column =
    floor(x * lit(Log2Grid)) / lit(Log2Grid)

  private[graft] def scoreBitsPerBigram(
      docs: DataFrame, model: DataFrame): DataFrame = {
    val vRow = model.select(max(col("v"))).head
    // loud guard: an empty model (corpus with no 2-token docs) would
    // otherwise surface as an NPE here or all-zero smoothing downstream
    require(!vRow.isNullAt(0),
      "LM model table is empty — train it on a corpus with at least one multi-token document")
    val v = vRow.getLong(0)
    val lefts = model.groupBy(col("w1")).agg(max(col("c1")).as("c1"))
    lmBigrams(tokenized(docs))
      .join(model.select(col("bigram"), col("c12")), Seq("bigram"), "left")
      .join(lefts, substring_index(col("bigram"), " ", 1) === col("w1"),
        "left")
      .select(col("doc_id"), col("pos"),
        quantizeLog2(log2((coalesce(col("c12"), lit(0L)) + lit(0.5)) /
          (coalesce(col("c1"), lit(0L)) + lit(0.5) * lit(v)))).as("logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        aggregate(
          sort_array(collect_list(struct(col("pos"), col("logp")))),
          lit(0.0d), (acc, x) => acc + x.getField("logp")).as("nll"))
      .select(col("doc_id"), col("n_bigrams"),
        (floor(-col("nll") / col("n_bigrams") * 1000) / 1000)
          .as("bits_per_bigram"))
  }

  // ------------------------------------------------------------------
  // Incremental LM model — continuous maintenance for MODEL state
  // (round 11). The bigram and unigram count tables are pure semigroup
  // state (integer sums over disjoint doc batches), so the model joins
  // the continuously-maintained family (signatures, sign buckets,
  // window fingerprints, ANN codes): per-batch count DELTAS append
  // exactly-once into bkt-partitioned incremental tables, and minor
  // compaction AGGREGATES the absorbed tiers
  // ([[graft.sinks.IncrementalParquet.compactMinor]]'s merge hook) so
  // the stored tables stay Zipf-bounded instead of growing with
  // batch count × keys. Serving reconstructs exactly [[trainLmModel]]'s
  // (bigram, w1, c12, c1, v) relation by summing the deltas — counts
  // are additive over a partition of the corpus, so the incremental
  // model is IDENTICAL to a one-shot retrain and q_lm_score_incr runs
  // under q_lm_score's full-retrain DuckDB SQL.

  /** A batch's bigram-count delta (one O(batch) pass, no table IO),
    * bucketed by bigram hash so serve scans parallelize and merged
    * tiers cluster by the model's join key.
    */
  private[graft] def bigramDeltas(docs: DataFrame, n: Int): DataFrame =
    lmBigrams(tokenized(docs)).groupBy(col("bigram"))
      .agg(count(lit(1)).as("c12"))
      .withColumn("bkt", pmod(hash(col("bigram")), lit(n)))

  /** A batch's token-count delta — maintains the vocabulary (v =
    * count of distinct stored tokens); tokens of 1-token docs appear
    * in no bigram, so v is NOT derivable from the bigram table.
    */
  private[graft] def unigramDeltas(docs: DataFrame, n: Int): DataFrame =
    tokenized(docs).select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .withColumn("bkt", pmod(hash(col("w")), lit(n)))

  /** Sum-merges for aggregate-on-compact — serve-equivalent because
    * [[lmModelFromStored]] sums these columns anyway.
    */
  // zero-drop: a fully-retracted bigram/token folds to 0 at a
  // compaction firing and leaves the table physically (the semigroup
  // deletion lifecycle — see [[retractFromLmModelIdempotent]])
  private val mergeBigramCounts: DataFrame => DataFrame =
    _.groupBy(col("bkt"), col("bigram")).agg(sum(col("c12")).as("c12"))
      .filter(col("c12") =!= 0)
  private val mergeUnigramCounts: DataFrame => DataFrame =
    _.groupBy(col("bkt"), col("w")).agg(sum(col("c")).as("c"))
      .filter(col("c") =!= 0)

  /** Exactly-once append of a batch's model deltas into the two stored
    * count tables (replay/ack/layout-pin protocol in
    * [[graft.sinks.IncrementalParquet]]; files clustered by the key so
    * merged tiers keep tight page stats).
    */
  def appendToLmModelIdempotent(
      batch: DataFrame, bgDir: String, uniDir: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    val nb = DedupQueries.tableBuckets(s, bgDir)
    graft.sinks.IncrementalParquet.appendIdempotent(
      s, bgDir, "bkt", batchId, Seq("bigram"),
      Map("buckets" -> nb.toString))(bigramDeltas(batch, nb))
    val nu = DedupQueries.tableBuckets(s, uniDir)
    graft.sinks.IncrementalParquet.appendIdempotent(
      s, uniDir, "bkt", batchId, Seq("w"),
      Map("buckets" -> nu.toString))(unigramDeltas(batch, nu))
  }

  /** Exactly-once RETRACTION of a batch of DELETED documents from the
    * maintained LM model — the [[retractFromTermStatsIdempotent]]
    * mechanism on the model family: negative bigram/unigram deltas
    * through the same append protocol under the negative id space, so
    * serves net them out immediately, a replayed retraction is a
    * no-op forever, and merge-compaction folds them away physically
    * (a fully-retracted bigram leaves the model — absent, not
    * zero-count, which matters under add-0.5 smoothing). Retraining-
    * free removal: the takedown shifts exactly the counts the deleted
    * docs contributed — the Zipf-bounded state never rebuilds.
    */
  def retractFromLmModelIdempotent(
      deletedDocs: DataFrame, bgDir: String, uniDir: String,
      batchId: Long): Unit = {
    val s = deletedDocs.sparkSession
    val rid = graft.sinks.IncrementalParquet.retractionBatchId(batchId)
    val nb = DedupQueries.tableBuckets(s, bgDir)
    graft.sinks.IncrementalParquet.appendIdempotent(
      s, bgDir, "bkt", rid, Seq("bigram"),
      Map("buckets" -> nb.toString))(
      bigramDeltas(deletedDocs, nb).withColumn("c12", -col("c12")))
    val nu = DedupQueries.tableBuckets(s, uniDir)
    graft.sinks.IncrementalParquet.appendIdempotent(
      s, uniDir, "bkt", rid, Seq("w"),
      Map("buckets" -> nu.toString))(
      unigramDeltas(deletedDocs, nu).withColumn("c", -col("c")))
  }

  /** Minor compaction of both model tables WITH count merging — the
    * first user of aggregate-on-compact. Returns partitions absorbed.
    */
  def compactLmModelMinor(
      s: SparkSession, bgDir: String, uniDir: String): Int =
    graft.sinks.IncrementalParquet.compactMinor(
      s, bgDir, "bkt", merge = mergeBigramCounts) +
      graft.sinks.IncrementalParquet.compactMinor(
        s, uniDir, "bkt", merge = mergeUnigramCounts)

  /** Reconstruct [[trainLmModel]]'s exact model relation from the
    * stored delta tables: counts sum (any unmerged tiers collapse
    * here), `c1` re-derives from the summed bigram table exactly as
    * the one-shot trainer derives it, `v` counts the distinct stored
    * tokens. Integer arithmetic end-to-end, so the reconstruction is
    * bit-identical to a full retrain.
    */
  def lmModelFromStored(
      s: SparkSession, bgDir: String, uniDir: String): DataFrame = {
    // the > 0 cuts make reconstruction retraction-exact between a
    // delete batch's ack and its compaction fold: a fully-retracted
    // bigram sums to 0 and must LEAVE the model (absent ≠ zero under
    // add-0.5 smoothing), and v counts only tokens with surviving
    // occurrences — identity for a never-retracted table (counts are
    // positive by construction)
    val model = Tables.parquetCachedSchema(s, bgDir).groupBy(col("bigram"))
      .agg(sum(col("c12")).as("c12")).filter(col("c12") > 0)
    val lefts = model
      .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val vocab = Tables.parquetCachedSchema(s, uniDir)
      .groupBy(col("w")).agg(sum(col("c")).as("c"))
      .filter(col("c") > 0)
      .agg(count(lit(1)).as("v"))
    model
      .join(lefts, substring_index(col("bigram"), " ", 1) === col("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("bigram"), col("w1"), col("c12"), col("c1"), col("v"))
  }

  private val storedIncLmModel =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** THE incrementally-built model per corpus fingerprint — the model
    * family's lifecycle gate, mirroring
    * [[DedupQueries.incrementalSpansPath]]: the even-doc_id half
    * arrives as batch 0, the odd half as batch 1, minor compaction
    * sum-merges the tiers, and the served model materializes from the
    * stored counts. Identical to [[trainLmModel]], so q_lm_score's
    * full-retrain oracle checks the whole append → merge-compact →
    * reconstruct lifecycle.
    */
  private[graft] def incrementalLmModelPath(
      s: SparkSession, dir: String): String =
    Tables.memoizedParquet(storedIncLmModel,
      Tables.derivedStateKey(s, dir, "documents") + "|lmincr",
      "graft-lm-incr") { out =>
      val docs = t(s, dir, "documents")
      val bgDir = s"$out/bg"
      val uniDir = s"$out/uni"
      appendToLmModelIdempotent(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), bgDir, uniDir, 0L)
      appendToLmModelIdempotent(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), bgDir, uniDir, 1L)
      compactLmModelMinor(s, bgDir, uniDir)
      lmModelFromStored(s, bgDir, uniDir).write.parquet(s"$out/model")
    } + "/model"

  private val storedIncLmModelDeleted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The DELETION-lifecycle LM model: the standard two-batch build,
    * then a retraction batch (every doc ≡ 3 mod 7), a replayed
    * retraction (pinned no-op — a double retraction shifts every
    * smoothed probability), and merge-compaction folding the
    * negatives away before the model materializes. Serving it under
    * the full-retrain-over-survivors oracle pins retraining-free
    * model takedown to the bit.
    */
  private[graft] def incrementalLmModelDeletedPath(
      s: SparkSession, dir: String): String =
    Tables.memoizedParquet(storedIncLmModelDeleted,
      Tables.derivedStateKey(s, dir, "documents") + "|lmincr-del",
      "graft-lm-del") { out =>
      val docs = t(s, dir, "documents")
      val bgDir = s"$out/bg"
      val uniDir = s"$out/uni"
      appendToLmModelIdempotent(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), bgDir, uniDir, 0L)
      appendToLmModelIdempotent(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), bgDir, uniDir, 1L)
      retractFromLmModelIdempotent(
        docs.filter(pmod(col("doc_id"), lit(7)) === 3), bgDir, uniDir, 0L)
      // replay with DIFFERENT content: the ack must make it a no-op
      retractFromLmModelIdempotent(
        docs.filter(pmod(col("doc_id"), lit(7)) =!= 3).limit(1),
        bgDir, uniDir, 0L)
      compactLmModelMinor(s, bgDir, uniDir)
      lmModelFromStored(s, bgDir, uniDir).write.parquet(s"$out/model")
    } + "/model"

  // ------------------------------------------------------------------
  // Incremental term statistics — aggregate-on-compact's second user
  // (round 11), maintaining the CORPUS state behind salient-term
  // extraction: the document-frequency table and the doc count. Both
  // are semigroups over batches, but df subtly so: df adds across
  // batches ONLY because their doc sets are disjoint — a replayed doc
  // would double-count every term it contains — so the exactly-once
  // ack protocol is the CORRECTNESS condition here, not merely an
  // efficiency (contrast the LM counts, where replay would inflate
  // totals uniformly). Per-doc tf is scan-stage per serving, not
  // state; q_top_terms_incr serves the exact q_top_terms relation
  // with df/n_docs read from the maintained tables.

  /** A batch's document-frequency delta: per term, the count of batch
    * docs containing it (one O(batch) pass, no table IO).
    */
  private[graft] def dfDeltas(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("bkt", pmod(hash(col("term")), lit(n)))

  /** A batch's doc-count delta — one row. The stopword cut compares
    * df against the CORPUS size, so the count is maintained state too.
    */
  private[graft] def docCountDelta(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n")).withColumn("bkt", lit(0))

  // the zero-drop makes merge-compaction the semigroup family's
  // physical removal: a fully-retracted term's (positive, negative)
  // rows fold to 0 and LEAVE the table — after a compaction firing the
  // bytes carry no evidence the term was ever ingested
  private val mergeDfCounts: DataFrame => DataFrame =
    _.groupBy(col("bkt"), col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") =!= 0)
  private val mergeDocCounts: DataFrame => DataFrame =
    _.groupBy(col("bkt")).agg(sum(col("n")).as("n"))

  /** Exactly-once append of a batch's term-stats deltas. */
  def appendToTermStatsIdempotent(
      batch: DataFrame, dfDir: String, cntDir: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    val nb = DedupQueries.tableBuckets(s, dfDir)
    graft.sinks.IncrementalParquet.appendIdempotent(
      s, dfDir, "bkt", batchId, Seq("term"),
      Map("buckets" -> nb.toString))(dfDeltas(batch, nb))
    graft.sinks.IncrementalParquet.appendIdempotent(
      s, cntDir, "bkt", batchId)(docCountDelta(batch))
  }

  /** Exactly-once RETRACTION of a batch of DELETED documents from the
    * maintained term-stats state — the deletion lifecycle's SEMIGROUP
    * arm: df/doc-count rows are sum-mergeable, so removal is the
    * NEGATIVE of exactly the deltas ingest appended
    * ([[dfDeltas]]/[[docCountDelta]] of the deleted docs, negated),
    * installed through the SAME exactly-once append protocol under
    * [[graft.sinks.IncrementalParquet.retractionBatchId]]'s negative
    * id space (no ack collision with ingest ids; a replayed
    * retraction is a no-op forever). Serves net the negatives out
    * with no plan change from the moment the batch acks;
    * [[compactTermStatsMinor]]'s sum-merge then folds them into the
    * base rows physically — a fully-retracted term leaves the table.
    * The caller passes the deleted documents' ROWS (id + text): a
    * takedown resolves the doc from the corpus store before removing
    * it, because only the text can say which counts to retract.
    */
  def retractFromTermStatsIdempotent(
      deletedDocs: DataFrame, dfDir: String, cntDir: String,
      batchId: Long): Unit = {
    val s = deletedDocs.sparkSession
    val nb = DedupQueries.tableBuckets(s, dfDir)
    val rid = graft.sinks.IncrementalParquet.retractionBatchId(batchId)
    graft.sinks.IncrementalParquet.appendIdempotent(
      s, dfDir, "bkt", rid, Seq("term"),
      Map("buckets" -> nb.toString))(
      dfDeltas(deletedDocs, nb).withColumn("df", -col("df")))
    graft.sinks.IncrementalParquet.appendIdempotent(
      s, cntDir, "bkt", rid)(
      docCountDelta(deletedDocs).withColumn("n", -col("n")))
  }

  /** Minor compaction of both term-stats tables with count merging. */
  def compactTermStatsMinor(
      s: SparkSession, dfDir: String, cntDir: String): Int =
    graft.sinks.IncrementalParquet.compactMinor(
      s, dfDir, "bkt", merge = mergeDfCounts) +
      graft.sinks.IncrementalParquet.compactMinor(
        s, cntDir, "bkt", merge = mergeDocCounts)

  /** The maintained (term, df) relation and corpus size, summed from
    * the stored deltas — exactly the df table + n_docs scalar the
    * one-shot query derives from the corpus.
    */
  def termStatsFromStored(
      s: SparkSession, dfDir: String, cntDir: String): (DataFrame, DataFrame) =
    // df > 0: between a retraction's ack and its compaction fold, a
    // fully-retracted term sums to exactly 0 — a term present in no
    // surviving doc has no df row in the recomputed relation
    (Tables.parquetCachedSchema(s, dfDir).groupBy(col("term"))
      .agg(sum(col("df")).as("df")).filter(col("df") > 0),
      Tables.parquetCachedSchema(s, cntDir).agg(sum(col("n")).as("n_docs")))

  private val storedIncTermStats =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** THE incrementally-built term-stats state per corpus fingerprint —
    * even half as batch 0, odd half as batch 1, sum-merge compaction.
    */
  private[graft] def incrementalTermStatsDirs(
      s: SparkSession, dir: String): (String, String) = {
    val out = Tables.memoizedParquet(storedIncTermStats,
      Tables.derivedStateKey(s, dir, "documents") + "|termincr",
      "graft-terms-incr") { out =>
      val docs = t(s, dir, "documents")
      val dfDir = s"$out/df"
      val cntDir = s"$out/cnt"
      appendToTermStatsIdempotent(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), dfDir, cntDir, 0L)
      appendToTermStatsIdempotent(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), dfDir, cntDir, 1L)
      compactTermStatsMinor(s, dfDir, cntDir); ()
    }
    (s"$out/df", s"$out/cnt")
  }

  private val storedIncTermStatsDeleted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The DELETION-lifecycle term-stats state: the standard two-batch
    * build, then a RETRACTION batch (every doc ≡ 3 mod 7, negative
    * deltas through the same append protocol), a REPLAY of that batch
    * (pinned no-op — a double retraction would shift every df and the
    * stopword cut), and sum-merge compaction that folds the negatives
    * into the base rows physically. q_top_terms_deleted's oracle hash
    * then pins the whole semigroup removal mechanism against the full
    * recompute over the surviving corpus.
    */
  private[graft] def incrementalTermStatsDeletedDirs(
      s: SparkSession, dir: String): (String, String) = {
    val out = Tables.memoizedParquet(storedIncTermStatsDeleted,
      Tables.derivedStateKey(s, dir, "documents") + "|termincr-del",
      "graft-terms-del") { out =>
      val docs = t(s, dir, "documents")
      val dfDir = s"$out/df"
      val cntDir = s"$out/cnt"
      appendToTermStatsIdempotent(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), dfDir, cntDir, 0L)
      appendToTermStatsIdempotent(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), dfDir, cntDir, 1L)
      val deleted = docs.filter(pmod(col("doc_id"), lit(7)) === 3)
      retractFromTermStatsIdempotent(deleted, dfDir, cntDir, 0L)
      // replay with DIFFERENT content: the ack must make it a no-op
      retractFromTermStatsIdempotent(
        docs.filter(pmod(col("doc_id"), lit(7)) =!= 3).limit(1),
        dfDir, cntDir, 0L)
      compactTermStatsMinor(s, dfDir, cntDir); ()
    }
    (s"$out/df", s"$out/cnt")
  }

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------ tokens
    // Token counting: whitespace tokens, BPE-ish subwords (letter runs /
    // digit runs / single marks), distinct-token and 3-gram-shingle
    // cardinalities. Counting via regexp_count never materializes the
    // token arrays — a pure scan-stage projection.
    GraftQuery(
      "q_token_stats",
      s"""SELECT doc_id,
         |  ${reCount("text", "\\S+")} AS n_tokens,
         |  ${reCount("lower(text)", "[a-z]+|[0-9]+|[^a-z0-9\\s]")} AS n_subwords,
         |  len(list_distinct(regexp_extract_all(lower(text), '\\S+'))) AS n_distinct_tokens,
         |  len(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
         |                     FOR i IN range(1, greatest(len(ts) - 1, 1))])) AS n_shingles
         |FROM (SELECT *, regexp_extract_all(lower(text), '\\S+') AS ts FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // tokenize ONCE into an own projection: the shingle transform
      // references the token array n+1 times, and an inlined
      // tokenizer expression re-runs the full-text regex PER
      // REFERENCE AND PER ARRAY ELEMENT (~3×n_tokens regex passes per
      // row — 19.2 s at sf0.1, caught in round 12 the moment the bench
      // action stopped letting count() prune the projection; 0.5 s
      // tokenized-once). CollapseProject keeps the barrier: it never
      // inlines a non-cheap alias into multiple consumers.
      // ...and the whole projection sits ABOVE the global sort: an
      // orderBy's range-sample pass evaluates its child twice, so the
      // tokenizer below the sort would still run 2× (1.0 s vs 0.55 s
      // at sf0.1 — same fix as q_normalize_row).
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), col("text"),
          tokens(lower(col("text"))).as("ts"))
        .select(col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          subwordCount(col("text")).as("n_subwords"),
          size(array_distinct(col("ts"))).as("n_distinct_tokens"),
          size(array_distinct(shinglesFromTokens(col("ts"), 3)))
            .as("n_shingles"))
    },

    // ------------------------------------------------------------ lang ID
    // Stopword-vote language ID (classic function-word heuristic). The
    // prediction is argmax of per-language stopword hits, first-listed
    // language wins ties, 'und' when no hits at all.
    GraftQuery(
      "q_lang_id", {
        val scores = langScoreSql.map { case (l, sql) => s"$sql AS s_$l" }
        val best = langScoreSql.map(l => s"s_${l._1}").mkString("greatest(", ", ", ")")
        val total = langScoreSql.map(l => s"s_${l._1}").mkString(" + ")
        val cases = langScoreSql.map { case (l, _) =>
          s"WHEN ($total) > 0 AND s_$l = $best THEN '$l'"
        }.mkString(" ")
        s"""SELECT doc_id, lang, lang_pred, s_en
           |FROM (SELECT doc_id, lang,
           |        CASE $cases ELSE 'und' END AS lang_pred, s_en
           |      FROM (SELECT doc_id, lang, ${scores.mkString(", ")} FROM documents))
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      // stopword-regex projection above the sort (the q_normalize_row
      // discipline): the range sampler otherwise runs it twice
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), col("lang"),
          langId(col("text")).as("lang_pred"),
          langScore(col("text"), "en").as("s_en"))
    },

    // ---------------------------------------------------------- top terms
    // Per-document salient-term extraction (the tf-idf-style keyword
    // stage of corpus curation), kept INTEGER-EXACT for the hash gate:
    // rank terms by (tf DESC, df ASC, term) instead of tf·ln(N/df) —
    // same ordering ln() would induce for fixed tf, with no libm in the
    // hash. Terms appearing in ≥90% of the corpus are dropped as
    // stopwords (this synthetic corpus shares most of its small
    // vocabulary, so a N/2 cut would empty the result).
    // Scale: the document-frequency table is |vocab|-sized
    // (broadcastable); the explode is scan-stage; the only wide ops are
    // the two term aggregations and the per-doc top-k window.
    GraftQuery("q_top_terms", topTermsSql) { (s, dir) =>
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
      // df derives from tf (tf is one row per (doc, term)) — the
      // tokenize+explode pipeline runs ONCE, behind tf's exchange,
      // instead of once per aggregate
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .repartition(col("term")) // barrier: stops df from re-inlining tok
      val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      // corpus size as a broadcast 1-row scalar (the SQL subquery's
      // plan shape) — no driver-side action in the query path
      val nDocs = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term"))
      tf.join(broadcast(dfT.join(broadcast(nDocs))
          .filter(col("df") * 10 < col("n_docs") * 9)
          .select("term", "df")), "term")
        .select(col("doc_id"),
          row_number().over(w).cast(org.apache.spark.sql.types.IntegerType).as("rnk"),
          col("term"), col("tf"), col("df"))
        .filter(col("rnk") <= 3)
        .orderBy(col("doc_id"), col("rnk"))
    },

    // Same oracle text, served with the CORPUS state (df table +
    // doc count) read from the incrementally-maintained tables instead
    // of re-derived — per-doc tf stays scan-stage per serving (it is a
    // function of each doc alone, not corpus state). The full-recompute
    // SQL checks that df stayed exact across append → sum-merge →
    // reconstruct, i.e. that exactly-once ingest really made df
    // additive over batches.
    GraftQuery("q_top_terms_incr", topTermsSql) { (s, dir) =>
      val (dfDir, cntDir) = incrementalTermStatsDirs(s, dir)
      val (dfT, nDocs) = termStatsFromStored(s, dfDir, cntDir)
      val tf = t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term"))
      tf.join(broadcast(dfT.join(broadcast(nDocs))
          .filter(col("df") * 10 < col("n_docs") * 9)
          .select("term", "df")), "term")
        .select(col("doc_id"),
          row_number().over(w).cast(org.apache.spark.sql.types.IntegerType).as("rnk"),
          col("term"), col("tf"), col("df"))
        .filter(col("rnk") <= 3)
        .orderBy(col("doc_id"), col("rnk"))
    },

    // The SEMIGROUP deletion lifecycle under the oracle hash: term
    // stats built as build + append + RETRACTION batch (doc ≡ 3 mod
    // 7, negative deltas through the same exactly-once protocol) +
    // replayed retraction (pinned no-op) + sum-merge compaction that
    // folds the negatives away physically. One hash pins the whole
    // mechanism — df shifts, the corpus-size scalar retracts (moving
    // the stopword cut), fully-retracted terms vanish — against the
    // full recompute over the surviving corpus. tf is per-doc
    // scan-stage state over the post-takedown corpus store, not
    // maintained state.
    GraftQuery("q_top_terms_deleted",
      topTermsSqlOver("(SELECT * FROM documents WHERE doc_id % 7 <> 3)")) {
      (s, dir) =>
      val (dfDir, cntDir) = incrementalTermStatsDeletedDirs(s, dir)
      val (dfT, nDocs) = termStatsFromStored(s, dfDir, cntDir)
      val tf = t(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(7)) =!= 3)
        .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term"))
      tf.join(broadcast(dfT.join(broadcast(nDocs))
          .filter(col("df") * 10 < col("n_docs") * 9)
          .select("term", "df")), "term")
        .select(col("doc_id"),
          row_number().over(w).cast(org.apache.spark.sql.types.IntegerType).as("rnk"),
          col("term"), col("tf"), col("df"))
        .filter(col("rnk") <= 3)
        .orderBy(col("doc_id"), col("rnk"))
    },

    // --------------------------------------------------------- splits
    // Deterministic hash-based train/val/test assignment (reproducible
    // corpus splits — the property random() sampling loses): bucket =
    // portable SHA-derived hash of the doc id mod 100, split by 80/10/10
    // ranges. Pure scan-stage expression; stratification falls out of
    // the per-source grouping. Same one-SHA hash family as the dedup
    // operators, so both engines agree bit-for-bit.
    GraftQuery(
      "q_split_assign",
      """WITH b AS (
        |  SELECT doc_id, source,
        |    list_sum([(strpos('0123456789abcdef', substring(h, p, 1)) - 1)
        |              * CAST(16**(7 - p) AS BIGINT) FOR p IN range(1, 8)]) % 100 AS bucket
        |  FROM (SELECT doc_id, source,
        |          substring(sha256(CAST(doc_id AS VARCHAR)), 1, 7) AS h
        |        FROM documents))
        |SELECT source,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n, min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM b GROUP BY 1, 2 ORDER BY source, split""".stripMargin) { (s, dir) =>
      import graft.functions.SimilarityFunctions.elementHash
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          (elementHash(col("doc_id").cast(org.apache.spark.sql.types.StringType)) % 100)
            .as("bucket"))
        .select(col("source"), col("doc_id"),
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test").as("split"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("source"), col("split"))
    },

    // ------------------------------------------------------------ quality
    // Heuristic quality score: length saturation × alpha ratio ×
    // punctuation sanity, identical double arithmetic on both sides.
    // Rendered via floor-truncation, NOT round(): the score is a small
    // rational (e.g. 0.59925) whose shortest decimal repr ends in 5 —
    // Spark rounds that repr (HALF_UP → .5993) while DuckDB rounds the
    // binary value (.59924999… → .5992). floor(x·10⁴)/10⁴ is
    // bit-deterministic on identically-computed doubles.
    GraftQuery(
      "q_quality_score",
      s"""SELECT doc_id,
         |  floor((
         |    least(1.0, CAST(${reCount("text", "\\S+")} AS DOUBLE) / 64.0)
         |    * (CASE WHEN length(text) > 0
         |            THEN CAST(${reCount("text", "[A-Za-z]")} AS DOUBLE) / CAST(length(text) AS DOUBLE)
         |            ELSE 0.0 END)
         |    * (CASE WHEN length(text) > 0
         |            THEN greatest(0.0, 1.0 - (CAST(${reCount("text", "[.,;:!?]")} AS DOUBLE)
         |                                      / CAST(length(text) AS DOUBLE)) * 4.0)
         |            ELSE 0.0 END)) * 10000) / 10000 AS quality
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // three-regex score above the sort (the q_normalize_row
      // discipline): the range sampler otherwise runs it twice
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"),
          (floor(qualityScore(col("text")) * 10000) / 10000).as("quality"))
    },

    // -------------------------------------------------- LM perplexity
    // CCNet-style language-model quality filter — the standard LLM
    // training-data signal the heuristic scores above approximate: a
    // bigram model with add-k smoothing is TRAINED ON THE CORPUS
    // ITSELF (c(w₁,w₂) and left counts c(w₁), one aggregation each —
    // Zipf-bounded model size), then every document is scored by its
    // average negative log₂ bigram probability ("bits per bigram":
    // repetitive template-like docs score low, incoherent token soup
    // scores high). p = (c₁₂ + ½)/(c₁ + ½·V) keeps every operand an
    // exact integer until one division, and each doc folds its bigram
    // log-probs in POSITION order (sort_array → left fold / DuckDB
    // `list(... ORDER BY pos)` → list_reduce) so the float sum is
    // order-identical on both engines; each logp is quantized to the
    // 2⁻³⁰ dyadic grid before the fold so a 1-ulp libm log2
    // difference cannot reach the sum ([[quantizeLog2]]). Since round 9 the model is
    // trained ONCE per corpus fingerprint into a stored parquet table
    // ([[lmModelPath]]) and the query scores against it — the same
    // store/serve discipline as the ANN codes table, and what the
    // streaming perplexity gate serves from. 100 TB shape: the model
    // is a broadcast-or-shuffle equi-join against a count table orders
    // of magnitude smaller than the corpus; scoring is one pass.
    GraftQuery("q_lm_score", lmScoreSql) { (s, dir) =>
      // served from the STORED model table (train-once memoized on the
      // corpus fingerprint) — the oracle retrains in SQL, but the
      // counts are the same counts, so the hash gate also pins the
      // store/serve round-trip. Same discipline as q_ann_codes_served.
      val model = Tables.parquetCachedSchema(s, lmModelPath(s, dir))
      scoreBitsPerBigram(t(s, dir, "documents"), model)
        .orderBy(col("doc_id"))
    },

    // Same oracle text, third physical strategy (the PQ-family
    // precedent): the model here was built INCREMENTALLY — two delta
    // batches, sum-merged tiers, reconstruction from stored counts —
    // so the full-retrain SQL checks that continuous model maintenance
    // loses nothing: incremental fold == one-shot retrain, to the bit.
    GraftQuery("q_lm_score_incr", lmScoreSql) { (s, dir) =>
      val model = Tables.parquetCachedSchema(s, incrementalLmModelPath(s, dir))
      scoreBitsPerBigram(t(s, dir, "documents"), model)
        .orderBy(col("doc_id"))
    },

    // The MODEL-family deletion lifecycle under the oracle hash: the
    // maintained bigram/unigram counts built as build + append +
    // RETRACTION batch (doc ≡ 3 mod 7) + replayed retraction (pinned
    // no-op) + merge-compaction, then served against the surviving
    // docs. The oracle retrains from scratch on the survivors — so
    // the hash pins that retraining-free count retraction equals a
    // full retrain to the bit: every smoothed probability shifts
    // (c1, v and the vanished bigrams all move), not just the deleted
    // docs' rows.
    GraftQuery("q_lm_score_deleted",
      s"""WITH ${lmScoredCtesSqlOver(
            "(SELECT * FROM documents WHERE doc_id % 7 <> 3)")}
         |SELECT doc_id, n_bigrams, bits_per_bigram
         |FROM lmdoc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val model = Tables.parquetCachedSchema(
        s, incrementalLmModelDeletedPath(s, dir))
      scoreBitsPerBigram(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(7)) =!= 3),
        model)
        .orderBy(col("doc_id"))
    },

    // ------------------------------------ CCNet perplexity bucketing
    // CCNet's actual corpus-split step (Wenzek et al. 2020): within
    // each source (CCNet splits per language; source is this corpus's
    // stand-in), documents rank by LM perplexity and split into
    // head / middle / tail terciles — head (lowest bits-per-bigram,
    // most model-like) trains as-is, middle gets filtered harder,
    // tail is usually dropped. The cut is integer-exact
    // (rk·3 ≤ n / rk·3 ≤ 2n over the per-source rank), ranking on the
    // already-gated floored bits with doc_id tie-break, so the bucket
    // assignment is cross-engine deterministic end to end. Serves from
    // the STORED model (train-once memoized — the q_lm_score
    // discipline); only docs with ≥1 bigram are scored, exactly as
    // q_lm_score emits. Scale shape: the scoring pass + one doc_id
    // join + one per-source window exchange.
    GraftQuery(
      "q_ccnet_buckets",
      s"""WITH $lmScoredCtesSql,
         |src AS (SELECT l.doc_id, d.source, l.bits_per_bigram
         |        FROM lmdoc l JOIN documents d ON d.doc_id = l.doc_id),
         |rk AS (SELECT doc_id, source, bits_per_bigram,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY bits_per_bigram, doc_id) AS rk,
         |         COUNT(*) OVER (PARTITION BY source) AS n
         |       FROM src)
         |SELECT doc_id, source, bits_per_bigram,
         |  CASE WHEN rk * 3 <= n THEN 'head'
         |       WHEN rk * 3 <= 2 * n THEN 'middle'
         |       ELSE 'tail' END AS ppl_bucket
         |FROM rk ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val model = Tables.parquetCachedSchema(s, lmModelPath(s, dir))
      val scored = scoreBitsPerBigram(t(s, dir, "documents"), model)
      val srcs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("bits_per_bigram"), col("doc_id"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      scored.join(srcs, "doc_id")
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wc))
        .select(col("doc_id"), col("source"), col("bits_per_bigram"),
          when(col("rk") * 3 <= col("n"), "head")
            .when(col("rk") * 3 <= col("n") * 2, "middle")
            .otherwise("tail").as("ppl_bucket"))
        .orderBy(col("doc_id"))
    })

  /** q_top_terms' full-recompute DuckDB mirror — shared verbatim by
    * q_top_terms_incr (one oracle text per result relation).
    */
  private def topTermsSql: String = topTermsSqlOver("documents")

  /** [[topTermsSql]] over an arbitrary corpus relation — the deletion
    * gate recomputes over the SURVIVING corpus; every derived quantity
    * (tf, df, the stopword cut's corpus size) follows the source.
    */
  private def topTermsSqlOver(src: String): String =
    s"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
       |             FROM $src),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |j AS (SELECT tf.doc_id, tf.term, tf.tf, df.df
       |      FROM tf JOIN df ON tf.term = df.term
       |      WHERE df.df * 10 < (SELECT count(*) FROM $src) * 9),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
       |        ORDER BY tf DESC, df ASC, term) AS INTEGER) AS rnk FROM j)
       |SELECT doc_id, rnk, term, tf, df
       |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  /** The full-retrain LM scoring chain through the per-doc relation
    * `lmdoc(doc_id, n_bigrams, bits_per_bigram)` — shared by
    * q_lm_score / q_lm_score_incr and the CCNet bucketing oracle.
    */
  private[analytics] def lmScoredCtesSql: String =
    lmScoredCtesSqlOver("documents")

  /** [[lmScoredCtesSql]] over an arbitrary corpus relation — the
    * deletion gate retrains AND scores over the surviving corpus.
    */
  private def lmScoredCtesSqlOver(src: String): String =
    s"""tk AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ts
       |  FROM $src),
       |bg AS (
       |  SELECT doc_id, i AS pos, ts[i] || ' ' || ts[i+1] AS bigram
       |  FROM (SELECT doc_id, ts,
       |          unnest(range(1, len(ts))) AS i FROM tk)
       |  WHERE len(ts) >= 2),
       |model AS (SELECT bigram, count(*) AS c12 FROM bg GROUP BY bigram),
       |lefts AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(c12) AS c1
       |          FROM model GROUP BY w1),
       |vocab AS (SELECT count(DISTINCT w) AS v
       |          FROM (SELECT unnest(ts) AS w FROM tk)),
       |scored AS (
       |  SELECT b.doc_id, b.pos,
       |    floor(log2((m.c12 + 0.5) / (l.c1 + 0.5 * vocab.v))
       |          * 1073741824.0) / 1073741824.0 AS logp
       |  FROM bg b
       |  JOIN model m ON b.bigram = m.bigram
       |  JOIN lefts l ON split_part(b.bigram, ' ', 1) = l.w1
       |  CROSS JOIN vocab),
       |lmdoc AS (
       |  SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_bigrams,
       |    floor(-list_reduce(list(logp ORDER BY pos), (a, x) -> a + x)
       |          / count(*) * 1000) / 1000 AS bits_per_bigram
       |  FROM scored GROUP BY doc_id)""".stripMargin

  /** q_lm_score's full-retrain DuckDB mirror — shared verbatim by
    * q_lm_score_incr (one oracle text per result relation).
    */
  private def lmScoreSql: String =
    s"""WITH $lmScoredCtesSql
       |SELECT doc_id, n_bigrams, bits_per_bigram
       |FROM lmdoc ORDER BY doc_id""".stripMargin
}

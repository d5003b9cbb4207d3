package graft

import java.nio.file.{Files, Paths}

/** Generates PLANS.md: formatted physical plans for the flagship
  * queries, with the properties that matter at 100 TB highlighted.
  * Run: `sbt "runMain graft.PlanReport <sfDir> <outFile>"`.
  */
object PlanReport {

  private val Flagship = Seq(
    "q1_agg" -> "Scan-heavy grouped aggregation (TPC-H Q1 shape): filter + 7-column projection must reach the parquet scan; partial aggregation before the exchange.",
    "q5_nation_revenue" -> "6-table star join: all dimensions broadcast; only fact-fact joins shuffle.",
    "q3_top_revenue" -> "Join + agg + top-k: TakeOrderedAndProject, no global sort.",
    "q_join_range" -> "Bounded range join via time-bucket equi-join: a hash join, not a nested loop.",
    "q_dedup_minhash" -> "MinHash+LSH served from the MATERIALIZED signature table (round 6): the pair stage is a parquet scan + band self-join — no SHA/MinHash/tokenizer kernel anywhere in this plan; the corpus pass was paid once at table build.",
    "q_dedup_embed" -> "Embedding near-dup served from the MATERIALIZED sign-bucket table: bucket self-join on bare (id, norm) rows, raw vectors fetched only for the post-blocking cosine verify — no SignBuckets kernel in this plan, NO cartesian/BNL anywhere.",
    "q_ann_ivf" -> "IVF ANN: centroid codebook broadcast; candidate generation equi-joins on the cell id.",
    "q_pipeline_combine" -> "The reference combine pipeline: normalize projection + single dedup exchange.",
    "q_ann_int8" -> "int8-quantized ANN: exact-integer quantized-dot candidate pass (codegen kernel) against the broadcast query set; exact cosine re-ranks only top-8 survivors.",
    "q_ann_pq" -> "Product-quantization ANN: corpus encode is ONE pq_encode projection in the scan stage (zero exchange on the encode side — the codebook is a compiled model parameter); ADC scoring probes 8 lookup tables per pair; exact cosine re-ranks top-8.",
    "q_contamination_bloom" -> "Broadcast-Bloom decontamination: 8 KiB train bitset built by one typed aggregation; eval non-members dropped by the scan-stage probe BELOW the exact confirm join.",
    "q_curation_funnel" -> "The composed curation verdict (lang ∧ quality ∧ repetition ∧ dedup): scan-stage rules + ONE word-stat aggregation + ONE fingerprint window + a doc_id join — no rule re-scans the corpus.",
    "q_ann_codes_served" -> "Stored-index IVF-PQ serving: candidates read ONLY the materialized codes table (no PqEncode/NearestCell on the corpus side — look for PartitionFilters pruning the scan to the probed cells); raw vectors are fetched only for the re-rank survivors.",
    "q_dedup_simhash64" -> "64-bit SimHash with two-clean-block pair blocking (round 8): one scan-stage simhash64 kernel pass, 28 block-pair keys exploded per doc, a single equi self-join on (pair-id, bits1, bits2) — full recall to hamming 6 with ~29x fewer chance candidates than single-byte blocks; no cartesian anywhere.",
    "q_lm_score" -> "Bigram-LM perplexity filter (round 9): scoring is served from the STORED model table (train-once memoized per corpus fingerprint) — no training aggregation in this plan, just the bigram explode left-joined against the stored counts; the per-doc fold is a sort_array + aggregate over collected (pos, logp) structs, order-identical to the DuckDB oracle's list fold.",
    "q_dedup_spans" -> "Substring-span dedup (Lee et al. 2022; round-10 serve): the tokenize→SHA→window-kernel→posexplode pass lives in the STORED fp-partitioned window table (spanWindowsPath, built once per corpus) — this plan must show only parquet scans of that table (no Generate, no SHA/tokenizer kernel); the pair stage is a self-equi-join on the packed 62-bit double-base key, and the gaps-and-islands merge is one window exchange per (pair, diagonal). No cartesian anywhere.",
    "q_dedup_spans_df" -> "df-capped span dedup: consumes the SAME stored window table (zero kernel recompute — the df-cap aggregation and both self-join sides scan one parquet table), with the over-cap hot set broadcast into a left-anti join BEFORE the pair join — the boilerplate guard that bounds per-fingerprint group mass by maxDf^2.",
    "q_dedup_clusters_incr" -> "Incremental cluster fold (round-11 serve): the odd-half batch folds into the even-half labeling with the WHOLE contraction + min-label step computed driver-side (batch-bounded union-find) — the served plan is just the relabel join of the existing labels against a broadcast LocalRelation alt-map plus the csize window; no iterative CC job chain appears anywhere.",
    "q_dedup_spans_incr" -> "Incremental span fold (round-11 serve): the lifecycle (append even half -> derive+persist base spans -> append odd half -> minor compaction -> batch-touching probe -> union) ran ONCE at table build; this plan must be a bare parquet scan of the stored span table plus the output sort — no window kernel, no fp self-join, no islands window. The per-trigger probe shape (batch windows x colliders, bucket-pruned + pushed-In stored reads) is pinned by SpanIngestSpec and measured in SCALING.md's 16-batch span series.",
    "q_top_terms_incr" -> "Salient terms served from MAINTAINED corpus state (round 11): df and n_docs are parquet scans of the incrementally-summed term-stats tables (vocab-bounded, broadcast into the tf join) — the one-shot form's second corpus-wide aggregation (df-from-tf) and its shuffled vocab join are GONE; the only corpus-sized work left is the per-doc tf aggregation + top-3 window, both functions of each doc alone. Faster than the one-shot serve (0.82 vs 1.17 s at sf0.1) before amortizing maintenance.",
    "q_dedup_semantic" -> "SemDeDup cluster-locality pruning (round 11): coarse assignment is the compiled-codebook nearest_cell kernel in the scan stage (no centroid join), the within-cell pair stage is ONE equi-join on the cell id (pair mass bounded by training k, the paper's corpus-proportional dial), and the verdict is a distinct + left join — no cartesian/BNL anywhere, no transitive closure (cell-local prune is the published semantics; q_dedup_embed_clusters is the closure-based sibling).",
    "q_dedup_semantic_incr" -> "Incremental SemDeDup fold (round-11 serve): the lifecycle (append id-ordered halves into the cell-partitioned member table, per-batch verdicts against stored state, mid-lifecycle compaction) ran ONCE at table build; this plan must be a bare parquet scan of the stored verdicts table plus the output sort — no nearest_cell kernel, no cell self-join. The per-trigger probe shape (|batch| x touched cells, partition-pruned) is pinned by SemanticIncrementalSpec.",
    "q_ann_ivfpq_residual" -> "Residual IVF-ADC served from the STORED residual codes table (round 13): no NearestCell/PqEncode over the corpus — cell assignment and the residual encode were paid once at index build; candidates are ADC-scored stored codes in the probed cells (the probe side's dl table is CELL-RELATIVE, one residual-subdist row per (query, probed cell), still driver-sized); exact cosine re-ranks the broadcast survivors.",
    "q_ann_filtered" -> "Hybrid metadata + vector search (round 13): the lang predicate is PUSHED into the documents parquet scan (PushedFilters, (doc_id, lang)-only ReadSchema), the qualifying ids PRE-filter the corpus through a semi-join BEFORE the pair stage, and the exact top-k runs on survivors — recall exact by construction; the 10-row query side broadcasts (the intended BNL, as q_ann_bruteforce).",
    "q_bm25_served" -> "BM25 served from the STORED inverted index (round 14): the corpus text never appears — every documents scan carries the query-side doc_id<5 pushdown; the postings scan shows PartitionFilters [bkt INSET ...] (hive-partition pruning from the collected query-term buckets) AND PushedFilters In(term, ...) (row-group skip over term-sorted files); doc stats and the (n, totlen) scalars read the maintained tables. The one-shot sibling's corpus tokenizer pass is GONE.",
    "q_mmr_diversify" -> "MMR diversified top-k (round 14): the candidate rank is the only corpus-sized stage; the 5-step greedy loop reads localCheckpoint-materialized relations (Scan ExistingRDD) — NO embeddings scan appears in this plan at all, and no step re-executes its predecessors (the naive lineage was a 2^k blowup, measured 5.1 -> 2.1 s at sf0.1).",
    "q_phrase_served" -> "Exact-phrase search served from the STORED positional bigram index (round 15): the corpus text is never tokenized or shingled — the only documents scans carry the query-side doc_id<5 pushdown (phrase derivation); candidates come from the bigram-bucketed stored table behind PartitionFilters [bkt INSET ...] + PushedFilters In(bigram, ...), and occurrence counts are a group-by over that pruned scan. The one-shot sibling's corpus-wide shingle explode is GONE.",
    "q_phrase_trigram" -> "Trigram phrase via POSITIONAL intersection (round 15): a 3-word phrase is its two constituent bigrams at consecutive stored offsets (b1@p JOIN b2@p+1 on doc_id) — the Lucene phrase-query walk over the same stored positional table, two literal-pruned scans + one position-equijoin, integer-exact; no corpus text anywhere except the pushed-down query side.")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = graft.core.GraftSession.local("plans", 4)
    val sb = new StringBuilder
    sb ++= "# PLANS — formatted physical plans of flagship queries\n\n"
    sb ++= s"Generated by `graft.PlanReport` against `$sfDir`. Regenerate after plan-affecting changes.\n"
    sb ++= "`PlanSpec` asserts the load-bearing properties in CI; this file is the human-readable evidence.\n"
    Flagship.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // materialize THIS dataframe's own QueryExecution (count() would
      // spawn a different one): AQE only finalizes join strategies and
      // codegen stage boundaries at runtime — an unexecuted plan prints
      // isFinalPlan=false with none of the decisions that matter here
      df.collect()
      sb ++= s"\n## $name\n\n$note\n\n```\n"
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= "```\n\nFinal adaptive plan (runtime-chosen join strategies, AQE-coalesced exchanges):\n\n```\n"
      sb ++= df.queryExecution.executedPlan.toString
      sb ++= "```\n"
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"PLANS written to $out")
    spark.stop()
  }
}

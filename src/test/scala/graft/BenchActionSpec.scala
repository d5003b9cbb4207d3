package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Pins the round-12 bench-action fix: timing `.count()` measures an
  * OPTIMIZED-AWAY plan for verdict-by-left-join queries, because a
  * bare count lets Catalyst prune final projections and eliminate
  * multiplicity-preserving outer joins (`EliminateOuterJoin` collapsed
  * q_dedup_semantic's count-plan to a bare corpus-scan count — 0.21 s
  * reported vs 139 s real at sf10). The harness times
  * [[Bench.materialize]] (no-op-sink write, full evaluation) instead;
  * this suite keeps the elision demonstrable so a future revert to
  * count() fails a test, not a bench adjudication.
  */
class BenchActionSpec extends SparkSpec {

  /** The SemDeDup verdict shape: left join against a distinct-keyed
    * prune set, verdict = right-side null check.
    */
  private def verdictShaped() = {
    import spark.implicits._
    val base = (0L until 100L).map(i => (i, i % 7)).toDF("id", "cell")
    val pruned = base.as("a").join(base.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("b.id").as("rid")).distinct()
    base.join(pruned, col("id") === col("rid"), "left")
      .select(col("id"), col("rid").isNull.cast("int").as("keep"))
  }

  test("count() elides the verdict join; the full plan keeps it") {
    val df = verdictShaped()
    val full = df.queryExecution.optimizedPlan
    assert(full.collect { case j: Join => j }.nonEmpty,
      "the verdict plan itself must contain the joins")
    val counted = df.groupBy().count().queryExecution.optimizedPlan
    assert(counted.collect { case j: Join => j }.isEmpty,
      "EliminateOuterJoin no longer prunes the count-plan — if this " +
        "fails, re-adjudicate the bench action: count() may have " +
        "become an honest measurement")
  }

  test("Bench.materialize evaluates the real plan (verdict values land)") {
    // noop write must compute every column: run it, then check the
    // same frame's values — a pruned evaluation cannot be observed
    // directly, so this pins that materialize at least executes the
    // full-plan path without error and the frame's verdicts are real
    val df = verdictShaped()
    Bench.materialize(df)
    val kept = df.filter(col("keep") === 1).count()
    // 7 cells over ids 0..99: exactly the minimum id per cell survives
    assert(kept == 7, s"expected 7 encounter-order survivors, got $kept")
  }
}

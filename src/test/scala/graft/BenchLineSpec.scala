package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses BENCH_r{N}.json out of the LAST 2000 chars of
  * stdout; round 2 lost its whole bench signal when full-precision
  * doubles pushed the line start outside that window. This guard
  * renders the line at CURRENT catalog size plus ten phantom queries
  * with pessimistic values and fails the build before the catalog can
  * grow past the window again.
  */
class BenchLineSpec extends AnyFunSuite {

  test("bench line fits the driver tail window at catalog+20 queries") {
    // POLICY for the precision ladder vs the top-k fallback: the line
    // renders at 3→1 decimals, sheds "passes", and then drops the
    // FASTEST queries one at a time ("dropped":N) — never degrading to
    // 0 decimals, which would erase the regression signal for the
    // whole sub-second majority of the catalog. The calibration
    // yardstick outlives everything except errors/noisy: it is what
    // lets a judge tell a code regression from a contended host. When
    // the fallback engages, the assertions below enforce it keeps a
    // meaningful prefix (>30 slowest queries) rather than truncating
    // arbitrarily.
    val names = SparkEntry.queries.keys.toSeq ++
      (1 to 20).map(i => s"q_phantom_padding_$i")
    // pessimistic widths: double-digit seconds for every query, plus
    // every optional field a worst-case run would carry
    val results = names.map(_ -> 12.345678).toMap
    val line = Bench.renderLine(results, "/root/testdata/sf0.1",
      errors = 2, flaky = 1, calib = Some(0.123), noise = Some(12.3))
    assert(line.length < 1970,
      s"bench line ${line.length} chars at ${names.size} queries — " +
        "the precision ladder no longer fits the driver's 2000-char tail")
    assert(line.startsWith("{\"metric\":\"total\""))
    assert(!line.contains("\n"))
    // if the slowest-only fallback engaged it must say what it dropped
    if (line.contains("\"dropped\":")) {
      val kept = "\"q_".r.findAllIn(line).length
      assert(kept > 30, s"kept only $kept queries")
    }
  }

  test("slowest-queries fallback keeps the expensive queries, not a prefix") {
    val names = (1 to 200).map(i => f"q_very_long_synthetic_name_number_$i%03d")
    val results = names.zipWithIndex
      .map { case (n, i) => n -> (if (n.endsWith("117")) 99.9 else i * 0.01) }
      .toMap
    val line = Bench.renderLine(results, "/tmp/x")
    assert(line.length <= 1970)
    assert(line.contains("\"dropped\":"), line.take(120))
    assert(line.contains("q_very_long_synthetic_name_number_117"),
      "slowest query was dropped from the fallback line")
  }

  test("bench line at the real catalog keeps >= 1-decimal resolution") {
    val results = SparkEntry.queries.keys.map(_ -> 1.234567).toMap
    val line = Bench.renderLine(results, "/root/testdata/sf0.1",
      calib = Some(0.123))
    // the ladder's own bound (1970 ≤ the driver's window minus ≥30
    // bytes of tolerance — see renderLine's scaladoc) is the contract
    assert(line.length <= 1970)
    // 100 ms per-query resolution minimum: per-query decimals feed the
    // round-over-round regression check, so the ladder never degrades
    // below 1 decimal — it sheds "passes" and then the fastest few
    // queries instead
    assert(line.contains(":1.2"), line.take(200))
    // the host yardstick must survive at the real catalog: it is the
    // evidence that distinguishes a code regression from a slow host
    // (BENCH_r04/r06 were adjudicated only by controlled re-runs).
    // Worth more than the walls of the few fastest queries it costs.
    assert(line.contains("\"calib\":0.123"),
      s"calib shed at real catalog size (line ${line.length} chars)")
    val dropped = "\"dropped\":(\\d+)".r.findFirstMatchIn(line).map(_.group(1).toInt)
    // Since round 9 the shed tail loses no history — BENCH_full.json
    // (the renderFull sidecar) carries every query at 3 decimals — so
    // the line's one job is keeping the regression-relevant SLOW tail
    // readable inside the driver's capture window. The right invariant
    // is therefore an absolute floor on how many slowest walls survive,
    // not a relative cap on the dropped count: kept ≈ (1970-char budget
    // − fixed overhead) / mean per-entry length, which the catalog's
    // size does NOT move (every dropped-allowance formula tried before
    // — /8 at 94 queries, /7 at 102 — needed retuning the moment a few
    // long-named queries landed, while the kept count sat near 86–87
    // the whole time). 80 leaves ~one row-of-names of headroom for the
    // incremental family's longer names before it would trip.
    val kept = SparkEntry.queries.size - dropped.getOrElse(0)
    assert(kept >= 80,
      s"line keeps only $kept slowest walls at real catalog size " +
        s"(dropped ${dropped.getOrElse(0)}) — slow tail no longer readable")
    // error/flaky signals survive the shed step: inject one and the
    // line must still carry it at full catalog size
    val withErr = Bench.renderLine(results, "/root/testdata/sf0.1", errors = 1)
    assert(withErr.contains("\"errors\":1"))
  }
}

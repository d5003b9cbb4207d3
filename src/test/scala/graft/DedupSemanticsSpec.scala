package graft

/** Semantic checks for the dedup catalog queries: the oracle proves
  * Spark and DuckDB agree; these prove the answer MEANS something —
  * the planted near-duplicates (doc_id + 10000) are actually found,
  * with high similarity scores, and exact dedup groups collapse the
  * planted exact copies.
  */
class DedupSemanticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("minhash LSH recalls planted near-dup pairs with high est_jaccard") {
    val pairs = run("q_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 10000 }
    // 20 planted copies (doc_id % 25) — LSH recall won't be perfect by
    // construction, but must find the clear majority, at high estimate
    assert(planted.length >= 15, s"found only ${planted.length} planted pairs")
    assert(planted.forall(_._3 >= 0.5),
      s"low estimates: ${planted.filter(_._3 < 0.5).mkString(",")}")
  }

  test("jaccard verification scores planted pairs near 1") {
    val pairs = run("q_dedup_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 10000 }
    assert(planted.length >= 15)
    assert(planted.forall(_._3 >= 0.8),
      s"low jaccard: ${planted.filter(_._3 < 0.8).mkString(",")}")
  }

  test("simhash blocking recalls planted pairs at small hamming") {
    val pairs = run("q_dedup_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
    val planted = pairs.filter { case (a, b, _) => b == a + 10000 }
    assert(planted.length >= 12, s"found only ${planted.length}")
    assert(planted.forall(_._3 <= 6))
  }

  test("exact dedup collapses every planted exact copy") {
    val groups = run("q_dedup_exact").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 50 planted copies (doc_id % 10): exactly those fingerprints have
    // n_copies = 2, everything else is unique
    val dups = groups.filter(_._2 == 2)
    assert(dups.length == 50)
    assert(dups.forall(_._3 % 10 == 0)) // first_doc is the original
    assert(groups.forall(_._2 <= 2))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster-
  * formation step after every pairwise dedup stage: LSH/SimHash/embed
  * pipelines emit near-dup PAIRS, but keep-one-per-group curation needs
  * the transitive closure (a~b, b~c ⇒ keep one of {a,b,c}).
  *
  * Algorithm: iterative minimum-label propagation. Every node starts
  * labeled with itself; each round joins labels across the symmetrized
  * edge list and keeps the per-node minimum; convergence when no label
  * shrinks. Rounds = graph diameter. Dup graphs are the favorable case:
  * LSH components are near-cliques (diameter 2–3), so the loop runs
  * 3–4 rounds of plain shuffle joins regardless of corpus size — each
  * round is one hash join + one aggregation on (id, label) pairs, no
  * driver-side data. For adversarial long-chain graphs the
  * two-phase large-star/small-star variant (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) drops
  * rounds to O(log n); the per-round plan shape is identical, so it
  * slots in here if a workload ever needs it.
  *
  * Each round ends in an eager localCheckpoint: it truncates the
  * growing lineage (re-planning cost is quadratic in iteration count
  * otherwise) and doubles as the convergence-count action.
  */
object ConnectedComponents {

  /** Label every node of `edges` (pairs `aCol`, `bCol`) with the
    * minimum node id reachable from it. Returns (`id`, `component`).
    */
  def run(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25): DataFrame = {
    val e = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
    val sym = e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()

    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // Candidate label for each node: min neighbor label this round.
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("pid"), col("label").as("plabel"))
        .groupBy(col("pid")).agg(min(col("plabel")).as("nlabel"))
      val next = labels.join(prop, labels("id") === prop("pid"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          (col("nlabel") < col("label")).as("chg"))
        .localCheckpoint() // eager: truncates lineage, materializes round
      changed = next.filter(col("chg")).count()
      labels = next.drop("chg")
      it += 1
    }
    sym.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    labels.select(col("id"), col("label").as("component"))
  }
}

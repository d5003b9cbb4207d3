package graft

/** Semantic quality of the ANN catalog queries against brute-force
  * ground truth: bucketed variants trade recall for candidate-set size
  * by DESIGN, but the multiband union must dominate the single-band
  * bucket, and every approximate hit must be a true neighbor-ranked
  * result (the verify stage is exact cosine, so reported cosines are
  * exact — only the candidate horizon is approximate).
  */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def top3(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, dir)
      .select("q_id", "n_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("multiband union recall >= single-band bucket recall vs brute force") {
    val exact = top3("q_ann_bruteforce") // top-10 per query, queries 0-4
    val single = top3("q_ann_lsh")       // queries 0-19
    val multi = top3("q_ann_multiband")  // queries 0-19

    // restrict to the brute-force query set; ground truth = its top-10
    val qs = exact.keySet
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = qs.toSeq.map { q =>
        approx.getOrElse(q, Set.empty).count(exact(q).contains).toDouble /
          math.min(3, exact(q).size)
      }
      hits.sum / hits.size
    }
    val rSingle = recall(single)
    val rMulti = recall(multi)
    assert(rMulti >= rSingle,
      s"multiband recall $rMulti < single-band $rSingle")
    assert(rMulti > 0.0, "multiband found nothing from the true top-10")
  }
}

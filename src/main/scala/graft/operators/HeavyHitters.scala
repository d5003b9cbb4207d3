package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter sketch as a typed Aggregator — bounded-state
  * hot-key detection, the primitive behind skew mitigation at scale:
  * finding the keys worth salting ([[SkewJoin]]) normally costs a full
  * groupBy over every distinct key (1e9+ at corpus scale); this keeps
  * `capacity` counters per partial buffer regardless of N or key
  * cardinality, and map-side partials merge associatively.
  *
  * Guarantee (Agarwal et al., "Mergeable Summaries", PODS'12): after
  * any merge tree, every key with true frequency > N/(capacity+1) is in
  * the summary, and each kept counter underestimates by at most
  * N/(capacity+1). So candidates(capacity) ⊇ {keys with freq share >
  * 1/(capacity+1)} — an exact confirm count over just the candidate
  * keys then yields the EXACT set of heavy hitters above any threshold
  * ≥ 1/(capacity+1), which is what q_heavy_hitters hash-checks against
  * the plain GROUP BY...HAVING oracle.
  */
class MisraGries(capacity: Int)(
    implicit bufEnc: Encoder[Map[Long, Long]], outEnc: Encoder[Seq[Long]])
    extends Aggregator[Long, Map[Long, Long], Seq[Long]] {
  require(capacity > 0)

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], key: Long): Map[Long, Long] =
    buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1)
      case None if buf.size < capacity => buf.updated(key, 1L)
      case None =>
        // classic MG step: a miss with a full summary decrements every
        // counter (the new key and one unit of each survivor cancel)
        buf.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  override def merge(b1: Map[Long, Long], b2: Map[Long, Long]): Map[Long, Long] = {
    val combined = b2.foldLeft(b1) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (combined.size <= capacity) combined
    else {
      // keep the capacity largest, offset by the (capacity+1)-th count
      val d = combined.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      combined.flatMap { case (k, c) => if (c > d) Some(k -> (c - d)) else None }
    }
  }

  override def finish(buf: Map[Long, Long]): Seq[Long] = buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[Long, Long]] = bufEnc
  override def outputEncoder: Encoder[Seq[Long]] = outEnc
}

package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k accumulator (SURVEY §2.10's `Aggregator[IN,BUF,OUT]`
  * extension point): keeps the k highest-scoring items per group with a
  * bounded buffer.
  *
  * vs `row_number().over(window) <= k`: the window form shuffles EVERY
  * row to its group's partition and sorts; this aggregator carries at
  * most k items per group through the map-side partial aggregation, so
  * only |groups|·k rows cross the exchange — the right shape when k ≪
  * rows-per-group at 100 TB. Deterministic: ties break by ascending id.
  */
final case class Scored(id: Long, score: Double)

class TopKByScore(k: Int)(implicit bufEnc: Encoder[Seq[Scored]])
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.size < k) (buf :+ a).sorted(ord)
    else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
    else buf

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] = bufEnc
  override def outputEncoder: Encoder[Seq[Scored]] = bufEnc
}

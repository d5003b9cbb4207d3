package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Distributed Bloom filter for broadcast membership prefilters — the
  * 100 TB decontamination shape: build a compact bitset over the TRAIN
  * side's keys with one typed aggregation (map-side partial buffers OR
  * together, so only |partitions| fixed-size bitsets cross the
  * exchange), broadcast the single-row result (m/8 bytes — 8 KiB at
  * m=2¹⁶), and drop non-members of the EVAL side in the scan stage
  * before any shuffle. Bloom filters have NO false negatives, so
  * prefilter + exact-join-confirm returns exactly the exact join's
  * answer — the filter only shrinks the shuffled candidate stream
  * (false-positive rate (1 − e^(−kn/m))^k; ~3·10⁻⁷ at n=400, m=2¹⁶,
  * k=4).
  *
  * Probes use double hashing (Kirsch–Mitzenstein): bit_j = (h1 + j·h2)
  * mod m from two independent 32-bit halves of the row's SHA-256
  * fingerprint — deterministic, engine-portable, and exact in 64-bit
  * integer arithmetic.
  */
final case class BloomHashes(h1: Long, h2: Long)

/** Typed Aggregator building the m-bit Bloom bitset as `array<long>`
  * (m/64 words). Buffers mutate in place; merge ORs word-wise.
  */
class BloomBuild(bits: Int, probes: Int)(implicit bufEnc: Encoder[Array[Long]])
    extends Aggregator[BloomHashes, Array[Long], Array[Long]] {
  require(bits % 64 == 0, "bloom size must pack whole 64-bit words")

  override def zero: Array[Long] = new Array[Long](bits / 64)

  override def reduce(buf: Array[Long], a: BloomHashes): Array[Long] = {
    var j = 0
    while (j < probes) {
      // floorMod: the SQL surface accepts arbitrary longs (hash(),
      // xxhash64() go negative) — a signed % would index out of bounds
      val idx = java.lang.Math.floorMod(a.h1 + j.toLong * a.h2, bits.toLong).toInt
      buf(idx >>> 6) |= 1L << (idx & 63)
      j += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = bufEnc
  override def outputEncoder: Encoder[Array[Long]] = bufEnc
}

/** Codegen'd membership probe: true iff all `probes` double-hashed bits
  * of (h1, h2) are set in the `array<long>` bitset. Runs in the scan
  * stage against the broadcast bitset column — the per-row cost is
  * `probes` word reads, no allocation.
  */
case class BloomMightContain(
    first: Expression, second: Expression, third: Expression,
    bits: Int, probes: Int)
    extends TernaryExpression {
  require(bits % 64 == 0, "bloom size must pack whole 64-bit words")

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires (array<bigint>, bigint, bigint), " +
            s"got ${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(bloom: Any, h1: Any, h2: Any): Any = {
    val arr = bloom.asInstanceOf[ArrayData]
    val a = h1.asInstanceOf[Long]
    val b = h2.asInstanceOf[Long]
    var j = 0
    while (j < probes) {
      val idx = java.lang.Math.floorMod(a + j.toLong * b, bits.toLong).toInt
      if (((arr.getLong(idx >>> 6) >> (idx & 63)) & 1L) == 0L) return false
      j += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, h1, h2) => {
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val hit = ctx.freshName("hit")
      s"""
         |boolean $hit = true;
         |for (int $j = 0; $j < $probes; $j++) {
         |  int $idx = (int) java.lang.Math.floorMod($h1 + (long) $j * $h2, ${bits}L);
         |  if ((($bloom.getLong($idx >>> 6) >> ($idx & 63)) & 1L) == 0L) {
         |    $hit = false; break;
         |  }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BloomFilter {

  /** Default geometry: 2¹⁶ bits (8 KiB broadcast), 4 probes. */
  val DefaultBits = 1 << 16
  val DefaultProbes = 4

  def mightContain(bloom: Column, h1: Column, h2: Column,
      bits: Int = DefaultBits, probes: Int = DefaultProbes): Column =
    graftbridge.column(BloomMightContain(
      graftbridge.expression(bloom), graftbridge.expression(h1),
      graftbridge.expression(h2), bits, probes))

  /** THE canonical (h1, h2) derivation from a SHA-256 hex fingerprint:
    * the first two independent 32-bit hex halves as longs. Build and
    * probe sides MUST derive identically or membership silently breaks
    * with false negatives — every call site uses this helper, none
    * inlines its own.
    */
  def hashColumns(fp: Column): (Column, Column) = {
    import org.apache.spark.sql.functions.{conv, substring}
    import org.apache.spark.sql.types.LongType
    (conv(substring(fp, 1, 8), 16, 10).cast(LongType),
      conv(substring(fp, 9, 8), 16, 10).cast(LongType))
  }
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two bucket ordinals — the clustering
  * key for multi-dimensional data layout.
  *
  * Sorting a corpus by `zorder2(x_bucket, y_bucket)` and cutting it into
  * files gives every file a compact bounding BOX in (x, y), so parquet
  * min/max stats prune predicates on EITHER dimension. A single-column
  * sort only ever prunes its own column: a 100 TB events table laid out
  * by time alone scans everything for a user-only query, while a
  * z-ordered (user_bucket, day) layout prunes both query shapes. This
  * is the same layout idea Delta/Iceberg expose as OPTIMIZE ZORDER BY,
  * built here from a Catalyst expression + repartitionByRange.
  *
  * Inputs are bucket ordinals in [0, 2³¹): the low 32 bits of each long
  * are spread to even (left) / odd (right) bit positions. With the
  * right input below 2³¹ the result stays non-negative, so signed LONG
  * ordering == unsigned z ordering.
  */
object ZOrder {
  def zorder2(x: Column, y: Column): Column =
    graftbridge.column(ZOrderLong(
      graftbridge.expression(x), graftbridge.expression(y)))

  /** Spread the low 32 bits of x to even bit positions (Morton magic). */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

/** `zorder2(x, y)`: 64-bit Morton code of two 32-bit bucket ordinals.
  * Pure bit arithmetic — stays inside whole-stage codegen.
  */
case class ZOrderLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder2 requires (bigint, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.ZOrder.interleave($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

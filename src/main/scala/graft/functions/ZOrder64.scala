package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit Z-order (Morton) key: interleaves the low 32 bits of two
  * non-negative bigint dimensions (x even bit positions, y odd).
  *
  * The data-layout tool for multi-dimensional scans at lake scale: sort
  * (or range-partition) a table by `zorder64(x, y)` ONCE and parquet
  * row-group min/max stats stay tight on BOTH dimensions, so predicates
  * on either column — or a box on both — skip most of the file without
  * maintaining two sort orders. Pure bit math on both engines, so the
  * key itself is oracle-checkable (DuckDB recomputes the interleave with
  * shift/mask arithmetic), and locality is pinned in LayoutSpec.
  *
  * Callers guarantee non-negative inputs (ids, bucketized values); bits
  * above 31 are ignored by construction.
  */
case class ZOrder64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder64.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder64.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(x: Column, y: Column): Column =
    ColumnBridge.column(
      ZOrder64(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** Morton interleave via the standard bit-spread (shift/mask, no loop);
    * shared by interpreted eval and generated code. */
  def interleave(x: Long, y: Long): Long =
    spread(x & 0xffffffffL) | (spread(y & 0xffffffffL) << 1)

  /** Spreads the low 32 bits of v to the even bit positions. */
  private def spread(v0: Long): Long = {
    var v = v0
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8))  & 0x00ff00ff00ff00ffL
    v = (v | (v << 4))  & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2))  & 0x3333333333333333L
    v = (v | (v << 1))  & 0x5555555555555555L
    v
  }
}

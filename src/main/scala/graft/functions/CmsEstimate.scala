package graft.functions

import java.nio.ByteBuffer
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency estimate from a serialized Count-Min sketch.
  *
  * Spark ships the build side (`count_min_sketch(col, eps, conf, seed)`
  * aggregate → binary) but no probe, so this native expression closes the
  * loop: `cms_estimate(sketch, key)` returns the sketch's count estimate
  * for `key`. The CMS guarantee — never an underestimate, and at most
  * `exact + eps·N` over-estimate with probability ≥ confidence — is what
  * makes heavy-hitter queries one streaming-friendly aggregate at 100 TB
  * instead of a full groupBy over every key.
  *
  * Codegen-friendly (no UDF): generated code calls the static helper,
  * which memoizes deserialization per distinct sketch payload so probing
  * k rows against one sketch deserializes once, not k times.
  */
case class CmsEstimate(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary sketch, bigint key), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(sketch: Any, value: Any): Any =
    CmsEstimate.estimate(sketch.asInstanceOf[Array[Byte]], value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, v) => s"graft.functions.CmsEstimate.estimate($s, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(sketch: Column, key: Column): Column =
    ColumnBridge.column(
      CmsEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(key)))

  /** Content-keyed deserialization memo (a probe batch reuses one sketch;
    * the guard bounds the map if many distinct sketches ever flow through). */
  private val cache = new ConcurrentHashMap[ByteBuffer, CountMinSketch]()

  /** Shared by interpreted eval and generated code. */
  def estimate(bytes: Array[Byte], key: Long): Long = {
    val k = ByteBuffer.wrap(bytes)
    var sk = cache.get(k)
    if (sk == null) {
      if (cache.size > 16) cache.clear()
      sk = CountMinSketch.readFrom(bytes)
      cache.put(k, sk)
    }
    sk.estimateCount(java.lang.Long.valueOf(key))
  }
}

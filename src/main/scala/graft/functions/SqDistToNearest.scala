package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Squared distance from an `array<double>` feature vector to the nearest
  * of a fixed set of centroids — the scoring kernel of the trained-model
  * anomaly path (A7/F5), as a native codegen expression.
  *
  * The HOF formulation (`array_min(transform(centers, c =>
  * aggregate(zip_with(f, c, (x,y) => (x-y)²), 0.0, _+_)))`) evaluates
  * interpreted per center per element; this is one compiled double loop.
  * Same left-to-right accumulation per center and the same min fold, so
  * scores are bit-identical.
  *
  * Centers ride along as a plan reference object (equivalent to a
  * broadcast scalar: serialized once per executor).
  */
case class SqDistToNearest(child: Expression, centers: Seq[Seq[Double]])
    extends UnaryExpression {
  require(centers.nonEmpty, "need at least one center")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sqdist_to_nearest"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> features, got ${t.sql}")
  }

  /** A null feature element nulls the result — the HOF formulation's
    * semantics (null poisons every center's sum, `array_min` of nulls is
    * null), NOT a silent 0.0 read. */
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  @transient private lazy val flat: Array[Array[Double]] =
    centers.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (SqDistToNearest.hasNullSlot(arr)) null
    else SqDistToNearest.compute(arr, flat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centers", flat, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      if (nullable)
        s"""if (graft.functions.SqDistToNearest.hasNullSlot($c)) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = graft.functions.SqDistToNearest.compute($c, $ref);
           |}""".stripMargin
      else s"${ev.value} = graft.functions.SqDistToNearest.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): SqDistToNearest =
    copy(child = newChild)
}

object SqDistToNearest {
  /** Shared by interpreted eval and generated code. */
  def hasNullSlot(features: ArrayData): Boolean = {
    var i = 0
    val n = features.numElements()
    while (i < n) { if (features.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Shared by interpreted eval and generated code. A dimensionality
    * mismatch between features and centers fails fast — a truncated
    * partial distance would silently corrupt every score. */
  def compute(features: ArrayData, centers: Array[Array[Double]]): Double = {
    val n = features.numElements()
    var best = Double.PositiveInfinity
    var ci = 0
    while (ci < centers.length) {
      val c = centers(ci)
      if (c.length != n) throw new IllegalArgumentException(
        s"feature vector has $n dims but a center has ${c.length}")
      val d = c.length
      var acc = 0.0
      var i = 0
      while (i < d) {
        val diff = features.getDouble(i) - c(i)
        acc += diff * diff
        i += 1
      }
      // Double.compare = array_min's total order (NaN largest, -0.0 < 0.0)
      if (ci == 0 || java.lang.Double.compare(acc, best) < 0) best = acc
      ci += 1
    }
    best
  }

  def apply(features: Column, centers: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SqDistToNearest(
      ColumnBridge.expression(features.cast("array<double>")), centers))
  }
}

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

  @transient private lazy val flat: Array[Array[Double]] =
    centers.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    SqDistToNearest.compute(input.asInstanceOf[ArrayData], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centers", flat, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.SqDistToNearest.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): SqDistToNearest =
    copy(child = newChild)
}

object SqDistToNearest {
  /** Shared by interpreted eval and generated code. */
  def compute(features: ArrayData, centers: Array[Array[Double]]): Double = {
    val n = features.numElements()
    var best = Double.PositiveInfinity
    var ci = 0
    while (ci < centers.length) {
      val c = centers(ci)
      val d = math.min(n, c.length)
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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-sensitive 64-bit polynomial rolling hash over an array of
  * (already-hashed) token longs: `acc = acc * 31 + h`, with **wrapping**
  * two's-complement arithmetic.
  *
  * Exists as a native Catalyst expression because the equivalent column
  * arithmetic (`aggregate(toks, 0L, (acc, h) => acc * 31 + h)`) overflows
  * Long immediately and Spark 4's default ANSI mode turns that into a
  * runtime `ARITHMETIC_OVERFLOW` — wrapping multiply is exactly what a
  * rolling hash wants, and JVM `Long` arithmetic provides it. Codegen'd,
  * so document fingerprinting stays inside whole-stage codegen.
  *
  * Null tokens are ignored; a null array yields null, an empty array 0L.
  */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "polyhash64"
  override def checkInputDataTypes(): TypeCheckResult =
    HashOps.requireArrayOf(prettyName, child.dataType, LongType)

  override def nullSafeEval(input: Any): Any =
    PolyHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64 {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) acc = acc * 31L + arr.getLong(i)
      i += 1
    }
    acc
  }

  /** Column API: `polyhash64(hashedTokens)` (input: `array<bigint>`). */
  def apply(hashedTokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PolyHash64(ColumnBridge.expression(hashedTokens)))
  }
}

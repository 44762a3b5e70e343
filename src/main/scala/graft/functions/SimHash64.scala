package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash over an array of (already-hashed) token longs.
  *
  * For each of the 64 bit positions, sums +1/−1 across token hashes and
  * keeps the sign — near-identical documents land within a small Hamming
  * distance. Implemented as a native Catalyst expression (not a UDF) with
  * codegen so the dedup pipeline stays inside whole-stage codegen; input is
  * `array<bigint>` (e.g. `transform(tokens, t -> xxhash64(t))`).
  *
  * Null tokens are ignored; an empty array yields 0L; a NULL array
  * yields null (standard null-intolerant expression semantics).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult =
    HashOps.requireArrayOf(prettyName, child.dataType, LongType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column API: `simhash64(hashedTokens)` (input: `array<bigint>`). */
  def apply(hashedTokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashedTokens)))
  }
}

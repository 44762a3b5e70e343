package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass replacements for the dedup family's hottest
  * higher-order-function pipelines. HOF lambdas evaluate interpreted, per
  * element (see SURVEY §4.2 / the Dedup scaladocs); these expressions run
  * the same math as one compiled loop and are **bit-identical** to the
  * formulations they replace — they call the same `XXH64` primitives
  * Spark's `xxhash64` uses (seed 42, per-child chaining) and
  * `UTF8String.concatWs`, so signatures, band keys, and candidate sets do
  * not change (pinned by HashOpsSpec equivalence tests and dd01's
  * exact-answer oracle).
  */
object HashOps {
  private val Seed = 42L
  private val Space = UTF8String.fromString(" ")

  private def hashString(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  /** ≡ `xxhash64(s)`: null child leaves the running hash at the seed. */
  private def hashStringOrNull(s: UTF8String): Long =
    if (s == null) Seed else hashString(s, Seed)

  /** Analysis-time element-type check shared by the three expressions —
    * `compute` reads typed values straight out of the array buffers, so a
    * mistyped input would yield garbage, not an error. */
  private[functions] def requireArrayOf(name: String, t: DataType,
                                        elem: DataType): TypeCheckResult =
    t match {
      case ArrayType(e, _) if e == elem => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<${elem.sql.toLowerCase}>, got ${other.sql}")
    }

  // ------------------------------------------------------- shingle hashes —

  /** ≡ the HOF shingling in `Dedup.shingleHashes` (minus the trailing
    * `array_distinct`, which stays a built-in):
    * `size<k` → `[xxhash64(concat_ws(" ", toks))]`, else one
    * `xxhash64(concat_ws(" ", slice(toks, i, k)))` per window. */
  def computeShingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    def window(start: Int, len: Int): Long = {
      // concat_ws skips null elements, exactly like the built-in
      val parts = new Array[UTF8String](len)
      var i = 0
      while (i < len) { parts(i) = toks.getUTF8String(start + i); i += 1 }
      hashString(UTF8String.concatWs(Space, parts: _*), Seed)
    }
    if (n < k) new GenericArrayData(Array[Any](window(0, n)))
    else {
      val out = new Array[Long](n - k + 1)
      var i = 0
      while (i < n - k + 1) { out(i) = window(i, k); i += 1 }
      new GenericArrayData(out)
    }
  }

  // ------------------------------------------------------ minhash sig —

  /** ≡ `array((0 until numHashes).map(i => array_min(transform(shingles,
    * h => xxhash64(h, lit(i))))))`: per shingle the base hash
    * `hashLong(h, 42)` is shared by all indices (that is how `xxhash64`
    * chains its children), then `hashInt(i, base)` per index — one pass
    * over the shingles instead of `numHashes` interpreted traversals.
    * Empty input → all-null signature (`array_min` of empty is null). */
  def computeMinHash(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      // null shingle ≡ xxhash64(null, i) = hashInt(i, seed)
      val base = if (shingles.isNullAt(j)) Seed else XXH64.hashLong(shingles.getLong(j), Seed)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashInt(i, base)
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  // ------------------------------------------------------- token hashes —

  /** ≡ `transform(tokens, t => xxhash64(t))`. */
  def computeTokenHashes(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = hashStringOrNull(tokens.getUTF8String(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** `array<string>` tokens → one 64-bit hash per word `k`-shingle. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"shingle width must be positive, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def checkInputDataTypes(): TypeCheckResult =
    HashOps.requireArrayOf(prettyName, child.dataType, StringType)

  override def nullSafeEval(input: Any): Any =
    HashOps.computeShingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.computeShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(tokens: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), k))
  }
}

/** `array<bigint>` shingle hashes → fixed-length MinHash signature. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0, s"signature length must be positive, got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult =
    HashOps.requireArrayOf(prettyName, child.dataType, LongType)

  override def nullSafeEval(input: Any): Any =
    HashOps.computeMinHash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.computeMinHash($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(shingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))
  }
}

/** `array<string>` → per-element `xxhash64` (SimHash / fingerprint input). */
case class XxHash64Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xxhash64_array"
  override def checkInputDataTypes(): TypeCheckResult =
    HashOps.requireArrayOf(prettyName, child.dataType, StringType)

  override def nullSafeEval(input: Any): Any =
    HashOps.computeTokenHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.computeTokenHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): XxHash64Array =
    copy(child = newChild)
}

object XxHash64Array {
  def apply(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(XxHash64Array(ColumnBridge.expression(tokens)))
  }
}

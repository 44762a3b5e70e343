package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, PolyHash64, SimHash64}

/** Spark session extension registering graft's native expressions in the
  * SQL function registry, so `spark.sql("SELECT simhash64(...)")` works
  * the same as the Column API.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * standard injection point for a library shipping Catalyst extensions.
  * Every graft OPERATOR lands on built-in plans (SURVEY §4.2); the one
  * injected optimizer rule ([[graft.plans.TextMetaRewrite]]) is a
  * contract-scoped scan-width optimization, itself opt-in via
  * `spark.graft.textMetaRewrite=true`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Reject wrong arity at analysis time — positional `children` access
    * alone would silently drop extra arguments (`simhash64(a, b)` ≠ an
    * error). */
  private def arity(name: String, n: Int)(children: Seq[Expression]): Seq[Expression] = {
    if (children.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name, "expectedNum" -> n.toString,
          "actualNum" -> children.length.toString, "docroot" -> ""))
    children
  }
  private def unary(name: String)(children: Seq[Expression]): Expression =
    arity(name, 1)(children).head

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.TextMetaRewrite)
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(arr) - 64-bit SimHash of an array<bigint> of token hashes."),
      (children: Seq[Expression]) => SimHash64(unary("simhash64")(children))))
    ext.injectFunction((
      FunctionIdentifier("polyhash64"),
      info("polyhash64", "polyhash64(arr) - order-sensitive wrapping polynomial rolling hash of an array<bigint>."),
      (children: Seq[Expression]) => PolyHash64(unary("polyhash64")(children))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two array<double> vectors."),
      (children: Seq[Expression]) => {
        // coerce SQL literal arrays (decimal/int elements) to
        // array<double>, as the Column-API call sites do upstream — but
        // ONLY numeric arrays: an unconditional cast would turn e.g.
        // array<string> into all-NULL doubles, which compute() skips,
        // returning a plausible-looking wrong result instead of an
        // analysis error (non-numeric inputs fall through to
        // DotProduct.checkInputDataTypes, which rejects them)
        import org.apache.spark.sql.types.{ArrayType, DoubleType, NumericType}
        val cs = arity("dot_product", 2)(children).map { c =>
          if (c.resolved) c.dataType match {
            case ArrayType(DoubleType, _) => c
            case ArrayType(_: NumericType, _) =>
              org.apache.spark.sql.catalyst.expressions.Cast(
                c, ArrayType(DoubleType))
            case _ => c
          } else c
        }
        DotProduct(cs.head, cs(1))
      }))
  }
}

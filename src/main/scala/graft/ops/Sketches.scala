package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the "runtime filter" pattern, made explicit.
  *
  * At 100 TB the dominant cost of a selective fact⋈dim join is shuffling
  * fact rows that will never match. A Bloom filter built over the build
  * side's join keys is a few-KB index artifact that drops the bulk of
  * those rows AT THE SCAN, before the exchange; because Bloom filters
  * have no false negatives, following it with the exact join preserves
  * the answer bit-for-bit (false positives are eliminated by the join
  * itself). This is exactly how Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) materializes its
  * injected filters — here the build/probe is explicit so the plan shape
  * does not depend on the optimizer's stats heuristics.
  */
object Sketches {

  /** Distributed Bloom build over `df(col)` (long keys): one aggregate
    * pass over the build side; only the serialized sketch (numBits/8
    * bytes — never data rows) returns to the driver, where it ships with
    * the probe-side plan like any broadcast index artifact. */
  def bloomBytes(df: DataFrame, col: String, expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = df.stat.bloomFilter(col, math.max(expectedItems, 1L), fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Codegen Bloom probe (`BloomFilterMightContain`) of a bigint column
    * against a serialized sketch literal. No false negatives: a
    * `filter(mightContain(...))` ahead of a join keeps every true match
    * while dropping ~(1-fpp) of the non-matching rows pre-shuffle. */
  def mightContain(bloom: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(Literal(bloom, BinaryType),
      ColumnBridge.expression(value)))
}

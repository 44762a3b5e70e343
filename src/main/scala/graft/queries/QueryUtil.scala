package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-facing query catalog.
  *
  * Oracle-exactness conventions (the driver hash-compares our parquet
  * against DuckDB 1.0 on identical inputs):
  *
  *  - **Money sums**: floating sums are order-dependent, and Spark's
  *    partial-aggregation order differs from DuckDB's sequential scan. So
  *    money columns are summed as integer cents — `round(x*100)::long` is
  *    bit-identical per row in both engines (same IEEE double in, same
  *    half-away-from-zero rounding), and integer sums are exact. The
  *    result is divided back to currency at the end.
  *  - **Integer outputs**: always cast to `long` on both sides (Spark
  *    `row_number` is int32, DuckDB's is int64; DuckDB `SUM(BIGINT)` is
  *    int128 — both are normalized to int64).
  *  - **Raw doubles** (pass-through column values, `min`/`max`) are
  *    bit-identical and safe to emit unrounded; *computed* doubles are
  *    either derived from exact integers (safe) or rounded.
  *  - **Row order**: every query ends in a deterministic total `orderBy`,
  *    mirrored by `ORDER BY` in the oracle.
  */
object QueryUtil {
  /** Signature of a driver-contract query: (session, testdata dir) → result. */
  type Q = (SparkSession, String) => DataFrame

  /** Signature of a one-time index build (bucketed tables, persisted
    * models, quantizers) that catalog queries amortize: the bench runs
    * and reports these separately so build cost is never silently
    * attributed to whichever query happens to run first. */
  type B = (SparkSession, String) => Unit

  /** Money double → exact integer cents (see class doc). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact money sum via integer cents, back to currency units (double). */
  def sumMoney(c: Column): Column = sum(cents(c)) / 100.0

  /** DuckDB-side twin of [[sumMoney]]: exact money sum of expression `x`. */
  def sqlSumMoney(x: String): String =
    s"CAST(SUM(CAST(round(($x)*100) AS BIGINT)) AS BIGINT)/100.0"

  /** Sketch-quality bit: |est − exact| / exact ≤ bound → 1, else 0. One
    * shared definition so the bound semantics can't silently diverge
    * between the batch sketch family (sk*) and its streaming twins (st*).
    * A zero exact value can't anchor a relative bound, so it is handled
    * explicitly: the bit is 1 iff the estimate is also (exactly) zero —
    * without the guard the ratio is NaN and a PERFECT estimate of an
    * empty set would read as a red quality bit. */
  def withinPct(est: Column, exact: Column, bound: Double): Column =
    when(exact.cast("double") === 0.0,
        when(est.cast("double") === 0.0, 1L).otherwise(0L))
      .otherwise(
        when(abs(est.cast("double") - exact.cast("double")) / exact.cast("double") <= bound, 1L)
          .otherwise(0L))
}

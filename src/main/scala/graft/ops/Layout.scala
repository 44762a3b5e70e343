package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder64

/** Multi-dimensional data layout: Z-order clustering.
  *
  * A 100 TB table can hold only ONE sort order, and a sort on column A
  * leaves predicates on column B reading every row group. Z-order
  * clustering spends that one order on BOTH dimensions: rank-bucketize
  * each column (so dimensions of wildly different ranges contribute
  * comparable bits), interleave the bucket bits into a Morton key, and
  * sort by it. Row-group min/max stats then stay tight on either
  * column, so single-column predicates AND boxes skip most of the file
  * — the `OPTIMIZE ZORDER BY` layout tool of lakehouse engines,
  * expressed as plain Spark: a quantile sketch for boundaries, a native
  * codegen interleave expression, and `repartitionByRange`+sort.
  *
  * Bucket boundaries come from `approxQuantile` (a quantile-sketch
  * aggregate; only n-1 doubles return to the driver — an index
  * artifact, like the IVF quantizer), so rank-normalization never
  * shuffles the data and the bucket id is one codegen'd array scan per
  * row.
  */
object Layout {

  /** Rank-bucket id (0..nBuckets-1) of `col`, from sketch-derived
    * boundaries: the count of boundaries ≤ value. */
  def rankBucket(df: DataFrame, colName: String, nBuckets: Int): Column = {
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = df.stat.approxQuantile(colName, probs, 0.001)
    size(filter(lit(bounds), b => b <= col(colName).cast("double"))).cast("long")
  }

  /** `df` clustered by the Z-order of two rank-bucketized dimensions:
    * range-partitioned then sorted within partitions by the Morton key,
    * so every output file covers a tight z-range (⇒ tight min/max on
    * both source columns). */
  def zorderBy(df: DataFrame, colX: String, colY: String,
               nBuckets: Int = 64, numPartitions: Int = 0): DataFrame = {
    val z = ZOrder64(rankBucket(df, colX, nBuckets),
      rankBucket(df, colY, nBuckets)).as("__z")
    val keyed = df.withColumn("__z", z)
    val parted =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col("__z"))
      else keyed.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }
}

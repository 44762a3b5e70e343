package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distance-to-centroid anomaly scoring (reference A7/F5,
  * `InvoicePipeline.scala:216-236` — four near-identical copies collapse
  * to one generic implementation here).
  *
  * Centers are embedded as a literal array in the plan (equivalent to an
  * explicit broadcast: serialized once per executor, not per task like the
  * reference's closure capture). The min-sqdist is computed with
  * higher-order functions — no UDF, stays in codegen.
  */
object Scoring {

  /** Squared distance from a feature array to the nearest of `centers`. */
  def sqDistToNearest(features: Column, centers: Seq[Seq[Double]]): Column = {
    val centersCol = array(centers.map(c => typedlit(c)): _*)
    array_min(transform(centersCol, c =>
      aggregate(zip_with(features, c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)))
  }

  /** Anomaly predicate: nearest-centroid sqdist above threshold. */
  def isAnomaly(features: Column, centers: Seq[Seq[Double]], threshold: Double): Column =
    sqDistToNearest(features, centers) > threshold

  /** Score a featurized frame: adds `dist` and `is_anomaly`. */
  def score(df: DataFrame, featureCols: Seq[String],
            centers: Seq[Seq[Double]], threshold: Double): DataFrame = {
    val features = array(featureCols.map(c => col(c).cast("double")): _*)
    df.withColumn("dist", sqDistToNearest(features, centers))
      .withColumn("is_anomaly", (col("dist") > threshold).cast("long"))
  }
}

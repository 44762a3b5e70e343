package graft.ml

import org.apache.spark.ml.clustering.{BisectingKMeans, BisectingKMeansModel, KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model training — the reference's k-sweep + elbow + threshold
  * calibration (reference `train.scala:54-66`, `Clustering.scala:125-144`)
  * on the modern `spark.ml` DataFrame API.
  */
object Training {

  /** Assemble feature columns into an ml `Vector` column `features`. */
  def assemble(df: DataFrame, featureCols: Seq[String]): DataFrame =
    df.withColumn("features",
      array_to_vector(array(featureCols.map(c => col(c).cast("double")): _*)))

  /** k-sweep KMeans training (reference A10, `train.scala:55-59`): fit one
    * model per k, return (k, model, cost). Cost = within-set sum of squared
    * distances (`summary.trainingCost`, the `computeCost` equivalent). */
  def kMeansSweep(df: DataFrame, ks: Seq[Int], seed: Long = 1L,
                  maxIter: Int = 20, initMode: String = "k-means||"): Seq[(Int, KMeansModel, Double)] = {
    val cached = df.cache()
    try ks.map { k =>
      val m = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
        .setInitMode(initMode)
        .setFeaturesCol("features").fit(cached)
      (k, m, m.summary.trainingCost)
    } finally cached.unpersist()
  }

  /** BisectingKMeans twin (reference `trainBisecting.scala:55-59`). */
  def bisectingSweep(df: DataFrame, ks: Seq[Int], seed: Long = 1L,
                     maxIter: Int = 20): Seq[(Int, BisectingKMeansModel, Double)] = {
    val cached = df.cache()
    try ks.map { k =>
      val m = new BisectingKMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
        .setFeaturesCol("features").fit(cached)
      (k, m, m.summary.trainingCost)
    } finally cached.unpersist()
  }

  /** Elbow selection, *documented* semantics: smallest index i (≥1) with
    * `cost(i)/cost(i-1) > ratio`, else the last. (The reference's
    * implementation has an off-by-one — it returns i+1 and then indexes
    * models by it, `Clustering.scala:125-136`; we deliberately implement
    * the documented intent. Pinned in ElbowSpec.) */
  def elbowSelection(costs: Seq[Double], ratio: Double): Int = {
    val i = (1 until costs.size).find(i => costs(i) / costs(i - 1) > ratio)
    i.getOrElse(costs.size - 1)
  }

  /** Anomaly threshold: the `rank`-th largest squared distance to the
    * assigned centroid over the training set (reference A5,
    * `train.scala:45-46`). Exact top-k via TakeOrderedAndProject; at
    * calibration-set sizes beyond memory use `approxQuantile`. */
  def threshold(distances: DataFrame, distCol: String, rank: Int): Double = {
    import distances.sparkSession.implicits._
    val top = distances.select(col(distCol).cast("double"))
      .orderBy(col(distCol).desc).limit(rank)
    top.agg(min(col(distCol))).as[Double].head()
  }
}

package graft.ml

import java.nio.file.{Files, Paths}

/** Model + threshold artifact persistence — the reference's
  * train→save→load→score contract (model dirs at `train.scala:42` loaded at
  * `InvoicePipeline.scala:178-193`; one-line threshold text file written at
  * `Clustering.scala:138-144` and re-read with
  * `sc.textFile(file).map(_.toDouble).first()`).
  *
  * Models use the `spark.ml` writer (parquet + JSON metadata — a
  * distributed artifact readable by any cluster). The threshold is a
  * driver-side scalar, so it is plain file IO here, not a 20-partition
  * Spark job like the reference (`InvoicePipeline.scala:180` — 20
  * partitions for a one-line file is pure overhead).
  */
object Persistence {

  def saveThreshold(path: String, threshold: Double): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, threshold.toString)
  }

  def loadThreshold(path: String): Double =
    Files.readString(Paths.get(path)).trim.toDouble

  /** Where session-local model artifacts live (scratch, not checked in). */
  def artifactDir(key: String): String =
    new java.io.File(s"target/models/${key.replaceAll("[^A-Za-z0-9._-]", "_")}")
      .getAbsolutePath
}

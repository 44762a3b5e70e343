package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for specs — one JVM-wide session, small local parallelism. */
object SparkSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.graft.textMetaRewrite", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val Sf = "/root/testdata/sf0.001"
}

abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSuite.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
  def sf: String = SparkSuite.Sf

  /** Total shuffle-write records observed while `body` runs (listener-bus
    * events are async, so poll until the counter is stable). Shared by
    * the probe-shuffle pins (DedupSpec, StreamSpec). */
  protected def shuffleRecords(body: => Unit): Long = {
    val recs = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics)
          .foreach(m => recs.addAndGet(m.shuffleWriteMetrics.recordsWritten): Unit)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var prev = -1L
      var cur = recs.get()
      var spins = 0
      while (cur != prev && spins < 50) {
        prev = cur; Thread.sleep(200); cur = recs.get(); spins += 1
      }
      cur
    } finally spark.sparkContext.removeSparkListener(l)
  }
}

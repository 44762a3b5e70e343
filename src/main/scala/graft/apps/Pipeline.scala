package graft.apps

import org.apache.spark.ml.clustering.{BisectingKMeansModel, KMeansModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.etl.InvoiceFeaturizer
import graft.ml.{Persistence, Scoring}
import graft.sources.PurchaseCsv
import graft.stream.{InvoiceStateMachine, PurchaseLine, Router}

/** The reference's online pipeline (`InvoicePipeline.main`,
  * `InvoicePipeline.scala:31-154`) as one Structured Streaming
  * application over a kafka-shaped `(key, value)` record stream:
  *
  *  - F1 invalid lines → `facturas_erroneas`
  *  - F2 cancelled invoices → dedup → 8 min/1 min sliding count →
  *    `cancelaciones`
  *  - F4 good lines → parse → stateful per-invoice aggregate
  *    (delete-on-idle ≈ one trigger) → anomaly scoring against BOTH
  *    persisted models/thresholds → `anomalias_kmeans` /
  *    `anomalias_bisect_kmeans`, as JSON payloads
  *
  * Sinks are parquet directories under `outDir` (swap for
  * `format("kafka")` 1:1 against a broker); the source is a file stream
  * over kafka-shaped parquet (swap for `StreamSources.kafkaShaped`).
  *
  * Usage: `runMain graft.apps.Pipeline <recordsDir> <kmModelDir>
  * <kmThresholdFile> <bisModelDir> <bisThresholdFile> <outDir> [--once]`
  * — `--once` processes all available input and exits (demo/CI); the
  * default runs 20-second triggers like the reference.
  */
object Pipeline {

  def main(args: Array[String]): Unit = {
    require(args.length >= 6, "usage: Pipeline <recordsDir> <kmModelDir> " +
      "<kmThresholdFile> <bisModelDir> <bisThresholdFile> <outDir> [--once]")
    val Array(recordsDir, kmDir, kmThr, bisDir, bisThr, outDir) = args.take(6)
    val once = args.contains("--once")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-invoice-pipeline")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = run(spark, recordsDir, kmDir, kmThr, bisDir, bisThr, outDir, once)
    if (once) queries.foreach(_.awaitTermination())
    else spark.streams.awaitAnyTermination()
    spark.stop()
  }

  /** Build and start the four branch queries; factored out so the
    * end-to-end spec drives the same code. */
  def run(spark: SparkSession, recordsDir: String, kmDir: String, kmThr: String,
          bisDir: String, bisThr: String, outDir: String,
          once: Boolean): Seq[StreamingQuery] = {
    import spark.implicits._

    // models + thresholds load once on the driver (ref :46-47); centers
    // enter the plans as literals (broadcast with the plan)
    val kmCenters = KMeansModel.load(kmDir).clusterCenters.map(_.toArray.toSeq).toSeq
    val kmThreshold = Persistence.loadThreshold(kmThr)
    val bisCenters = BisectingKMeansModel.load(bisDir).clusterCenters.map(_.toArray.toSeq).toSeq
    val bisThreshold = Persistence.loadThreshold(bisThr)

    val schema = StructType(Seq(
      StructField("key", StringType), StructField("value", StringType)))
    def records: DataFrame =
      spark.readStream.schema(schema).parquet(recordsDir)
    val trigger = if (once) Trigger.AvailableNow() else Trigger.ProcessingTime("20 seconds")
    def sink(df: DataFrame, name: String) = df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$outDir/$name")
      .option("checkpointLocation", s"$outDir/_checkpoints/$name")
      .trigger(trigger)
    // update-mode branches (stateful operators re-emit on update) cannot
    // use the append-only file sink directly — append each update batch
    def updateSink(df: DataFrame, name: String) = df.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(s"$outDir/$name")
      }
      .option("checkpointLocation", s"$outDir/_checkpoints/$name")
      .trigger(trigger)

    // F1: malformed lines, routed raw (ref :61-62)
    val classified = Router.classified(records)
    val qInvalid = sink(
      classified.filter($"route" === "invalid").select($"key", $"value"),
      "facturas_erroneas").start()

    // F2 + A2 + A3: cancelled → per-key dedup within the watermark horizon
    // (the streaming form of the reference's per-batch distinct) →
    // processing-time 8 min/1 min sliding count (ref :68-80)
    val cancelled = classified.filter($"route" === "cancelled")
      .select($"key", current_timestamp().as("ts"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("key")
      .groupBy(window($"ts", "8 minutes", "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w_start"), $"n")
    val qCancel = updateSink(cancelled, "cancelaciones").start()

    // F4 + P7 + A4 + F5 + P9: good lines → typed purchases → stateful
    // invoice aggregate → both anomaly branches as JSON payloads
    // (ref :133-148)
    val purchases = toPurchaseLines(
      PurchaseCsv.parseLines(Router.goodRecords(records).select($"value")))
    val idleMs = if (once) 0L else 20000L // delete-on-idle ≈ one trigger
    val aggs = InvoiceStateMachine(purchases, idleTimeoutMs = idleMs).toDF()
    def anomalies(centers: Seq[Seq[Double]], threshold: Double): DataFrame =
      Scoring.score(aggs, InvoiceFeaturizer.FeatureCols.map(featureCol), centers, threshold)
        .filter($"is_anomaly" === 1L)
        .select($"invoice_no".as("key"),
          to_json(struct($"invoice_no", $"avg_unit_price", $"min_unit_price",
            $"max_unit_price", $"time_of_day", $"number_items", $"dist")).as("value"))
    val qKm = updateSink(anomalies(kmCenters, kmThreshold), "anomalias_kmeans").start()
    val qBis = updateSink(anomalies(bisCenters, bisThreshold), "anomalias_bisect_kmeans").start()

    Seq(qInvalid, qCancel, qKm, qBis)
  }

  /** InvoiceAgg column name for a training feature-column name (the agg
    * emits `time_of_day`/`number_items`; training used `time`/
    * `number_items` on the featurized frame). */
  private def featureCol(name: String): String =
    if (name == "time") "time_of_day" else name

  /** Parsed purchase columns → typed `PurchaseLine`s (stream leg of P7/P8:
    * the exact projection the batch featurizer derives from the same
    * fields). Unparseable dates fall back to the reference's −1 hour. */
  private def toPurchaseLines(parsed: DataFrame) = {
    val spark = parsed.sparkSession
    import spark.implicits._
    val ts = InvoiceFeaturizer.parseInvoiceDate($"InvoiceDate")
    parsed
      .filter($"InvoiceNo".isNotNull && $"Quantity".isNotNull && $"UnitPrice".isNotNull)
      .select(
        $"InvoiceNo".as("invoiceNo"),
        $"Quantity".cast("long").as("quantity"),
        $"UnitPrice".as("unitPrice"),
        graft.queries.QueryUtil.cents($"UnitPrice").as("unitPriceCents"),
        coalesce(hour(ts) * 60 + minute(ts), lit(-60)).as("minuteOfDay"),
        ($"CustomerID".isNotNull && trim($"CustomerID") =!= "").as("hasCustomer"))
      .as[PurchaseLine]
  }
}

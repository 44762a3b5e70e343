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
  * `InvoicePipeline.scala:31-154`) as a Structured Streaming application
  * over a kafka-shaped `(key, value)` record stream:
  *
  *  - F1 invalid lines → `facturas_erroneas`
  *  - F2 cancelled invoices → dedup → 8 min/1 min sliding count →
  *    `cancelaciones`
  *  - F4 good lines → parse → stateful per-invoice aggregate
  *    (delete-on-idle ≈ one trigger) → anomaly scoring against BOTH
  *    persisted models/thresholds → `anomalias_kmeans` /
  *    `anomalias_bisect_kmeans`, as JSON payloads
  *
  * **Single-pass topology**: the raw source is scanned ONCE per trigger.
  * The reference starts four independently-filtered consumers over the
  * same stream (4× source reads); here one router query classifies each
  * record once and fans the three routes out in one `foreachBatch`
  * ([[graft.stream.Router]]'s shape), staging the stateful routes as tiny
  * parquet streams that two downstream queries consume:
  *
  * {{{
  *   records ─ route (1 scan) ─┬─ invalid  → facturas_erroneas
  *                             ├─ cancelled → _staged/cancelled ─ window → cancelaciones
  *                             └─ good      → _staged/good ─ state machine ─┬─ kmeans sink
  *                                                           (1 fold)       └─ bisecting sink
  * }}}
  *
  * Both anomaly branches share ONE state machine and one scan — scoring
  * is stateless column math per emission, so the two models are applied
  * inside the same `foreachBatch`. The staging hop costs one extra
  * trigger of latency on the stateful routes and buys: one source scan
  * (vs 4), one state store (vs 2), and downstream inputs that are
  * already filtered to a fraction of the source volume — at 100 TB/day
  * the difference between reading the firehose once and four times.
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

  /** Build and start the branch queries (router + 2 stateful consumers);
    * factored out so the end-to-end spec drives the same code. In `once`
    * mode the router drains first, then the staged consumers — three
    * `AvailableNow` queries back-to-back; in continuous mode all three
    * run concurrently (the staged routes ride one trigger behind). */
  def run(spark: SparkSession, recordsDir: String, kmDir: String, kmThr: String,
          bisDir: String, bisThr: String, outDir: String,
          once: Boolean): Seq[StreamingQuery] =
      // state-store partition count pinned per StreamRunner.StatePartitions
      // (captured at each start(); decoupled from the session's batch
      // shuffle setting and therefore from core count)
      graft.stream.StreamRunner.pinnedStatePartitions(spark) {
    import spark.implicits._

    // models + thresholds load once on the driver (ref :46-47); centers
    // enter the plans as literals (broadcast with the plan)
    val kmCenters = KMeansModel.load(kmDir).clusterCenters.map(_.toArray.toSeq).toSeq
    val kmThreshold = Persistence.loadThreshold(kmThr)
    val bisCenters = BisectingKMeansModel.load(bisDir).clusterCenters.map(_.toArray.toSeq).toSeq
    val bisThreshold = Persistence.loadThreshold(bisThr)

    val schema = StructType(Seq(
      StructField("key", StringType), StructField("value", StringType)))
    val staged = s"$outDir/_staged"
    Seq(s"$staged/cancelled", s"$staged/good")
      .foreach(d => new java.io.File(d).mkdirs())
    val trigger = if (once) Trigger.AvailableNow() else Trigger.ProcessingTime("20 seconds")
    // update-mode branches (stateful operators re-emit on update) cannot
    // use the append-only file sink directly — write each update batch
    // idempotently (foreachBatch is at-least-once; see writeBatch)
    def updateSink(df: DataFrame, name: String) = df.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, s"$outDir/$name", batchId)
      }
      .option("checkpointLocation", s"$outDir/_checkpoints/$name")
      .trigger(trigger)

    // ONE pass over the raw source: classify each record once, fan all
    // three routes out of the same cached batch (F1 ∘ F2 ∘ F4). The
    // invalid route is final output; cancelled/good are staged for the
    // stateful consumers below.
    val qRoute = Router.classified(spark.readStream.schema(schema).parquet(recordsDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.cache()
        try {
          writeBatch(cached.filter(col("route") === "invalid")
            .select(col("key"), col("value")), s"$outDir/facturas_erroneas", batchId)
          // per-batch distinct (A2, ref :68-71) + arrival timestamp for
          // the processing-time window
          writeBatch(graft.stream.CancellationWindow.perBatchDistinct(
              cached.filter(col("route") === "cancelled").select(col("key")), "key")
            .withColumn("ts", current_timestamp()), s"$staged/cancelled", batchId)
          writeBatch(cached.filter(col("route") === "good")
            .select(col("key"), col("value")), s"$staged/good", batchId)
        } finally cached.unpersist()
      }
      .option("checkpointLocation", s"$outDir/_checkpoints/route")
      .trigger(trigger)
      .start()
    if (once) qRoute.awaitTermination() // drain before the consumers snapshot

    // F2 + A2 + A3: staged cancelled keys (already per-batch deduped) →
    // dedup within the watermark horizon → 8 min/1 min sliding count
    // (ref :68-80). Input volume here is the cancelled fraction only.
    val cancelledSchema = StructType(Seq(StructField("key", StringType),
      StructField("ts", org.apache.spark.sql.types.TimestampType)))
    // `b*` glob: IdempotentSink publishes per-batch DIRECTORIES; the glob
    // is re-resolved each trigger, picking up new batches as they commit
    val cancelled = spark.readStream.schema(cancelledSchema).parquet(s"$staged/cancelled/b*")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("key")
      .groupBy(window($"ts", "8 minutes", "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w_start"), $"n")
    val qCancel = updateSink(cancelled, "cancelaciones").start()

    // F4 + P7 + A4 + F5 + P9: staged good lines → typed purchases → ONE
    // stateful invoice aggregate, scored against BOTH models in the same
    // foreachBatch (scoring is stateless column math over the emitted
    // updates — it needs no second state store or source scan)
    val purchases = toPurchaseLines(PurchaseCsv.parseLines(
      spark.readStream.schema(schema).parquet(s"$staged/good/b*").select($"value")))
    val idleMs = if (once) 0L else 20000L // delete-on-idle ≈ one trigger
    def anomalies(aggs: DataFrame, centers: Seq[Seq[Double]], threshold: Double): DataFrame =
      Scoring.score(aggs, InvoiceFeaturizer.FeatureCols.map(featureCol), centers, threshold)
        .filter(col("is_anomaly") === 1L)
        .select(col("invoice_no").as("key"),
          to_json(struct(col("invoice_no"), col("avg_unit_price"), col("min_unit_price"),
            col("max_unit_price"), col("time_of_day"), col("number_items"), col("dist"))).as("value"))
    val qAnomalies = InvoiceStateMachine(purchases, idleTimeoutMs = idleMs).toDF()
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.cache()
        try {
          writeBatch(anomalies(cached, kmCenters, kmThreshold),
            s"$outDir/anomalias_kmeans", batchId)
          writeBatch(anomalies(cached, bisCenters, bisThreshold),
            s"$outDir/anomalias_bisect_kmeans", batchId)
        } finally cached.unpersist()
      }
      .option("checkpointLocation", s"$outDir/_checkpoints/anomalias")
      .trigger(trigger)
      .start()

    Seq(qRoute, qCancel, qAnomalies)
  }

  /** See [[graft.stream.IdempotentSink]] — foreachBatch is at-least-once,
    * so every sink in this app commits batches through the idempotent
    * staging/rename protocol. */
  private[graft] def writeBatch(batch: DataFrame, dir: String, batchId: Long): Unit =
    graft.stream.IdempotentSink.writeBatch(batch, dir, batchId)

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
        coalesce(hour(ts) * 60 + minute(ts), lit(-60)).as("minuteOfDay"))
      .as[PurchaseLine]
  }
}

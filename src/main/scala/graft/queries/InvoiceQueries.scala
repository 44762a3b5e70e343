package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{InvoiceFeaturizer, Validity}
import graft.model.Tables
import QueryUtil._

/** The reference's own pipeline surface re-expressed over the driver
  * testdata: per-invoice featurization (A1), validity filtering (F3),
  * threshold calibration top-k (A5), cancellation-prefix filtering (F2/A2),
  * malformed-line routing (F1), and centroid-distance anomaly scoring
  * (A7/F5) against fixed centers. `lineitem ⋈ orders` plays the role of the
  * retail invoice lines (order = invoice, extendedprice = unit price,
  * custkey = customer).
  */
object InvoiceQueries {

  /** Shared featurized-invoice frame (reference `Clustering.scala:47-85`):
    * one wide join + one hash aggregate. Orders is the smaller side but
    * both scale with the fact table, so this is a key-partitioned shuffle
    * join — at cluster scale both tables would be bucketed by orderkey to
    * make it shuffle-free. */
  def invoiceFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
    InvoiceFeaturizer.featurize(
      lines,
      invoiceNo = $"l_orderkey",
      unitPrice = $"l_extendedprice",
      quantity = $"l_quantity",
      time = InvoiceFeaturizer.decimalHour($"o_orderdate"),
      customer = $"o_custkey")
  }

  /** SQL twin of [[invoiceFeatures]] (exact-cents average — see
    * InvoiceFeaturizer.featurize). */
  private val featuresSql =
    """SELECT l_orderkey AS invoice_no,
      |       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0
      |         /COUNT(l_extendedprice)
      |         AS avg_unit_price,
      |       MIN(l_extendedprice) AS min_unit_price,
      |       MAX(l_extendedprice) AS max_unit_price,
      |       AVG(hour(o_orderdate) + minute(o_orderdate)/60.0) AS time_of_day,
      |       CAST(SUM(l_quantity) AS DOUBLE) AS number_items,
      |       MAX(CASE WHEN o_custkey IS NULL THEN 0.0 ELSE 1.0 END) AS has_customer
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY l_orderkey""".stripMargin

  /** Output projection for the oracle-compared feature queries (renames
    * `time` → `time_of_day`; DuckDB reserves TIME). All columns are exact
    * across engines (see QueryUtil doc). */
  private def featureOutput(df: DataFrame): DataFrame =
    df.select(
      col("invoice_no"), col("avg_unit_price"),
      col("min_unit_price"), col("max_unit_price"),
      col("time").as("time_of_day"),
      col("number_items"), col("has_customer"))

  // Fixed scoring centers for the oracle-compared anomaly queries: with
  // literal centers the squared distance is plain arithmetic, identical in
  // both engines (the *trained*-model variants are rows-only checked in
  // PipelineQueries). Feature order: avg, min, max, time, items. Shared
  // with the streaming anomaly pipeline (st05) so batch and stream score
  // identically.
  private[queries] val CenterA = Seq(30000.0, 5000.0, 70000.0, 0.0, 100.0)
  private[queries] val CenterB = Seq(60000.0, 20000.0, 100000.0, 0.0, 150.0)
  private[queries] val AnomalyThreshold = 1.0e9

  private[queries] def sqDistTo(center: Seq[Double], f: Seq[Column]): Column =
    f.zip(center).map { case (c, v) => (c - lit(v)) * (c - lit(v)) }.reduce(_ + _)

  private[queries] def sqlSqDistTo(center: Seq[Double], f: Seq[String]): String =
    f.zip(center).map { case (c, v) => s"($c - $v)*($c - $v)" }.mkString(" + ")

  val queries: Map[String, Q] = Map(
    // A1: the invoice featurizer end-to-end (the flagship slice).
    "inv01_invoice_features" -> { (s, dir) =>
      featureOutput(invoiceFeatures(s, dir)).orderBy(col("invoice_no"))
    },

    // F3: training-validity filter over the featurized invoices.
    "inv02_valid_invoices" -> { (s, dir) =>
      import s.implicits._
      featureOutput(
        invoiceFeatures(s, dir).filter(InvoiceFeaturizer.validInvoice($"invoice_no")))
        .orderBy($"invoice_no")
    },

    // A5: threshold calibration — k-th largest metric via top-k + min
    // (TakeOrderedAndProject; at calibration scale use approxQuantile).
    "inv03_threshold_topk" -> { (s, dir) =>
      import s.implicits._
      invoiceFeatures(s, dir)
        .orderBy($"max_unit_price".desc)
        .limit(100)
        .agg(min($"max_unit_price").as("threshold"))
    },

    // F2 + A2: prefix-classified invoices (stand-in for the C-prefix
    // cancellation rule), collapsed per group like the per-batch dedup.
    "inv04_flagged_by_prefix" -> { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .filter($"o_orderpriority".startsWith("1"))
        .groupBy($"o_orderstatus")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct($"o_custkey").as("n_customers"))
        .orderBy($"o_orderstatus")
    },

    // F1: malformed-CSV-line routing — lines synthesized from events, same
    // naive arity/empty-field semantics as the reference.
    "inv05_line_validation" -> { (s, dir) =>
      import s.implicits._
      val line = concat_ws(",",
        $"event_id".cast("string"), $"event_type",
        when($"user_id" < 3, lit("")).otherwise($"user_id".cast("string")),
        $"props")
      Tables.events(s, dir)
        .select($"event_id", line.as("line"))
        .select(
          $"event_id",
          size(split($"line", ",", -1)).cast("long").as("arity"),
          Validity.isInvalidLine($"line", 4).cast("long").as("is_invalid"))
        .orderBy($"event_id")
    },

    // A7/F5: distance-to-nearest-centroid anomaly flag with fixed centers.
    "inv06_anomaly_flags" -> { (s, dir) =>
      import s.implicits._
      val f = InvoiceFeaturizer.FeatureCols.map(col)
      val dist = least(sqDistTo(CenterA, f), sqDistTo(CenterB, f))
      invoiceFeatures(s, dir)
        .select($"invoice_no", (dist > AnomalyThreshold).cast("long").as("is_anomaly"))
        .orderBy($"invoice_no")
    },

    // The invoice fold as a typed Aggregator (§2.8 custom-UDAF surface):
    // the exact same state/fold/merge as the streaming state machine, run
    // as a batch map-side-combined aggregate — hash-matched against the
    // same weighted oracle as st01, proving one fold definition serves
    // both engines' modes.
    "inv08_invoice_fold_agg" -> { (s, dir) =>
      import s.implicits._
      val lines = StreamQueries.purchaseLines(
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey"), s)
      lines.groupByKey(_.invoiceNo)
        .agg(graft.stream.InvoiceAggregator.toColumn.name("agg"))
        .select(col("key").cast("long").as("invoice_no"),
          col("agg.avg_unit_price").as("avg_unit_price"),
          col("agg.min_unit_price").as("min_unit_price"),
          col("agg.max_unit_price").as("max_unit_price"),
          col("agg.time_of_day").as("time_of_day"),
          col("agg.number_items").as("number_items"),
          col("agg.lines").as("lines"))
        .orderBy($"invoice_no")
    },

    // The reference's two genuinely different unit-price averages side by
    // side (per-line in training, quantity-weighted in streaming — SURVEY
    // §7.4.4): both as exact-cents aggregates so the divergence itself is
    // oracle-pinned.
    "inv07_avg_variants" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_orderkey".as("invoice_no"))
        .agg(
          (sum(QueryUtil.cents($"l_extendedprice")) / lit(100.0) / count(lit(1)))
            .as("avg_per_line"),
          InvoiceFeaturizer.weightedAvgUnitPrice($"l_extendedprice", $"l_quantity")
            .as("avg_weighted"))
        .orderBy($"invoice_no")
    })

  val oracles: Map[String, String] = {
    val outputSql = s"SELECT * FROM ($featuresSql)"
    val fSql = Seq("avg_unit_price", "min_unit_price", "max_unit_price", "time_of_day", "number_items")
    Map(
      "inv01_invoice_features" -> s"$outputSql ORDER BY invoice_no",

      "inv02_valid_invoices" ->
        s"""SELECT * FROM ($outputSql)
           |WHERE CAST(invoice_no AS VARCHAR) NOT LIKE 'C%'
           |  AND avg_unit_price IS NOT NULL AND min_unit_price IS NOT NULL
           |  AND max_unit_price IS NOT NULL AND time_of_day IS NOT NULL
           |  AND number_items IS NOT NULL
           |  AND has_customer = 1.0
           |  AND avg_unit_price > 0 AND min_unit_price > 0
           |  AND max_unit_price > 0 AND number_items > 0
           |  AND time_of_day BETWEEN 0.0 AND 24.0
           |ORDER BY invoice_no""".stripMargin,

      "inv03_threshold_topk" ->
        """SELECT MIN(max_unit_price) AS threshold
          |FROM (SELECT MAX(l_extendedprice) AS max_unit_price
          |      FROM lineitem GROUP BY l_orderkey
          |      ORDER BY max_unit_price DESC LIMIT 100)""".stripMargin,

      "inv04_flagged_by_prefix" ->
        """SELECT o_orderstatus,
          |  CAST(COUNT(*) AS BIGINT) AS n_orders,
          |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
          |FROM orders
          |WHERE o_orderpriority LIKE '1%'
          |GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin,

      "inv05_line_validation" ->
        """SELECT event_id,
          |  CAST(len(string_split(line, ',')) AS BIGINT) AS arity,
          |  CAST((len(string_split(line, ',')) != 4
          |        OR list_contains(string_split(line, ','), '')) AS BIGINT) AS is_invalid
          |FROM (SELECT event_id,
          |        CAST(event_id AS VARCHAR) || ',' || event_type || ','
          |        || (CASE WHEN user_id < 3 THEN '' ELSE CAST(user_id AS VARCHAR) END)
          |        || ',' || props AS line
          |      FROM events)
          |ORDER BY event_id""".stripMargin,

      "inv06_anomaly_flags" ->
        s"""SELECT invoice_no,
           |  CAST(LEAST(${sqlSqDistTo(CenterA, fSql)},
           |             ${sqlSqDistTo(CenterB, fSql)}) > $AnomalyThreshold AS BIGINT) AS is_anomaly
           |FROM ($featuresSql)
           |ORDER BY invoice_no""".stripMargin,

      "inv08_invoice_fold_agg" ->
        s"${StreamQueries.weightedAggSql} ORDER BY invoice_no",

      "inv07_avg_variants" ->
        """SELECT l_orderkey AS invoice_no,
          |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0/COUNT(*)
          |    AS avg_per_line,
          |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
          |           * CAST(l_quantity AS BIGINT)) AS BIGINT)/100.0
          |    / CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS avg_weighted
          |FROM lineitem
          |GROUP BY l_orderkey
          |ORDER BY invoice_no""".stripMargin)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** CSV ingestion for the reference's purchase-line shape (S1 batch scan,
  * `Clustering.scala:37-41`; P7 stream-line parse,
  * `InvoicePipeline.scala:85-90`).
  *
  * Two deliberate upgrades over the reference, per SURVEY §7.4.5:
  * the schema is **explicit** (`Schemas.purchaseCsv` — inference costs a
  * full extra pass at scale and types nondeterministically), and parsing
  * uses `from_csv` (quote-aware) rather than naive `split(",")`, which
  * corrupts quoted fields containing commas. The naive arity semantics
  * survive as `Validity.isInvalidLine` for routing fidelity.
  */
object PurchaseCsv {

  /** S1: batch CSV scan with the explicit purchase schema. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.purchaseCsv).option("header", "false").csv(path)

  /** P7: destructure raw CSV `value` lines into typed purchase columns —
    * one expression usable on batch and streaming frames (the stream path
    * applies it after Kafka's `CAST(value AS STRING)`). */
  def parseLines(lines: DataFrame, valueCol: String = "value"): DataFrame =
    lines
      .withColumn("_p", from_csv(col(valueCol),
        Schemas.purchaseCsv, Map.empty[String, String]))
      .select(col("_p.*"))

  /** Deterministic UCI-shaped CSV fixture synthesized from the `orders`
    * testdata: every 7th invoice is `C`-prefixed (cancelled). Written as
    * a real on-disk CSV so the scan path (and the DuckDB oracle) read an
    * actual file, not an in-memory stand-in. */
  def writeFixture(spark: SparkSession, sfDir: String, outPath: String): Unit = {
    val orders = graft.model.Tables.orders(spark, sfDir)
    orders.select(
      concat(when(col("o_orderkey") % 7 === 0, lit("C")).otherwise(lit("")),
        col("o_orderkey").cast("string")).as("InvoiceNo"),
      concat(lit("SKU"), (col("o_orderkey") % 97).cast("string")).as("StockCode"),
      concat(col("o_orderstatus"), lit(" priority "), col("o_orderpriority")).as("Description"),
      (col("o_orderkey") % 50 + 1).cast("int").as("Quantity"),
      date_format(col("o_orderdate"), Schemas.invoiceDateFormat).as("InvoiceDate"),
      col("o_totalprice").as("UnitPrice"),
      col("o_custkey").cast("string").as("CustomerID"),
      concat(lit("C"), (col("o_custkey") % 10).cast("string")).as("Country"))
      // parallel, unordered write — consumers (Spark scan and the DuckDB
      // oracle) read the whole directory, and row order is irrelevant to
      // the sorted compare; a sort + single-writer coalesce would only
      // serialize the write
      .write.mode("overwrite").option("header", "false").csv(outPath)
  }
}

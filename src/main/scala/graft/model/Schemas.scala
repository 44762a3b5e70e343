package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for every data shape the engine touches.
  *
  * The reference infers its CSV schema at load time
  * (reference `Clustering.scala:37-41`, `inferSchema=true`) and uses
  * positional `split(",")` on the stream (`InvoicePipeline.scala:87`).
  * At 100 TB, schema inference means an extra full pass over the data and
  * nondeterministic typing, so every source here is read with an explicit
  * `StructType`.
  */
object Schemas {

  /** UCI Online Retail purchase line — the reference's raw CSV row
    * (reference `Clustering.scala:37-41`, `InvoicePipeline.scala:85-90`). */
  val purchaseCsv: StructType = StructType(Seq(
    StructField("InvoiceNo", StringType),
    StructField("StockCode", StringType),
    StructField("Description", StringType),
    StructField("Quantity", IntegerType),
    StructField("InvoiceDate", StringType), // parsed once via to_timestamp
    StructField("UnitPrice", DoubleType),
    StructField("CustomerID", StringType),
    StructField("Country", StringType)))

  /** Kafka-shaped stream record: key = InvoiceNo, value = raw CSV line
    * (reference `InvoiceDataProducer.scala:30-32`). */
  val kafkaRecord: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType)))

  /** Timestamp format of the reference's InvoiceDate strings
    * (reference `Clustering.scala:51`). */
  val invoiceDateFormat = "MM/dd/yyyy HH:mm"

  // ---- driver testdata tables (parquet, schema fixed by TESTDATA.md) ----

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampNTZType)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))
}

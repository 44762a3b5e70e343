package graft

import org.apache.spark.sql.functions._

import graft.etl.{InvoiceFeaturizer, Validity}

class FeaturizerSpec extends SparkSuite {
  import InvoiceFeaturizer._

  private def featurizeRows(rows: Seq[(String, Double, Double, String, String)]) = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("invoice", "price", "qty", "date", "customer")
      .withColumn("ts", parseInvoiceDate(col("date")))
    featurize(df, col("invoice"), col("price"), col("qty"),
      decimalHour(col("ts")), col("customer"))
  }

  test("featurize computes avg/min/max/time/items per invoice") {
    val out = featurizeRows(Seq(
      ("A", 10.0, 2.0, "01/15/2011 14:30", "c1"),
      ("A", 20.0, 3.0, "01/15/2011 14:30", "c1"),
      ("B", 5.0, 1.0, "02/01/2011 09:15", ""))).collect()
      .map(r => r.getAs[Any]("invoice_no").toString -> r).toMap

    val a = out("A")
    assert(a.getAs[Double]("avg_unit_price") == 15.0)
    assert(a.getAs[Double]("min_unit_price") == 10.0)
    assert(a.getAs[Double]("max_unit_price") == 20.0)
    assert(a.getAs[Double]("time") == 14.5)
    assert(a.getAs[Double]("number_items") == 5.0)
    assert(a.getAs[Double]("has_customer") == 1.0)

    val b = out("B")
    assert(b.getAs[Double]("time") == 9.25)
    assert(b.getAs[Double]("has_customer") == 0.0) // empty customer id
  }

  test("validInvoice rejects C-prefixed, customerless, and bad-time invoices") {
    val out = featurizeRows(Seq(
      ("OK1", 10.0, 2.0, "01/15/2011 14:30", "c1"),
      ("C123", 10.0, 2.0, "01/15/2011 14:30", "c1"), // cancelled
      ("NOC", 10.0, 2.0, "01/15/2011 14:30", ""))) // no customer
      .filter(validInvoice(col("invoice_no")))
      .collect().map(_.getAs[Any]("invoice_no").toString).toSet
    assert(out == Set("OK1"))
  }

  test("invalid-line predicate: arity and empty-field semantics (F1)") {
    val s = spark
    import s.implicits._
    val out = Seq(
      "a,b,c,1,01/15/2011 14:30,2.5,c1,ES", // valid, 8 fields
      "a,b,c,1,01/15/2011 14:30,2.5,c1",    // 7 fields
      "a,,c,1,01/15/2011 14:30,2.5,c1,ES")  // empty field
      .toDF("line")
      .select(Validity.isInvalidLine($"line", 8).as("bad"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(out == Seq(false, true, true))
  }

  test("weighted vs unweighted average diverge exactly as in the reference") {
    val s = spark
    import s.implicits._
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("price", "qty")
    val r = df.agg(
      avg($"price").as("unweighted"),
      weightedAvgUnitPrice($"price", $"qty").as("weighted")).head()
    assert(r.getAs[Double]("unweighted") == 15.0)
    assert(r.getAs[Double]("weighted") == 17.5) // (10*1+20*3)/4
  }
}

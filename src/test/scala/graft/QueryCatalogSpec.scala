package graft

/** Smoke + invariants for every driver-contract query at sf0.001. */
class QueryCatalogSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes and is deterministic across runs") {
      val a = fn(spark, sf).collect()
      val b = fn(spark, sf).collect()
      assert(a.sameElements(b), s"$name not deterministic")
    }
  }

  test("invoice features satisfy min <= avg <= max and items = sum(qty)") {
    import org.apache.spark.sql.functions._
    val bad = queries.InvoiceQueries.invoiceFeatures(spark, sf)
      .filter(col("min_unit_price") > col("avg_unit_price") + 0.01 ||
        col("avg_unit_price") > col("max_unit_price") + 0.01 ||
        col("number_items") <= 0)
      .count()
    assert(bad == 0)
  }
}

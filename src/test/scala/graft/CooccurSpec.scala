package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Cooccur

class CooccurSpec extends SparkSuite {

  private def lineitem = Tables.lineitem(spark, sf)

  test("q26/q27/q31 premise: the basket cap never fires at ANY driver SF") {
    // q26's oracle (and q27's/q31's, which build their edge sets through
    // the same capped pairCounts) replays an UNCAPPED self-join — parity
    // holds only while no basket exceeds maxBasket=64. The driver runs
    // Verify at sf0.01 and Bench at sf0.1, so pin the premise at every
    // SF it touches, not just the spec corpus.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                    "/root/testdata/sf0.1")
         if new java.io.File(dir).isDirectory) {
      val maxOrder = Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey")).agg(countDistinct(col("l_partkey")).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      assert(maxOrder <= 64,
        s"$dir: an order holds $maxOrder distinct parts — the uncapped " +
          "oracle self-join would diverge from the capped Spark pipeline " +
          "(q26 lift pairs, q27 pagerank edges, q31 bfs edges)")
    }
  }

  test("pair counts match a direct self-join recompute on a small slice") {
    val slice = lineitem.filter(col("l_orderkey") < 500)
    val got = Cooccur.marketBasketPairs(slice, "l_orderkey", "l_partkey",
        maxBasket = 64, k = 1000000)
      .select(col("item_a"), col("item_b"), col("n_ab").as("got_n"))
    // independent recompute: the plain self-join shape the operator avoids
    val op = slice.select(col("l_orderkey").as("b"),
      col("l_partkey").cast("long").as("i")).distinct()
    val expected = op.as("x").join(op.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("exp_n"))
    val joined = got.join(expected, Seq("item_a", "item_b"), "full")
    assert(got.count() > 0, "slice produced no pairs — test is vacuous")
    assert(joined.filter(col("got_n").isNull || col("exp_n").isNull ||
      col("got_n") =!= col("exp_n")).isEmpty,
      "capped-bucket pair counts diverge from the self-join recompute")
  }

  test("maxBasket cap drops oversized baskets instead of going quadratic") {
    val sizes = lineitem
      .groupBy(col("l_orderkey")).agg(countDistinct(col("l_partkey")).as("n"))
    assert(sizes.filter(col("n") > 2).count() > 0,
      "no oversized baskets at this sf — cap test is vacuous")
    val capped = Cooccur.marketBasketPairs(lineitem, "l_orderkey", "l_partkey",
      maxBasket = 2, k = 1000000)
    // every surviving pair comes from a ≤2-item basket, so total pair
    // incidence is bounded by the number of exactly-2-item baskets
    val nTwoItem = sizes.filter(col("n") === 2).count()
    assert(capped.agg(coalesce(sum(col("n_ab")), lit(0L))).head().getLong(0) <= nTwoItem)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Cooccur, Graph}

class GraphSpec extends SparkSuite {

  private def pairs = Cooccur.pairCounts(Tables.lineitem(spark, sf),
      "l_orderkey", "l_partkey", maxBasket = 64)
    .select(col("item_a"), col("item_b"), col("n_ab").as("w"))

  test("pageRankInt is bit-identical across partitionings (integer claim)") {
    def run(p: org.apache.spark.sql.DataFrame) =
      Graph.pageRankInt(p, iters = 3)
        .orderBy(col("item")).collect().toSeq
    val a = run(pairs.repartition(1))
    val b = run(pairs.repartition(5, col("item_a")))
    assert(a.nonEmpty && a == b,
      "ranks differ across partitionings — integer fixed-point property broken")
  }

  test("mass is conserved up to floor leakage, never created") {
    val total = 1000000000000L
    val ranks = Graph.pageRankInt(pairs, iters = 5, total = total)
    val sumRank = ranks.agg(sum(col("rank"))).head().getLong(0)
    assert(sumRank <= total, s"rank mass $sumRank exceeds the injected $total")
    // floors leak at most ~1 unit per node per step per term — with
    // thousands of nodes that is ≪ 1% of total mass
    assert(sumRank > total / 2, s"rank mass $sumRank collapsed — recurrence wrong")
  }

  test("a hub node outranks a leaf on a known star graph") {
    val s = spark
    import s.implicits._
    val star = Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L), (0L, 4L, 1L))
      .toDF("item_a", "item_b", "w")
    val r = Graph.pageRankInt(star, iters = 10).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L), s"hub ${r(0L)} should outrank leaf ${r(1L)}")
    assert(r(1L) == r(4L), "symmetric leaves must tie exactly")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.Joins

class JoinsSpec extends SparkSuite {

  test("salted join: identical result to the plain join") {
    val s = spark
    import s.implicits._
    val li = s.read.parquet(s"$sf/lineitem.parquet")
    val ord = s.read.parquet(s"$sf/orders.parquet")
    val plain = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Joins.saltedEquiJoin(
      li.withColumnRenamed("l_orderkey", "o_orderkey"), ord,
      key = "o_orderkey", saltEntropy = Seq("o_orderkey", "l_linenumber"), saltFactor = 8)
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("bucketed join: no shuffle exchange feeding the join") {
    val s = spark
    // force the sort-merge path so bucket co-location (not a broadcast)
    // is what removes the exchanges
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Joins.bucketedInvoiceLines(s, sf)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it still returns the right rows
      assert(joined.count() ==
        s.read.parquet(s"$sf/lineitem.parquet").count())
    } finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}

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

  test("q37 premise: the derived hot key is genuinely skewed and the salt spreads it") {
    val s = spark
    import s.implicits._
    // the same derivation as the q37 catalog entry: every 5th event
    // remapped to customer 1
    val skewed = graft.model.Tables.events(s, sf).select(
      when($"event_id" % 5 === 0, lit(1L)).otherwise($"user_id").as("k"),
      $"event_id")
    // two skew pins: the hot key holds >=20% of the WHOLE table (an
    // absolute statement that survives the small key cardinality at
    // sf0.001 — skew_x100 is bounded by 100·n_keys, so a ratio-only bar
    // would be unreachable there), and q34's skew_x100 alarm line (300)
    // fires on the fixture
    val prof = skewed.groupBy($"k").agg(count(lit(1)).as("n"))
      .agg(expr("max(n) / sum(n)").as("hot_share"),
        expr("(max(n) * 100 * count(1)) div sum(n)").as("skew_x100"))
      .head()
    val (hotShare, skewX100) = (prof.getDouble(0), prof.getLong(1))
    assert(hotShare >= 0.2,
      s"hot key holds only ${hotShare * 100}%% of rows — not a meaningful hot key")
    assert(skewX100 > 300,
      s"fixture skew_x100 = $skewX100 — q34's alarm line (300) does not even fire")
    // the cure's mechanism, not just its result: the hot key's rows carry
    // all saltFactor distinct salt values (same expression saltedEquiJoin
    // uses), so its work spreads across 16 sub-partitions instead of one
    val spread = skewed.filter($"k" === 1L)
      .select(pmod(xxhash64($"event_id"), lit(16)).cast("int").as("salt"))
      .distinct().count()
    assert(spread == 16L,
      s"hot key covers only $spread of 16 salt sub-partitions")
  }

  test("AQE skew-join splits the hot partition; salting stays result-identical") {
    val s = spark
    import s.implicits._
    // tuned so the hot key's shuffle partition trips AQE's skew detector
    // at test scale (default thresholds are 256 MB / factor 5)
    val tuned = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = tuned.keys.map(k => k -> s.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // one pathological key (0) holding ~94% of the rows, 40 normal keys
      val big = s.range(160000).select($"id",
        when($"id" < 150000, lit(0L)).otherwise(($"id" % 40) + 1).as("k"),
        rpad(lit("p"), 128, "x").as("payload"))
      val small = s.range(41).select($"id".as("k"),
        concat(lit("dim_"), $"id").as("name"))

      // 1) plain join: AQE detects and splits the skewed partition at
      //    runtime — the final adaptive plan marks the join skew=true
      val plain = big.join(small, "k")
      // collect() (not count()) so THIS QueryExecution runs — count()
      // spawns its own and would leave this adaptive plan unfinalized
      assert(plain.collect().length == 160000)
      val plan = plain.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should have split the hot partition:\n$plan")

      // 2) manual salting gives the same result (the fallback for plans
      //    AQE's OptimizeSkewedJoin refuses to touch, e.g. join feeding a
      //    same-key aggregation)
      val salted = Joins.saltedEquiJoin(big, small, key = "k",
        saltEntropy = Seq("id"), saltFactor = 8)
      assert(salted.count() == 160000L)
      val perKey = salted.groupBy("k").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(perKey(0L) == 150000L && perKey.size == 41)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
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

package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.functions.CmsEstimate
import graft.model.Tables
import graft.ops.Sketches

/** Property pins for the sketch surface (sk01–sk04, cs06) — the
  * structural guarantees the oracle's quality bits summarize, asserted
  * directly so a regression names the broken property, not just a hash.
  */
class SketchSpec extends SparkSuite {

  test("bloom pre-filter has no false negatives and actually prunes") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf).select($"l_orderkey")
    val big = Tables.orders(spark, sf)
      .filter($"o_totalprice" > 470000.0).select($"o_orderkey")
    val bloom = Sketches.bloomBytes(big, "o_orderkey", big.count(), fpp = 0.01)

    val total = li.count()
    val pass = li.filter(Sketches.mightContain(bloom, $"l_orderkey")).count()
    val trueMatches = li.join(big, $"l_orderkey" === $"o_orderkey", "left_semi").count()
    val missed = li.join(big, $"l_orderkey" === $"o_orderkey", "left_semi")
      .filter(!Sketches.mightContain(bloom, $"l_orderkey")).count()

    assert(missed == 0, s"bloom dropped $missed true matches — false negatives are impossible")
    assert(pass >= trueMatches, s"bloom passed $pass < $trueMatches true matches")
    // the point of the pre-filter: the overwhelming share of non-matching
    // fact rows never reaches the join (fpp 0.01 + ~6% true selectivity)
    assert(pass < total / 2,
      s"bloom passed $pass of $total rows — pruning is not doing its job")
  }

  test("CMS never undercounts ANY key and stays within eps*N on the full key space") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val exact = li.groupBy($"l_partkey").agg(count(lit(1)).as("n"))
    val sketch = li.agg(
        expr("count_min_sketch(l_partkey, CAST(0.0005 AS DOUBLE), CAST(0.999 AS DOUBLE), 42)").as("cms"),
        count(lit(1)).as("n_total"))
      .withColumn("k", lit(1))
    val checked = exact.withColumn("k", lit(1)).join(broadcast(sketch), "k")
      .select($"n", CmsEstimate($"cms", $"l_partkey").as("est"), $"n_total")
    val under = checked.filter($"est" < $"n").count()
    val over = checked.filter($"est" > $"n" + ceil(lit(0.0005) * $"n_total").cast("long")).count()
    assert(under == 0, s"CMS undercounted $under keys — structurally impossible, probe is broken")
    assert(over == 0, s"CMS overcounted $over keys beyond eps*N")
  }

  test("HLL: merged per-group sketches estimate the same corpus as one direct sketch") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val direct = li.agg(expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 12))"))
      .head().getLong(0)
    val merged = li.groupBy($"l_returnflag")
      .agg(expr("hll_sketch_agg(l_orderkey, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))"))
      .head().getLong(0)
    val exact = li.agg(countDistinct($"l_orderkey")).head().getLong(0)
    // register state is order/partition-insensitive; the union may sit in
    // a different sketch mode than the one-pass aggregate, so pin both to
    // the exact answer rather than to each other
    assert(math.abs(direct - exact).toDouble / exact <= 0.05, s"direct HLL $direct vs exact $exact")
    assert(math.abs(merged - exact).toDouble / exact <= 0.05, s"merged HLL $merged vs exact $exact")
  }

  test("cs06: the ORC scan pushes filters and prunes columns like parquet") {
    import spark.implicits._
    // prerequisite: the fixture exists (cs06 itself writes it)
    SparkEntry.queries("cs06_orc_roundtrip")(spark, sf).collect()
    val orc = spark.read.orc(new java.io.File("target/fixtures/lineitem_orc").getAbsolutePath)
      .filter($"l_quantity" >= 25.0)
      .select($"l_orderkey")
    val plan = orc.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, s"no file scan in ORC plan:\n$plan")
    for (scan <- scans) {
      assert(scan.metadata.getOrElse("PushedFilters", "[]") != "[]",
        s"ORC scan has no pushed filters:\n$scan")
      assert(scan.requiredSchema.size <= 2,
        s"ORC scan reads ${scan.requiredSchema.fieldNames.mkString(",")} — pruning regressed")
    }
  }
}

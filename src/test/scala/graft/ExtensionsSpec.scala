package graft

/** The SQL surface of the native expressions: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` (the shared test session —
  * the conf is static, so it must be set at SparkContext construction)
  * can call them from spark.sql, and the results match the Column API. */
class ExtensionsSpec extends SparkSuite {

  test("simhash64/polyhash64 are callable from SQL via GraftExtensions") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val r = s.sql(
      """SELECT simhash64(array(CAST(3 AS BIGINT), CAST(5 AS BIGINT))) AS sh,
        |       polyhash64(array(CAST(3 AS BIGINT), CAST(5 AS BIGINT))) AS ph""".stripMargin)
      .head()
    assert(r.getLong(1) == 3L * 31L + 5L)
    val viaColumn = Seq(Seq(3L, 5L)).toDF("a")
      .select(graft.functions.SimHash64(col("a")), graft.functions.PolyHash64(col("a")))
      .head()
    assert(r.getLong(0) == viaColumn.getLong(0))
    assert(r.getLong(1) == viaColumn.getLong(1))
  }

  test("wrong arity fails analysis instead of silently dropping arguments") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(array(CAST(3 AS BIGINT)), 42)").head()
    }
    assert(e.getMessage.contains("simhash64"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT polyhash64()").head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product(array(1.0))").head()
    }
  }

  test("dot_product: non-numeric arrays fail analysis, not silent NULL math") {
    // an unconditional array<double> cast would element-wise-NULL an
    // array<string> argument and return a plausible wrong number; the
    // builder must instead let checkInputDataTypes reject it
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product(array('a','b'), array(1.0, 2.0))").head()
    }
    assert(e.getMessage.toLowerCase.contains("dot_product") ||
      e.getMessage.contains("array<double>"), e.getMessage)
    // numeric non-double arrays still coerce (the literal-friendly path)
    assert(spark.sql("SELECT dot_product(array(1, 2), array(3, 4)) AS d")
      .head().getDouble(0) == 11.0)
  }

  test("dot_product: SQL-callable, bit-identical to the HOF formulation") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    assert(s.sql("SELECT dot_product(array(1.0, 2.0, 3.0), array(4.0, 5.0, 6.0)) AS d")
      .head().getDouble(0) == 32.0)
    // adversarial doubles: the native loop must reproduce the HOF's
    // left-to-right accumulation exactly (order changes the result here)
    val vals = Seq((Seq(1e16, 1.0, -1e16, 0.1, 1e-7, 3.33),
                    Seq(1.0, 1.0, 1.0, 3.7, 1e7, 0.77)))
    val r = vals.toDF("a", "b").select(
      graft.functions.DotProduct($"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("hof"))
      .head()
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)),
      s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
  }

  test("TextMetaRewrite: length(text) filter becomes a pushed n_chars scan predicate") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    def q = graft.model.Tables.documents(s, sf)
      .filter(length($"text") > 400)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("n_chars"),
      s"rule did not substitute the metadata column:\n$optimized")
    assert(!optimized.toLowerCase.contains("length("),
      s"length(text) survived the rewrite:\n$optimized")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("GreaterThan(n_chars"),
      s"rewritten predicate was not pushed to the scan:\n$physical")
    // the aggregate no longer needs the corpus column at all
    assert(!physical.contains("ReadSchema: struct<text") &&
      !physical.contains("text:string"),
      s"scan still reads the text column:\n$physical")
    // semantics: rewritten result == unrewritten result, bit-identical
    val on = q.collect()
    s.conf.set(graft.plans.TextMetaRewrite.ConfKey, "false")
    try {
      val offPlan = q.queryExecution.optimizedPlan.toString
      assert(offPlan.toLowerCase.contains("length("), "conf off must disable the rule")
      assert(q.collect().sameElements(on), "rewrite changed the result")
    } finally s.conf.set(graft.plans.TextMetaRewrite.ConfKey, "true")
  }
}

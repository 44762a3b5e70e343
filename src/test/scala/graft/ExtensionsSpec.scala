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
  }
}

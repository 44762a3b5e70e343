package graft

import graft.queries.IngestQueries

/** Layout-side pins for the ingest fixtures: compaction must actually
  * change the file layout (the content half is cs09's DuckDB oracle),
  * and the ORC path must push filters into the scan like parquet does. */
class IngestSpec extends SparkSuite {

  private def parquetFiles(d: String) =
    new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction merges 32 fragments into fewer files with identical content") {
    val s = spark
    IngestQueries.ensureCompacted(s, sf)
    val frag = parquetFiles(IngestQueries.fragDir)
    val comp = parquetFiles(IngestQueries.compactDir)
    assert(frag.length == 32, s"fixture should fragment to 32 files, got ${frag.length}")
    assert(comp.length < frag.length,
      s"compaction must reduce file count: ${comp.length} vs ${frag.length}")
    // tiny corpus ⇒ well under one 128 MiB target file
    assert(comp.length == 1, s"expected a single size-targeted file, got ${comp.length}")
    val a = s.read.parquet(IngestQueries.fragDir)
      .orderBy("doc_id").collect().toSeq
    val b = s.read.parquet(IngestQueries.compactDir)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "compaction must not change table content")
  }

  test("the ORC scan pushes filters down like parquet") {
    val s = spark
    import org.apache.spark.sql.functions._
    IngestQueries.ensureOrc(s, sf)
    val q = s.read.orc(IngestQueries.orcDir)
      .filter(col("l_quantity") > 30.0)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"expected a pushed l_quantity filter in the ORC scan:\n$plan")
  }

  test("cs10 checksum detects any single-cell mutation and ignores row order") {
    val s = spark
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    def checksums(rows: DataFrame) = rows
      .select(col("g"), expr(
        "CAST(conv(substring(md5(row_str), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .groupBy(col("g")).agg(expr("bit_xor(h)").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    import s.implicits._
    val base = Seq(("a", "1|10"), ("a", "2|20"), ("b", "3|30"))
      .toDF("g", "row_str")
    val shuffled = Seq(("a", "2|20"), ("b", "3|30"), ("a", "1|10"))
      .toDF("g", "row_str").repartition(3)
    assert(checksums(base) == checksums(shuffled),
      "checksum must be row-order and partitioning independent")
    val mutated = Seq(("a", "1|10"), ("a", "2|21"), ("b", "3|30"))
      .toDF("g", "row_str")
    assert(checksums(base)("a") != checksums(mutated)("a"),
      "a single-cell mutation must flip its group's checksum")
    assert(checksums(base)("b") == checksums(mutated)("b"),
      "untouched groups must keep their checksum")
  }
}

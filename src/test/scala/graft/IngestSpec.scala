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
}

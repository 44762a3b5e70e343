package graft

import graft.ops.Upsert

class UpsertSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet

  test("upsert: wholesale replace (incl. null columns), pass-through, insert") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "seg", "bal")
    // update for k=2 legitimately nulls its segment — the match flag must
    // carry the null through instead of falling back to the base value
    val updates = Seq((2L, null: String, 20.0), (9L, "new", 9.0))
      .toDF("k", "seg", "bal")
    val merged = Upsert.upsert(base, updates, "k")
    assert(rows(merged) == Set(
      (1L, Some("a"), 1.0), (2L, None, 20.0), (3L, Some("c"), 3.0),
      (9L, Some("new"), 9.0)))
  }

  test("upsert laws: empty updates is identity; reapplying a batch is idempotent") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "seg", "bal")
    val updates = Seq((2L, "b2", 20.0), (5L, "e", 5.0)).toDF("k", "seg", "bal")
    val empty = updates.filter($"k" < 0)
    assert(rows(Upsert.upsert(base, empty, "k")) == rows(base))
    val once = Upsert.upsert(base, updates, "k")
    val twice = Upsert.upsert(once, updates, "k")
    assert(rows(twice) == rows(once), "same batch reapplied must be a no-op")
  }

  test("upsert rejects mismatched schemas") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a", 1.0)).toDF("k", "seg", "bal")
    val bad = Seq((1L, "a")).toDF("k", "seg")
    intercept[IllegalArgumentException](Upsert.upsert(base, bad, "k"))
  }
}

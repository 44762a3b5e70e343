package graft

import org.apache.spark.sql.functions._

import graft.functions.{MinHashSig, ShingleHashes, XxHash64Array}

/** The native hash expressions must be BIT-IDENTICAL to the HOF
  * formulations they replaced — same `XXH64` primitives, same chaining —
  * or every downstream signature/band/candidate set silently changes.
  * Each test evaluates both forms over real documents plus edge cases and
  * compares element-wise. */
class HashOpsSpec extends SparkSuite {

  private def docs = {
    val s = spark
    import s.implicits._
    (Seq("", "one", "one two", "a b c d e f g", "dup dup dup dup")
      ++ (0 until 50).map(i => s"synthetic doc $i with some shared tokens ${i % 7}"))
      .toDF("text").withColumn("toks", split(col("text"), " ", -1))
  }

  test("ShingleHashes == HOF windowed concat_ws+xxhash64") {
    val k = 3
    val hof =
      when(size(col("toks")) < k, array(xxhash64(concat_ws(" ", col("toks")))))
        .otherwise(transform(
          sequence(lit(1), size(col("toks")) - (k - 1)),
          i => xxhash64(concat_ws(" ", slice(col("toks"), i, lit(k))))))
    val bad = docs.select(ShingleHashes(col("toks"), k).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b")))
    assert(bad.count() == 0L, bad.collect().take(3).mkString("\n"))
  }

  test("MinHashSig == HOF per-index array_min(transform(xxhash64(h, i)))") {
    val n = 32
    val sh = docs.select(graft.ops.Dedup.shingleHashes(col("toks"), 3).as("sh"))
    val hof = array((0 until n).map(i =>
      array_min(transform(col("sh"), h => xxhash64(h, lit(i))))): _*)
    val bad = sh.select(MinHashSig(col("sh"), n).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b")))
    assert(bad.count() == 0L, bad.collect().take(3).mkString("\n"))
  }

  test("XxHash64Array == HOF transform(xxhash64)") {
    val hof = transform(col("toks"), t => xxhash64(t))
    val bad = docs.select(XxHash64Array(col("toks")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b")))
    assert(bad.count() == 0L, bad.collect().take(3).mkString("\n"))
  }
}

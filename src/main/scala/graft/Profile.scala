package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract): time the
  * stages of the dedup pipelines at a given SF. */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Dedup, TextOps}
    val docs = graft.model.Tables.documents(spark, dir)
    time("docs count")(docs.count())
    val sh = docs.withColumn("_toks", TextOps.tokens(col("text")))
      .select(col("doc_id").as("id"),
        Dedup.shingleHashes(col("_toks"), 3).as("shingles"))
    time("shingles only")(sh.select(sum(size(col("shingles")))).head())
    val sig = sh.withColumn("sig", Dedup.minHashSignature(col("shingles"), 32))
    time("shingles+minhash32")(sig.select(sum(size(col("sig")))).head())
    time("dd01 full")(Dedup.minHashDupPairs(docs, "doc_id", "text",
      3, 8, 4, 0.5).count())
    time("dd03 full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      4, 0.5, 16).count())
    val sh4 = docs.withColumn("_toks", TextOps.tokens(col("text")))
      .select(col("doc_id").as("id"),
        Dedup.shingleHashes(col("_toks"), 4).as("shingles"))
    time("shingles4 only")(sh4.select(sum(size(col("shingles")))).head())
    val posting = sh4.select(col("id"), explode(col("shingles")).as("shingle"))
    time("posting explode+count")(posting.count())
    time("posting groupBy shingle")(posting.groupBy("shingle")
      .agg(collect_list(col("id"))).count())
    time("tokens only")(docs.select(sum(size(TextOps.tokens(col("text"))))).head())
    val emb = graft.model.Tables.embeddings(spark, dir)
    println("[prof] dd04 rows = " + time("dd04 capped cells")(
      graft.ops.Similarity.embeddingDupPairs(emb, "vec_id", "embedding",
        threshold = 0.4, quantizerKey = s"emb-dup-$dir").count()))
    spark.stop()
  }
}

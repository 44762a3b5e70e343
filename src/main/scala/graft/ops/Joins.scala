package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the cluster-scale cases Catalyst cannot fix alone:
  *
  *  - **Salted equi-join** for skewed keys: a hot key concentrates its
  *    rows in one shuffle partition; salting splits each key's rows over
  *    `saltFactor` sub-partitions (deterministic per-row salt) and
  *    replicates the other side per salt value, so the hot key's work
  *    spreads across `saltFactor` tasks. Result-identical to the plain
  *    join.
  *
  *    **When AQE already solves it** (see JoinsSpec "AQE skew-join"): for
  *    a plain shuffled join (sort-merge or shuffled-hash) whose output
  *    feeds no operator that needs the join's hash partitioning,
  *    `spark.sql.adaptive.skewJoin` detects the oversized partition at
  *    runtime and splits it (replicating the matching partition of the
  *    other side) — no salting needed, and no schema pollution. Reach for
  *    [[saltedEquiJoin]] only where AQE's `OptimizeSkewedJoin` bails:
  *    when the join output is consumed by an aggregation/window keyed on
  *    the join key (splitting would force an extra shuffle, so AQE leaves
  *    the skew in place), or when the skew sits in a `groupBy` rather
  *    than a join.
  *
  *  - **Bucketed tables** for repeated co-located joins: both sides
  *    pre-partitioned into the same bucket count on the join key at write
  *    time — every subsequent join on that key is exchange-free, which is
  *    the difference between one shuffle per query and zero at 100 TB.
  */
object Joins {

  /** Salted inner equi-join on `key`. `saltEntropy` columns must uniquely
    * identify big-side rows (the salt is a deterministic hash of them, so
    * replay yields identical partitioning — no rand()). */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltEntropy: Seq[String], saltFactor: Int): DataFrame = {
    // saltFactor <= 0 would silently return an EMPTY join (explode of an
    // empty salt array + null pmod), not an identical one
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = big.withColumn("_salt",
      pmod(xxhash64(saltEntropy.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(lit((0 until saltFactor).toArray)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  // ------------------------------------------------------------ buckets —

  private val bucketed = new ConcurrentHashMap[String, Boolean]()

  /** Ensure a bucketed copy of `dir/name.parquet` exists as a catalog
    * table bucketed on `bucketCol`; idempotent per session (the write is
    * an index build — one full pass that removes the join shuffle from
    * every later query). Returns the table name. */
  def ensureBucketed(spark: SparkSession, dir: String, name: String,
                     bucketCol: String, nBuckets: Int): String = {
    // suffix the sanitized dir with a hash of the RAW dir: sanitizing is
    // lossy ("ds-1" and "ds_1" collide) and table names are lowercased,
    // so without it two sources could silently share one bucketed copy
    val table = (s"graft_bkt_${name}_" +
      s"${dir.replaceAll("[^A-Za-z0-9]", "_")}_${bucketCol}_$nBuckets" +
      f"_${dir.hashCode & 0x7fffffff}%08x").toLowerCase
    // the JVM-wide memo only dedups concurrent builds; the authority on
    // whether the table exists is the session CATALOG — a recreated
    // SparkSession in the same JVM starts with a fresh in-memory catalog,
    // and trusting the memo alone would skip the write and fail the read
    bucketed.compute(table, (_, _) => {
      if (!spark.catalog.tableExists(table)) {
        graft.model.Tables.table(spark, dir, name)
          .write.mode("overwrite")
          .bucketBy(nBuckets, bucketCol)
          .sortBy(bucketCol)
          .option("path", new java.io.File(s"target/buckets/$table").getAbsolutePath)
          .saveAsTable(table)
      }
      true
    })
    table
  }

  /** Exchange-free `lineitem ⋈ orders` on the order key via same-bucket
    * tables (the layout `InvoiceQueries.invoiceFeatures` calls for at
    * cluster scale). */
  def bucketedInvoiceLines(spark: SparkSession, dir: String,
                           nBuckets: Int = 8): DataFrame = {
    val li = ensureBucketed(spark, dir, "lineitem", "l_orderkey", nBuckets)
    val ord = ensureBucketed(spark, dir, "orders", "o_orderkey", nBuckets)
    spark.table(li).join(spark.table(ord),
      col("l_orderkey") === col("o_orderkey"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-INTO semantics over immutable columnar storage (no Delta/Iceberg
  * in the dependency set): matched keys take the update row, unmatched
  * base rows pass through, insert-only update rows come through — one
  * key-partitioned full-outer join, the shape that rewrites only the
  * partitions an update batch touches at 100 TB (partition-prune the base
  * on the update batch's key range before calling this; the join itself
  * never moves untouched columns through more than one exchange).
  */
object Upsert {

  /** Upsert `updates` into `base` by `key`. Both frames must carry the
    * same columns; update rows replace matched base rows wholesale
    * (MERGE ... WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN
    * INSERT *). Null key rows never match (SQL join semantics) — both
    * sides' null-key rows pass through as distinct rows. */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"schema mismatch: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val cols = base.columns
    // presence flag, not per-column coalesce: an update row must replace
    // its match WHOLESALE, including columns it sets to null
    val u = updates.select(cols.map(c => col(c).as(s"_u_$c")) :+ lit(1).as("_u_present"): _*)
    base.join(u, col(key) === col(s"_u_$key"), "full_outer")
      .select(cols.map(c =>
        when(col("_u_present").isNotNull, col(s"_u_$c")).otherwise(col(c)).as(c)): _*)
  }
}

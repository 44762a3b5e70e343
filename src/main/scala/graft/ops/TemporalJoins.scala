package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators Spark has no native node for, each built on
  * relational primitives Catalyst already optimizes — instead of the
  * nested-loop fallback a naive inequality join triggers (a non-equi
  * condition gives the planner no hash/sort key, so it picks
  * BroadcastNestedLoopJoin: O(|L|·|R|) and a full broadcast of one side).
  *
  * Neither shape exists in the reference (SURVEY §2.4: it has no joins at
  * all); they are part of the mandated new-surface join family, in the
  * preference order §7.3 sets out: compose existing operators before
  * reaching for a custom SparkPlan.
  */
object TemporalJoins {

  /** As-of join: for every left row, the single right row with the
    * greatest `rightTime <= leftTime` (inclusive) for the same key;
    * left-outer — unmatched left rows keep a null payload.
    *
    * Implemented as union + ordered window (`last(payload, ignoreNulls)`
    * over rows up to current): ONE shuffle on the key and ONE sort — the
    * cost shape of a sort-merge join. At 100 TB both inputs stream
    * through their sorted partitions exactly once; nothing is replicated
    * and no per-row search runs. The payload travels as a single struct,
    * so a matched row's columns can never mix across right rows.
    *
    * Right rows must be unique per (key, time) — pre-aggregate otherwise
    * (see ev05: `max_by` collapses same-day orders deterministically);
    * with duplicates the surviving payload is tie-order-dependent.
    * `leftTime`/`rightTime` must be the same type. Column names of the
    * two inputs must not collide.
    *
    * @return left columns + right payload columns (right key/time dropped)
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: ${overlap.mkString(", ")}")
    val payloadCols = right.columns.filterNot(c => c == rightKey || c == rightTime).toSeq
    val payloadType = StructType(right.schema.fields.filter(f => payloadCols.contains(f.name)))
    // JOIN semantics for nulls: a right row with a null key or null time
    // matches nothing (without this, the window's NULL-key partition
    // would hand such payloads to null-keyed left rows, and a null time
    // sorts first and would "precede" every left row). Null-keyed/timed
    // LEFT rows still come out, payload null — left-outer semantics.
    val cleanRight = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
    val lPart = left.select(
      col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_l"),
      lit(null).cast(payloadType).as("_p"))
    val rPart = cleanRight.select(
      col(rightKey).as("_k"),
      // align mixed timestamp flavors (e.g. ntz vs ltz) to the left side
      col(rightTime).cast(left.schema(leftTime).dataType).as("_t"),
      lit(0).as("_side"),
      lit(null).cast(StructType(left.schema.fields)).as("_l"),
      struct(payloadCols.map(col): _*).as("_p"))
    // right rows sort before left rows at equal time (side 0 < 1), which
    // is exactly the inclusive `rightTime <= leftTime` semantic
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPart.unionByName(rPart)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(c => col(s"_l.$c").as(c)).toIndexedSeq ++
        payloadCols.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Forward as-of join — the mirror of [[asOfJoin]]: for every left row,
    * the single right row with the SMALLEST `rightTime >= leftTime`
    * (inclusive) for the same key; left-outer. Same one-shuffle/one-sort
    * union + ordered-window shape, run over time DESCENDING so the frame
    * stays the incremental `[unbounded preceding, current]` +
    * `last(payload, ignoreNulls)` — Spark evaluates that frame in one
    * O(n) streaming pass per sorted partition, whereas the naive mirror
    * (`[current, unbounded following]` + `first`) recomputes the
    * aggregate from scratch per row, O(n²) per key. In the descending
    * order every right row at `rightTime >= leftTime` precedes the left
    * row, and the last one seen is the nearest; right rows sort BEFORE
    * left rows at equal time (side 2 before 1 descending), which is
    * exactly the inclusive `rightTime >= leftTime` semantic. Same
    * uniqueness/disjoint-name preconditions as [[asOfJoin]]. */
  def asOfJoinForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: ${overlap.mkString(", ")}")
    val payloadCols = right.columns.filterNot(c => c == rightKey || c == rightTime).toSeq
    val payloadType = StructType(right.schema.fields.filter(f => payloadCols.contains(f.name)))
    val cleanRight = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
    val lPart = left.select(
      col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_l"),
      lit(null).cast(payloadType).as("_p"))
    val rPart = cleanRight.select(
      col(rightKey).as("_k"),
      col(rightTime).cast(left.schema(leftTime).dataType).as("_t"),
      lit(2).as("_side"),
      lit(null).cast(StructType(left.schema.fields)).as("_l"),
      struct(payloadCols.map(col): _*).as("_p"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPart.unionByName(rPart)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(c => col(s"_l.$c").as(c)).toIndexedSeq ++
        payloadCols.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Range (interval) join: points with `time ∈ [start, end)` per key.
    *
    * Binning turns the inequality into an EQUI-join: each interval is
    * replicated to every fixed-width time bin it covers, each point
    * belongs to exactly one bin, and the join runs hash-partitioned on
    * (key, bin) with the exact predicate filtered inside the bins. A
    * point matches an interval in precisely the point's own bin, so no
    * dedup pass is needed. Replication factor is interval/binSize + 1 —
    * pick `binSeconds` near the typical interval length (≈2 bins per
    * interval). Skewed bins are AQE's skew-join case (see [[Joins]]).
    *
    * Key/column names of the two inputs must be disjoint.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointKey: String, intervalKey: String,
                timeCol: String, startCol: String, endCol: String,
                binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint, both have: ${overlap.mkString(", ")}")
    val binOf: Column => Column = t => floor(unix_micros(t) / (binSeconds * 1000000L))
    val p = points.withColumn("_bin", binOf(col(timeCol)))
    val i = intervals.withColumn("_bin",
      explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    p.join(i, col(pointKey) === col(intervalKey) && p("_bin") === i("_bin"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop(p("_bin")).drop(i("_bin"))
  }
}

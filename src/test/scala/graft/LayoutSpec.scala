package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ZOrder64
import graft.model.Tables
import graft.ops.Layout

/** Locality pin for the Z-order layout (ops/Layout): one clustering
  * order must serve selective predicates on EITHER dimension, where a
  * single-column sort serves only its own column. "Row groups touched"
  * is modeled as ntile chunks of the sorted order — the unit parquet
  * min/max skipping works on.
  */
class LayoutSpec extends SparkSuite {

  private val nGroups = 32

  test("zorder64 interleaves known vectors bit-for-bit") {
    // x=0b101 → bits 0,4; y=0b011 → bits 1,3  ⇒ z = 1+2+8+16 = 27
    assert(ZOrder64.interleave(5L, 3L) == 27L)
    assert(ZOrder64.interleave(0L, 0L) == 0L)
    // single high bit of each dimension lands at 2i (x) and 2i+1 (y)
    assert(ZOrder64.interleave(1L << 31, 0L) == (1L << 62))
    assert(ZOrder64.interleave(0L, 1L << 31) == (1L << 63))
    // bits above 31 are ignored by construction
    assert(ZOrder64.interleave(1L << 32, 1L << 40) == 0L)
    // monotone within a fixed high-bit block: interleave preserves
    // lexicographic (xHigh, yHigh) block order
    assert(ZOrder64.interleave(2L, 2L) > ZOrder64.interleave(1L, 1L))
  }

  test("one z-order sort serves selective boxes on BOTH dimensions") {
    val s = spark
    import s.implicits._
    val ev = Tables.events(s, sf)
      .select($"user_id", (hour($"ts") * 60 + minute($"ts")).cast("long").as("m"))

    def touched(order: Column, pred: Column): Long =
      ev.withColumn("g", ntile(nGroups).over(Window.orderBy(order, $"user_id", $"m")))
        .filter(pred).select($"g").distinct().count()

    val z = ZOrder64(Layout.rankBucket(ev, "user_id", 64), Layout.rankBucket(ev, "m", 64))
    val userBox = $"user_id" < 2            // ~13% of rows, scattered in time
    val minuteBox = $"m".between(600, 719)  // ~9% of rows, scattered over users

    val mSortUserBox = touched($"m", userBox)       // wrong-dim sort: near-total scan
    val zUserBox = touched(z, userBox)
    val zMinuteBox = touched(z, minuteBox)
    val mSortMinuteBox = touched($"m", minuteBox)   // own-dim sort: the easy case

    // the single-dim sort fails the other dimension...
    assert(mSortUserBox >= (nGroups * 3) / 4,
      s"minute-sort unexpectedly served the user box ($mSortUserBox/$nGroups)")
    // ...while the z-order serves both: strictly better than the failure
    // mode, and bounded below 2/3 of the groups on each dimension
    assert(zUserBox < mSortUserBox,
      s"z-order ($zUserBox) not better than wrong-dim sort ($mSortUserBox)")
    assert(zUserBox <= (nGroups * 2) / 3,
      s"z-order user box touched $zUserBox/$nGroups groups")
    assert(zMinuteBox <= (nGroups * 2) / 3,
      s"z-order minute box touched $zMinuteBox/$nGroups groups")
    // sanity: the own-dim sort remains the optimum on its own column
    assert(mSortMinuteBox <= zMinuteBox)
  }

  test("zorderBy clusters output so both dimensions' per-chunk spans shrink") {
    val s = spark
    import s.implicits._
    val ev = Tables.events(s, sf)
      .select($"event_id", $"user_id", (hour($"ts") * 60 + minute($"ts")).cast("long").as("m"))
    val laid = Layout.zorderBy(ev, "user_id", "m", nBuckets = 64, numPartitions = 8)
    // every input row survives the re-layout exactly once
    assert(laid.count() == ev.count())
    assert(laid.select($"event_id").except(ev.select($"event_id")).count() == 0)
    // per-partition min/max stats (what parquet footers would carry):
    // average user-span of a partition must be far below the full range,
    // i.e. the interleave genuinely localizes the non-time dimension too
    val spans = laid.withColumn("p", spark_partition_id())
      .groupBy($"p")
      .agg((max($"user_id") - min($"user_id")).as("uSpan"), count(lit(1)).as("n"))
      .filter($"n" > 0)
    val fullSpan = ev.agg(max($"user_id") - min($"user_id")).head().getLong(0)
    val avgSpan = spans.agg(avg($"uSpan")).head().getDouble(0)
    assert(avgSpan <= fullSpan * 0.75,
      s"avg per-partition user span $avgSpan vs full $fullSpan — no locality gained")
  }
}

package graft

/** State-store provider matrix: the stateful streaming suite must produce
  * byte-identical output under the default HDFS-backed provider AND the
  * RocksDB provider — the provider you actually deploy when state no
  * longer fits the executor heap (at 100 TB scale, per-key invoice state
  * and windowed sketch state live off-heap in RocksDB with incremental
  * checkpointing; see SCALE.md). The provider only changes WHERE state
  * lives, never what it holds, so any divergence is a bug in our state
  * encoding (case-class encoders for `flatMapGroupsWithState` state,
  * sketch binary buffers in windowed aggs) — exactly what this matrix
  * would catch.
  *
  * Coverage across the provider-sensitive operator classes:
  *  - st01/st07: `flatMapGroupsWithState` fold, single- and multi-batch;
  *  - st11: event-time timeouts (timer state) + watermark purge;
  *  - st12/st13: windowed aggregation state carrying binary sketch
  *    buffers (HLL registers, CMS matrix);
  *  - st18: crash + checkpoint recovery — state REloaded from a RocksDB
  *    checkpoint after an abnormal termination, not just written to one.
  */
class RocksDbStateStoreSpec extends SparkSuite {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** The provider class is read per-query at start, so scoping it through
    * the session conf is sound as long as no other streaming query starts
    * concurrently (specs here run sequentially on the shared session). */
  private def withProvider[A](cls: String)(f: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, cls)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private val StatefulSuite = Seq(
    "st01_invoice_state",
    "st07_invoice_state_multibatch",
    "st11_invoice_state_eventtime",
    "st12_stream_hll_window",
    "st13_stream_cms_topk",
    "st18_crash_recovery",
    // the measured late-filter semantics (end<=wm drop, two-batch filter
    // lag, final-wm append cut) must be provider-INDEPENDENT — the
    // filter runs above the store; a divergence here would mean the drop
    // model the st19/st20 oracles encode is provider-specific
    "st19_late_data_audit",
    "st20_append_window_flush",
    // r16 additions: the SHUFFLED stream-static regime (per-batch join
    // exchange feeding the same fold state) and GK quantile summaries in
    // state under the purging watermark (variable-length serialized
    // summary buffers — a different binary-state class than HLL/CMS)
    "st27_invoice_state_shuffled",
    "st28_stream_quantile_purge",
    // r17: symmetric stream-stream join state with BOTH-SIDES outer-row
    // tracking — a different state class again (two keyed buffers plus
    // matched-flags for null-extension on both sides)
    "st32_stream_full_outer_join")

  for (name <- StatefulSuite)
    test(s"$name: identical output under RocksDB and default state stores") {
      val query = SparkEntry.queries(name)
      val default = query(spark, sf).collect()
      val rocks = withProvider(RocksDb) {
        // sanity: the query must actually start under the overridden conf
        assert(spark.conf.get(ProviderKey) == RocksDb)
        query(spark, sf).collect()
      }
      assert(default.nonEmpty, s"$name returned no rows — vacuous matrix")
      assert(rocks.sameElements(default),
        s"$name diverged between state-store providers")
    }
}

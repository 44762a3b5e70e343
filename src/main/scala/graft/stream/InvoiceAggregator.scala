package graft.stream

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The invoice fold as a typed `Aggregator` — the same state/fold/merge
  * as [[InvoiceStateMachine]], packaged for `.agg()` so the per-invoice
  * aggregate runs with map-side partial aggregation (partial states
  * combine exactly because every field is a commutative monoid —
  * [[InvoiceStateMachine.combine]], pinned by FoldProperties).
  *
  * This is the custom-UDAF surface of SURVEY §2.8/§7.3: one fold
  * definition serves `flatMapGroupsWithState` (streaming, stateful) and
  * `groupByKey(...).agg(...)` (batch, shuffle-combined) — the reference
  * duplicated this logic between `Clustering.scala` and
  * `InvoicePipeline.scala`.
  *
  * `finish` emits the aggregate without the key (the grouping key lives
  * outside the aggregation buffer); callers attach it from the groupByKey
  * result.
  */
object InvoiceAggregator extends Aggregator[PurchaseLine, InvoiceState, InvoiceAgg] {
  override def zero: InvoiceState = InvoiceStateMachine.Empty
  override def reduce(s: InvoiceState, p: PurchaseLine): InvoiceState =
    InvoiceStateMachine.fold(s, p)
  override def merge(a: InvoiceState, b: InvoiceState): InvoiceState =
    InvoiceStateMachine.combine(a, b)
  override def finish(s: InvoiceState): InvoiceAgg =
    InvoiceStateMachine.toAgg("", s)
  override def bufferEncoder: Encoder[InvoiceState] = Encoders.product[InvoiceState]
  override def outputEncoder: Encoder[InvoiceAgg] = Encoders.product[InvoiceAgg]
}

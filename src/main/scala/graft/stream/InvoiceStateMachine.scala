package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One parsed purchase line entering the state machine (the reference's
  * `Purchase`, `InvoicePipeline.scala:19-20`, with price pre-converted to
  * exact integer cents and the invoice date pre-parsed to minute-of-day —
  * all floating accumulation happens in integers so the fold is
  * associative/commutative and replay-deterministic). */
case class PurchaseLine(
    invoiceNo: String,
    quantity: Long,
    unitPrice: Double,
    unitPriceCents: Long,
    minuteOfDay: Int)

/** A purchase line carrying its event time, for the watermarked variant
  * of the state machine ([[InvoiceStateMachine.eventTimed]]). */
case class TimedPurchaseLine(line: PurchaseLine, eventTime: java.sql.Timestamp)

/** [[InvoiceState]] plus the key's ALL-TIME newest event time — the
  * idle-purge anchor for [[InvoiceStateMachine.eventTimed]]. Anchoring to
  * the current batch's max instead would let an out-of-order (but
  * on-time) row PULL THE TIMEOUT EARLIER, making purge points depend on
  * how rows happen to fall into batches — the same input with different
  * batching could purge a live key and split its aggregate. */
case class TimedInvoiceState(inv: InvoiceState, maxEventMs: Long)

/** Running per-invoice aggregate — the stream state (the reference's
  * `Invoice`, `InvoicePipeline.scala:22-24`), kept as exact integer sums
  * plus order-insensitive min/max so any arrival order yields the same
  * state. */
case class InvoiceState(
    sumPriceQtyCents: Long,
    sumQty: Long,
    minPrice: Double,
    maxPrice: Double,
    earliestMinute: Int,
    lines: Long)

/** Emitted view of the state after each update. */
case class InvoiceAgg(
    invoice_no: String,
    avg_unit_price: Double,
    min_unit_price: Double,
    max_unit_price: Double,
    time_of_day: Double,
    number_items: Long,
    lines: Long)

/** The reference's stateful per-invoice aggregation (A4,
  * `updateStateByKey(updateInvoiceState)` at `InvoicePipeline.scala:93-136`)
  * as a typed `flatMapGroupsWithState` state machine.
  *
  * Reproduced semantics:
  *  - quantity-weighted running average (`avg=(avg·n+p·q)/(n+q)`,
  *    ref `:110-113`) — held as exact integer sums, emitted as one division;
  *  - running min/max unit price (seeded `Double.MaxValue` /
  *    `MinPositiveValue` in the reference, `:96`; here the first line seeds
  *    directly, which removes the reference's sentinel leaking into output
  *    when an invoice has no lines);
  *  - **delete-on-idle**: the reference returns `None` — purging state — on
  *    the first batch in which a key gets no new purchases (`:99`).
  *    `flatMapGroupsWithState` never invokes idle keys, so the purge is a
  *    processing-time timeout of one trigger: the state times out and is
  *    removed *without emission*, exactly like the reference (downstream
  *    only ever sees keys updated in the current batch);
  *  - update-mode emission: the updated aggregate re-fires on every batch
  *    that touches the invoice (§2.9 #5).
  *
  * Documented divergences (nondeterminism the reference leaks, SURVEY §2.9
  * #8): `time` is the *earliest* line's minute-of-day (reference: whichever
  * line arrived first in the batch), `lines` counts lines (reference:
  * batches), and there is no wall-clock in the state.
  *
  * Scale: state is grouped on `invoiceNo` — the natural shuffle key — and
  * each key holds a fixed ~60 bytes regardless of invoice size; the state
  * store scales linearly with *live* invoices only, because idle state is
  * purged after one trigger.
  */
object InvoiceStateMachine {

  val Empty: InvoiceState =
    InvoiceState(0L, 0L, Double.MaxValue, Double.MinValue, Int.MaxValue, 0L)

  def fold(s: InvoiceState, p: PurchaseLine): InvoiceState = InvoiceState(
    sumPriceQtyCents = s.sumPriceQtyCents + p.unitPriceCents * p.quantity,
    sumQty = s.sumQty + p.quantity,
    minPrice = math.min(s.minPrice, p.unitPrice),
    maxPrice = math.max(s.maxPrice, p.unitPrice),
    earliestMinute = math.min(s.earliestMinute, p.minuteOfDay),
    lines = s.lines + 1L)

  /** Merge two partial states — every field is a commutative monoid, so
    * partial folds combine exactly (the property that lets the same
    * aggregate run as a map-side-combined `Aggregator`, see
    * [[InvoiceAggregator]]). */
  def combine(a: InvoiceState, b: InvoiceState): InvoiceState = InvoiceState(
    sumPriceQtyCents = a.sumPriceQtyCents + b.sumPriceQtyCents,
    sumQty = a.sumQty + b.sumQty,
    minPrice = math.min(a.minPrice, b.minPrice),
    maxPrice = math.max(a.maxPrice, b.maxPrice),
    earliestMinute = math.min(a.earliestMinute, b.earliestMinute),
    lines = a.lines + b.lines)

  def toAgg(invoiceNo: String, s: InvoiceState): InvoiceAgg = InvoiceAgg(
    invoice_no = invoiceNo,
    // real retail data has zero/negative cancellation quantities; an
    // invoice whose quantities sum to zero has no meaningful weighted
    // average — emit 0.0 rather than Infinity/NaN (which would poison
    // downstream distance scoring)
    avg_unit_price = if (s.sumQty == 0L) 0.0
                     else s.sumPriceQtyCents / 100.0 / s.sumQty,
    min_unit_price = s.minPrice,
    max_unit_price = s.maxPrice,
    time_of_day = s.earliestMinute / 60.0,
    number_items = s.sumQty,
    lines = s.lines)

  private def update(idleTimeoutMs: Long)(
      invoiceNo: String,
      rows: Iterator[PurchaseLine],
      state: GroupState[InvoiceState]): Iterator[InvoiceAgg] = {
    if (state.hasTimedOut) {
      // Delete-on-idle without emission (ref `InvoicePipeline.scala:99`).
      state.remove()
      Iterator.empty
    } else {
      val next = rows.foldLeft(state.getOption.getOrElse(Empty))(fold)
      state.update(next)
      if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
      Iterator.single(toAgg(invoiceNo, next))
    }
  }

  /** Apply the state machine. Works on a streaming `Dataset` (update mode,
    * processing-time timeout ≈ one trigger) and on a batch `Dataset`
    * (single conceptual batch; timeouts never fire), so batch equivalence
    * is checked against the *same code path*.
    *
    * @param idleTimeoutMs processing-time idle timeout; ≤0 disables.
    *                      Note: with a processing-time timeout registered,
    *                      Spark's micro-batch engine intentionally runs a
    *                      batch every trigger forever (to fire future
    *                      timeouts — `FlatMapGroupsWithStateExec.
    *                      shouldRunAnotherBatch` is constant-true), so
    *                      such a query never self-terminates under
    *                      `Trigger.AvailableNow`; finite replays that
    *                      don't span multiple triggers should disable it.
    */
  def apply(lines: Dataset[PurchaseLine], idleTimeoutMs: Long): Dataset[InvoiceAgg] = {
    import lines.sparkSession.implicits._
    val conf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    lines
      .groupByKey(_.invoiceNo)
      .flatMapGroupsWithState(OutputMode.Update, conf)(update(idleTimeoutMs))
  }

  private def updateEventTimed(idleMs: Long)(
      invoiceNo: String,
      rows: Iterator[TimedPurchaseLine],
      state: GroupState[TimedInvoiceState]): Iterator[InvoiceAgg] = {
    if (state.hasTimedOut) {
      state.remove() // delete-on-idle without emission, watermark-driven
      Iterator.empty
    } else {
      var batchMax = Long.MinValue
      val prev = state.getOption.getOrElse(TimedInvoiceState(Empty, Long.MinValue))
      val inv = rows.foldLeft(prev.inv) { (acc, t) =>
        if (t.eventTime.getTime > batchMax) batchMax = t.eventTime.getTime
        fold(acc, t.line)
      }
      // the purge anchor is the key's ALL-TIME newest event (carried in
      // state), so an out-of-order row can never pull the horizon
      // backwards — purge points are a function of the input, not of how
      // it was batched (see TimedInvoiceState)
      val next = TimedInvoiceState(inv, math.max(prev.maxEventMs, batchMax))
      state.update(next)
      // purge when the watermark passes idleMs beyond that anchor (not
      // the batch-start watermark, which lags a full batch behind: a key
      // whose own rows advance the watermark would otherwise time out in
      // the no-data batch the engine runs right after, losing live
      // state). Rows here survived the watermark filter, so the anchor >=
      // current watermark and the timestamp is legal. Replay-deterministic
      // (event time, not wall clock), and safe under Trigger.AvailableNow —
      // the engine only reruns while the watermark still moves, so finite
      // replays terminate (unlike the processing-time timeout, see [[apply]])
      state.setTimeoutTimestamp(
        math.max(next.maxEventMs, state.getCurrentWatermarkMs) + idleMs)
      Iterator.single(toAgg(invoiceNo, inv))
    }
  }

  /** Event-time variant: the production shape for out-of-order sources.
    * The watermark bounds BOTH late data (rows with `eventTime` behind the
    * watermark are dropped before reaching the fold — without one, a
    * single straggler can resurrect and corrupt any invoice's aggregate
    * forever) and state lifetime (idle purge is driven by the event-time
    * watermark, so replaying the same input gives the same purge points —
    * the processing-time variant's lifecycle depends on wall-clock trigger
    * cadence).
    *
    * @param watermarkDelay how far out-of-order events may arrive
    *                       (e.g. "10 minutes")
    * @param idleMs state is purged once the watermark has advanced this
    *               far past the key's newest event time; must be positive
    *               (there is no "disabled" mode here — bounding state
    *               lifetime by the watermark is this variant's point, and
    *               a non-positive horizon would register timeouts at or
    *               before the current watermark, which the state API
    *               rejects) */
  def eventTimed(lines: Dataset[TimedPurchaseLine], watermarkDelay: String,
                 idleMs: Long): Dataset[InvoiceAgg] = {
    require(idleMs > 0, s"idleMs must be positive, got $idleMs")
    import lines.sparkSession.implicits._
    lines
      .withWatermark("eventTime", watermarkDelay)
      .as[TimedPurchaseLine]
      .groupByKey(_.line.invoiceNo)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(updateEventTimed(idleMs))
  }
}

package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.stream.{InvoiceState, InvoiceStateMachine, PurchaseLine}

/** Property tests for the invoice state fold (SURVEY §5.4): the invariants
  * that make the streaming aggregate correct under ANY batch split and
  * arrival interleaving — which is exactly what a cluster does to the
  * data.
  */
object FoldProperties extends Properties("InvoiceStateFold") {

  private val genLine: Gen[PurchaseLine] = for {
    qty <- Gen.choose(1L, 50L)
    cents <- Gen.choose(1L, 100_000L)
    minute <- Gen.choose(0, 1439)
  } yield PurchaseLine("A", qty, cents / 100.0, cents, minute)

  private val genLines: Gen[List[PurchaseLine]] = Gen.nonEmptyListOf(genLine)

  private val Empty = InvoiceState(0L, 0L, Double.MaxValue, Double.MinValue, Int.MaxValue, 0L)

  private def foldAll(lines: Seq[PurchaseLine]): InvoiceState =
    lines.foldLeft(Empty)(InvoiceStateMachine.fold)

  property("associative across any batch split") = forAll(genLines, Gen.choose(0, 100)) {
    (lines, cut) =>
      val i = cut % (lines.size + 1)
      val (b1, b2) = lines.splitAt(i)
      foldAll(b1 ++ b2) == b2.foldLeft(foldAll(b1))(InvoiceStateMachine.fold)
  }

  property("order-insensitive (commutative accumulation)") = forAll(genLines) { lines =>
    foldAll(lines) == foldAll(lines.reverse)
  }

  property("partial folds merge exactly (Aggregator map-side combine)") =
    forAll(genLines, Gen.choose(0, 100)) { (lines, cut) =>
      val (b1, b2) = lines.splitAt(cut % (lines.size + 1))
      InvoiceStateMachine.combine(foldAll(b1), foldAll(b2)) == foldAll(lines)
    }

  property("number_items = sum of quantities; lines = line count") = forAll(genLines) { lines =>
    val agg = InvoiceStateMachine.toAgg("A", foldAll(lines))
    agg.number_items == lines.map(_.quantity).sum && agg.lines == lines.size.toLong
  }

  property("min <= weighted avg <= max (within cents rounding)") = forAll(genLines) { lines =>
    val agg = InvoiceStateMachine.toAgg("A", foldAll(lines))
    Prop(agg.avg_unit_price >= agg.min_unit_price - 0.01 &&
      agg.avg_unit_price <= agg.max_unit_price + 0.01)
  }

  property("time_of_day = earliest line's decimal hour") = forAll(genLines) { lines =>
    val agg = InvoiceStateMachine.toAgg("A", foldAll(lines))
    agg.time_of_day == lines.map(_.minuteOfDay).min / 60.0
  }

  property("zero net quantity emits finite avg (cancellation lines)") =
    forAll(Gen.choose(1L, 50L), Gen.choose(1L, 100_000L)) { (qty, cents) =>
      // a purchase fully cancelled: +qty then −qty of the same line
      val buy = PurchaseLine("A", qty, cents / 100.0, cents, 600)
      val cancel = buy.copy(quantity = -qty)
      val agg = InvoiceStateMachine.toAgg("A", foldAll(Seq(buy, cancel)))
      agg.number_items == 0L && agg.avg_unit_price == 0.0 &&
        !agg.avg_unit_price.isNaN && !agg.avg_unit_price.isInfinite
    }
}

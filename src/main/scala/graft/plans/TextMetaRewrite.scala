package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BinaryComparison, Cast, Length}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}

/** Computed-column substitution for the documents contract: wherever a
  * filter compares `length(text)` against a constant, compare the
  * materialized `n_chars` column instead (the ingest contract guarantees
  * `n_chars = length(text)`; TESTDATA.md documents schema).
  *
  * Why this is worth a custom `Rule[LogicalPlan]`: `length(text) > k`
  * forces the scan to read and measure the corpus' largest column, while
  * `n_chars > k` is a plain long predicate — it reaches the parquet scan
  * as a pushed filter (row groups prune on min/max stats) and, when the
  * query doesn't otherwise need `text`, column pruning then drops the
  * string column from ReadSchema entirely. At 100 TB of documents that is
  * the difference between scanning the corpus and scanning an 8-byte
  * column. The rewrite only fires when
  *
  *  - `spark.graft.textMetaRewrite=true` (explicit opt-in: the rule
  *    encodes a DATA contract, not a language equivalence),
  *  - the `text` attribute being measured traces to a leaf relation that
  *    also exposes a long `n_chars`, and
  *  - that `n_chars` attribute is still present in the filter child's
  *    output (column pruning may already have dropped it — then skipping
  *    is the only sound choice).
  *
  * The comparison's other side must be foldable, and is cast to long so
  * the rewritten predicate stays a single pushable comparison.
  */
object TextMetaRewrite extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.textMetaRewrite"

  private def metaTwin(child: LogicalPlan, text: AttributeReference): Option[Attribute] =
    child.collectLeaves().find(_.outputSet.contains(text)).flatMap { leaf =>
      leaf.output.find(a => a.name == "n_chars" && a.dataType == LongType)
        .filter(nc => child.outputSet.contains(nc))
    }

  private def isTextAttr(e: AttributeReference): Boolean =
    e.name == "text" && e.dataType == StringType

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transform {
      case f @ Filter(cond, child) =>
        val rewritten = cond.transform {
          case cmp @ BinaryComparison(Length(t: AttributeReference), rhs)
              if isTextAttr(t) && rhs.foldable =>
            metaTwin(child, t)
              .map(nc => cmp.withNewChildren(Seq(nc, Cast(rhs, LongType))))
              .getOrElse(cmp)
          case cmp @ BinaryComparison(lhs, Length(t: AttributeReference))
              if isTextAttr(t) && lhs.foldable =>
            metaTwin(child, t)
              .map(nc => cmp.withNewChildren(Seq(Cast(lhs, LongType), nc)))
              .getOrElse(cmp)
        }
        if (rewritten fastEquals cond) f else Filter(rewritten, child)
    }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, BroadcastQueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Catalog-wide physical-plan invariants — "the plan I'd want at 100×"
  * as enforced asserts, not per-query comments.
  *
  * Every batch catalog query is planned (not executed) and checked for
  * scale-killers: a `CartesianProduct` or an unhinted
  * `BroadcastNestedLoopJoin` is O(n·m) at cluster scale no matter how
  * fast it runs at test SF. The load-bearing plan shapes are then pinned
  * individually: scan-level pushdown (q01/q06), top-k without a global
  * sort (q02), dimension broadcast (q03), and the exchange-free bucketed
  * join (q12). A negative control proves the pins have teeth.
  *
  * Streaming catalog entries (st*) are excluded: their query functions
  * RUN a finite stream and return the sink read-back, so the returned
  * plan is just a parquet/memory scan — their plan shapes (state bounds,
  * watermarks, broadcast stream-static joins) are pinned in StreamSpec.
  */
class PlanSpec extends SparkSuite {

  /** an01 is the documented brute-force ANN baseline: the query side is
    * small and explicitly broadcast, the corpus side streams — a
    * BroadcastNestedLoopJoin is the intended plan, not an accident.
    * an03 embeds that same brute-force frame as the recall ground truth. */
  /** tx12 crossJoins an explicitly-broadcast 1-row aggregate (the corpus
    * size scalar) into the scorer — O(n·1), the scale-correct way to
    * attach a global scalar without collapsing to one partition. q33 is
    * the same pattern twice: the total-count scalar (1 row) into the
    * boundary aggregate, and the 7-boundary frame (1 row) onto the
    * value stream — both explicitly `broadcast()`-hinted, so the
    * BroadcastNestedLoopJoin is O(n·1) replication of constants, not a
    * pairwise product. */
  /** dd10 embeds the O(n²) all-pairs certification baseline
    * (`Similarity.allPairsCosine`, explicitly broadcast) as its recall
    * ground truth — same standing as an01/an03's brute-force frames.
    * dd12 attaches its two 1-row certificate aggregates (cap_bounded,
    * hot_bucket_seen) to the 1-row recall aggregate via explicitly
    * `broadcast()`-hinted crossJoins — O(1·1) scalar attaches, the tx12
    * pattern. */
  /** tx22 attaches its 1-row premise aggregate (base_pii_docs) to the
    * PII-hit stream via an explicitly `broadcast()`-hinted crossJoin —
    * the tx12 O(n·1) scalar-attach pattern. tx24's stripe-offset prefix
    * sum is the q33 pattern: a broadcast theta-join over the stripe-count
    * frame, bounded at 256×256 rows regardless of corpus size. */
  private val bnljWhitelist = Set("an01_cosine_topk_brute", "an10_maxsim_topk",
    "an03_ivf_recall",
    "an04_pq_recall", "an05_ivfpq_recall", "an07_filtered_topk",
    "an09_sq8_recall",
    // an02/an11: like an03–an09, their recall certificates embed the
    // brute-force exact-cosine ground truth — a BOUNDED broadcast query
    // frame (≤ fixed query count) theta-joined against the corpus with
    // `query_id != neighbor_id`. O(n·queries) with a constant query set;
    // the documented baseline posture, not an accident.
    "an02_cosine_topk_ivf", "an11_opq_recall",
    // an13: the same bounded ≤10-query frame theta-joined against the
    // corpus (fresh pqTopK/opqTopK) and against the persisted CODES
    // table (pqTopKWithIndex/opqTopKWithIndex) — O(n·queries) both ways,
    // the exhaustive-PQ posture an04 certifies (IVF·PQ is the
    // candidate-cutting tier).
    "an13_pq_index_persistence",
    "q26_market_basket",
    "sk05_hll_intersection", "q33_range_partition_plan",
    "dd10_embdup_recall", "dd11_semantic_keepers",
    "tx19_mixture_rebalance",
    "tx24_deterministic_shuffle",
    // tx18: the q33/tx24 theta-join over the ≤256-row stripe frame —
    // explicitly broadcast()-hinted bounded attach (not a 1-row scalar,
    // so it stays name-listed with this boundedness proof)
    "tx18_sequence_packing")

  /** Structural recognition of the scalar-attach pattern: a
    * BroadcastNestedLoopJoin whose BROADCAST side is guaranteed to
    * produce at most one row — a global (no grouping keys) aggregate,
    * possibly wrapped in projects/filters/exchanges, or a join of two
    * such 1-row frames. Replicating a 1-row constant across n stream
    * rows is O(n·1): the scale-correct way to attach a corpus-wide
    * scalar (count, recall certificate, integrity bit) without
    * collapsing the stream to one partition. Queries using this pattern
    * pass the sweep BY SHAPE — no whitelist entry needed — so a new
    * certificate query can't break the suite by forgetting a name here.
    * Everything else (brute-force baselines, bounded >1-row theta
    * frames) still needs an explicit `bnljWhitelist` entry with a
    * boundedness comment. */
  private def maxOneRow(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case e: BroadcastExchangeExec => maxOneRow(e.child)
    case r: ReusedExchangeExec => maxOneRow(r.child)
    case q: BroadcastQueryStageExec => maxOneRow(q.plan)
    case a: AdaptiveSparkPlanExec => maxOneRow(a.executedPlan)
    case w: WholeStageCodegenExec => maxOneRow(w.child)
    case i: InputAdapter => maxOneRow(i.child)
    case pr: ProjectExec => maxOneRow(pr.child)
    case f: FilterExec => maxOneRow(f.child)
    case j: BroadcastNestedLoopJoinExec => maxOneRow(j.left) && maxOneRow(j.right)
    case _ => false
  }

  private def isScalarAttach(j: BroadcastNestedLoopJoinExec): Boolean = {
    val broadcastSide = j.buildSide match {
      case BuildLeft => j.left
      case BuildRight => j.right
    }
    maxOneRow(broadcastSide)
  }

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def planOf(df: DataFrame): SparkPlan =
    unwrap(df.queryExecution.executedPlan)

  private val batchQueries = SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot(_._1.startsWith("st"))

  for ((name, fn) <- batchQueries) {
    test(s"$name plans without cartesian products or unhinted BNL joins") {
      val root = planOf(fn(spark, sf))
      val cartesians = root.collect { case c: CartesianProductExec => c }
      assert(cartesians.isEmpty,
        s"$name plans a CartesianProduct — O(n*m) at scale:\n$root")
      if (!bnljWhitelist(name)) {
        val bad = root.collect {
          case j: BroadcastNestedLoopJoinExec if !isScalarAttach(j) => j
        }
        assert(bad.isEmpty,
          s"$name plans a BroadcastNestedLoopJoin whose broadcast side is " +
            s"not a guaranteed 1-row scalar — non-equi fallback, O(n*m) " +
            s"work at scale:\n$root")
      }
    }
  }

  test("negative control: a >=1-row broadcast cross join is NOT accepted as a scalar attach") {
    // a 3-row broadcast frame crossJoined onto a stream is O(3n)
    // replication today and O(kn) tomorrow — the structural recognizer
    // must reject it so only provably-1-row global aggregates pass by
    // shape. This proves maxOneRow has teeth.
    val s = spark
    import s.implicits._
    val stream = graft.model.Tables.lineitem(s, sf).select($"l_orderkey")
    val multiRow = Seq(1, 2, 3).toDF("tag")
    val crossed = stream.crossJoin(broadcast(multiRow))
    val bnljs = planOf(crossed).collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnljs.nonEmpty, "control did not even plan a BNLJ — test is vacuous")
    assert(bnljs.exists(j => !isScalarAttach(j)),
      "structural recognizer accepted a multi-row broadcast frame as a " +
        "scalar attach — the sweep has lost its teeth")
    // and the positive shape it exists to allow: a global aggregate
    val scalar = stream.agg(count(lit(1)).as("n"))
    val attached = stream.crossJoin(broadcast(scalar))
    val ok = planOf(attached).collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(ok.nonEmpty && ok.forall(isScalarAttach),
      "structural recognizer rejected a genuine 1-row global-aggregate attach")
  }

  /** Entries allowed to plan a WindowExec with an EMPTY partition spec.
    * An unpartitioned window funnels its whole input frame through ONE
    * task, so it is only admissible when that frame is provably bounded
    * (does not grow with the base tables). Each entry here is:
    *  - ev20: cumulative uniques over the PER-DAY aggregate frame
    *    (≤ calendar days covered by the fixture, not event count)
    *  - q24: the dictionary-encode rank over the DISTINCT-value frame
    *    (bounded dictionary cardinality by construction)
    *  - ml03/ml05: the k-sweep elbow curve (≤ 20 rows, one per k)
    * Anything else tripping this sweep is a scale-killer: fix it with the
    * tx18/tx24/q33 striped prefix-sum pattern. */
  private val unpartitionedWindowWhitelist: Set[String] = Set(
    "ev20_cumulative_uniques", "q24_dict_encode",
    "ml03_elbow_selection", "ml05_elbow_invoice")

  test("catalog sweep: no unpartitioned WindowExec over an unbounded frame") {
    val offenders = batchQueries.flatMap { case (name, fn) =>
      if (unpartitionedWindowWhitelist(name)) Nil
      else {
        val root = planOf(fn(spark, sf))
        val bad = root.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) Seq(name -> bad.size) else Nil
      }
    }
    assert(offenders.isEmpty,
      s"unpartitioned WindowExec (single-task frame at scale) in: " +
        s"${offenders.map { case (n, c) => s"$n($c)" }.mkString(", ")} — " +
        "use the tx18/tx24/q33 striped prefix-sum pattern or whitelist " +
        "with a boundedness proof")
  }

  test("q07: rank<=k is pushed to a map-side WindowGroupLimit before the shuffle") {
    // the property that makes per-group top-k viable at 100 TB: each
    // map partition keeps only k rows per group BEFORE the exchange, so
    // shuffle volume is k·groups, not the full fact table. Spark plans
    // this as a partial WindowGroupLimitExec below the Exchange plus a
    // final one above it — pin both, and pin the partial genuinely
    // sitting under the exchange.
    val root = planOf(SparkEntry.queries("q07_top_orders_per_customer")(spark, sf))
    val limits = root.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(limits.size == 2, s"expected partial+final WindowGroupLimit, got ${limits.size}")
    val underExchange = root.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.collectLeaves().nonEmpty && e.collect {
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
        }.nonEmpty => e
    }
    assert(underExchange.nonEmpty,
      "no WindowGroupLimit below an exchange — the limit is not map-side")
  }

  test("q01/q06: predicates and projection reach the lineitem parquet scan") {
    for ((name, maxCols) <- Seq("q01_pricing_summary" -> 7,
                                "q06_revenue_forecast_filter" -> 4)) {
      val scans = planOf(SparkEntry.queries(name)(spark, sf)).collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty, s"$name: no FileSourceScanExec found")
      for (scan <- scans) {
        assert(scan.metadata.getOrElse("PushedFilters", "[]") != "[]",
          s"$name: scan has no pushed filters — the parquet reader would " +
            s"decode every row group at scale:\n$scan")
        assert(scan.requiredSchema.size <= maxCols,
          s"$name: scan reads ${scan.requiredSchema.size} columns " +
            s"(${scan.requiredSchema.fieldNames.mkString(",")}), " +
            s"expected <= $maxCols — column pruning regressed")
      }
    }
  }

  test("dd18: the Bloom probe filters train shingles BELOW the join's exchange") {
    // the entry's whole point: shuffle volume ∝ bloom-surviving
    // candidates, not ∝ corpus — so the might_contain filter must sit
    // under a ShuffleExchange, not above the join
    val root = planOf(SparkEntry.queries("dd18_bloom_decontaminate")(spark, sf))
    val prunedExchanges = root.collect {
      case e: ShuffleExchangeExec if e.collect {
        case f: FilterExec if f.condition.toString.contains("might_contain") => f
      }.nonEmpty => e
    }
    assert(prunedExchanges.nonEmpty,
      s"no exchange fed by a might_contain filter — the Bloom prefilter " +
        s"is not map-side:\n$root")
  }

  test("q02: global top-k plans TakeOrderedAndProject, not a full sort") {
    val plan = planOf(SparkEntry.queries("q02_top_orders")(spark, sf)).toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"q02 must plan per-partition heaps + driver merge of k rows:\n$plan")
  }

  test("q03: the customer dimension joins as exactly one BroadcastHashJoin") {
    // broadcast-by-stats off, so the ONE BroadcastHashJoin present is the
    // explicit broadcast() hint on customer — the plan shape that holds at
    // any fact-table size, not just when sf0.001 stats allow it
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planOf(SparkEntry.queries("q03_revenue_by_segment")(spark, sf)).toString
      val nBhj = "BroadcastHashJoin".r.findAllIn(plan).size
      assert(nBhj == 1,
        s"q03 expected exactly 1 hinted BroadcastHashJoin (customer dim), got $nBhj:\n$plan")
      assert(plan.contains("SortMergeJoin"),
        s"q03's lineitem-orders join must shuffle-merge, not replicate:\n$plan")
    } finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q12: the bucketed join reads co-located buckets — no exchange below the join") {
    // force the sort-merge path so bucket co-location (not a broadcast)
    // is what removes the exchanges
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val root = planOf(SparkEntry.queries("q12_bucketed_join")(spark, sf))
      val smjs = root.collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"q12 expected a SortMergeJoin:\n$root")
      for (j <- smjs) {
        val shuffles = j.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty,
          s"q12's bucketed join must not shuffle either side:\n$root")
      }
    } finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("dd14: no shuffle carries document text — only hashed grams, " +
    "positions, and per-doc counts cross an exchange") {
    val plan = planOf(SparkEntry.queries("dd14_duplicate_spans")(spark, sf))
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, s"dd14 expected shuffles in:\n$plan")
    for (e <- exchanges)
      assert(!e.output.exists(_.name == "text"),
        s"dd14 exchange carries the raw text column — the 16 B-digest " +
          s"shuffle claim is broken:\n$e")
  }

  test("q18/ev11: the window stack runs on ONE shuffle and ONE sort") {
    // q18's five analytics (lag×2, ntile, percent_rank, cume_dist) and
    // ev11's three frames all declare the same (partitionBy, orderBy).
    // Spark stacks one WindowExec per distinct frame, but the invariant
    // that matters at 100 TB is that the whole stack is fed by a single
    // hash-partition exchange and a single in-partition sort — a second
    // exchange or sort below the stack would mean the shared window spec
    // stopped being reused.
    for (name <- Seq("q18_order_timeline", "ev11_rolling_user_value")) {
      val root = planOf(SparkEntry.queries(name)(spark, sf))
      // collect is pre-order: head = topmost window node
      val windows = root.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty && windows.size <= 2,
        s"$name expected 1-2 stacked WindowExec nodes, got ${windows.size}:\n$root")
      val shufflesBelow = windows.head.collect { case e: ShuffleExchangeExec => e }
      assert(shufflesBelow.size == 1,
        s"$name expected exactly 1 exchange feeding the window stack, " +
          s"got ${shufflesBelow.size}:\n$root")
      val sortsBelow = windows.head.collect {
        case e: org.apache.spark.sql.execution.SortExec => e
      }
      assert(sortsBelow.size == 1,
        s"$name expected exactly 1 sort feeding the window stack, " +
          s"got ${sortsBelow.size}:\n$root")
    }
  }

  /** Entries allowed a broadcast hint on a >1-row LOGICAL subtree. The
    * r15 verdict's only two weak findings were forced broadcasts of
    * fact-scaling frames (q40's FK key sets, purchaseStream's orders) —
    * this sweep makes that failure mode structural: any NEW multi-row
    * broadcast hint outside this list fails the suite until its
    * boundedness is argued here. Every entry is bounded by construction:
    *  - an01–an12, an06/an10: the fixed ≤10-vector query set and the
    *    brute-force recall ground-truth frames derived from it (the
    *    documented ANN baseline posture);
    *  - q03: the canonical dimension-side broadcast (the q03 pin's whole
    *    point; its negative control proves the hint is load-bearing);
    *  - q20: a pre-aggregated frame keyed on the bounded group domain;
    *  - q24: the distinct-value dictionary (bounded cardinality by
    *    construction — the dictionary-encode premise);
    *  - q33/tx18/tx19/tx24: the ≤256-row stripe/boundary/rate frames
    *    (the striped prefix-sum pattern);
    *  - ev17: the per-day aggregate frame (≤ calendar days);
    *  - sk06/sk07: per-group KMV synopses over the bounded audited-group
    *    set (≤8k+4 B each — the KB-artifact posture);
    *  - tx29/tx32/tx33/tx34: the distinct-word dictionary with per-word
    *    token counts (vocabulary growth, sub-corpus by Heaps' law — the
    *    blessed tx29 scale shape: the corpus pays one broadcast join). */
  private val multiRowHintWhitelist: Set[String] = Set(
    "an01_cosine_topk_brute", "an02_cosine_topk_ivf", "an03_ivf_recall",
    "an04_pq_recall", "an05_ivfpq_recall", "an06_jaccard_topk",
    "an07_filtered_topk", "an09_sq8_recall", "an10_maxsim_topk",
    "an11_opq_recall", "an12_index_persistence", "an13_pq_index_persistence",
    "ev17_rolling_actives",
    "q03_revenue_by_segment", "q20_outer_join", "q24_dict_encode",
    "q33_range_partition_plan",
    "sk06_theta_intersection", "sk07_persisted_synopses",
    "tx18_sequence_packing", "tx19_mixture_rebalance",
    "tx24_deterministic_shuffle",
    "tx29_bpe_encode", "tx32_bpe_decode_roundtrip",
    "tx33_wordpiece_encode", "tx34_wordpiece_roundtrip")

  test("catalog sweep: no broadcast hint on an unbounded (fact-scaling) side") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val offenders = batchQueries.flatMap { case (name, fn) =>
      val hints = fn(spark, sf).queryExecution.analyzed.collect {
        case h: ResolvedHint => h }
      val multi = hints.filterNot(_.child.maxRows.exists(_ <= 1))
      if (multi.nonEmpty && !multiRowHintWhitelist(name))
        Some(s"$name (${multi.map(_.child.nodeName).mkString(", ")})")
      else None
    }
    assert(offenders.isEmpty,
      "broadcast hint on a multi-row side outside the boundedness " +
        s"whitelist — the q40/purchaseStream failure mode:\n" +
        offenders.mkString("\n"))
    // teeth both ways: every whitelisted name must still CARRY a
    // multi-row hint, or the list is stale and silently over-permissive
    val stale = multiRowHintWhitelist.filter { name =>
      SparkEntry.queries(name)(spark, sf).queryExecution.analyzed.collect {
        case h: ResolvedHint if !h.child.maxRows.exists(_ <= 1) => h
      }.isEmpty
    }
    assert(stale.isEmpty,
      s"whitelisted entries no longer carry a multi-row hint — prune them: $stale")
  }

  test("q40: no broadcast hint on a side that scales with the fact table") {
    // The r15 shape forced broadcast(orders.select(o_orderkey)) /
    // broadcast(part.select(p_partkey)) under the FK anti-joins — a
    // driver OOM at 100× because orders/part grow WITH lineitem. The
    // fixed shape leaves the anti-join UNHINTED (AQE broadcasts only
    // when the key table is genuinely small at runtime) and hints only
    // the 1-row certificate attaches. Pin: every broadcast hint in the
    // analyzed plan sits on a LOGICALLY max-1-row subtree (a global
    // aggregate), never on a table-scaling frame.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = SparkEntry.queries("q40_constraint_audit")(spark, sf)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.nonEmpty,
      "q40 lost its 1-row scalar attaches entirely — pin is vacuous")
    val bad = hints.filterNot(_.child.maxRows.exists(_ <= 1))
    assert(bad.isEmpty,
      s"q40 carries a broadcast hint on a multi-row (table-scaling) side " +
        s"— the collected-dimension OOM at 100×:\n${bad.mkString("\n")}")
    // negative control: the OLD r15 shape IS caught by this pin
    val s = spark
    import s.implicits._
    val old = graft.model.Tables.lineitem(s, sf).select($"l_orderkey")
      .join(broadcast(graft.model.Tables.orders(s, sf).select($"o_orderkey")),
        $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).as("v_fk_orders"))
    val oldHints = old.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(oldHints.nonEmpty && oldHints.exists(!_.child.maxRows.exists(_ <= 1)),
      "the r15 hinted-key-set shape no longer trips the pin — teeth lost")
  }

  test("negative control: dropping q03's broadcast hint is caught by the pin") {
    // the same join tree WITHOUT the hint: with stats-based broadcast off,
    // no BroadcastHashJoin appears — proving the q03 pin fails when the
    // hint is removed rather than passing vacuously
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val unhinted = graft.model.Tables.lineitem(s, sf)
        .join(graft.model.Tables.orders(s, sf), $"l_orderkey" === $"o_orderkey")
        .join(graft.model.Tables.customer(s, sf), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = planOf(unhinted).toString
      assert(!plan.contains("BroadcastHashJoin"),
        "unhinted twin unexpectedly broadcast — the q03 pin would not " +
          s"detect a dropped hint:\n$plan")
    } finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}

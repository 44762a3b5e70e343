package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import QueryUtil._

/** General relational surface — scans, filters, joins (inner/semi/anti),
  * hash aggregation, distinct aggregation, analytic window functions, set
  * ops, rollup, top-k. The reference itself has no joins or SQL surface
  * (SURVEY.md §2.4); this is the new-engine surface mandated by §7.2 step 2,
  * exercised on the driver's TPC-H-ish testdata.
  *
  * Scale notes per query are inline; the common themes:
  *  - dimension sides of joins are `broadcast()` (no shuffle of the fact),
  *  - aggregates are plain `groupBy().agg()` so Catalyst plans
  *    partial+final hash aggregation (map-side combine before the exchange),
  *  - filters/projections sit directly on the parquet scan (pushdown).
  */
object RelationalQueries {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-style pricing summary: one scan, one partial+final hash
    // aggregate over a low-cardinality key — no data-size-dependent state.
    "q01_pricing_summary" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("1999-01-01").cast("timestamp_ntz"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          sumMoney($"l_extendedprice").as("sum_base_price"),
          sumMoney($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          sumMoney($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
          avg($"l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // Global top-k: Catalyst plans TakeOrderedAndProject — per-partition
    // heaps then a driver merge of k rows, never a full sort at scale.
    "q02_top_orders" -> { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },

    // 3-way join: lineitem⋈orders shuffles on the join key (both sides
    // large); customer is a dimension → broadcast, so the fact table is
    // never re-shuffled for it. AQE can upgrade orders to broadcast when
    // stats allow.
    "q03_revenue_by_segment" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(
          sumMoney($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          countDistinct($"o_orderkey").as("n_orders"),
          count(lit(1)).as("n_lines"))
        .orderBy($"c_mktsegment")
    },

    // Left-semi join (EXISTS): the build side is pre-filtered and only the
    // key column survives pruning — minimal shuffle payload.
    "q04_big_spender_segments" -> { (s, dir) =>
      import s.implicits._
      val c = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).filter($"o_totalprice" > 300000.0).select($"o_custkey")
      c.join(big, $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    },

    // Left-anti join (NOT EXISTS).
    "q05_customers_without_orders" -> { (s, dir) =>
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).select($"o_custkey")
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // TPC-H Q6-style selective scan: every predicate and both referenced
    // columns push to the parquet reader (PushedFilters + 4-column
    // ReadSchema) — the query reads a fraction of the table at scale.
    "q06_revenue_forecast_filter" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter(
          $"l_shipdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp_ntz") &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(
          sumMoney($"l_extendedprice" * $"l_discount").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // Analytic window function: rank-per-group, a single shuffle on the
    // partition key then sorted rank within partitions.
    "q07_top_orders_per_customer" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey", $"rn")
    },

    // Distinct aggregation (expand + two-phase aggregate under the hood).
    "q08_distinct_counts" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_lines"))
        .orderBy($"l_returnflag")
    },

    // Set operations: INTERSECT / EXCEPT (both distinct-semantics) over
    // disjoint tagged branches, then a safe UNION ALL.
    "q09_user_set_ops" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      val purchasers = ev.filter($"event_type" === "purchase").select($"user_id")
      val erroring = ev.filter($"event_type" === "error").select($"user_id")
      purchasers.intersect(erroring).withColumn("tag", lit("both"))
        .union(purchasers.except(erroring).withColumn("tag", lit("purchase_only")))
        .orderBy($"tag", $"user_id")
    },

    // Multi-level aggregation via ROLLUP (Expand operator feeding one
    // hash aggregate — still a single shuffle).
    "q10_rollup_quantities" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n_lines"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"sum_qty", $"n_lines")
        .orderBy($"returnflag", $"linestatus")
    },

    // CUBE: all grouping-set combinations (rollup's lattice completion) —
    // one pass, Catalyst expands to a single Expand + hash aggregate.
    "q14_cube_quantities" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n_lines"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"sum_qty", $"n_lines")
        .orderBy($"returnflag", $"linestatus")
    },

    // Exact moments: mean/variance/stddev derived from EXACT decimal sums
    // (Σcents, Σcents²) in one pass. Float-accumulated variance
    // (`var_samp`) is partition-order-dependent — results wiggle with
    // parallelism; exact integer moments are order-independent, so the
    // same doubles come out at any cluster size (and match DuckDB's
    // hugeint arithmetic bit-for-bit).
    //
    // Exactness envelope: the variance numerator n·s2 − s1² is computed in
    // decimal(38,0), so it must stay below 10^38. With cents ≤ 10^7
    // (prices ≤ $10^5), n·s2 ≤ n²·10^14 — exact up to n ≈ 10^12 rows PER
    // GROUP; past that, Spark raises under ANSI mode (nulls otherwise)
    // rather than silently losing precision. Beyond the envelope, either
    // pre-aggregate per sub-key and combine the (n, s1, s2) triples on the
    // few post-agg rows in arbitrary precision, or switch to Welford-style
    // `var_pop` and give up bit-reproducibility.
    "q15_exact_moments" -> { (s, dir) =>
      import s.implicits._
      val cents = round($"l_extendedprice" * 100).cast("decimal(18,0)")
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_lines"),
          sum(cents).as("s1"), sum(cents * cents).as("s2"))
        .select($"l_returnflag", $"n_lines",
          ($"s1".cast("double") / 100.0 / $"n_lines").as("mean_price"),
          (($"n_lines" * $"s2" - $"s1" * $"s1").cast("double")
            / 10000.0 / $"n_lines" / $"n_lines").as("var_price"),
          sqrt(($"n_lines" * $"s2" - $"s1" * $"s1").cast("double")
            / 10000.0 / $"n_lines" / $"n_lines").as("stddev_price"))
        .orderBy($"l_returnflag")
    },

    // PIVOT: long-to-wide reshape (one hash aggregate; the pivot values
    // are fixed so no extra distinct pass).
    "q16_pivot_quantities" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum($"l_quantity"))
        .orderBy($"l_returnflag")
    },

    // Salted join (skew tool): deterministic per-row salt spreads each
    // order key over 8 sub-partitions, orders replicated per salt —
    // result must be identical to the plain join (the oracle is the
    // plain join).
    "q11_salted_join" -> { (s, dir) =>
      import s.implicits._
      graft.ops.Joins.saltedEquiJoin(
        Tables.lineitem(s, dir).withColumnRenamed("l_orderkey", "o_orderkey"),
        Tables.orders(s, dir),
        key = "o_orderkey",
        saltEntropy = Seq("o_orderkey", "l_linenumber"),
        saltFactor = 8)
        .groupBy($"o_orderstatus")
        .agg(sumMoney($"l_extendedprice").as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy($"o_orderstatus")
    },

    // Exact percentiles (sort-based, deterministic; both engines use
    // linear interpolation at rank p·(n−1) so the doubles are identical).
    // At true corpus scale the approx sketch (percentile_approx/t-digest)
    // replaces this — exact percentile needs the group's values together.
    "q13_quantity_percentiles" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          count(lit(1)).as("n_lines"))
        .orderBy($"l_returnflag")
    },

    // Explicit GROUPING SETS (the general form rollup/cube specialize):
    // four hand-picked sets in ONE pass — Spark expands to a single
    // aggregate over the grouping-set id, not four scans — with
    // grouping_id() disambiguating which set each output row belongs to
    // (the standard bitmask, checked against DuckDB's GROUPING()).
    "q17_grouping_sets" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"),
            Seq($"l_linestatus"), Seq()),
          $"l_returnflag", $"l_linestatus")
        .agg(grouping_id().cast("long").as("gid"),
          sum($"l_quantity".cast("long")).as("sum_qty"),
          count(lit(1)).as("n_lines"))
        .select($"l_returnflag", $"l_linestatus", $"gid", $"sum_qty", $"n_lines")
        .orderBy($"gid", $"l_returnflag", $"l_linestatus")
    },

    // Offset + distribution window functions over the per-customer order
    // timeline: lag (previous order's price and day gap), ntile quartiles,
    // percent_rank and cume_dist — one shuffle on the partition key, then
    // a single in-partition sort serves every function (all five share one
    // WindowSpec, so Catalyst plans ONE Window node, not five).
    // Exactness: lag(o_totalprice) is a raw-double passthrough; gap_days
    // and ntile are integers; percent_rank/cume_dist divide exact integer
    // counts (same IEEE result in both engines) because the ordering key
    // (o_orderdate, o_orderkey) is unique — no peer groups.
    "q18_order_timeline" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, dir)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        .withColumn("prev_totalprice", lag($"o_totalprice", 1).over(w))
        .withColumn("gap_days",
          datediff($"o_orderdate", lag($"o_orderdate", 1).over(w)).cast("long"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"prev_totalprice",
          $"gap_days", $"quartile", $"pct_rank", $"cume")
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // Bag-semantics set ops — q09's multiset twins: EXCEPT ALL keeps a
    // user once per purchase beyond their click count, INTERSECT ALL
    // keeps min(purchases, clicks) copies. Catalyst plans both as a
    // single shuffle with per-key counters (no row explosion); the
    // result is aggregated to (tag, user, n) so the multiplicity itself
    // is the hash-checked value.
    "q23_bag_set_ops" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      val p = ev.filter($"event_type" === "purchase").select($"user_id")
      val c = ev.filter($"event_type" === "click").select($"user_id")
      p.exceptAll(c).withColumn("tag", lit("purchase_minus_click"))
        .unionByName(p.intersectAll(c).withColumn("tag", lit("purchase_and_click")))
        .groupBy($"tag", $"user_id").agg(count(lit(1)).as("n"))
        .orderBy($"tag", $"user_id")
    },

    // Data-quality profiling: per-column row/null/distinct counts plus
    // typed min/max over `orders`, unpivoted to one row per column — the
    // schema-audit pass every ingest runs before trusting a feed. ONE
    // aggregate computes every stat (the multi-distinct goes through
    // Catalyst's Expand, a single scan + single shuffle rather than one
    // job per column); the 1-row result is exploded driver-free into the
    // profile rows. Numeric min/max are doubles, string min/max strings,
    // the timestamp formatted — never a double printed as text.
    "q25_data_profile" -> { (s, dir) =>
      import s.implicits._
      val nullNum = lit(null).cast("double")
      val nullStr = lit(null).cast("string")
      def prof(name: String, nn: Column, nd: Column,
               mnN: Column, mxN: Column, mnS: Column, mxS: Column) =
        struct(lit(name).as("col_name"), $"n_rows",
          ($"n_rows" - nn).as("n_null"), nd.as("n_distinct"),
          mnN.as("min_num"), mxN.as("max_num"),
          mnS.as("min_str"), mxS.as("max_str"))
      Tables.orders(s, dir)
        .agg(count(lit(1)).as("n_rows"),
          count($"o_orderkey").as("k_nn"), countDistinct($"o_orderkey").as("k_nd"),
          min($"o_orderkey").cast("double").as("k_mn"),
          max($"o_orderkey").cast("double").as("k_mx"),
          count($"o_custkey").as("c_nn"), countDistinct($"o_custkey").as("c_nd"),
          min($"o_custkey").cast("double").as("c_mn"),
          max($"o_custkey").cast("double").as("c_mx"),
          count($"o_totalprice").as("t_nn"), countDistinct($"o_totalprice").as("t_nd"),
          min($"o_totalprice").as("t_mn"), max($"o_totalprice").as("t_mx"),
          count($"o_orderstatus").as("s_nn"), countDistinct($"o_orderstatus").as("s_nd"),
          min($"o_orderstatus").as("s_mn"), max($"o_orderstatus").as("s_mx"),
          count($"o_orderpriority").as("p_nn"), countDistinct($"o_orderpriority").as("p_nd"),
          min($"o_orderpriority").as("p_mn"), max($"o_orderpriority").as("p_mx"),
          count($"o_orderdate").as("d_nn"), countDistinct($"o_orderdate").as("d_nd"),
          date_format(min($"o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("d_mn"),
          date_format(max($"o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("d_mx"))
        .select(explode(array(
          prof("o_orderkey", $"k_nn", $"k_nd", $"k_mn", $"k_mx", nullStr, nullStr),
          prof("o_custkey", $"c_nn", $"c_nd", $"c_mn", $"c_mx", nullStr, nullStr),
          prof("o_totalprice", $"t_nn", $"t_nd", $"t_mn", $"t_mx", nullStr, nullStr),
          prof("o_orderstatus", $"s_nn", $"s_nd", nullNum, nullNum, $"s_mn", $"s_mx"),
          prof("o_orderpriority", $"p_nn", $"p_nd", nullNum, nullNum, $"p_mn", $"p_mx"),
          prof("o_orderdate", $"d_nn", $"d_nd", nullNum, nullNum, $"d_mn", $"d_mx")))
          .as("p"))
        .select($"p.*")
        .orderBy($"col_name")
    },

    // Market-basket co-occurrence (ops/Cooccur): top pairs of parts
    // bought in the same order, with lift over independence. Candidates
    // come from the capped-bucket skeleton — one hash aggregate on the
    // order key, per-order item lists bounded by maxBasket — never an
    // order self-join. The oracle replays the pipeline as a plain SQL
    // self-join (exact at sf scale; the cap never fires on ≤7-line
    // orders, asserted in CooccurSpec). Lift is one double division of
    // exact integer products, so both engines round identically.
    "q26_market_basket" -> { (s, dir) =>
      import s.implicits._
      graft.ops.Cooccur.marketBasketPairs(Tables.lineitem(s, dir), "l_orderkey", "l_partkey",
        maxBasket = 64, k = 100)
        .select($"item_a".as("part_a"), $"item_b".as("part_b"), $"n_ab", $"lift")
    },

    // Weighted PageRank over the part co-purchase graph (ops/Graph):
    // q26's pair counts as edges, walked for 5 rounds in exact integer
    // fixed point — every step is integer multiply + floor division, so
    // the distributed sums are exact in any order and the oracle (the
    // same recurrence unrolled as 5 chained CTEs, evaluated
    // sequentially) reproduces the ranks bit-for-bit. An iterative
    // graph-centrality operator with a hash-checked result.
    "q27_part_pagerank" -> { (s, dir) =>
      import s.implicits._
      val pairs = graft.ops.Cooccur.pairCounts(Tables.lineitem(s, dir),
          "l_orderkey", "l_partkey", maxBasket = 64)
        .select($"item_a", $"item_b", $"n_ab".as("w"))
      graft.ops.Graph.pageRankInt(pairs, iters = 5)
        .orderBy($"rank".desc, $"item")
        .limit(100)
        .select($"item".as("part"), $"rank")
    },

    // Frequency-ordered dictionary encoding of a categorical column —
    // the standard label-encode step before training. The scale shape:
    // the distributed part is ONE hash aggregate over the data; the
    // global rank (row_number, a single-partition window) runs only on
    // the aggregated DICTIONARY, whose cardinality is the number of
    // distinct categories, not the number of rows; the encode itself is
    // a broadcast join of that tiny dictionary back onto the data. The
    // oracle replays the identical rank (ties broken by category value,
    // a total order) and the cents-exact per-code rollup certifies the
    // encode touched every row exactly once.
    "q24_dict_encode" -> { (s, dir) =>
      import s.implicits._
      val dict = Tables.part(s, dir)
        .groupBy($"p_type").agg(count(lit(1)).as("n_cat"))
        .withColumn("code",
          row_number().over(Window.orderBy($"n_cat".desc, $"p_type")).cast("long"))
        .select($"p_type", $"code")
      Tables.part(s, dir)
        .join(broadcast(dict), "p_type")
        .groupBy($"code", $"p_type")
        .agg(count(lit(1)).as("n_parts"),
          sum(cents($"p_retailprice")).as("sum_retail_cents"))
        .orderBy($"code")
    },

    // Single-source BFS hop distances over the co-purchase graph
    // (ops/Graph.bfsHops): frontier-at-a-time expansion — per-round cost
    // is the frontier's edge boundary (key-join + anti-join), never the
    // all-pairs path expansion, with lineage truncated per round. The
    // per-level histogram is exact integer counting; the oracle replays
    // the traversal as a recursive CTE with MIN(dist) per node, which is
    // traversal-order independent and therefore bit-identical.
    "q31_bfs_hops" -> { (s, dir) =>
      import s.implicits._
      val edges = graft.ops.Cooccur.pairCounts(Tables.lineitem(s, dir),
          "l_orderkey", "l_partkey", maxBasket = 64)
        .filter($"n_ab" >= 2)
        .select($"item_a", $"item_b")
        .localCheckpoint()
      val src = edges.agg(least(min($"item_a"), min($"item_b"))).as[Long].head()
      graft.ops.Graph.bfsHops(edges, src, maxHops = 4)
        .groupBy($"dist".cast("long").as("dist"))
        .agg(count(lit(1)).as("n_nodes"),
          min($"node").as("min_node"), max($"node").as("max_node"))
        .orderBy($"dist")
    },

    // Slowly-changing-dimension Type 2: per-customer order-priority
    // history built by change detection (lag over a key-partitioned
    // window — rows where the attribute differs from its predecessor
    // open a new version), then an as-of lookup resolving each
    // customer's ACTIVE version at a probe date (row_number over the
    // same key partition, descending). Both windows partition by the
    // dimension key, so every exchange is a key shuffle and no partition
    // ever exceeds one customer's history — the standard warehouse SCD2
    // build, expressed declaratively. The oracle replays the identical
    // lag/rank arithmetic sequentially.
    "q32_scd2_history" -> { (s, dir) =>
      import s.implicits._
      val byTime = Seq($"o_orderdate", $"o_orderkey")
      val versions = Tables.orders(s, dir)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderpriority")
        .withColumn("prev", lag($"o_orderpriority", 1)
          .over(Window.partitionBy($"o_custkey").orderBy(byTime: _*)))
        .filter($"prev".isNull || $"prev" =!= $"o_orderpriority")
      val nVersions = versions.groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_versions"))
      val active = versions
        .filter($"o_orderdate" <= lit("1998-06-17").cast("timestamp_ntz"))
        .withColumn("rn", row_number().over(Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate".desc, $"o_orderkey".desc)))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderpriority".as("priority"))
      active.join(nVersions, "o_custkey")
        .groupBy($"priority")
        .agg(count(lit(1)).as("n_customers"),
          sum($"n_versions").as("sum_versions"))
        .orderBy($"priority")
    },

    // CDC log apply with TOMBSTONES — the change-data-capture primitive
    // q22 (merge) and st16 (streaming upsert) both lack: a DELETE op.
    // The events stream is read as a change log (signup/click/view/
    // purchase = upsert, error = delete) and folded to the final table
    // state: per key, the last op by (ts, event_id) wins, and a key
    // whose last op is a tombstone is ABSENT from the result — not
    // null-valued, gone (the compaction semantic every CDC sink
    // implements). One hash aggregate (max_by over the unique
    // (ts, event_id) total order — associative, partials merge in any
    // order); no windows over the raw log, no per-key sort.
    "q36_cdc_apply" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .select($"user_id", $"event_type", cents($"value").as("value_cents"),
          $"ts", $"event_id")
        .groupBy($"user_id")
        .agg(expr("max_by(event_type, struct(ts, event_id))").as("last_type"),
          expr("max_by(value_cents, struct(ts, event_id))").as("last_value_cents"),
          count(lit(1)).as("n_changes"))
        .filter($"last_type" =!= "error")
        .orderBy($"user_id")
    },

    // SCD2 point-in-time lookup — the consuming half of q32's dimension
    // build, and the join every backtest/training-data pipeline needs to
    // avoid leakage: each fact row is enriched with the dimension version
    // that was ACTIVE AT ITS OWN TIMESTAMP (never the current one — that
    // leaks the future into history). Versions come from q32's change
    // detection, collapsed to one per (key, day) with a deterministic
    // max_by (same-day changes: last writer by orderkey wins), then the
    // PIT lookup is ev05's as-of machinery: union + one key-partitioned
    // ordered window — both exchanges key shuffles, no range join, no
    // broadcast of the fact side. Oracle: DuckDB's native ASOF JOIN over
    // the identically-derived version frame.
    "q35_scd2_pit_join" -> { (s, dir) =>
      import s.implicits._
      val byTime = Seq($"o_orderdate", $"o_orderkey")
      val versions = Tables.orders(s, dir)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderpriority")
        .withColumn("prev", lag($"o_orderpriority", 1)
          .over(Window.partitionBy($"o_custkey").orderBy(byTime: _*)))
        .filter($"prev".isNull || $"prev" =!= $"o_orderpriority")
        .groupBy($"o_custkey", $"o_orderdate")
        .agg(expr("max_by(o_orderpriority, o_orderkey)").as("pit_priority"))
        .select($"o_custkey".as("v_custkey"), $"o_orderdate".as("v_date"),
          $"pit_priority")
      val facts = Tables.orders(s, dir)
        .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      graft.ops.TemporalJoins.asOfJoin(facts, versions,
          "o_custkey", "v_custkey", "o_orderdate", "v_date")
        .select($"o_orderkey", $"o_custkey", $"pit_priority")
        .orderBy($"o_orderkey")
    },

    // Range-partition planning (what RangePartitioner/global sort does
    // under the hood, surfaced as a query): split boundaries for 8
    // balanced ranges of order value, derived from the exact VALUE
    // HISTOGRAM. The cumulative count is a two-level distributed prefix
    // sum (tx18's sequence-packing trick applied to values), because
    // o_totalprice is near-unique — a bare `Window.orderBy(v)` cumsum
    // would move ALL (v, c) rows to ONE task, O(n_orders) on a single
    // core at any scale. Instead: (1) one hash aggregate collapses rows
    // to (v, c); (2) values are striped by `v div 2^20` (~$10k-wide
    // cent stripes — the stripe count is bounded by the PRICE DOMAIN,
    // ~60 stripes, never by row count); (3) the cumsum is a per-stripe
    // window (parallel, ≤2^20 distinct cent values per stripe by
    // construction) plus stripe offsets from a broadcast range self-
    // join over the ~60 stripe totals (O(stripes²) on a domain-bounded
    // frame — never a row-count-sized single-partition window; a bare
    // `Window.orderBy` would warn and serialize, and a constant
    // partition key gets constant-folded back to the same thing).
    // ONE aggregate then picks each boundary as the
    // smallest value whose cumulative count reaches i/8 of the total
    // (pure integer compare: cum*8 >= n*i — no float quantiles, so both
    // engines agree bit-for-bit). The total-count and boundary attaches
    // are broadcast crossJoins of 1-row frames — the O(n·1) scalar-
    // attach pattern PlanSpec whitelists for tx12/q26/sk05. Assignment
    // back onto the data is a broadcast of 7 longs.
    "q33_range_partition_plan" -> { (s, dir) =>
      import s.implicits._
      val vals = Tables.orders(s, dir).select(cents($"o_totalprice").as("v"))
      val hist = vals.groupBy($"v").agg(count(lit(1)).as("c"))
        .withColumn("stripe", expr("v div 1048576"))
      val within = hist.withColumn("wcum",
        sum($"c").over(Window.partitionBy($"stripe").orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val totals = hist.groupBy($"stripe").agg(sum($"c").as("sc"))
      val offsets = totals
        .join(broadcast(totals.select($"stripe".as("p_stripe"), $"sc".as("p_sc"))),
          $"p_stripe" < $"stripe", "left")
        .groupBy($"stripe")
        .agg(coalesce(sum($"p_sc"), lit(0L)).as("off"))
      val cum = within.join(broadcast(offsets), "stripe")
        .withColumn("cum", $"wcum" + $"off")
      val boundCols = (1 to 7).map(i =>
        min(when($"cum" * 8 >= $"n" * i, $"v")).as(s"b$i"))
      val bounds = cum
        .crossJoin(broadcast(vals.agg(count(lit(1)).as("n"))))
        .agg(boundCols.head, boundCols.tail: _*)
      val bucket = (1 to 7).map(i => when($"v" > col(s"b$i"), 1L)
        .otherwise(0L)).reduce(_ + _)
      vals.crossJoin(broadcast(bounds))
        .withColumn("bucket", bucket)
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_rows"),
          min($"v").as("min_cents"), max($"v").as("max_cents"))
        .orderBy($"bucket")
    },

    // Join-key skew profiler — the pre-join diagnostic that decides
    // salting factors and AQE skew thresholds BEFORE a 100 TB join is
    // launched (q11's salted join is the cure; this is the instrument
    // that says whether/where to apply it). One hash aggregate per
    // candidate key — the percentile/max run over the per-key COUNT
    // frame, whose cardinality is the number of distinct keys, never the
    // row count — and O(1) output per key column. skew_x100 is the
    // max-key-to-mean ratio in exact integer math (×100): under ~300 a
    // plain hash join is fine, beyond that the max key dominates a task.
    "q34_skew_profile" -> { (s, dir) =>
      import s.implicits._
      def profile(df: org.apache.spark.sql.DataFrame, keyCol: String,
                  label: String) =
        df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_keys"), sum($"n").as("n_rows"),
            max($"n").as("max_rows"),
            expr("percentile(n, 0.5)").as("p50_rows"),
            expr("percentile(n, 0.99)").as("p99_rows"),
            expr("(max(n) * 100 * count(1)) div sum(n)").as("skew_x100"))
          .select(lit(label).as("key_col"), $"n_keys", $"n_rows",
            $"max_rows", $"p50_rows", $"p99_rows", $"skew_x100")
      profile(Tables.lineitem(s, dir), "l_partkey", "lineitem.l_partkey")
        .unionByName(profile(Tables.lineitem(s, dir), "l_suppkey",
          "lineitem.l_suppkey"))
        .unionByName(profile(Tables.orders(s, dir), "o_custkey",
          "orders.o_custkey"))
        .unionByName(profile(Tables.events(s, dir), "user_id",
          "events.user_id"))
        .orderBy($"key_col")
    },

    // Skew-stress certificate for the salted-join cure: a DERIVED
    // hot-keyed frame (every 5th event remapped to customer 1, so one key
    // holds ~20%+ of all rows — JoinsSpec pins the fixture's skew_x100 far
    // above q34's 300 alarm line AND that the salt genuinely spreads the
    // hot key across all 16 sub-partitions) pushed through
    // `Joins.saltedEquiJoin` must equal the PLAIN join's aggregate: the
    // cure changes partitioning, never results — now certified ON a
    // skewed input, not just the organic q11 distribution.
    "q37_hotkey_salted_join" -> { (s, dir) =>
      import s.implicits._
      val skewed = Tables.events(s, dir).select(
        when($"event_id" % 5 === 0, lit(1L)).otherwise($"user_id").as("c_custkey"),
        $"event_id", $"value")
      graft.ops.Joins.saltedEquiJoin(
        skewed, Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment"),
        key = "c_custkey", saltEntropy = Seq("event_id"), saltFactor = 16)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_events"), sumMoney($"value").as("sum_value"))
        .orderBy($"c_mktsegment")
    },

    // q38's companion: the NOT IN null trap, certified cross-engine.
    // When the subquery's value set contains a NULL, `x NOT IN (set)` is
    // never TRUE under three-valued logic — the filter silently returns
    // ZERO rows — while the NOT EXISTS spelling (and the DataFrame
    // left_anti join it compiles to) returns the intended complement.
    // Emitting both counts side by side pins the divergence on both
    // engines: n_not_in must be 0, n_not_exists must be the real
    // complement. A semantics certificate, not a production template
    // (the scalar subqueries scan per-count by design).
    // Data-quality constraint audit (the Deequ shape): EVERY single-table
    // rule — completeness, ranges, domain membership, composite-key
    // uniqueness — verifies in ONE scan + ONE partial-capable aggregate
    // (conditional sums + one COUNT DISTINCT over the key struct), not a
    // pass per rule; the two referential-integrity rules are UNHINTED
    // left-anti probes over pre-aggregated fact keys (see below),
    // attached as 1-row scalars (structural scalar-attach pattern).
    // Output = one row per named
    // rule with its violation count and pass bit: the audit a 100 TB
    // ingest gate runs nightly, priced at one corpus read. The composite
    // key rule reports REAL violations here (the synthetic lineitem
    // reuses (orderkey, linenumber)) — the audit is exercised, not
    // vacuous.
    "q40_constraint_audit" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      def viol(c: Column) = sum(when(c, 1L).otherwise(0L))
      val agg = li.agg(
        count(lit(1)).as("n_rows"),
        viol($"l_orderkey".isNull || $"l_linenumber".isNull).as("v_null_key"),
        (count(lit(1)) - countDistinct(struct($"l_orderkey", $"l_linenumber")))
          .as("v_dup_key"),
        viol(!($"l_quantity" >= 1.0 && $"l_quantity" <= 50.0)).as("v_qty_range"),
        viol(!($"l_discount" >= 0.0 && $"l_discount" <= 0.1)).as("v_disc_range"),
        viol($"l_extendedprice" <= 0.0).as("v_price_nonpos"),
        viol(!$"l_returnflag".isin("A", "N", "R")).as("v_flag_domain"),
        viol(!$"l_linestatus".isin("O", "F")).as("v_status_domain"))
      // FK probes with NO broadcast hint: orders/part scale WITH the fact
      // table, so forcing them into a driver-collected broadcast is the
      // collected-dimension OOM at 100× — the fact side is pre-aggregated
      // to per-key counts instead (map-side combine shrinks the anti-join
      // exchange from fact ROWS to distinct KEYS, ~4× for orders here and
      // more for part), and the join shape is left to AQE: broadcast when
      // the key table is genuinely small, shuffled anti-join when it is
      // not. Violation count is the sum of per-key counts over unmatched
      // keys — identical to the per-row count. PlanSpec pins that no
      // multi-row side of this plan carries a broadcast hint.
      val fkOrders = li.groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
        .join(Tables.orders(s, dir).select($"o_orderkey"),
          $"l_orderkey" === $"o_orderkey", "left_anti")
        .agg(coalesce(sum($"n"), lit(0L)).as("v_fk_orders"))
      val fkPart = li.groupBy($"l_partkey").agg(count(lit(1)).as("n"))
        .join(Tables.part(s, dir).select($"p_partkey"),
          $"l_partkey" === $"p_partkey", "left_anti")
        .agg(coalesce(sum($"n"), lit(0L)).as("v_fk_part"))
      def rule(name: String, v: Column) =
        struct(lit(name).as("rule"), $"n_rows".as("n_checked"),
          v.cast("long").as("n_violations"),
          when(v === 0, 1L).otherwise(0L).as("passed"))
      agg.crossJoin(broadcast(fkOrders)).crossJoin(broadcast(fkPart))
        .select(explode(array(
          rule("completeness_key_cols", $"v_null_key"),
          rule("domain_linestatus", $"v_status_domain"),
          rule("domain_returnflag", $"v_flag_domain"),
          rule("fk_lineitem_orders", $"v_fk_orders"),
          rule("fk_lineitem_part", $"v_fk_part"),
          rule("range_discount_0_01", $"v_disc_range"),
          rule("range_quantity_1_50", $"v_qty_range"),
          rule("sanity_price_positive", $"v_price_nonpos"),
          rule("unique_order_line", $"v_dup_key"))).as("r"))
        .select($"r.*")
        .orderBy($"rule")
    },

    "q39_not_in_null_trap" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("q39_orders")
      s.sql("""
        WITH blocked AS (SELECT CAST(NULL AS STRING) AS p
                         UNION ALL SELECT '2-HIGH')
        SELECT
          CAST((SELECT COUNT(*) FROM q39_orders
                WHERE o_orderpriority NOT IN (SELECT p FROM blocked))
            AS BIGINT) AS n_not_in,
          CAST((SELECT COUNT(*) FROM q39_orders o
                WHERE NOT EXISTS (SELECT 1 FROM blocked b
                                  WHERE b.p = o.o_orderpriority))
            AS BIGINT) AS n_not_exists,
          CAST((SELECT COUNT(*) FROM q39_orders) AS BIGINT) AS n_total,
          CAST((SELECT COUNT(*) FROM q39_orders
                WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS n_blocked
      """)
    },

    // NULL-semantics certification — the cross-engine traps every SQL
    // migration hits, pinned against DuckDB on one frame: NULL forms its
    // own GROUP BY group, count(col) skips NULLs while count(*) doesn't,
    // aggregates ignore NULL inputs, and the null-safe equality join
    // (`<=>` ≡ IS NOT DISTINCT FROM) matches NULL keys where plain `=`
    // drops them — eq_matches vs nullsafe_matches differ by exactly the
    // NULL-key pair. Nulls are derived deterministically (the URGENT
    // priority nulled out), so both engines see identical inputs; the
    // two match-count scalars ride every row via 1-row broadcast
    // attaches (the tx12 pattern).
    "q38_null_semantics" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.orders(s, dir).select(
        when($"o_orderpriority" === "1-URGENT", lit(null))
          .otherwise($"o_orderpriority").as("prio"),
        cents($"o_totalprice").as("pc"))
      val d = o.select($"prio").distinct()
      val r = d.select($"prio".as("rp"))
      val eq = d.join(r, $"prio" === $"rp")
        .agg(count(lit(1)).as("eq_matches"))
      val ns = d.join(r, $"prio" <=> $"rp")
        .agg(count(lit(1)).as("nullsafe_matches"))
      o.groupBy(coalesce($"prio", lit("(null)")).as("prio_key"))
        .agg(count(lit(1)).as("n_rows"), count($"prio").as("n_nonnull"),
          sum($"pc").as("sum_cents"))
        .crossJoin(broadcast(eq)).crossJoin(broadcast(ns))
        .orderBy($"prio_key")
    },

    // UNPIVOT/melt (q16's inverse): the wide pivoted quantity table
    // folded back to long form with the Dataset `unpivot` operator —
    // wide→long is pure per-row column shuffling (no exchange beyond
    // q16's aggregate), and the roundtrip landing exactly on the plain
    // GROUP BY is the correctness statement. Quantities are integral
    // doubles (exact under any sum order), cast to long on both sides.
    "q29_unpivot_roundtrip" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum($"l_quantity"))
        .unpivot(Array($"l_returnflag"), Array($"F", $"O"),
          "l_linestatus", "qty")
        .filter($"qty".isNotNull)
        .select($"l_returnflag", $"l_linestatus", $"qty".cast("long").as("sum_qty"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // Triangle participation over the co-purchase graph (ops/Graph):
    // q26's support-filtered pair counts as edges, triangles counted by
    // degree-ordered orientation — wedge count bounded O(m^1.5)
    // regardless of hub degree, the scale-correct shape. The oracle
    // enumerates the same triangles the sequential way (a<b<c wedge
    // closure); per-node counts are orientation-independent exact
    // integers, so they hash-match bit-for-bit.
    "q28_copurchase_triangles" -> { (s, dir) =>
      import s.implicits._
      val edges = graft.ops.Cooccur.pairCounts(Tables.lineitem(s, dir),
          "l_orderkey", "l_partkey", maxBasket = 64)
        .filter($"n_ab" >= 2)
        .select($"item_a", $"item_b")
        .localCheckpoint()
      graft.ops.Graph.triangleParticipation(edges)
        .orderBy($"n_triangles".desc, $"degree".desc, $"node")
        .limit(100)
        .select($"node".as("part"), $"degree", $"n_triangles")
    },

    // Snapshot reconciliation (the CDC/diff operator): two table
    // versions compared by ONE key-partitioned full-outer join, every
    // row classified added/removed/changed/unchanged, then collapsed to
    // a per-status summary — the audit a pipeline runs after any MERGE
    // to prove what a data refresh actually did. The "next" snapshot is
    // q22's deterministic upsert with every 97th key dropped (so all
    // four statuses occur). Value compare is cents-exact; the join and
    // aggregate are the only exchanges, both on the key, at any scale.
    "q30_snapshot_diff" -> { (s, dir) =>
      import s.implicits._
      val base = Tables.customer(s, dir)
        .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
      val updates = base
        .filter($"c_custkey" % 10 === 0)
        .select(
          when($"c_custkey" % 50 === 0, $"c_custkey" + 1000000L)
            .otherwise($"c_custkey").as("c_custkey"),
          $"c_mktsegment",
          ((cents($"c_acctbal") + 10000L) / 100.0).as("c_acctbal"))
      val next = graft.ops.Upsert.upsert(base, updates, "c_custkey")
        .filter($"c_custkey" % 97 =!= 0)
      val b = base.select($"c_custkey", cents($"c_acctbal").as("b_bal"),
        $"c_mktsegment".as("b_seg"))
      val n = next.select($"c_custkey", cents($"c_acctbal").as("n_bal"),
        $"c_mktsegment".as("n_seg"))
      b.join(n, Seq("c_custkey"), "full_outer")
        .select($"c_custkey",
          when($"b_bal".isNull, "added")
            .when($"n_bal".isNull, "removed")
            .when($"b_bal" =!= $"n_bal" || $"b_seg" =!= $"n_seg", "changed")
            .otherwise("unchanged").as("status"))
        .groupBy($"status")
        .agg(count(lit(1)).as("n"),
          min($"c_custkey").as("min_key"), max($"c_custkey").as("max_key"))
        .orderBy($"status")
    },

    // MERGE/upsert over immutable storage (ops/Upsert): a deterministic
    // update batch — every 10th customer's balance bumped, every 50th
    // re-keyed as a brand-new row — merged into the customer table by
    // one key-partitioned full-outer join with wholesale row
    // replacement. The oracle replays MERGE semantics as
    // anti-join ∪ updates. Money passes through cents-exact arithmetic.
    "q22_upsert_merge" -> { (s, dir) =>
      import s.implicits._
      val base = Tables.customer(s, dir)
        .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
      val updates = base
        .filter($"c_custkey" % 10 === 0)
        .select(
          when($"c_custkey" % 50 === 0, $"c_custkey" + 1000000L)
            .otherwise($"c_custkey").as("c_custkey"),
          $"c_mktsegment",
          ((cents($"c_acctbal") + 10000L) / 100.0).as("c_acctbal"))
      graft.ops.Upsert.upsert(base, updates, "c_custkey")
        .orderBy($"c_custkey")
    },

    // Recursive CTE (Spark 4 surface): a zero-filled daily calendar of
    // event counts — the anchor aggregates (min, max) day and the
    // recursive step walks one day at a time carrying the bound, so the
    // recursion is a linear chain that terminates by construction (span
    // days ≪ the engine's recursion limit; ev08's `sequence()` unfold is
    // the non-recursive twin of the same gap-fill). LEFT JOIN brings in
    // the real counts; gap days surface as zero instead of vanishing.
    "q21_recursive_calendar" -> { (s, dir) =>
      Tables.events(s, dir).createOrReplaceTempView("q21_events")
      s.sql("""
        WITH RECURSIVE cal(d, dmax) AS (
          SELECT CAST(min(ts) AS DATE), CAST(max(ts) AS DATE) FROM q21_events
          UNION ALL
          SELECT DATE_ADD(d, 1), dmax FROM cal WHERE d < dmax
        ),
        daily AS (
          SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
          FROM q21_events GROUP BY 1
        )
        SELECT CAST(cal.d AS STRING) AS day,
               CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
        FROM cal LEFT JOIN daily ON cal.d = daily.d
        ORDER BY day""")
    },

    // Outer-join surface: customers LEFT JOIN their order aggregates
    // (null-extended rows surviving into coalesce'd output is the
    // semantics under test — q05 already proves the anti side). The
    // aggregate runs BEFORE the join, so the join carries one row per
    // customer from each side — at 100 TB you outer-join the rollup, not
    // the raw fact table. The per-customer aggregate frame is the
    // broadcast side; the customer scan streams.
    "q20_outer_join" -> { (s, dir) =>
      import s.implicits._
      val agg = Tables.orders(s, dir)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), sumMoney($"o_totalprice").as("total_spend"))
      Tables.customer(s, dir)
        .join(broadcast(agg), $"c_custkey" === $"o_custkey", "left")
        .select($"c_custkey", $"c_mktsegment",
          coalesce($"n_orders", lit(0L)).as("n_orders"),
          coalesce($"total_spend", lit(0.0)).as("total_spend"))
        .orderBy($"c_custkey")
    },

    // The SQL entry point: a correlated EXISTS plus correlated and
    // uncorrelated scalar subqueries, submitted as SQL TEXT — exercising
    // the parser/analyzer path the rest of the catalog bypasses, and
    // Catalyst's subquery decorrelation: EXISTS plans as a left-semi
    // join, the correlated COUNT as an aggregate + outer join, the
    // uncorrelated average as a one-row subquery broadcast into the
    // filter — never a per-row re-execution. The average is computed in
    // exact integer cents (a float avg is summation-order-dependent) so
    // the comparison bit is identical in both engines.
    "q19_sql_subqueries" -> { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("q19_customer")
      Tables.orders(s, dir).createOrReplaceTempView("q19_orders")
      s.sql("""
        SELECT c_custkey, c_acctbal,
               CAST((SELECT COUNT(*) FROM q19_orders o2
                     WHERE o2.o_custkey = c.c_custkey) AS BIGINT) AS n_orders
        FROM q19_customer c
        WHERE EXISTS (
          SELECT 1 FROM q19_orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_totalprice >
              (SELECT CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
                        / 100.0 / COUNT(*)
               FROM q19_orders))
        ORDER BY c_custkey""")
    },

    // Bucketed join (co-location tool): both tables bucketed on the order
    // key at write time, so the join itself is exchange-free — the layout
    // every repeated big⋈big join wants at cluster scale. Same oracle
    // shape as the plain join.
    "q12_bucketed_join" -> { (s, dir) =>
      import s.implicits._
      graft.ops.Joins.bucketedInvoiceLines(s, dir)
        .groupBy($"o_orderstatus")
        .agg(sumMoney($"l_extendedprice").as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy($"o_orderstatus")
    })

  /** One-time bucket-table writes q12 amortizes (same bucket spec as
    * [[graft.ops.Joins.bucketedInvoiceLines]]); timed separately by the
    * bench. */
  val builds: Map[String, QueryUtil.B] = Map(
    "build_bucket_tables" -> { (s, dir) =>
      graft.ops.Joins.ensureBucketed(s, dir, "lineitem", "l_orderkey", nBuckets = 8)
      graft.ops.Joins.ensureBucketed(s, dir, "orders", "o_orderkey", nBuckets = 8); ()
    })

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM(l_quantity) AS sum_qty,
         |  ${sqlSumMoney("l_extendedprice")} AS sum_base_price,
         |  ${sqlSumMoney("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
         |  ${sqlSumMoney("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge,
         |  AVG(l_quantity) AS avg_qty,
         |  CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1999-01-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q03_revenue_by_segment" ->
      s"""SELECT c_mktsegment,
         |  ${sqlSumMoney("l_extendedprice*(1.0-l_discount)")} AS revenue,
         |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,

    "q04_big_spender_segments" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q05_customers_without_orders" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_revenue_forecast_filter" ->
      s"""SELECT ${sqlSumMoney("l_extendedprice*l_discount")} AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,

    "q07_top_orders_per_customer" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q08_distinct_counts" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q09_user_set_ops" ->
      """SELECT user_id, 'both' AS tag
        |FROM (SELECT user_id FROM events WHERE event_type = 'purchase'
        |      INTERSECT
        |      SELECT user_id FROM events WHERE event_type = 'error')
        |UNION ALL
        |SELECT user_id, 'purchase_only' AS tag
        |FROM (SELECT user_id FROM events WHERE event_type = 'purchase'
        |      EXCEPT
        |      SELECT user_id FROM events WHERE event_type = 'error')
        |ORDER BY tag, user_id""".stripMargin,

    "q10_rollup_quantities" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q14_cube_quantities" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q15_exact_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |         SUM(CAST(round(l_extendedprice*100) AS HUGEINT)) AS s1,
        |         SUM(CAST(round(l_extendedprice*100) AS HUGEINT)
        |             * CAST(round(l_extendedprice*100) AS HUGEINT)) AS s2
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_lines,
        |  CAST(s1 AS DOUBLE)/100.0/n AS mean_price,
        |  CAST(n*s2 - s1*s1 AS DOUBLE)/10000.0/n/n AS var_price,
        |  sqrt(CAST(n*s2 - s1*s1 AS DOUBLE)/10000.0/n/n) AS stddev_price
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q16_pivot_quantities" ->
      """SELECT l_returnflag,
        |  SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS "F",
        |  SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS "O"
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q17_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q13_quantity_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q11_salted_join" ->
      s"""SELECT o_orderstatus,
         |  ${sqlSumMoney("l_extendedprice")} AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,

    // the PLAIN join over the same derived hot-keyed frame — parity
    // certifies the salted cure is result-transparent under real skew
    "q37_hotkey_salted_join" ->
      s"""WITH e AS (SELECT CASE WHEN event_id % 5 = 0 THEN 1
         |                       ELSE user_id END AS c_custkey, value
         |           FROM events)
         |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  ${sqlSumMoney("value")} AS sum_value
         |FROM e JOIN customer USING (c_custkey)
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,

    // identical standard-SQL text on both engines: both implement the
    // three-valued NOT IN trap, so n_not_in pins to 0 on each
    // every rule recomputed independently (plain conditional counts, a
    // COUNT DISTINCT over the key pair, and two NOT-EXISTS probes)
    "q40_constraint_audit" ->
      """WITH a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL
        |         THEN 1 ELSE 0 END) AS BIGINT) AS v_null_key,
        |    CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
        |         AS BIGINT) AS v_dup_key,
        |    CAST(SUM(CASE WHEN NOT (l_quantity >= 1.0 AND l_quantity <= 50.0)
        |         THEN 1 ELSE 0 END) AS BIGINT) AS v_qty_range,
        |    CAST(SUM(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.1)
        |         THEN 1 ELSE 0 END) AS BIGINT) AS v_disc_range,
        |    CAST(SUM(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS v_price_nonpos,
        |    CAST(SUM(CASE WHEN l_returnflag NOT IN ('A','N','R')
        |         THEN 1 ELSE 0 END) AS BIGINT) AS v_flag_domain,
        |    CAST(SUM(CASE WHEN l_linestatus NOT IN ('O','F')
        |         THEN 1 ELSE 0 END) AS BIGINT) AS v_status_domain
        |  FROM lineitem),
        |fko AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_fk_orders FROM lineitem l
        |        WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                          WHERE o.o_orderkey = l.l_orderkey)),
        |fkp AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_fk_part FROM lineitem l
        |        WHERE NOT EXISTS (SELECT 1 FROM part p
        |                          WHERE p.p_partkey = l.l_partkey)),
        |r AS (
        |  SELECT 'completeness_key_cols' AS rule, n_rows, v_null_key AS v
        |    FROM a
        |  UNION ALL SELECT 'domain_linestatus', n_rows, v_status_domain FROM a
        |  UNION ALL SELECT 'domain_returnflag', n_rows, v_flag_domain FROM a
        |  UNION ALL SELECT 'fk_lineitem_orders', n_rows, v_fk_orders
        |    FROM a, fko
        |  UNION ALL SELECT 'fk_lineitem_part', n_rows, v_fk_part FROM a, fkp
        |  UNION ALL SELECT 'range_discount_0_01', n_rows, v_disc_range FROM a
        |  UNION ALL SELECT 'range_quantity_1_50', n_rows, v_qty_range FROM a
        |  UNION ALL SELECT 'sanity_price_positive', n_rows, v_price_nonpos FROM a
        |  UNION ALL SELECT 'unique_order_line', n_rows, v_dup_key FROM a)
        |SELECT rule, n_rows AS n_checked, v AS n_violations,
        |       CAST(CASE WHEN v = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
        |FROM r ORDER BY rule""".stripMargin,

    "q39_not_in_null_trap" ->
      """WITH blocked AS (SELECT CAST(NULL AS VARCHAR) AS p
        |                 UNION ALL SELECT '2-HIGH')
        |SELECT
        |  CAST((SELECT COUNT(*) FROM orders
        |        WHERE o_orderpriority NOT IN (SELECT p FROM blocked))
        |    AS BIGINT) AS n_not_in,
        |  CAST((SELECT COUNT(*) FROM orders o
        |        WHERE NOT EXISTS (SELECT 1 FROM blocked b
        |                          WHERE b.p = o.o_orderpriority))
        |    AS BIGINT) AS n_not_exists,
        |  CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_total,
        |  CAST((SELECT COUNT(*) FROM orders
        |        WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS n_blocked""".stripMargin,

    // IS NOT DISTINCT FROM is DuckDB's spelling of Spark's <=>
    "q38_null_semantics" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
        |              ELSE o_orderpriority END AS prio,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS pc
        |  FROM orders),
        |d AS (SELECT DISTINCT prio FROM o),
        |eq AS (SELECT CAST(COUNT(*) AS BIGINT) AS eq_matches
        |       FROM d a JOIN d b ON a.prio = b.prio),
        |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS nullsafe_matches
        |       FROM d a JOIN d b ON a.prio IS NOT DISTINCT FROM b.prio)
        |SELECT COALESCE(prio, '(null)') AS prio_key,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(COUNT(prio) AS BIGINT) AS n_nonnull,
        |       CAST(SUM(pc) AS BIGINT) AS sum_cents,
        |       eq.eq_matches, ns.nullsafe_matches
        |FROM o CROSS JOIN eq CROSS JOIN ns
        |GROUP BY 1, eq.eq_matches, ns.nullsafe_matches
        |ORDER BY prio_key""".stripMargin,

    "q12_bucketed_join" ->
      s"""SELECT o_orderstatus,
         |  ${sqlSumMoney("l_extendedprice")} AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,

    "q23_bag_set_ops" ->
      """SELECT tag, user_id, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT 'purchase_minus_click' AS tag, user_id FROM (
        |    SELECT user_id FROM events WHERE event_type = 'purchase'
        |    EXCEPT ALL
        |    SELECT user_id FROM events WHERE event_type = 'click')
        |  UNION ALL
        |  SELECT 'purchase_and_click' AS tag, user_id FROM (
        |    SELECT user_id FROM events WHERE event_type = 'purchase'
        |    INTERSECT ALL
        |    SELECT user_id FROM events WHERE event_type = 'click'))
        |GROUP BY tag, user_id
        |ORDER BY tag, user_id""".stripMargin,

    "q25_data_profile" ->
      """WITH p AS (
        |  SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
        |    COUNT(*) - COUNT(o_orderkey) AS n_null,
        |    COUNT(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
        |    CAST(MAX(o_orderkey) AS DOUBLE) AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
        |    COUNT(DISTINCT o_custkey),
        |    CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE),
        |    NULL, NULL
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
        |    COUNT(DISTINCT o_totalprice),
        |    MIN(o_totalprice), MAX(o_totalprice), NULL, NULL
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
        |    COUNT(DISTINCT o_orderstatus),
        |    NULL, NULL, MIN(o_orderstatus), MAX(o_orderstatus)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
        |    COUNT(DISTINCT o_orderpriority),
        |    NULL, NULL, MIN(o_orderpriority), MAX(o_orderpriority)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
        |    COUNT(DISTINCT o_orderdate),
        |    NULL, NULL,
        |    strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
        |    strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
        |  FROM orders)
        |SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_null AS BIGINT) AS n_null,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  min_num, max_num, min_str, max_str
        |FROM p ORDER BY col_name""".stripMargin,

    // co-occurrence replayed as a plain incidence self-join; lift is one
    // double division of exact integer products on both sides
    "q26_market_basket" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, CAST(l_partkey AS BIGINT) AS item
        |            FROM lineitem),
        |n AS (SELECT item, COUNT(*) AS n_item FROM op GROUP BY item),
        |tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM op),
        |pc AS (SELECT a.item AS part_a, b.item AS part_b, COUNT(*) AS n_ab
        |       FROM op a JOIN op b
        |         ON a.l_orderkey = b.l_orderkey AND a.item < b.item
        |       GROUP BY 1, 2)
        |SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
        |  CAST(n_ab * n_baskets AS DOUBLE) / (na.n_item * nb.n_item) AS lift
        |FROM pc
        |JOIN n na ON pc.part_a = na.item
        |JOIN n nb ON pc.part_b = nb.item
        |CROSS JOIN tot
        |ORDER BY n_ab DESC, part_a, part_b
        |LIMIT 100""".stripMargin,

    // the integer-fixed-point PageRank recurrence unrolled: r0 is the
    // uniform mass split, each r_i one damped step; `//` (floor div) on
    // positive BIGINTs matches Spark's `div` exactly
    "q27_part_pagerank" -> PageRankOracleSql,

    // identical rank over the aggregated dictionary (ties broken by the
    // category value — a total order), re-joined to roll up per code
    "q24_dict_encode" ->
      """WITH freq AS (SELECT p_type, COUNT(*) AS n_cat FROM part GROUP BY p_type),
        |dict AS (SELECT p_type,
        |           ROW_NUMBER() OVER (ORDER BY n_cat DESC, p_type) AS code
        |         FROM freq)
        |SELECT CAST(d.code AS BIGINT) AS code, d.p_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT)
        |    AS sum_retail_cents
        |FROM part p JOIN dict d ON p.p_type = d.p_type
        |GROUP BY 1, 2
        |ORDER BY code""".stripMargin,

    // identical lag/rank arithmetic replayed sequentially: change rows
    // open versions, the as-of pick is rank-1 descending at the probe
    "q32_scd2_history" ->
      """WITH v AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |    lag(o_orderpriority) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |ver AS (SELECT * FROM v
        |        WHERE prev IS NULL OR prev <> o_orderpriority),
        |vc AS (SELECT o_custkey, COUNT(*) AS n_versions FROM ver GROUP BY 1),
        |act AS (SELECT o_custkey, o_orderpriority AS priority FROM (
        |    SELECT o_custkey, o_orderpriority,
        |      ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM ver WHERE o_orderdate <= TIMESTAMP '1998-06-17')
        |  WHERE rn = 1)
        |SELECT act.priority, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(vc.n_versions) AS BIGINT) AS sum_versions
        |FROM act JOIN vc ON act.o_custkey = vc.o_custkey
        |GROUP BY 1 ORDER BY priority""".stripMargin,

    // last-writer-wins replayed as a sequential rank over the same
    // unique (ts, event_id) order; tombstoned keys filtered identically
    "q36_cdc_apply" ->
      """WITH r AS (SELECT user_id, event_type,
        |    CAST(round(value*100) AS BIGINT) AS value_cents, ts, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        |  FROM events)
        |SELECT user_id, event_type AS last_type,
        |  value_cents AS last_value_cents, CAST(n_changes AS BIGINT) AS n_changes
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    // identical change detection (lag + filter), identical same-day
    // collapse (max_by by orderkey), and DuckDB's native ASOF JOIN as the
    // independent point-in-time implementation (the ev05-proven pairing)
    "q35_scd2_pit_join" ->
      """WITH v0 AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |                               ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |ch AS (SELECT * FROM v0 WHERE prev IS NULL OR prev <> o_orderpriority),
        |v AS (SELECT o_custkey AS v_custkey, o_orderdate AS v_date,
        |        max_by(o_orderpriority, o_orderkey) AS pit_priority
        |      FROM ch GROUP BY 1, 2)
        |SELECT f.o_orderkey, f.o_custkey, v.pit_priority
        |FROM orders f ASOF LEFT JOIN v
        |  ON f.o_custkey = v.v_custkey AND f.o_orderdate >= v.v_date
        |ORDER BY f.o_orderkey""".stripMargin,

    // identical per-key count frames, quantile_cont ≡ Spark's exact
    // interpolated percentile (the q13-proven pairing), and the same
    // exact-integer skew ratio
    "q34_skew_profile" -> {
      def leg(table: String, key: String) =
        s"""SELECT '$table.$key' AS key_col,
           |  CAST(COUNT(*) AS BIGINT) AS n_keys,
           |  CAST(SUM(n) AS BIGINT) AS n_rows,
           |  CAST(MAX(n) AS BIGINT) AS max_rows,
           |  quantile_cont(n, 0.5) AS p50_rows,
           |  quantile_cont(n, 0.99) AS p99_rows,
           |  CAST(MAX(n) * 100 * COUNT(*) // SUM(n) AS BIGINT) AS skew_x100
           |FROM (SELECT $key, COUNT(*) AS n FROM $table GROUP BY $key)""".stripMargin
      Seq(leg("lineitem", "l_partkey"), leg("lineitem", "l_suppkey"),
        leg("orders", "o_custkey"), leg("events", "user_id"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
    },

    // identical integer boundary rule (smallest v with cum*8 >= n*i) and
    // identical strictly-greater bucket assignment
    "q33_range_partition_plan" ->
      """WITH v AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v
        |           FROM orders),
        |h AS (SELECT v, COUNT(*) AS c FROM v GROUP BY v),
        |cum AS (SELECT v, SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h),
        |n AS (SELECT COUNT(*) AS n FROM v),
        |b AS (SELECT
        |    MIN(CASE WHEN cum*8 >= n*1 THEN v END) AS b1,
        |    MIN(CASE WHEN cum*8 >= n*2 THEN v END) AS b2,
        |    MIN(CASE WHEN cum*8 >= n*3 THEN v END) AS b3,
        |    MIN(CASE WHEN cum*8 >= n*4 THEN v END) AS b4,
        |    MIN(CASE WHEN cum*8 >= n*5 THEN v END) AS b5,
        |    MIN(CASE WHEN cum*8 >= n*6 THEN v END) AS b6,
        |    MIN(CASE WHEN cum*8 >= n*7 THEN v END) AS b7
        |  FROM cum CROSS JOIN n),
        |a AS (SELECT v,
        |    (CASE WHEN v > b1 THEN 1 ELSE 0 END + CASE WHEN v > b2 THEN 1 ELSE 0 END
        |     + CASE WHEN v > b3 THEN 1 ELSE 0 END + CASE WHEN v > b4 THEN 1 ELSE 0 END
        |     + CASE WHEN v > b5 THEN 1 ELSE 0 END + CASE WHEN v > b6 THEN 1 ELSE 0 END
        |     + CASE WHEN v > b7 THEN 1 ELSE 0 END) AS bucket
        |  FROM v CROSS JOIN b)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  MIN(v) AS min_cents, MAX(v) AS max_cents
        |FROM a GROUP BY bucket ORDER BY bucket""".stripMargin,

    // the same traversal as a recursive CTE: (node, dist) pairs grow
    // level by level (UNION dedups against everything already walked),
    // MIN(dist) per node is traversal-order independent
    "q31_bfs_hops" ->
      """WITH RECURSIVE
        |op AS (SELECT DISTINCT l_orderkey, CAST(l_partkey AS BIGINT) AS item
        |       FROM lineitem),
        |e AS (SELECT a.item AS x, b.item AS y
        |      FROM op a JOIN op b
        |        ON a.l_orderkey = b.l_orderkey AND a.item < b.item
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |und AS (SELECT x AS u, y AS v FROM e UNION SELECT y, x FROM e),
        |walk(node, dist) AS (
        |  SELECT (SELECT MIN(u) FROM und), 0
        |  UNION
        |  SELECT und.v, walk.dist + 1
        |  FROM walk JOIN und ON und.u = walk.node
        |  WHERE walk.dist < 4),
        |d AS (SELECT node, MIN(dist) AS dist FROM walk GROUP BY node)
        |SELECT CAST(dist AS BIGINT) AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  MIN(node) AS min_node, MAX(node) AS max_node
        |FROM d GROUP BY dist ORDER BY dist""".stripMargin,

    // the roundtrip's fixed point is the plain GROUP BY
    "q29_unpivot_roundtrip" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_linestatus IN ('F', 'O')
        |GROUP BY 1, 2
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // same triangles enumerated sequentially: support-filtered edges,
    // a<b<c wedge closure; per-node membership counts are
    // orientation-independent
    "q28_copurchase_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, CAST(l_partkey AS BIGINT) AS item
        |            FROM lineitem),
        |e AS (SELECT a.item AS x, b.item AS y
        |      FROM op a JOIN op b
        |        ON a.l_orderkey = b.l_orderkey AND a.item < b.item
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |und AS (SELECT x AS u, y AS v FROM e UNION SELECT y, x FROM e),
        |deg AS (SELECT u, COUNT(*) AS degree FROM und GROUP BY u),
        |tri AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
        |        FROM e e1 JOIN e e2 ON e1.y = e2.x
        |        JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
        |pn AS (SELECT node, COUNT(*) AS n_triangles
        |       FROM (SELECT a AS node FROM tri
        |             UNION ALL SELECT b FROM tri
        |             UNION ALL SELECT c FROM tri)
        |       GROUP BY node)
        |SELECT deg.u AS part, CAST(deg.degree AS BIGINT) AS degree,
        |       CAST(COALESCE(pn.n_triangles, 0) AS BIGINT) AS n_triangles
        |FROM deg LEFT JOIN pn ON deg.u = pn.node
        |ORDER BY n_triangles DESC, degree DESC, part
        |LIMIT 100""".stripMargin,

    // the diff replayed sequentially: q22's MERGE result minus every
    // 97th key, full-outer against the base, cents-exact compare
    "q30_snapshot_diff" ->
      """WITH upd AS (
        |  SELECT CASE WHEN c_custkey % 50 = 0 THEN c_custkey + 1000000
        |              ELSE c_custkey END AS c_custkey,
        |         c_mktsegment,
        |         (CAST(round(c_acctbal*100) AS BIGINT) + 10000)/100.0 AS c_acctbal
        |  FROM customer WHERE c_custkey % 10 = 0),
        |nxt AS (
        |  SELECT * FROM (
        |    SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |    WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |    UNION ALL
        |    SELECT c_custkey, c_mktsegment, c_acctbal FROM upd)
        |  WHERE c_custkey % 97 <> 0),
        |b AS (SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal,
        |             c_mktsegment AS seg FROM customer),
        |n AS (SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal,
        |             c_mktsegment AS seg FROM nxt),
        |d AS (SELECT COALESCE(b.c_custkey, n.c_custkey) AS k,
        |        CASE WHEN b.bal IS NULL THEN 'added'
        |             WHEN n.bal IS NULL THEN 'removed'
        |             WHEN b.bal <> n.bal OR b.seg <> n.seg THEN 'changed'
        |             ELSE 'unchanged' END AS status
        |      FROM b FULL OUTER JOIN n ON b.c_custkey = n.c_custkey)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
        |       MIN(k) AS min_key, MAX(k) AS max_key
        |FROM d GROUP BY status ORDER BY status""".stripMargin,

    // MERGE replayed as base-minus-updated ∪ update batch
    "q22_upsert_merge" ->
      """WITH upd AS (
        |  SELECT CASE WHEN c_custkey % 50 = 0 THEN c_custkey + 1000000
        |              ELSE c_custkey END AS c_custkey,
        |         c_mktsegment,
        |         (CAST(round(c_acctbal*100) AS BIGINT) + 10000)/100.0 AS c_acctbal
        |  FROM customer WHERE c_custkey % 10 = 0)
        |SELECT c_custkey, c_mktsegment, c_acctbal
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, c_acctbal FROM upd
        |ORDER BY c_custkey""".stripMargin,

    // identical recursion in DuckDB (DATE + 1 is its date-add spelling)
    "q21_recursive_calendar" ->
      """WITH RECURSIVE cal(d, dmax) AS (
        |  SELECT CAST(min(ts) AS DATE), CAST(max(ts) AS DATE) FROM events
        |  UNION ALL
        |  SELECT d + 1, dmax FROM cal WHERE d < dmax
        |),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events GROUP BY 1
        |)
        |SELECT CAST(cal.d AS VARCHAR) AS day,
        |       CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
        |FROM cal LEFT JOIN daily ON cal.d = daily.d
        |ORDER BY day""".stripMargin,

    "q20_outer_join" ->
      s"""WITH agg AS (
         |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         |         ${sqlSumMoney("o_totalprice")} AS total_spend
         |  FROM orders GROUP BY 1)
         |SELECT c_custkey, c_mktsegment,
         |       COALESCE(n_orders, 0) AS n_orders,
         |       COALESCE(total_spend, 0.0) AS total_spend
         |FROM customer LEFT JOIN agg ON c_custkey = o_custkey
         |ORDER BY c_custkey""".stripMargin,

    // same SQL modulo view names — DuckDB runs the identical subquery
    // nest over the raw tables
    "q19_sql_subqueries" ->
      """SELECT c_custkey, c_acctbal,
        |       CAST((SELECT COUNT(*) FROM orders o2
        |             WHERE o2.o_custkey = c.c_custkey) AS BIGINT) AS n_orders
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_totalprice >
        |      (SELECT CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |                / 100.0 / COUNT(*)
        |       FROM orders))
        |ORDER BY c_custkey""".stripMargin,

    "q18_order_timeline" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice) OVER w AS prev_totalprice,
        |  CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
        |                 CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)

  /** q27's oracle, generated: the fixed-point PageRank recurrence
    * unrolled into one CTE per iteration (DuckDB's recursive CTEs don't
    * allow the per-step aggregate, so the loop is laid out explicitly —
    * same count as the Spark side's `iters = 5`). */
  private lazy val PageRankOracleSql: String = {
    val prelude =
      """WITH op AS (SELECT DISTINCT l_orderkey, CAST(l_partkey AS BIGINT) AS item
        |            FROM lineitem),
        |pc AS (SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS w
        |       FROM op a JOIN op b
        |         ON a.l_orderkey = b.l_orderkey AND a.item < b.item
        |       GROUP BY 1, 2),
        |e AS (SELECT item_a AS u, item_b AS v, w FROM pc
        |      UNION ALL SELECT item_b, item_a, w FROM pc),
        |ow AS (SELECT u, SUM(w) AS outw FROM e GROUP BY u),
        |nodes AS (SELECT DISTINCT u AS node FROM e),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |r0 AS (SELECT node, (SELECT 1000000000000 // n FROM nn) AS rank
        |       FROM nodes)""".stripMargin
    val steps = (1 to 5).map { i =>
      s"""r$i AS (
         |  SELECT nd.node,
         |         (SELECT (15 * 1000000000000) // (100 * n) FROM nn)
         |           + (85 * COALESCE(c.contrib, 0)) // 100 AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.v AS node, SUM((r.rank * e.w) // outw) AS contrib
         |    FROM e JOIN ow USING (u) JOIN r${i - 1} r ON r.node = e.u
         |    GROUP BY e.v) c ON nd.node = c.node)""".stripMargin
    }
    (prelude +: steps).mkString(",\n") +
      "\nSELECT node AS part, CAST(rank AS BIGINT) AS rank FROM r5" +
      "\nORDER BY rank DESC, part LIMIT 100"
  }
}

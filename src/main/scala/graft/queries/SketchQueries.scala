package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{CmsEstimate, KmvSketchAgg}
import graft.model.Tables
import graft.ops.Sketches
import QueryUtil._

/** Sketch / approximate-query surface — the operators that REPLACE their
  * exact twins at 100 TB, certified against those twins.
  *
  * Exact distinct counts, percentiles, and per-key frequencies all need a
  * shuffle that carries every key (or every value) of the corpus; the
  * sketch versions are single-pass, mergeable, fixed-size aggregates —
  * the only shapes that stay cheap at cluster scale:
  *
  *  - sk01: HLL distinct-count sketches (`hll_sketch_agg`, Datasketches
  *    HLL), including the property that makes them scale: partial
  *    sketches built per group/partition and `hll_union_agg`-merged give
  *    the same answer as one pass — partial aggregation for COUNT
  *    DISTINCT. Plus `approx_count_distinct` (HLL++), the drop-in column.
  *  - sk02: quantile sketches (`percentile_approx`, Greenwald-Khanna)
  *    vs exact interpolated percentiles.
  *  - sk03: Count-Min frequency sketch (`count_min_sketch` aggregate +
  *    native `cms_estimate` probe) vs exact heavy-hitter counts.
  *  - sk04: Bloom-filter join pruning — build over the selective side's
  *    keys, drop non-matching fact rows at the scan, exact join removes
  *    the false positives; answer provably identical to the plain join.
  *  - sk05/sk06: set-overlap estimation, both ways. sk05 is HLL
  *    inclusion–exclusion (|A∩B| = |A|+|B|−|A∪B|) — cheap but its error
  *    scales with the UNION. sk06 is the production answer: a KMV/theta
  *    sketch (native [[graft.functions.KmvSketchAgg]]) whose retained
  *    hashes are a uniform θ-sample of each set, so intersection is
  *    estimated by DIRECT set algebra on the synopses — error scales
  *    with the intersection sample, and every estimate degrades to
  *    exact below saturation.
  *
  * Certification pattern (same as an03/tx11): the oracle-checked columns
  * are the EXACT values — recomputed independently by DuckDB — plus
  * quality bits pinned to 1 asserting the sketch estimate landed inside
  * its designed error bound. All sketches here are seeded/deterministic,
  * so a bit that is 1 locally is 1 on the driver at any tested SF.
  */
object SketchQueries {

  // sketch-quality bit: QueryUtil.withinPct (shared with the streaming
  // twins so the bound semantics stay pinned together)

  val queries: Map[String, Q] = Map(
    // HLL distinct: direct sketch, merged-from-group-partials sketch, and
    // HLL++ column, each within 5% of exact (lgK=12 → RSE ≈ 1.6%, so the
    // bound is ~3σ). The merged path is the load-bearing one: register
    // state is order- and partition-insensitive, so per-partition
    // sketches union to the whole-corpus answer — COUNT DISTINCT with
    // map-side combine, no key shuffle.
    "sk01_hll_distinct" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      // the two-level merge path rides in as a scalar subquery — the
      // 1-row "join" construct that plans as a subquery, not a BNLJ
      val merged = li.groupBy($"l_returnflag")
        .agg(expr("hll_sketch_agg(l_orderkey, 12)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("merged_est"))
      li.agg(
          countDistinct($"l_orderkey").as("n_exact"),
          expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 12))").as("direct_est"),
          approx_count_distinct($"l_orderkey", 0.01).as("hllpp_est"))
        .select(
          $"n_exact",
          withinPct($"direct_est", $"n_exact", 0.05).as("direct_sketch_ok"),
          withinPct(merged.scalar(), $"n_exact", 0.05).as("merged_sketch_ok"),
          withinPct($"hllpp_est", $"n_exact", 0.05).as("hllpp_ok"))
    },

    // Quantile sketch vs exact: percentile_approx(accuracy=10000) bounds
    // rank error by n/accuracy; on this data that lands within 1% of the
    // exact value at both probed quantiles. The exact percentiles (the
    // q13 shape — sort-based, needs the group's values together, the op
    // the sketch replaces at scale) are the hash-checked columns.
    "sk02_quantile_sketch" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
          expr("percentile(l_extendedprice, 0.99)").as("p99_exact"),
          expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("p50_sk"),
          expr("percentile_approx(l_extendedprice, 0.99, 10000)").as("p99_sk"),
          count(lit(1)).as("n_lines"))
        .select($"l_returnflag",
          round($"p50_exact", 4).as("p50_exact"),
          round($"p99_exact", 4).as("p99_exact"),
          withinPct($"p50_sk", $"p50_exact", 0.01).as("p50_sketch_ok"),
          withinPct($"p99_sk", $"p99_exact", 0.01).as("p99_sketch_ok"),
          $"n_lines")
        .orderBy($"l_returnflag")
    },

    // Count-Min heavy hitters: ONE fixed-size sketch aggregate over the
    // fact (seeded → deterministic), probed for the exact top-10 keys
    // with the native cms_estimate expression. Certifies both CMS
    // guarantees: estimates never undercount, and overcount stays within
    // eps·N. The exact counts (hash-checked) come from the groupBy twin
    // the sketch replaces when the key space is too wide to shuffle.
    "sk03_cms_heavy_hitters" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val top = li.groupBy($"l_partkey").agg(count(lit(1)).as("n_lines"))
        .orderBy($"n_lines".desc, $"l_partkey").limit(10)
      // ONE sketch pass; the 1-row (sketch, N) result reaches the probe
      // rows as a scalar subquery (deduplicated + reused at execution)
      val sketch = li.agg(struct(
          expr("count_min_sketch(l_partkey, CAST(0.0005 AS DOUBLE), CAST(0.999 AS DOUBLE), 42)")
            .as("cms"),
          count(lit(1)).as("n_total")).as("s"))
      top
        .select($"l_partkey", $"n_lines",
          CmsEstimate(sketch.scalar().getField("cms"), $"l_partkey").as("est"),
          sketch.scalar().getField("n_total").as("n_total"))
        .select($"l_partkey", $"n_lines",
          when($"est" >= $"n_lines", 1L).otherwise(0L).as("no_underestimate"),
          when($"est" <= $"n_lines" + ceil(lit(0.0005) * $"n_total").cast("long"), 1L)
            .otherwise(0L).as("within_eps_n"))
        .orderBy($"n_lines".desc, $"l_partkey")
    },

    // Bloom-pruned selective join: sketch the ~6% of orders above the
    // price bar (one aggregate; ~10 KB artifact), drop non-candidate
    // lineitem rows at the scan, then the exact semi-join erases the
    // false positives. No false negatives → the oracle is the PLAIN
    // semi-join; a hash match proves pruning lost nothing. At 100 TB the
    // bloom runs where a broadcast of the build side would not fit and
    // the shuffle of unmatched fact rows is the bottleneck.
    "sk04_bloom_prejoin" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val big = Tables.orders(s, dir)
        .filter($"o_totalprice" > 470000.0)
        .select($"o_orderkey")
      val bloom = Sketches.bloomBytes(big, "o_orderkey",
        expectedItems = big.count(), fpp = 0.01)
      li.filter(Sketches.mightContain(bloom, $"l_orderkey"))
        .join(big, $"l_orderkey" === $"o_orderkey", "left_semi")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_lines"), sumMoney($"l_extendedprice").as("revenue"))
        .orderBy($"l_returnflag")
    },

    // Set-intersection cardinality from mergeable sketches: |A∩B|
    // estimated by inclusion–exclusion over per-segment HLL sketches
    // (|A|+|B|−|A∪B|, union via the native binary hll_union) — the
    // audience-overlap question answered WITHOUT re-scanning raw data,
    // because per-segment sketches are precomputed mergeable state (the
    // whole point of sketches at 100 TB: one sketch per segment, any
    // pairwise overlap after the fact). The exact overlap (hash-checked
    // column) comes from one equi-join on user over the distinct
    // (type, user) projection; the estimate must land within the
    // inclusion–exclusion error envelope (pinned bit; wider than a
    // single sketch's ±1.6% because subtraction compounds error).
    "sk05_hll_intersection" -> { (s, dir) =>
      import s.implicits._
      val tu = Tables.events(s, dir).select($"event_type", $"user_id").distinct()
      val byType = tu.groupBy($"event_type")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
          count(lit(1)).as("n_type"))
      val a = byType.select($"event_type".as("type_a"), $"sk".as("sk_a"), $"n_type".as("na"))
      val b = byType.select($"event_type".as("type_b"), $"sk".as("sk_b"), $"n_type".as("nb"))
      val est = a.join(b, $"type_a" < $"type_b")
        .withColumn("est_common", $"na" + $"nb" -
          expr("hll_sketch_estimate(hll_union(sk_a, sk_b, false))"))
      val exact = tu.as("x").join(tu.as("y"),
          $"x.user_id" === $"y.user_id" && $"x.event_type" < $"y.event_type")
        .groupBy($"x.event_type".as("type_a"), $"y.event_type".as("type_b"))
        .agg(count(lit(1)).as("n_common"))
      est.join(exact, Seq("type_a", "type_b"))
        .select($"type_a", $"type_b", $"n_common",
          when(abs($"est_common" - $"n_common") <= $"n_common" * 0.05 + 2.0, 1L)
            .otherwise(0L).as("est_ok"))
        .orderBy($"type_a", $"type_b")
    },

    // KMV/theta-sketch set algebra over customer sets per order priority
    // (~1.3k distinct custkeys per group at sf0.01, ~13k at sf0.1 — well
    // past k=256, so real estimation, not the unsaturated-exact path).
    // Production path: ONE bounded ObjectHashAggregate per group — the
    // shuffle carries ≤(8·256+4)-byte synopses, never custkeys — then
    // every pairwise |A|, |A∪B|, |A∩B| estimate is pure column algebra
    // over the tiny sorted-array sketches (the 100 TB pattern: sketch
    // once, answer many overlap questions from KB artifacts). The exact
    // pairwise self-join is the certification twin the sketch replaces;
    // bounds: RSE ≈ 1/√(k−2) ≈ 6.3% at k=256 → 0.25 ≈ 4σ for sizes and
    // union; the intersection counts ~k·|I|/|U| sampled hits (~7% RSE on
    // this overlap profile) → 0.30 ≈ 4σ. Deterministic splitmix64
    // uniformizer ⇒ the bits are reproducible values, not coin flips.
    "sk06_theta_intersection" -> { (s, dir) =>
      import s.implicits._
      val du = customerSets(s, dir)
      val sk = du.groupBy($"p")
        .agg(KmvSketchAgg.kmv($"c", ThetaK).as("sk"), count(lit(1)).as("n"))
      thetaOverlapAudit(s, sk, du)
    },

    // The restart posture for the sketch tier (dd17/an12's story): the
    // per-group synopses persist as a PARQUET ARTIFACT — a KB-sized
    // columnar table of sorted bigint arrays, with the sketch parameter
    // k stored alongside and ASSERTED at load (the r15 LSH-index
    // lesson: an artifact without its parameters is a silent wrong
    // answer waiting for a mismatched reader). A later job answers
    // every overlap question from the reloaded artifact without
    // touching the base data; the shared oracle SQL with sk06 IS the
    // equivalence certificate — persisted path ≡ fresh path, row for
    // row, hash for hash.
    "sk07_persisted_synopses" -> { (s, dir) =>
      import s.implicits._
      val du = customerSets(s, dir)
      val artifactDir = new java.io.File(
        s"target/fixtures/kmv_synopses_${new java.io.File(dir).getName}")
        .getAbsolutePath
      du.groupBy($"p")
        .agg(KmvSketchAgg.kmv($"c", ThetaK).as("sk"), count(lit(1)).as("n"))
        .withColumn("k", lit(ThetaK))
        .write.mode("overwrite").parquet(artifactDir)
      val loaded = s.read.parquet(artifactDir)
      val ks = loaded.select($"k").distinct().collect().map(_.getInt(0))
      require(ks.sameElements(Array(ThetaK)),
        s"persisted synopsis artifact has k=${ks.mkString(",")}, " +
          s"this reader expects k=$ThetaK — refusing to mix parameters")
      thetaOverlapAudit(s, loaded.drop("k"), du)
    },

    // SKETCH ROLLUP CUBE — the pre-aggregated serving pattern: HLL
    // sketches built ONCE at the finest grain (returnflag × linestatus)
    // and persisted; every COARSER grain (per-flag, grand total) is then
    // answered by MERGING the persisted sketches alone — `hll_union_agg`
    // over a 6-row KB-sized artifact, the fact table never rescanned.
    // This is the property exact COUNT DISTINCT lacks (distincts don't
    // add across cells: an orderkey spans linestatuses) and the reason
    // sketch cubes exist at 100 TB: one fact pass funds every grain of
    // the hierarchy forever after. The exact rollup twin — which must
    // re-shuffle the FACT once per grain (Spark expands ROLLUP to
    // grouping-set duplicates) — is the certification cost, not the
    // serving path. Hash-checked columns: the exact distincts per cell;
    // pinned: each merged estimate within 5% (lgK=12, ~3σ — sk01's
    // bound) of its cell's exact.
    "sk08_sketch_rollup_cube" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val artifactDir = new java.io.File(
        s"target/fixtures/hll_rollup_${new java.io.File(dir).getName}")
        .getAbsolutePath
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(expr("hll_sketch_agg(l_orderkey, 12)").as("sk"))
        .withColumn("lg_k", lit(12))
        .write.mode("overwrite").parquet(artifactDir)
      val fine = s.read.parquet(artifactDir)
      val lgks = fine.select($"lg_k").distinct().collect().map(_.getInt(0))
      require(lgks.sameElements(Array(12)),
        s"persisted HLL rollup artifact has lg_k=${lgks.mkString(",")}, " +
          "this reader expects lg_k=12 — refusing to mix parameters")
      val cellEst = fine.select(
        lit("flag_status").as("grain"), $"l_returnflag".as("k1"),
        $"l_linestatus".as("k2"), expr("hll_sketch_estimate(sk)").as("est"))
      val flagEst = fine.groupBy($"l_returnflag")
        .agg(expr("hll_union_agg(sk, false)").as("sk"))
        .select(lit("flag").as("grain"), $"l_returnflag".as("k1"),
          lit("").as("k2"), expr("hll_sketch_estimate(sk)").as("est"))
      val totalEst = fine.agg(expr("hll_union_agg(sk, false)").as("sk"))
        .select(lit("total").as("grain"), lit("").as("k1"),
          lit("").as("k2"), expr("hll_sketch_estimate(sk)").as("est"))
      val exact = li.rollup($"l_returnflag", $"l_linestatus")
        .agg(countDistinct($"l_orderkey").as("n_exact"))
        .select(
          when($"l_returnflag".isNull, "total")
            .when($"l_linestatus".isNull, "flag")
            .otherwise("flag_status").as("grain"),
          coalesce($"l_returnflag", lit("")).as("k1"),
          coalesce($"l_linestatus", lit("")).as("k2"),
          $"n_exact")
      exact.join(cellEst.union(flagEst).union(totalEst),
          Seq("grain", "k1", "k2"))
        .select($"grain", $"k1", $"k2", $"n_exact".cast("long").as("n_exact"),
          withinPct($"est", $"n_exact", 0.05).as("est_ok"))
        .orderBy($"grain", $"k1", $"k2")
    })

  /** sk06/sk07's synopsis size. */
  private val ThetaK = 256

  /** The (group, element) sets under audit: distinct custkeys per order
    * priority (~1.3k per group at sf0.01, ~13k at sf0.1 — well past k,
    * so real estimation above the lowest SF). */
  private def customerSets(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderpriority".as("p"), $"o_custkey".as("c")).distinct()
  }

  /** Pairwise overlap audit from per-group synopses: exact sizes/union/
    * intersection recomputed from `du` (the quadratic certification twin
    * the sketch replaces at scale), KMV estimates from the synopses
    * alone, 4σ bits. Shared by sk06 (fresh synopses) and sk07 (reloaded
    * artifact) — identical output is the persisted≡fresh certificate. */
  private def thetaOverlapAudit(s: org.apache.spark.sql.SparkSession,
                                sk: org.apache.spark.sql.DataFrame,
                                du: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val K = ThetaK
    val exact = du.as("x").join(du.as("y"),
        $"x.c" === $"y.c" && $"x.p" < $"y.p")
      .groupBy($"x.p".as("p_a"), $"y.p".as("p_b"))
      .agg(count(lit(1)).as("n_inter"))
    val withA = exact.join(
      broadcast(sk.select($"p".as("p_a"), $"sk".as("sk_a"), $"n".as("n_a"))), "p_a")
    val both = withA.join(
      broadcast(sk.select($"p".as("p_b"), $"sk".as("sk_b"), $"n".as("n_b"))), "p_b")
    both.select(
      $"p_a", $"p_b", $"n_a", $"n_b",
      ($"n_a" + $"n_b" - $"n_inter").as("n_union"), $"n_inter",
      withinPct(KmvSketchAgg.kmvEstimate($"sk_a", K), $"n_a", 0.25)
        .as("est_a_ok"),
      withinPct(KmvSketchAgg.kmvEstimate($"sk_b", K), $"n_b", 0.25)
        .as("est_b_ok"),
      withinPct(KmvSketchAgg.kmvUnionEstimate($"sk_a", $"sk_b", K),
        $"n_a" + $"n_b" - $"n_inter", 0.25).as("est_union_ok"),
      withinPct(KmvSketchAgg.kmvIntersectEstimate($"sk_a", $"sk_b", K),
        $"n_inter", 0.30).as("est_inter_ok"))
      .orderBy($"p_a", $"p_b")
  }

  val oracles: Map[String, String] = Map(
    // Exact distinct recomputed by DuckDB; the three sketch-quality bits
    // are pinned to 1 (see the sk01 entry for the bound rationale).
    "sk01_hll_distinct" ->
      """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
        |       CAST(1 AS BIGINT) AS direct_sketch_ok,
        |       CAST(1 AS BIGINT) AS merged_sketch_ok,
        |       CAST(1 AS BIGINT) AS hllpp_ok
        |FROM lineitem""".stripMargin,

    // Exact interpolated percentiles (identical formula both engines —
    // proven unrounded by q13; rounded here for belt-and-braces) plus the
    // pinned sketch-quality bits.
    "sk02_quantile_sketch" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_exact,
        |       CAST(1 AS BIGINT) AS p50_sketch_ok,
        |       CAST(1 AS BIGINT) AS p99_sketch_ok,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // Exact top-10 heavy hitters (same deterministic tie-break) with the
    // two CMS-guarantee bits pinned to 1.
    "sk03_cms_heavy_hitters" ->
      """SELECT l_partkey,
        |       CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(1 AS BIGINT) AS no_underestimate,
        |       CAST(1 AS BIGINT) AS within_eps_n
        |FROM lineitem
        |GROUP BY l_partkey
        |ORDER BY n_lines DESC, l_partkey
        |LIMIT 10""".stripMargin,

    // The plain (un-pruned) semi-join: a hash match certifies the bloom
    // pre-filter dropped only non-matching rows.
    "sk04_bloom_prejoin" ->
      s"""SELECT l_returnflag,
         |       CAST(count(*) AS BIGINT) AS n_lines,
         |       ${sqlSumMoney("l_extendedprice")} AS revenue
         |FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
         |                     WHERE o_totalprice > 470000)
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin,

    // exact pairwise overlap; the inclusion–exclusion quality bit is
    // pinned to 1 (see the sk05 entry for the error envelope)
    "sk05_hll_intersection" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT x.event_type AS type_a, y.event_type AS type_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_common,
        |       CAST(1 AS BIGINT) AS est_ok
        |FROM tu x JOIN tu y
        |  ON x.user_id = y.user_id AND x.event_type < y.event_type
        |GROUP BY 1, 2
        |ORDER BY type_a, type_b""".stripMargin,

    // exact pairwise set sizes/union/intersection recomputed by DuckDB;
    // the four theta-sketch quality bits are pinned to 1 (bounds in the
    // sk06 entry — 4σ at k=256, deterministic hash)
    "sk06_theta_intersection" ->
      """WITH du AS (SELECT DISTINCT o_orderpriority AS p, o_custkey AS c
        |            FROM orders),
        |sizes AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY 1),
        |pairs AS (SELECT x.p AS p_a, y.p AS p_b,
        |                 CAST(COUNT(*) AS BIGINT) AS n_inter
        |          FROM du x JOIN du y ON x.c = y.c AND x.p < y.p
        |          GROUP BY 1, 2)
        |SELECT p_a, p_b, sa.n AS n_a, sb.n AS n_b,
        |       sa.n + sb.n - n_inter AS n_union, n_inter,
        |       CAST(1 AS BIGINT) AS est_a_ok, CAST(1 AS BIGINT) AS est_b_ok,
        |       CAST(1 AS BIGINT) AS est_union_ok,
        |       CAST(1 AS BIGINT) AS est_inter_ok
        |FROM pairs JOIN sizes sa ON sa.p = p_a JOIN sizes sb ON sb.p = p_b
        |ORDER BY p_a, p_b""".stripMargin,

    // IDENTICAL SQL to sk06 by design: the hash match across the two
    // entries is the persisted≡fresh equivalence certificate (the dd17
    // pattern applied to the sketch tier)
    "sk07_persisted_synopses" ->
      """WITH du AS (SELECT DISTINCT o_orderpriority AS p, o_custkey AS c
        |            FROM orders),
        |sizes AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY 1),
        |pairs AS (SELECT x.p AS p_a, y.p AS p_b,
        |                 CAST(COUNT(*) AS BIGINT) AS n_inter
        |          FROM du x JOIN du y ON x.c = y.c AND x.p < y.p
        |          GROUP BY 1, 2)
        |SELECT p_a, p_b, sa.n AS n_a, sb.n AS n_b,
        |       sa.n + sb.n - n_inter AS n_union, n_inter,
        |       CAST(1 AS BIGINT) AS est_a_ok, CAST(1 AS BIGINT) AS est_b_ok,
        |       CAST(1 AS BIGINT) AS est_union_ok,
        |       CAST(1 AS BIGINT) AS est_inter_ok
        |FROM pairs JOIN sizes sa ON sa.p = p_a JOIN sizes sb ON sb.p = p_b
        |ORDER BY p_a, p_b""".stripMargin,

    // Exact distincts at every grain of the hierarchy, straight from the
    // fact (DuckDB's ROLLUP mirrors Spark's grouping-set expansion); the
    // per-cell merged-sketch quality bits are pinned to 1 (sk01's 5%
    // bound at lgK=12)
    "sk08_sketch_rollup_cube" ->
      """SELECT CASE WHEN l_returnflag IS NULL THEN 'total'
        |            WHEN l_linestatus IS NULL THEN 'flag'
        |            ELSE 'flag_status' END AS grain,
        |       COALESCE(l_returnflag, '') AS k1,
        |       COALESCE(l_linestatus, '') AS k2,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
        |       CAST(1 AS BIGINT) AS est_ok
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY grain, k1, k2""".stripMargin)
}

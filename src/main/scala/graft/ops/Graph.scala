package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair-shaped frames.
  *
  * [[Dedup.connectedComponents]] gave the engine its first iterative
  * graph operator (min-label propagation); this adds weighted PageRank —
  * the standard importance measure over an affinity graph like
  * [[Cooccur.pairCounts]]'s co-purchase pairs.
  *
  * Determinism: classic PageRank iterates floating-point division, and a
  * float sum over in-neighbor contributions is partial-aggregation-order
  * dependent — irreproducible across partitionings, let alone engines.
  * This implementation walks in EXACT integer fixed point instead: total
  * mass `10¹²` is distributed in integer units and every step is integer
  * multiply + floor division (`div`), so the sums are exact in any order
  * and a sequential SQL replay produces bit-identical ranks. Mass floors
  * leak a few units per step (never gained), which is deterministic too.
  *
  * Scale shape: one join + one aggregate per iteration on an `(u, v, w,
  * outw)` edge frame built once; per-iteration lineage is truncated
  * ([[Lineage.truncate]] — reliable `checkpoint()` when a directory is
  * given, `localCheckpoint` otherwise) so the plan stays O(1) deep.
  * Iteration count is a fixed small constant — rank stabilizes
  * geometrically — and the per-round cost is governed by how the rank
  * frame meets the edge frame (see [[pageRankInt]]'s `broadcastRanks`).
  */
object Graph {

  /** Weighted PageRank in integer fixed point.
    *
    * Per iteration, with `TOTAL = 10¹²` and damping 85/100:
    * {{{
    *   contrib(v) = Σ_{(u,v,w)} (rank(u) · w) div outw(u)
    *   rank'(v)   = (15·TOTAL) div (100·n)  +  (85·contrib(v)) div 100
    * }}}
    * Overflow audit: `rank ≤ TOTAL = 10¹²` (mass only leaks), so
    * `rank·w` stays below 2⁶³ for any weight `w < 9·10⁶`.
    *
    * Per-round join strategy: the rank/contrib frames are NODE-cardinality
    * (for a part-affinity graph, catalog-sized — millions of 16-byte rows,
    * dimension-table territory), while the edge frame is the big side. With
    * `broadcastRanks = true` (default) every per-round join broadcasts the
    * node-sized frame, so the edge frame is scanned in place and NEVER
    * re-shuffled — per round: one broadcast hash join + one map-side-
    * combined aggregate whose shuffle carries at most distinct-v partial
    * rows per task. For graphs whose node set exceeds driver/broadcast
    * capacity set it false: the edge frame is then hash-partitioned on the
    * join key ONCE (the partitioning survives each round's checkpoint via
    * `LogicalRDD`), so rounds shuffle only the node-sized frames — never
    * the edges.
    *
    * @param pairs undirected weighted edges (item_a, item_b, w); both
    *              directions are materialized internally
    * @param iters fixed iteration count
    * @param checkpointDir reliable-checkpoint root for executor-loss
    *              survival on a real cluster (see [[Lineage.truncate]])
    * @param broadcastRanks broadcast the node-sized rank frame per round
    *              (edge frame never shuffles); false = co-partitioned join
    * @return (item, rank) — rank in integer mass units summing to ≤ TOTAL
    */
  def pageRankInt(pairs: DataFrame, iters: Int = 5,
                  total: Long = 1000000000000L,
                  checkpointDir: Option[String] = None,
                  broadcastRanks: Boolean = true): DataFrame = {
    def cut(df: DataFrame) = Lineage.truncate(df, checkpointDir)
    def side(df: DataFrame) = if (broadcastRanks) broadcast(df) else df
    // materialize the edge frame BEFORE the out-weight self-join: `edges`
    // appears on both sides of that join (and each side unions the input
    // twice), so an un-truncated caller pipeline — q27 feeds the full
    // co-purchase pair aggregate here — would be re-evaluated 4× before
    // the first round even starts
    val edges = cut(pairs
      .select(col("item_a").as("u"), col("item_b").as("v"), col("w"))
      .union(pairs.select(col("item_b").as("u"), col("item_a").as("v"), col("w"))))
    val ewRaw = edges
      .join(edges.groupBy(col("u")).agg(sum(col("w")).as("outw")), "u")
    val ew = cut(if (broadcastRanks) ewRaw else ewRaw.repartition(col("u")))
    val nodes = cut(ew.select(col("u").as("node")).distinct())
    val n = nodes.count()
    require(n > 0, "pageRankInt: empty graph")
    val base = (15L * total) / (100L * n)
    var rank = nodes.withColumn("rank", lit(total / n))
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(side(rank.select(col("node").as("u"), col("rank"))), "u")
        .select(col("v"), expr("(rank * w) div outw").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("contrib"))
      rank = cut(nodes
        .join(side(contrib.select(col("v").as("node"), col("contrib"))),
          Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(contrib, 0L)) div 100")).as("rank")))
    }
    rank.select(col("node").as("item"), col("rank"))
  }

  /** Per-node triangle participation over an undirected simple graph.
    *
    * The naive wedge enumeration (join edges on a shared vertex, close
    * against the edge set) is quadratic in the maximum degree — one hub
    * vertex of degree d contributes d² wedges, the classic scale-killer
    * for graph triangle counting. This uses the standard degree-ordered
    * orientation instead: every edge is directed from its
    * (degree, id)-smaller endpoint to the larger, so each triangle has
    * exactly one node with two out-edges and the wedge count is bounded
    * by Σ outdeg(v)² = O(m^1.5) REGARDLESS of hub degree (a node's
    * out-degree under this orientation is at most O(√m)). All three
    * steps are key-joins + one aggregate — no cartesian anywhere.
    *
    * Determinism: the output (node, degree, n_triangles) is pure exact
    * integer counting, and triangle membership is orientation-
    * independent — a sequential replay that enumerates triangles any
    * other way (e.g. DuckDB closing `a<b<c` wedges) produces identical
    * counts.
    *
    * @param pairs canonical undirected edges, `item_a < item_b`, one row
    *              per edge (pre-capped upstream — e.g.
    *              [[Cooccur.pairCounts]] with a min-support filter)
    * @return (node, degree, n_triangles) for every node on an edge
    */
  def triangleParticipation(pairs: DataFrame,
                            checkpointDir: Option[String] = None): DataFrame = {
    // the caller's pair pipeline feeds three consumers (both union
    // branches of `und` plus the wedge-closure join below) — materialize
    // it once instead of re-running it per consumer
    val p = Lineage.truncate(pairs, checkpointDir)
    val und = Lineage.truncate(p
      .select(col("item_a").as("u"), col("item_b").as("v"))
      .union(p.select(col("item_b").as("u"), col("item_a").as("v")))
      .distinct(), checkpointDir)
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // Orient u→v iff (deg(u), u) < (deg(v), v): a total order, so each
    // undirected edge survives exactly once.
    val oriented = und
      .join(deg.withColumnRenamed("deg", "du"), "u")
      .join(deg.select(col("u").as("v"), col("deg").as("dv")), "v")
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u"), col("v"))
    val orientedCut = Lineage.truncate(oriented, checkpointDir)
    // Wedge (v, w) from a common source's two out-edges, canonicalized
    // v < w; closed against the canonical undirected edge set.
    val wedges = orientedCut.as("e1")
      .join(orientedCut.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("apex"), col("e1.v").as("a"), col("e2.v").as("b"))
    val tris = wedges
      .join(p.select(col("item_a").as("a"), col("item_b").as("b")), Seq("a", "b"))
    val perNode = tris
      .select(explode(array(col("apex"), col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.select(col("u").as("node"), col("deg").as("degree"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Single-source BFS hop distances, frontier-at-a-time.
    *
    * The textbook distributed BFS: each round joins ONLY the current
    * frontier (nodes first reached last round) against the edge frame and
    * anti-joins the visited set, so per-round work is proportional to the
    * frontier's edge boundary — never to the whole reachable set, and
    * never the quadratic all-pairs expansion a naive "min over paths"
    * formulation would shuffle. Rounds are capped by `maxHops` (the
    * explicit cost knob: one key-join + one anti-join per round) with an
    * early exit when the frontier drains; per-round lineage truncation
    * exactly like [[pageRankInt]] ([[Lineage.truncate]] — reliable when
    * `checkpointDir` is set).
    *
    * Determinism: a node's hop distance is the unique minimum over
    * traversal orders, so the output is exact integers independent of
    * partitioning — a sequential replay (e.g. DuckDB's recursive CTE
    * taking `MIN(dist)` per node) is bit-identical.
    *
    * @param pairs   undirected edges (item_a, item_b), one row per edge
    * @param source  start node
    * @param maxHops inclusive distance bound
    * @return (node, dist) for every node within `maxHops` of `source`
    */
  def bfsHops(pairs: DataFrame, source: Long, maxHops: Int,
              checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    def cut(df: DataFrame) = Lineage.truncate(df, checkpointDir)
    // one evaluation of the caller's pair pipeline, not one per union branch
    val p = cut(pairs)
    val und = cut(p
      .select(col("item_a").as("u"), col("item_b").as("v"))
      .union(p.select(col("item_b").as("u"), col("item_a").as("v")))
      .distinct())
    var visited = cut(Seq((source, 0)).toDF("node", "dist"))
    var frontier = visited.select(col("node"))
    var hop = 0
    while (hop < maxHops && frontier.head(1).nonEmpty) {
      hop += 1
      val next = cut(frontier.join(und, frontier("node") === und("u"))
        .select(col("v").as("node"))
        .distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti"))
      visited = cut(visited
        .union(next.withColumn("dist", lit(hop)).select(col("node"), col("dist"))))
      frontier = next
    }
    visited
  }
}

package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`).
  *
  *  - **Brute force** is the correctness baseline: broadcast the (small)
  *    query set against the corpus scan — the corpus is never shuffled,
  *    so this scales to any corpus size at O(corpus × queries) compute.
  *  - **IVF** is the scale path: a coarse k-means quantizer assigns every
  *    corpus vector to a cell (one pass); queries probe only the
  *    `nProbe` nearest cells, cutting compute by ~k/nProbe at the cost
  *    of recall. Cell assignment is itself distributed.
  *
  * The quantizer is an **index artifact, not a query cost**: it is fit on
  * a bounded deterministic sample (hash-selected, capped — never the full
  * corpus; at 100 TB a full-corpus fit per query is a non-starter), with
  * capped iterations, and memoized per (corpus, cells, seed) so every
  * query against the same corpus shares one index.
  *
  * Dot products use `zip_with` + `aggregate` (codegen'd higher-order
  * functions, no UDF). Norms are precomputed once per side.
  */
object Similarity {

  /** Dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (arrays cast to double upstream). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors by cosine for each query vector.
    *
    * @param corpus  (idCol, vecCol) corpus — arbitrarily large
    * @param queries (idCol, vecCol) query set — small enough to broadcast
    * @return (query_id, rank, neighbor_id, cosine)
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", norm(col("cvec")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("qnorm", norm(col("qvec")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("cvec"), col("qvec")) / (col("cnorm") * col("qnorm"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  // ---------------------------------------------------------------- IVF —

  /** Memoized coarse quantizers: one index build per (corpus key, cells,
    * seed) per session, shared by every IVF query over that corpus. */
  private val quantizers = new ConcurrentHashMap[String, Array[Array[Double]]]()

  /** Max rows the quantizer is ever fit on. Cell centroids are a coarse
    * partitioning device — a bounded sample fixes them as well as the full
    * corpus does. */
  private val QuantizerSampleCap = 4096

  /** Fit (or fetch) the coarse quantizer for a corpus. The sample is
    * hash-selected on the id column — deterministic under repartitioning
    * and replay, unlike `df.sample` — and hard-capped. */
  def coarseQuantizer(corpus: DataFrame, idCol: String, vecCol: String,
                      key: String, nCells: Int, seed: Long): Array[Array[Double]] =
    quantizers.computeIfAbsent(s"$key|$nCells|$seed", _ => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      // 1-in-N hash sample aiming at ~QuantizerSampleCap rows; the limit
      // is a hard cap for corpora whose size estimate is unavailable.
      val n = corpus.queryExecution.optimizedPlan.stats.rowCount
      val everyNth = n.map(c => (c.toLong / QuantizerSampleCap).max(1L)).getOrElse(1L)
      val sample = corpus
        .filter(pmod(xxhash64(col(idCol)), lit(everyNth)) === 0)
        .limit(QuantizerSampleCap)
        .select(array_to_vector(asDouble(col(vecCol))).as("features"))
      // random init + few iterations: the quantizer only partitions space
      // into cells — probe search tolerates coarse centroids, and the
      // k-means|| init alone costs more jobs than the whole refinement
      val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(5)
        .setInitMode("random")
        .setFeaturesCol("features").fit(sample)
      model.clusterCenters.map(_.toArray)
    })

  /** Literal `(cell, centroid)` array — broadcast via the plan. Centroids
    * are L2-normalized on the driver: cosine ORDER against a fixed vector
    * is invariant to scaling either side, so cell ranking needs only the
    * dot product with unit centers — no per-row, per-center norm
    * evaluation (those lambdas run interpreted). */
  private def centersCol(centers: Array[Array[Double]]): Column = {
    val unit = centers.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }
    array(unit.indices.map(i =>
      struct(lit(i).as("cell"), typedlit(unit(i).toSeq).as("cvec"))): _*)
  }

  /** The `n` nearest cells of `vec` by cosine, best first. */
  private def nearestCells(centers: Array[Array[Double]], vec: Column, n: Int): Column = {
    val scored = transform(centersCol(centers), c =>
      struct(dot(vec, c.getField("cvec")).as("sim"), c.getField("cell").as("cell")))
    slice(reverse(array_sort(scored)), 1, n)
  }

  /** IVF (inverted-file) ANN: assign the corpus to quantizer cells, then
    * search only the `nProbe` cells nearest each query.
    *
    * @return (query_id, rank, neighbor_id, cosine) — approximate top-k
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
              seed: Long = 42L, quantizerKey: String = ""): DataFrame = {
    val centers = coarseQuantizer(corpus, idCol, vecCol,
      if (quantizerKey.nonEmpty) quantizerKey else s"ivf-${corpus.hashCode}", nCells, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("cell", nearestCells(centers, col("cvec"), 1).getItem(0).getField("cell"))
      .withColumn("cnorm", norm(col("cvec")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("cells", transform(nearestCells(centers, col("qvec"), nProbe), x => x.getField("cell")))
      .withColumn("qnorm", norm(col("qvec")))
      .select(col("query_id"), explode(col("cells")).as("cell"), col("qvec"), col("qnorm"))

    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("cvec"), col("qvec")) / (col("cnorm") * col("qnorm"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, found via the
    * IVF cells (pairs in the same cell only — approximate). */
  def embeddingDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, nCells: Int = 16,
                        seed: Long = 42L, quantizerKey: String = ""): DataFrame = {
    val centers = coarseQuantizer(corpus, idCol, vecCol,
      if (quantizerKey.nonEmpty) quantizerKey else s"ivf-${corpus.hashCode}", nCells, seed)
    val withCell = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .withColumn("vnorm", norm(col("vec")))
      .withColumn("cell", nearestCells(centers, col("vec"), 1).getItem(0).getField("cell"))
    val right = withCell.select(col("cell"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("vnorm").as("norm_b"))
    withCell.join(right, Seq("cell"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"),
        (dot(col("vec"), col("vec_b")) / (col("vnorm") * col("norm_b"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation policy for iterative operators (PageRank, connected
  * components, BFS). Each iteration's output feeds the next, so without
  * truncation the logical plan grows linearly in rounds and Catalyst
  * re-analysis goes quadratic — every iterative op here cuts lineage once
  * per round.
  *
  * HOW it cuts lineage is the durability knob:
  *
  *  - `localCheckpoint` (default, `checkpointDir = None`): blocks are
  *    pinned on executor memory/disk and are NOT recoverable — losing one
  *    executor mid-iteration kills the job. Correct for `local[n]`
  *    (one JVM: any executor loss is already fatal) and cheap.
  *  - reliable `checkpoint()` (`checkpointDir = Some(dir)`): blocks are
  *    written to the (typically distributed) filesystem at `dir` and
  *    survive executor loss — the required posture for long iterative
  *    jobs on a real cluster, at the cost of one FS round-trip per round.
  *
  * Both capture the physical plan's output partitioning into the resulting
  * `LogicalRDD`, so a pre-`repartition`ed frame keeps its co-location
  * across rounds under either policy.
  */
object Lineage {
  def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir stores `dir/<UUID>` (qualified with an FS
        // scheme), so recover the configured ROOT as the parent of that
        // UUID subdir and compare fully-qualified paths. Substring
        // matching here would false-positive on a previously configured
        // root that merely CONTAINS the requested path (e.g. requested
        // /data/ckpt vs configured /data/ckpt-old/<uuid>), silently
        // landing "reliable" blocks under a root someone else may clean.
        // NOTE: the checkpoint root is PROCESS-GLOBAL SparkContext state —
        // concurrent callers wanting different roots race on it; the last
        // setter wins for subsequently checkpointed frames.
        val hconf = sc.hadoopConfiguration
        def qualified(p: String) = {
          val path = new org.apache.hadoop.fs.Path(p)
          path.getFileSystem(hconf).makeQualified(path)
        }
        val configuredRoot = sc.getCheckpointDir.map(d => qualified(d).getParent)
        if (!configuredRoot.contains(qualified(dir))) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
}

package graft.stream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic versioned-SNAPSHOT artifact: `base/v<id>` directories, each a
  * self-contained full snapshot of some maintained state (an incremental
  * view, an upsert table, a fold artifact). Newest committed version
  * wins; earlier versions exist only for in-flight readers and batch
  * retries. The maintenance twin of [[IdempotentSink]]: that protocol
  * accumulates immutable DELTAS that compaction folds into one run; this
  * one accumulates full SNAPSHOTS that retention prunes — without
  * retention a per-batch snapshot writer leaks one directory per batch
  * forever (the small-file seam of the st15/st16/st31 family).
  *
  * Commit protocol (same discipline as IdempotentSink, through the
  * Hadoop FileSystem of the target — HDFS/S3A-with-atomic-rename, not
  * just `file:`):
  *
  *  1. if `base/v<id>` exists the version already committed — a retry
  *     publishes nothing (committed versions are immutable, so a reader
  *     that resolved `v<id>` can never see it change under it);
  *  2. otherwise stage at `base/_staging/v<id>` with `overwrite` (a
  *     crashed prior attempt's partial staging is simply rewritten);
  *  3. one atomic rename publishes the complete directory. A reader
  *     resolving "latest" therefore only ever sees COMPLETE snapshots —
  *     the raw `mode("overwrite")` write this replaces could expose a
  *     half-written newest version to a concurrent reader.
  *
  * Retention contract: [[retain]] deletes all but the newest `keep`
  * committed versions. Every surviving version is self-contained, so any
  * delete prefix (including a crash mid-retention) leaves a consistent
  * artifact. Inside a streaming merge loop use `keep >= 2`: an
  * at-least-once retry of batch `id` re-reads `v(id-1)` as its merge
  * input. Readers pinned to an old version must finish within the
  * retention window — the standard snapshot-retention caveat (Delta
  * VACUUM's contract), documented rather than solved, because solving it
  * needs reader leases the artifact deliberately doesn't carry.
  */
object VersionedSnapshot {

  def dir(base: String, id: Long): String = s"$base/v$id"

  private def fsOf(spark: SparkSession, base: Path): FileSystem =
    base.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Publish `df` as version `id` (stage + one atomic rename). A retry
    * of a committed version publishes nothing.
    *
    * Single-writer contract: at most ONE publisher per version id at a
    * time (the streaming-merge posture — one driver owns the artifact;
    * a foreachBatch RETRY of the same id is sequential, never
    * concurrent). The existence checks are check-then-rename, so two
    * truly concurrent publishers of the same id can both pass them; the
    * loser's `fs.rename` then lands its staging dir UNDER the winner's
    * committed `v<id>` (Hadoop rename-into-existing-directory moves the
    * source inside) while returning true. That violation is DETECTED
    * after the rename — a nested `v<id>/v<id>` means we lost the race —
    * and repaired by deleting the nested junk; the winner's committed
    * snapshot stands untouched (committed versions are immutable either
    * way, so readers were never exposed to a torn snapshot). */
  def publish(df: DataFrame, base: String, id: Long): Unit = {
    val basePath = new Path(base)
    val fs = fsOf(df.sparkSession, basePath)
    val target = new Path(basePath, s"v$id")
    // a nested v<id>/v<id> is the loser's footprint from a past race —
    // repair it on every path through publish (the loser's own
    // at-least-once retry heals the artifact it dirtied)
    def repairNested(): Unit = {
      val nested = new Path(target, s"v$id")
      if (fs.exists(nested)) fs.delete(nested, true): Unit
    }
    if (fs.exists(target)) { repairNested(); return }
    val stage = new Path(basePath, s"_staging/v$id")
    df.write.mode("overwrite").parquet(stage.toString)
    if (fs.exists(target)) { fs.delete(stage, true); repairNested(); return }
    fs.mkdirs(target.getParent)
    if (!fs.rename(stage, target))
      throw new java.io.IOException(
        s"snapshot commit failed: rename $stage -> $target returned false")
    repairNested()
  }

  /** Ids of every committed version, ascending (staging is invisible —
    * it lives under the underscore-prefixed `_staging`). */
  def versionIds(spark: SparkSession, base: String): Seq[Long] = {
    val basePath = new Path(base)
    val fs = fsOf(spark, basePath)
    if (!fs.exists(basePath)) return Seq.empty
    fs.listStatus(basePath).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.length > 1 && n.head == 'v' && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong)
      .toSeq.sorted
  }

  def latestId(spark: SparkSession, base: String): Option[Long] =
    versionIds(spark, base).lastOption

  def read(spark: SparkSession, base: String, id: Long): DataFrame =
    spark.read.parquet(dir(base, id))

  /** TIME-TRAVEL read: the artifact AS OF version `id` — for a per-batch
    * publisher, exactly the state after the batch that committed `id`
    * (the k-batch prefix of the stream). Committed versions are
    * immutable, so the returned frame is byte-stable no matter how many
    * later versions publish while it is read (st38 certifies readAt ≡
    * an independent prefix replay; SnapshotSpec pins the immutability).
    * Fails fast, naming the available ids, when `id` was never committed
    * or [[retain]] pruned it — the Delta/Iceberg AS-OF contract: time
    * travel reaches exactly as far back as retention keeps. */
  def readAt(spark: SparkSession, base: String, id: Long): DataFrame = {
    val ids = versionIds(spark, base)
    require(ids.contains(id),
      s"version $id is not readable (committed: ${ids.mkString(", ")}) — " +
        "never published, or pruned by retention")
    read(spark, base, id)
  }

  /** Delete all but the newest `keep` committed versions (and any stale
    * `_staging` leftovers older than the survivors). Returns the ids
    * deleted. Crash-safe: snapshots are self-contained and retention
    * never touches the newest `keep`, so every intermediate state is a
    * valid artifact; a re-run finishes the remaining deletes. */
  def retain(spark: SparkSession, base: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "retention must keep at least the newest version")
    val ids = versionIds(spark, base)
    val drop = ids.dropRight(keep)
    val basePath = new Path(base)
    val fs = fsOf(spark, basePath)
    drop.foreach { id =>
      fs.delete(new Path(basePath, s"v$id"), true)
      val stale = new Path(basePath, s"_staging/v$id")
      if (fs.exists(stale)) fs.delete(stale, true)
    }
    drop
  }
}

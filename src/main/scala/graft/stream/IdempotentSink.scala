package graft.stream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Idempotent per-batch parquet commit for `foreachBatch` sinks.
  *
  * `foreachBatch` is at-least-once: a crash between the write and the
  * streaming checkpoint commit re-executes the batch, so a bare
  * `mode("append")` duplicates the batch's rows on retry — permanently,
  * since downstream consumers cannot tell a duplicate file from new data.
  *
  * Protocol, all through the Hadoop FileSystem of the target path (works
  * on HDFS/S3A-with-atomic-rename, not just `file:`): the unit of commit
  * is a whole per-batch DIRECTORY, published by ONE atomic rename —
  *
  *  1. if `dir/b<id>` exists, the batch already committed: a retry is a
  *     no-op (the name→content mapping of a committed batch is immutable,
  *     so a downstream file-stream source that listed first-attempt files
  *     can never see them replaced or partially duplicated);
  *  2. otherwise write the batch to `dir/_staging/b<id>` with `overwrite`
  *     (a retry starts from a clean staging dir);
  *  3. rename `_staging/b<id>` → `dir/b<id>`. The rename either publishes
  *     the complete directory or fails — its boolean result is checked and
  *     a `false` raises, failing the batch so the streaming checkpoint is
  *     not advanced past rows that never landed.
  *
  * Replaying any prefix of these steps converges to exactly one copy of
  * the batch. `_staging` is underscore-prefixed, so readers skip it; a
  * committed `b<id>` directory appears atomically and never changes.
  * Readers consume the sink with [[read]] (batch) or a `dir/b*` glob
  * (file-stream source — the glob is re-resolved every trigger, so later
  * batch directories are picked up as they are published).
  */
object IdempotentSink {

  /** Commit `batch` as the atomic directory `dir/b<batchId>`.
    *
    * A retry of an already-committed batch publishes nothing, but it must
    * still PROCESS the batch: in a stateful query the re-attempted batch
    * re-builds its state-store version from the last committed one, and
    * the engine (Spark 4's state-store commit validation) requires every
    * partition of every batch to run so those versions commit — an early
    * return here would fail the restarted query and strand its state. */
  def writeBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val out = new Path(dir)
    val fs = out.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    val target = new Path(out, s"b$batchId")
    if (fs.exists(target)) { materialize(batch); return } // committed — republish nothing
    val stage = new Path(out, s"_staging/b$batchId")
    batch.write.mode("overwrite").parquet(stage.toString)
    commitDir(fs, stage, target)
  }

  /** Fan a route-classified batch out to per-route sinks in ONE Spark job:
    * a single `partitionBy(routeCol)` staged write (instead of one filtered
    * write per route — N source scans, N jobs), then one atomic directory
    * rename per populated route, committing `baseDir/<route>/b<batchId>`.
    * Routes absent from the batch produce no directory — their sinks
    * simply gain nothing this batch. */
  def writeRoutedBatch(classified: DataFrame, baseDir: String, routeCol: String,
                       batchId: Long): Unit = {
    val base = new Path(baseDir)
    val fs = base.getFileSystem(classified.sparkSession.sparkContext.hadoopConfiguration)
    // A single route directory existing is NOT proof the whole batch
    // committed (a crash can land between per-route renames), so full
    // completion gets its own marker: `_committed/b<id>` is created only
    // after every populated route's rename. A retry of a fully-committed
    // batch then skips the staging write entirely instead of re-running
    // the whole partitionBy job and discarding every directory.
    val done = new Path(base, s"_committed/b$batchId")
    if (fs.exists(done)) { materialize(classified); return } // see writeBatch
    val stage = new Path(base, s"_staging/b$batchId")
    classified.write.mode("overwrite").partitionBy(routeCol).parquet(stage.toString)
    fs.listStatus(stage)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$routeCol="))
      .foreach { st =>
        val route = st.getPath.getName.stripPrefix(s"$routeCol=")
        commitDir(fs, st.getPath, new Path(new Path(base, route), s"b$batchId"))
      }
    fs.delete(stage, true)
    fs.mkdirs(done): Unit
  }

  /** Read back everything committed to a sink directory (all `b<id>`
    * subdirectories; `_staging` and `_SUCCESS` markers are skipped by the
    * standard hidden-path filter). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(dir)

  /** Run every partition of a re-attempted batch without writing anything
    * — the cheapest full pass that lets upstream state stores commit. */
  private def materialize(batch: DataFrame): Unit =
    batch.foreach(_ => ())

  /** Publish a staged directory at `target` via one atomic rename. If a
    * prior attempt already committed `target`, the staged copy is
    * discarded — committed names and contents are immutable. */
  private def commitDir(fs: FileSystem, staged: Path, target: Path): Unit = {
    if (fs.exists(target)) { fs.delete(staged, true); return }
    fs.mkdirs(target.getParent)
    if (!fs.rename(staged, target))
      throw new java.io.IOException(
        s"idempotent commit failed: rename $staged -> $target returned false")
  }
}

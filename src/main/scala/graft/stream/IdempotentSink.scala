package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Idempotent per-batch parquet commit for `foreachBatch` sinks.
  *
  * `foreachBatch` is at-least-once: a crash between the write and the
  * streaming checkpoint commit re-executes the batch, so a bare
  * `mode("append")` duplicates the batch's rows on retry — permanently,
  * since downstream consumers cannot tell a duplicate file from new data.
  *
  * Protocol, all through the Hadoop FileSystem of the target path (works
  * on HDFS/S3A, not just `file:`):
  *  1. write the batch to `_staging/b<id>` with `overwrite` — a retry
  *     starts from a clean staging dir;
  *  2. delete every previously-committed `b<id>-*.parquet` for this batch
  *     — a prior partial commit may have left MORE files than this
  *     attempt produces (partition counts can change across restarts),
  *     and stale leftovers would duplicate rows;
  *  3. rename the staged files to deterministic `b<id>-<i>.parquet` names
  *     and drop the staging dir.
  *
  * Replaying any prefix of these steps converges to exactly one copy of
  * the batch. `_staging` is underscore-prefixed, so readers ignore it;
  * downstream file-stream sources see each committed name once.
  */
object IdempotentSink {

  def writeBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val out = new Path(dir)
    val fs = out.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    val stage = new Path(out, s"_staging/b$batchId")
    batch.write.mode("overwrite").parquet(stage.toString)
    val staged = fs.listStatus(stage)
      .filter(_.getPath.getName.endsWith(".parquet")).sortBy(_.getPath.getName)
    if (fs.exists(out)) fs.listStatus(out)
      .filter(_.getPath.getName.matches(s"b$batchId-\\d+\\.parquet"))
      .foreach(f => fs.delete(f.getPath, false))
    staged.zipWithIndex.foreach { case (f, i) =>
      fs.rename(f.getPath, new Path(out, s"b$batchId-$i.parquet"))
    }
    fs.delete(stage, true)
  }
}

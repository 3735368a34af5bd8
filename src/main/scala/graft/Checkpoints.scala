package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for ITERATIVE loops (connected components,
  * k-core peeling, LPA, Lloyd/k-means, BPE merges, blast-radius BFS).
  *
  * Default: `localCheckpoint()` — eager, cheap, and the per-round state
  * frames are tiny, but the blocks are pinned to EXECUTOR storage: on a
  * real cluster a lost executor mid-loop loses them, and with the
  * lineage truncated there is nothing to recompute from, so the whole
  * job fails (acceptable locally; fragile at 1000 executors).
  *
  * `SPARK_GRAFT_CHECKPOINT_DIR` (or [[checkpointDir]] directly, the
  * test hook — mirrors [[operators.Dedup.edgeScratchDir]]) swaps every
  * loop onto RELIABLE `checkpoint()`: round state is written to the
  * given fault-tolerant directory (HDFS / object store on a cluster),
  * so executor loss costs one round's recompute, not the job. Cost: one
  * distributed-FS write per round of a state frame that is node-count
  * sized — the standard large-graph trade (GraphX periodic checkpoints
  * make the same one).
  *
  * Checkpoint files accumulate for the app's lifetime unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`; point the
  * dir at scratch storage. */
object Checkpoints {
  @volatile private[graft] var checkpointDir: Option[String] =
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")

  /** Truncate `df`'s lineage per the configured policy (see object
    * scaladoc). Eager in both modes — loop callers rely on the
    * materialization action (e.g. to fire `Observation` counts). */
  def iter(df: DataFrame): DataFrame = checkpointDir match {
    case Some(dir) =>
      val sc = df.sparkSession.sparkContext
      if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
      df.checkpoint()
    case None => df.localCheckpoint()
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame

/** Plan-truncating checkpoint with a fault-tolerance lever (r18).
  *
  * The engine's iterative / multi-pass operators ([[AggOps.exactQuantiles]],
  * [[GraphOps]]'s PageRank family) truncate reused lineage with
  * `localCheckpoint`: blocks live on executor local storage, which is fast
  * but NOT fault-tolerant — an executor loss fails the query for a full
  * re-run instead of recomputing lineage. Acceptable on a single node;
  * at cluster scale a long-running query may prefer durable checkpoints.
  *
  * Setting `spark.graft.reliableCheckpointDir` (session conf) switches
  * every such site to a RELIABLE `Dataset.checkpoint` into that directory
  * (HDFS/object-store path on a real cluster): blocks survive executor
  * loss at the cost of a write to the checkpoint filesystem. Unset
  * (default) keeps the local form. Both forms truncate the logical plan
  * identically — results and plan-size behavior do not depend on the
  * lever, only the storage of the materialized bytes does. */
object Checkpoints {
  val ConfKey = "spark.graft.reliableCheckpointDir"

  /** Last raw conf value we passed to `setCheckpointDir`, tracked locally
    * because `sc.getCheckpointDir` returns the RESOLVED URI (scheme +
    * random subdir) and never string-matches the raw conf value — the
    * naive `contains` guard would re-set global SparkContext state on
    * every call. Caveat: the checkpoint dir is SparkContext-global, so
    * two sessions sharing one context with DIFFERENT `ConfKey` values
    * would race each other; the engine assumes one value per context. */
  @volatile private var lastDirSet: String = null

  def planCheckpoint(df: DataFrame, eager: Boolean = false): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // also re-set when the CONTEXT has no dir: lastDirSet is
        // JVM-global, a restarted context (stop + new session, same conf
        // value) starts with an empty checkpoint dir and `df.checkpoint`
        // would throw if the stale cache short-circuited the set
        if (lastDirSet != dir || sc.getCheckpointDir.isEmpty) synchronized {
          if (lastDirSet != dir || sc.getCheckpointDir.isEmpty) {
            sc.setCheckpointDir(dir)
            lastDirSet = dir
          }
        }
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
}

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

  /** Last (context, raw conf value) we passed to `setCheckpointDir`,
    * tracked locally because `sc.getCheckpointDir` returns the RESOLVED
    * URI (scheme + random subdir) and never string-matches the raw conf
    * value — the naive `contains` guard would re-set global SparkContext
    * state (and mint a fresh random subdir) on every call. Keying the
    * cache on the CONTEXT IDENTITY too (r21, closing the r20 advice)
    * removes the restarted-context stale hit outright: a new context —
    * even one whose conf carries the same dir string — never
    * short-circuits on the previous context's entry, whether or not its
    * checkpoint dir was pre-set externally to some other path. Caveat
    * (unchanged): the checkpoint dir is SparkContext-global, so two
    * sessions sharing one context with DIFFERENT `ConfKey` values would
    * race each other; the engine assumes one value per context. */
  @volatile private var lastSet: (org.apache.spark.SparkContext, String) = null

  def planCheckpoint(df: DataFrame, eager: Boolean = false): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // also re-set when the CONTEXT has no dir: a context constructed
        // without one would make `df.checkpoint` throw if a stale cache
        // entry short-circuited the set
        if (lastSet != ((sc, dir)) || sc.getCheckpointDir.isEmpty) synchronized {
          if (lastSet != ((sc, dir)) || sc.getCheckpointDir.isEmpty) {
            sc.setCheckpointDir(dir)
            lastSet = (sc, dir)
          }
        }
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
}

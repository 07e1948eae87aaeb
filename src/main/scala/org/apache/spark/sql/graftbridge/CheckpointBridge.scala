package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to release the storage blocks behind a checkpointed Dataset.
  *
  * `Dataset.localCheckpoint(eager = true)` persists the materialized
  * internal RDD on the executors, but the public API offers no way to
  * free those blocks: `Dataset.unpersist()` only talks to the
  * CacheManager, which never saw them. Iterative dataflows that
  * checkpoint per round (DupGraph.connectedComponents) would otherwise
  * accrete one block set per iteration for the life of the session —
  * storage memory fills and every later query pays for it.
  *
  * The checkpointed Dataset's analyzed plan is exactly one `LogicalRDD`
  * node whose `rdd` field is the persisted RDD; unpersisting that RDD
  * frees the blocks. Lives in an org.apache.spark.sql subpackage solely
  * for access; contains no Spark-derived code.
  *
  * SAFETY: a locally-checkpointed RDD has its lineage truncated, so once
  * unpersisted it can NEVER be recomputed — only call this when every
  * consumer of the Dataset has already materialized its own output.
  */
object CheckpointBridge {

  /** Free the blocks behind a checkpointed Dataset. Returns false (and
    * does nothing) if the Dataset is not a checkpoint result.
    */
  def unpersistCheckpoint(df: Dataset[_], blocking: Boolean = false): Boolean =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking); true
      case _ => false
    }
}

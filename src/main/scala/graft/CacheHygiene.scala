package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Deterministic release of operator-internal caches.
  *
  * Operators like [[graft.operators.TextOps.lshCandidatePairs]] persist an
  * intermediate (the minhash signature table) that the RETURNED lazy
  * DataFrame still reads — so the operator cannot unpersist before
  * returning, and without help the cache leaks until session end
  * (VERDICT r7 finding #3). Eagerly materializing the result instead
  * costs an extra Spark job (+1.6 s on t03 at sf0.1, measured), so the
  * right shape is: stay lazy, and drop the cache the moment the caller's
  * first action over the session completes. Persisted plans recompute
  * transparently if a caller runs a second action, so an early release
  * costs only speed, never correctness — which is why this helper must
  * ONLY be used for `persist`ed plans, never for checkpoints (their
  * lineage is truncated; released blocks are unrecoverable).
  */
object CacheHygiene {

  /** Unpersist `cached` after the next SQL action on its session
    * completes (success or failure), then deregister. One-shot. */
  def unpersistAfterNextAction(cached: DataFrame): Unit = {
    val manager = cached.sparkSession.listenerManager
    val fired = new AtomicBoolean(false)
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def fire(): Unit = if (fired.compareAndSet(false, true)) {
        cached.unpersist(blocking = false)
        manager.unregister(this)
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = fire()
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = fire()
    }
    manager.register(listener)
  }
}

package graft.operators

import org.apache.spark.SparkContext

/** Shared binding for the SparkContext-GLOBAL checkpoint directory.
  *
  * Spark's checkpoint dir is one mutable slot per application, and every
  * `setCheckpointDir` call mints a fresh UUID subdirectory under the
  * given path. Iterative operators (`Dedup.connectedComponents`,
  * `Similarity.kmeansAssign`/`kmeansCentroids`/`pqCodes`,
  * `Classifier.perceptronTrain`) that accept `checkpointDir` therefore
  * bind it through here: the rebind is skipped when the requested path
  * is the one already bound, so (a) back-to-back operator calls in one
  * pipeline reuse a single checkpoint root instead of scattering UUID
  * dirs, and (b) an operator call can no longer silently clobber a
  * DIFFERENT dir mid-job unless the caller really asked for a new path.
  * Two CONCURRENT calls with different dirs still race on the global
  * slot — callers running operators in parallel must pass the same dir
  * (documented at every public entry point taking `checkpointDir`).
  */
private[graft] object Checkpoints {
  private val bound = new java.util.concurrent.atomic.AtomicReference[String]()

  def bindDir(sc: SparkContext, dir: String): Unit =
    if (bound.getAndSet(dir) != dir) sc.setCheckpointDir(dir)
}

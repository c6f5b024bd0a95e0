package graft.ops

import org.apache.spark.sql.DataFrame

/** Driver-side overlap of INDEPENDENT jobs (optimization guide §2.6:
  * Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially). Two shapes recur in the query paths:
  *
  *  - [[materialize]]: persist()ed stages that one downstream action
  *    would otherwise evaluate SERIALLY. A broadcast subtree blocks
  *    submission of the main job while it computes (executeBroadcast
  *    is awaited on the driver during RDD assembly), so e.g. q237's
  *    percentile-bound broadcast materialized the whole LM chain
  *    before the job carrying the repetition-gate chain even started.
  *    Counting the cached stages concurrently first means the final
  *    action reads only caches.
  *  - [[inParallel]]: two independent driver-side fit chains (each an
  *    eager sequence of jobs — the k-means / BPE collect convention)
  *    run on two threads, so one chain's stage tails back-fill the
  *    other's idle cores.
  *
  * Failure contract: all tasks settle before the first throwable
  * rethrows on the caller thread — no orphaned in-flight jobs.
  */
object Overlap {

  /** Run two independent driver-side computations concurrently;
    * returns both results, rethrows the first failure after both
    * settle.
    */
  def inParallel[A, B](fa: => A, fb: => B): (A, B) = {
    @volatile var rb: Either[Throwable, B] = null
    val t = new Thread(() => {
      rb = try Right(fb) catch { case e: Throwable => Left(e) }
    }, "graft-overlap")
    t.setDaemon(true)
    t.start()
    val ra = try Right(fa) catch { case e: Throwable => Left(e) }
    t.join()
    (ra, rb) match {
      case (Right(a), Right(b)) => (a, b)
      case (Left(e), _)         => throw e
      case (_, Left(e))         => throw e
    }
  }

  /** Materialize persisted DataFrames concurrently (one count() per
    * thread). Call with stages that are independent of each other and
    * all consumed by the same downstream action.
    */
  def materialize(dfs: DataFrame*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = dfs.map { df =>
      val t = new Thread(() => {
        try { df.count(); () } catch { case e: Throwable => errs.add(e) }
      }, "graft-materialize")
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }
}

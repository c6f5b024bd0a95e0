package graft.ops

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicLong

/** SURVEY.md §3.4 — the engine-side mapping of the reference's
  * cooperative cancellation and incremental progress reporting
  * (`session_state.get('*_cancel_scan')` polls at `app.py:35,40,48,
  * 57,89,117,295`; `st.progress` at `app.py:37,62,289,297`).
  *
  * In Spark the loop-level poll becomes job-group cancellation (tasks
  * are interrupted between records) and progress becomes a
  * SparkListener over task completions — no operator-level changes
  * needed, which is why these live at the session layer, not in the
  * plan (SURVEY.md §4).
  */
object Control {

  /** Run `body` under a named job group; [[cancel]] with the same tag
    * aborts all its running jobs (the `break`/flag-poll analog).
    * interruptOnCancel=true interrupts task threads blocked on IO.
    */
  def runCancellable[T](spark: SparkSession, tag: String, description: String = "")(body: => T): T = {
    val sc = spark.sparkContext
    sc.setJobGroup(tag, if (description.isEmpty) tag else description,
      interruptOnCancel = true)
    try body finally sc.clearJobGroup()
  }

  def cancel(spark: SparkSession, tag: String): Unit =
    spark.sparkContext.cancelJobGroup(tag)

  /** Progress reporting: counts completed tasks, invoking `onProgress`
    * with the running total (the `st.progress(done/total)` analog).
    * Returns the listener so callers can remove it.
    */
  def withTaskProgress(sc: SparkContext)(onProgress: Long => Unit): SparkListener = {
    val done = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
        onProgress(done.incrementAndGet())
    }
    sc.addSparkListener(listener)
    listener
  }

  def removeListener(sc: SparkContext, l: SparkListener): Unit =
    sc.removeSparkListener(l)

  /** In-plan pipeline metrics via `Dataset.observe` + `Observation`:
    * the metric aggregates ride the SAME job as the consuming action —
    * no second scan, no `.count()` side trips — and `Observation.get`
    * blocks until the action that materialized the plan delivers them.
    * This is the scale-correct form of the reference's incremental
    * counters: at 100 TB a separate counting pass doubles the read.
    * Returns the instrumented frame plus the observation handle.
    */
  def withObservedMetrics(df: org.apache.spark.sql.DataFrame, name: String,
                          metrics: org.apache.spark.sql.Column*)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}

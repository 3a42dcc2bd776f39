package graft.tools

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Progress instrumentation — the engine-side analogue of the
  * reference's tqdm progress bars (SURVEY.md §2.13): a SparkListener
  * counting task/stage completions, with an optional throttled console
  * line. The listener observes the scheduler; it adds no work to the
  * tasks themselves (the reference wraps every UDF call instead —
  * worker-side accounting shipped over a queue).
  *
  * Use: `val p = Progress.attach(spark)` … `p.snapshot` / `p.detach()`.
  */
object Progress {

  final case class Snapshot(tasksCompleted: Long, stagesCompleted: Long,
                            stagesSubmitted: Long, recordsRead: Long)

  final class Handle private[Progress] (spark: SparkSession,
                                        echoEveryTasks: Long,
                                        sink: String => Unit) {
    private val tasks = new AtomicLong(0)
    private val stagesUp = new AtomicLong(0)
    private val stagesDone = new AtomicLong(0)
    private val records = new AtomicLong(0)
    private val lastEcho = new AtomicLong(0)
    private val listenerRef = new AtomicReference[SparkListener]()

    private[Progress] def start(): Handle = {
      val l = new SparkListener {
        override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
          stagesUp.incrementAndGet(); ()
        }
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          stagesDone.incrementAndGet(); ()
        }
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val n = tasks.incrementAndGet()
          if (t.taskMetrics != null)
            records.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
          if (echoEveryTasks > 0) {
            val last = lastEcho.get()
            if (n - last >= echoEveryTasks && lastEcho.compareAndSet(last, n))
              sink(s"[progress] tasks=$n stages=${stagesDone.get()}/" +
                s"${stagesUp.get()} records=${records.get()}")
          }
        }
      }
      listenerRef.set(l)
      spark.sparkContext.addSparkListener(l)
      this
    }

    def snapshot: Snapshot =
      Snapshot(tasks.get(), stagesDone.get(), stagesUp.get(), records.get())

    def detach(): Unit = {
      val l = listenerRef.getAndSet(null)
      if (l != null) spark.sparkContext.removeSparkListener(l)
    }
  }

  /** Attach a progress listener; `echoEveryTasks = 0` disables echo
    * (counts still accumulate for `snapshot`). `sink` redirects the
    * throttled line to a logger or file-like — the reference 0.8's
    * `initialize(logger=...)` / `pbar_file=...` analogue
    * (`progress_imap.py`; CHANGELOG 0.8). */
  def attach(spark: SparkSession, echoEveryTasks: Long = 0L,
             sink: String => Unit = println(_)): Handle =
    new Handle(spark, echoEveryTasks, sink).start()
}

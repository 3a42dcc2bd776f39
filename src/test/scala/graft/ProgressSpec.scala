package graft

import graft.tools.Progress

/** The listener counts scheduler events for jobs run while attached. */
class ProgressSpec extends SparkSpec {
  import spark.implicits._

  /** Listener events are delivered asynchronously; poll until the
    * condition holds or a timeout passes. */
  private def eventually(cond: => Boolean, ms: Long = 20000): Boolean = {
    val end = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < end) Thread.sleep(50)
    cond
  }

  test("progress listener accumulates task/stage/record counts") {
    val p = Progress.attach(spark)
    try {
      val n = (1 to 1000).toDF("v").groupBy(($"v" % 7).as("k")).count().count()
      assert(n == 7)
      assert(eventually {
        val s = p.snapshot
        s.tasksCompleted > 0 && s.stagesCompleted > 0 &&
          s.stagesSubmitted >= s.stagesCompleted
      }, p.snapshot.toString)
    } finally p.detach()
    // after detach, counts freeze
    Thread.sleep(200) // drain in-flight events from the attached window
    val frozen = p.snapshot
    spark.range(100).count()
    Thread.sleep(500)
    assert(p.snapshot == frozen)
  }

  test("progress echo redirects to a custom sink (logger analogue)") {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val p = Progress.attach(spark, echoEveryTasks = 1L, sink = lines.add(_))
    try {
      spark.range(10000).repartition(8).count()
      assert(eventually { !lines.isEmpty }, "no progress line reached the sink")
      assert(lines.peek().startsWith("[progress] tasks="))
    } finally p.detach()
  }
}

package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams
import graft.streaming.Streams.SessionEvent

/** Dev-only demo: drive the streaming operators end-to-end over a memory
  * source and print each sink table — runnable evidence that the
  * readStream->transform->writeStream path works outside the test
  * harness. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new Timestamp((3600 + s) * 1000)

    val in = MemoryStream[SessionEvent]
    val win = Streams.windowedStats(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win").outputMode(OutputMode.Update).start()
    val sess = Streams.sessionize(in.toDS(), gapMs = 60000, watermark = "1 minute")
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append).start()
    val rm = Streams.runningMean(in.toDS())
      .writeStream.format("memory").queryName("rm").outputMode(OutputMode.Update).start()

    in.addData(SessionEvent(1, ts(0), 2.0), SessionEvent(1, ts(30), 4.0),
      SessionEvent(2, ts(10), 1.0))
    Seq(win, sess, rm).foreach(_.processAllAvailable())
    in.addData(SessionEvent(1, ts(700), 10.0), SessionEvent(2, ts(5000), 0.5))
    Seq(win, sess, rm).foreach(_.processAllAvailable())
    in.addData(SessionEvent(2, ts(9000), 0.5)) // advance watermark again
    Seq(win, sess, rm).foreach(_.processAllAvailable())

    println("=== windowed stats ===")
    spark.table("win").orderBy("window", "user_id").show(20, truncate = false)
    println("=== sessions ===")
    spark.table("sess").orderBy("user_id", "session_start").show(20, truncate = false)
    println("=== running mean ===")
    spark.table("rm").orderBy("key", "n").show(20, truncate = false)

    Seq(win, sess, rm).foreach(_.stop())
    spark.stop()
  }
}

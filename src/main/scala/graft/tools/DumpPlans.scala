package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named queries into
  * `<outDir>/<query>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit under `plans/rNN/`.
  *
  * Usage: `sbt "runMain graft.tools.DumpPlans <sfDir> <outDir> <suffix>
  * q1,q2,..."`. Bench-only rows (graft.Bench.benchOnly) resolve too.
  * The session mirrors Bench's timing session (32 cores, shuffle width
  * = cores) so the dumped plan is the one the bench actually runs. */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "DumpPlans: <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, list) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val all = graft.SparkEntry.queries ++ graft.Bench.benchOnly
    list.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = all(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[dumpplans] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

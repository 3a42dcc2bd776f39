package graft.tools

import java.nio.file.{Files, Paths}

/** Local-iteration helper: dump every `SparkEntry.oracleSql` entry to a
  * flat text file (delimited, not JSON) WITHOUT running any Spark query,
  * so scripts can sweep the whole oracle corpus in DuckDB cheaply —
  * e.g. the signed-zero / rounding-boundary audits in
  * scripts/oracle_audit.py. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/oracle_all.txt"
    val sb = new StringBuilder
    graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append("=====QUERY===== ").append(k).append('\n')
      sb.append(v).append('\n')
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle entries to $out")
  }
}

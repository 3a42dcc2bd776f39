package graft.tools

import org.apache.spark.sql.DataFrame

/** Spark-side analogue of the reference's chunk planner
  * (`tools.py:60-110`, exercised by `test_auto_chunk.py:17-89`): pick
  * a partition count so each task sees ~`TargetChunkBytes` of data,
  * floored at `nCpu` (keep every core busy), capped at
  * `MaxChunksPerCpu * nCpu` (bound per-task overhead) and at the row
  * count (a chunk can't be smaller than one row).
  *
  * Most of this is INHERENT in Spark — `files.maxPartitionBytes`
  * sizes scan tasks and AQE coalescing right-sizes post-shuffle
  * partitions (SURVEY §2 maps the reference row to those) — so this
  * helper exists for the reference's EXPLICIT surface: the
  * `split_factor` knob and the byte-size heuristic applied to a
  * COMPUTED mid-plan frame (where AQE only re-sizes after the next
  * exchange, and an explicit `repartition` is how you re-chunk for a
  * heavy per-row UDF stage). The byte estimate comes from the
  * optimized plan's Catalyst stats — the engine analogue of the
  * reference's dtype-based `memory_usage(deep=False)` (both are cheap
  * under-estimates for string-heavy data; both are targets, not
  * contracts). */
object Chunking {

  /** ~8 MB/chunk: the reference's measured sweet spot where per-chunk
    * fixed cost amortizes (`tools.py:69-72`); the same magnitude works
    * for Spark task overhead vs. shuffle-block granularity. */
  val TargetChunkBytes: Long = 8L * 1024 * 1024

  /** Upper bound on chunks per core (`tools.py:74-76`). */
  val MaxChunksPerCpu: Int = 64

  /** `get_split_size(n_cpu, split_factor)`: the explicit form —
    * `split_factor=None` behaves like the historical factor 1. */
  def splitSize(nCpu: Int, splitFactor: Option[Int] = None): Int = {
    require(nCpu >= 1, s"splitSize: need nCpu >= 1, got $nCpu")
    nCpu * splitFactor.getOrElse(1)
  }

  /** `auto_split_size` arithmetic on known byte/row totals:
    * ceil(bytes/target) clamped to [nCpu, MaxChunksPerCpu*nCpu], then
    * to the split-dimension length. */
  def autoSplitSize(totalBytes: Long, rows: Long, nCpu: Int,
                    targetBytes: Long = TargetChunkBytes): Int = {
    require(nCpu >= 1, s"autoSplitSize: need nCpu >= 1, got $nCpu")
    // double-division ceil: totalBytes can be Long.MaxValue (capped
    // Catalyst stats) and integer `+ targetBytes - 1` would wrap
    // negative, collapsing huge frames to the nCpu floor
    val desired =
      math.max(1L, math.ceil(totalBytes.toDouble / targetBytes).toLong)
    val n = math.min(math.max(desired, nCpu.toLong),
      MaxChunksPerCpu.toLong * nCpu)
    math.max(1L, math.min(n, math.max(rows, 1L))).toInt
  }

  /** Catalyst-stats byte estimate for a frame (cheap, no job). */
  def approxBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong

  /** `resolve_split_size`: explicit factor wins; `None` triggers the
    * byte heuristic. Row count comes from plan stats when available
    * (no job), else the byte bound alone decides (rows only ever
    * CLAMP, so a missing row count can only over-partition tiny
    * frames, never starve cores). */
  def resolveSplitSize(df: DataFrame, nCpu: Int,
                       splitFactor: Option[Int] = None): Int =
    splitFactor match {
      case Some(_) => splitSize(nCpu, splitFactor)
      case None =>
        val rows = df.queryExecution.optimizedPlan.stats.rowCount
          .map(_.min(BigInt(Long.MaxValue)).toLong).getOrElse(Long.MaxValue)
        autoSplitSize(approxBytes(df), rows, nCpu)
    }

  /** Re-chunk a computed frame for a heavy downstream per-row stage —
    * the Spark move the reference's chunk planner corresponds to. */
  def repartitionAuto(df: DataFrame, nCpu: Int,
                      splitFactor: Option[Int] = None): DataFrame =
    df.repartition(resolveSplitSize(df, nCpu, splitFactor))
}

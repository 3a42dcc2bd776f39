package graft

import graft.tools.Chunking

/** Differentials of the reference's auto-chunk arithmetic
  * (`test_auto_chunk.py:17-73`), plus the Spark integration point. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("splitSize: None behaves like factor 1; explicit factor scales") {
    assert(Chunking.splitSize(4) == 4)
    assert(Chunking.splitSize(4, Some(1)) == 4)
    assert(Chunking.splitSize(4, Some(3)) == 12)
    intercept[IllegalArgumentException] { Chunking.splitSize(0) }
  }

  test("auto: tiny frame floors at nCpu; shorter-than-nCpu clamps to rows") {
    // 100 rows x 4 doubles ~ 3.2 KB << one target chunk
    assert(Chunking.autoSplitSize(totalBytes = 3200, rows = 100,
      nCpu = 4) == 4)
    assert(Chunking.autoSplitSize(totalBytes = 96, rows = 3, nCpu = 8) == 3)
  }

  test("auto: big frame targets ~8MB per chunk within bounds") {
    // 2M rows x 10 doubles = 160 MB -> ceil(160/8) = 20 chunks
    val bytes = 2000000L * 10 * 8
    val got = Chunking.autoSplitSize(bytes, rows = 2000000L, nCpu = 4)
    val expected = math.min(math.max(
      (bytes + Chunking.TargetChunkBytes - 1) / Chunking.TargetChunkBytes,
      4L), 64L * 4).toInt
    assert(got == expected)
    // sanity: each chunk lands within 2x of the target
    val perChunk = bytes.toDouble / got
    assert(perChunk >= Chunking.TargetChunkBytes / 2 &&
      perChunk <= Chunking.TargetChunkBytes * 2)
  }

  test("auto: chunk count caps at MaxChunksPerCpu * nCpu") {
    // ~1.6 GB at nCpu=2 -> desired ~191 chunks, cap = 128
    val bytes = 5000000L * 40 * 8
    assert(Chunking.autoSplitSize(bytes, rows = 5000000L, nCpu = 2) ==
      Chunking.MaxChunksPerCpu * 2)
    // Long.MaxValue byte estimate (capped Catalyst join stats) must
    // hit the cap, not wrap negative and collapse to the nCpu floor
    assert(Chunking.autoSplitSize(Long.MaxValue, rows = Long.MaxValue,
      nCpu = 2) == Chunking.MaxChunksPerCpu * 2)
  }

  test("resolveSplitSize: explicit factor ignores data size; " +
    "repartitionAuto applies the resolved count") {
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("i", "v")
    assert(Chunking.resolveSplitSize(df, nCpu = 4, Some(2)) == 8)
    val re = Chunking.repartitionAuto(df, nCpu = 4, Some(2))
    assert(re.rdd.getNumPartitions == 8)
    // auto on a tiny in-memory frame: floors at nCpu (rows >= nCpu)
    assert(Chunking.resolveSplitSize(df, nCpu = 4) == 4)
  }
}

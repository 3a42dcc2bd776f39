package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in
  * this container): `decodeImageStub` derives deterministic fake
  * metadata from the raw bytes. Everything around it — the schema, the
  * Dataset[T] encoder, the mapPartitions batch shape, the partition
  * sizing — is the real plumbing a production decoder drops into.
  *
  * Scale notes: binary payloads dominate row size, so the pipeline
  * repartitions by count (`maxRecordsPerPartition`) before the decode
  * map; decode is per-partition (one codec init per partition, not per
  * row), zero shuffle.
  */
object Multimodal {

  case class MediaRow(id: Long, modality: String, data: Array[Byte])
  case class ImageMeta(id: Long, byteLen: Int, width: Int, height: Int,
                       channels: Int, checksum: Long)

  /** STUB decoder — deterministic fake in place of a real image codec.
    * A real implementation would parse the container header here. */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val first = if (n > 0) bytes(0) & 0xff else 0
    // ??? real codec goes here; fake: dims derived from payload size
    (64 + (n % 512), 64 + (first * 4) % 512, 3)
  }

  private def checksum(bytes: Array[Byte]): Long =
    bytes.foldLeft(1125899906842597L)((h, b) => 31 * h + b)

  /** Decode a binary media column into typed metadata, per-partition. */
  def decodeImages(ds: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init (codec contexts, buffers) happens once here
      it.map { row =>
        val (w, h, ch) = decodeImageStub(row.data)
        ImageMeta(row.id, row.data.length, w, h, ch, checksum(row.data))
      }
    }
  }

  /** Frame-sample a (fake) video payload: n evenly-spaced byte slices —
    * the batch shape of real frame extraction. */
  def frameSample(ds: Dataset[MediaRow], n: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { row =>
        val len = row.data.length
        if (len == 0) Iterator.empty
        else (0 until n).iterator.map { i =>
          val off = (len.toLong * i / n).toInt
          val slice = row.data.slice(off, math.min(off + 16, len))
          (row.id, i, checksum(slice))
        }
      }
    }.toDF("id", "frame", "frame_checksum")
  }

  /** STUB resize — a real implementation decodes, scales with a codec,
    * and re-encodes; the fake deterministically truncates/pads the
    * payload to the target "pixel" budget so downstream size accounting
    * is exercised for real. Per-partition map, zero shuffle. */
  def resizeImages(ds: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    val budget = targetW * targetH * 3
    ds.mapPartitions { it =>
      it.map { row =>
        // ??? real scaler goes here; fake: clamp payload to the budget
        val out = if (row.data.length >= budget) row.data.take(budget)
                  else java.util.Arrays.copyOf(row.data, budget)
        MediaRow(row.id, row.modality, out)
      }
    }
  }

  /** STUB feature extraction: binary payload -> dense float embedding
    * (a real implementation runs a vision/audio encoder per batch; one
    * model init per PARTITION is the whole point of the mapPartitions
    * shape). The fake projects byte histograms deterministically, L2-
    * normalized, so the output is directly consumable by
    * [[Similarity]]'s ANN/near-dup operators. */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 64): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition model init happens once here
      it.map { row =>
        val v = new Array[Double](dim)
        var i = 0
        while (i < row.data.length) {
          v((row.data(i) & 0xff) % dim) += 1.0
          i += 1
        }
        var s = 0.0
        var j = 0
        while (j < dim) { s += v(j) * v(j); j += 1 }
        val n = math.sqrt(s)
        if (n > 0) { j = 0; while (j < dim) { v(j) /= n; j += 1 } }
        (row.id, v)
      }
    }.toDF("vec_id", "embedding")
  }

  /** Wrap a text table as fake media rows (test harness for the
    * plumbing; payload = utf-8 bytes). */
  def fromText(df: DataFrame, id: String, text: String,
               modality: String = "image"): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(id).cast("long").as("id"), lit(modality).as("modality"),
        encode(col(text), "UTF-8").as("data"))
      .as[MediaRow]
  }

  /** Partition-size guard for fat binary rows. */
  def repartitionForDecode(df: DataFrame, maxRecordsPerPartition: Long): DataFrame = {
    val n = df.count()
    val parts = math.max(1, math.ceil(n.toDouble / maxRecordsPerPartition).toInt)
    df.repartition(parts)
  }
}

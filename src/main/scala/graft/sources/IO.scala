package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink layer. The reference operates purely on in-memory frames
  * (SURVEY.md §2.1 — no file formats anywhere), so this layer is the
  * Spark-native superset a user needs when the same data lives on disk:
  * schema-checked reads, layout-aware writes, and an indexed-ingest
  * helper replacing the pandas RangeIndex.
  *
  * Scale notes: parquet + explicit schema skips footer-merging/inference
  * jobs; `writePartitioned` lays data out for partition pruning
  * (predicates on the partition key never touch other directories);
  * `writeBucketed` pre-shuffles by join key so later joins between
  * co-bucketed tables skip their shuffles entirely. */
object IO {

  /** Parquet read; explicit schema avoids schema-merge jobs at ingest. */
  def readParquet(spark: SparkSession, path: String,
                  schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read.parquet(path))(s => spark.read.schema(s).parquet(path))

  /** CSV with header; pass a schema in production — inference scans the
    * whole input once before the real read. */
  def readCsv(spark: SparkSession, path: String,
              schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** Line-delimited JSON (the only JSON shape that splits across
    * workers; a single JSON array is one unsplittable record). */
  def readJsonLines(spark: SparkSession, path: String,
                    schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read.json(path))(s => spark.read.schema(s).json(path))

  /** ORC read/write — the other columnar format with predicate pushdown
    * and column pruning built into Spark; same explicit-schema guidance
    * as parquet. */
  def readOrc(spark: SparkSession, path: String,
              schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read.orc(path))(s => spark.read.schema(s).orc(path))
  def writeOrc(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Stable row ids at ingest (pandas-index analogue):
    * `monotonically_increasing_id` is partition-local-ordered and unique
    * but NOT dense; zipWithIndex-style density costs an extra pass, so
    * dense=false is the default for 100 TB ingest. */
  def withRowId(df: DataFrame, col0: String = "row_id",
                dense: Boolean = false): DataFrame =
    if (!dense) df.withColumn(col0, monotonically_increasing_id())
    else {
      val spark = df.sparkSession
      val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }
      spark.createDataFrame(rdd,
        df.schema.add(col0, org.apache.spark.sql.types.LongType))
    }

  /** Hive-style partitioned parquet: one directory per distinct key
    * combination -> partition pruning on read. Keep the key cardinality
    * bounded (thousands, not millions) or the file count explodes. */
  def writePartitioned(df: DataFrame, path: String, keys: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(keys: _*).parquet(path)

  /** Bucketed managed table: pre-shuffled on `key` into `buckets` files
    * per partition. Two tables bucketed the same way join WITHOUT a
    * shuffle on either side — the biggest single lever for repeated
    * large-fact joins. (Bucketing requires saveAsTable: the bucket
    * metadata lives in the catalog, not the files.) */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Size-balanced training-shard export: exactly `shards` output files
    * of ~equal row count, shard membership a pure function of the id
    * (hash-partition on `id` — Murmur3 of the value, stable across
    * re-runs for the same shard count). This is the trainer-facing
    * sink: balanced shards mean no long-tail file on the data-loader
    * side and no small-files problem on the store.
    *
    * Scale shape: ONE hash-partition shuffle to `shards` partitions
    * (each becomes one file); optional `sortWithin` columns sort inside
    * each shard only (sortWithinPartitions — never a global sort) for
    * run-length/dictionary compression locality. `maxRecordsPerFile`
    * caps a file when a shard must stay under a loader's memory budget;
    * Spark then splits that shard into numbered parts without another
    * shuffle. */
  def writeShards(df: DataFrame, path: String, id: String, shards: Int,
                  sortWithin: Seq[String] = Nil,
                  maxRecordsPerFile: Long = 0L,
                  mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(shards >= 1, s"writeShards: need shards >= 1, got $shards")
    val sharded = df.repartition(shards, col(id))
    val sorted =
      if (sortWithin.isEmpty) sharded
      else sharded.sortWithinPartitions(sortWithin.map(col): _*)
    sorted.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }
}

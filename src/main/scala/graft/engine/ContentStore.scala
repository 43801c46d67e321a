package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.util.zip.CRC32

/** Physical layout of the content log: parquet partitioned by
  * `crc32(document_uri) % NumPartitions` — the reference's partition
  * scheme (TransactionLogic.scala:11, 26-30: CRC32 % 1024). A per-URI read
  * prunes to ONE directory partition at the FileScan (PartitionFilters),
  * so point gets and collection queries touch 1/256 of a 100 TB store
  * before any row is read; the bound on partition count is the same idea
  * as the reference's ≤1024-node scale ceiling. */
object ContentStore {
  val NumPartitions = 256

  def partitionCol(uri: Column): Column =
    pmod(crc32(uri), lit(NumPartitions)).cast("int")

  /** Driver-side partition id of one URI (must match [[partitionCol]]). */
  def partitionOf(uri: String): Int = {
    val c = new CRC32()
    c.update(uri.getBytes("UTF-8"))
    (c.getValue % NumPartitions).toInt
  }

  /** Append (or overwrite) a content-log slice into the partitioned store. */
  def write(log: DataFrame, path: String,
      mode: SaveMode = SaveMode.Append): Unit =
    log.withColumn("part", partitionCol(col("document_uri")))
      .write.partitionBy("part").mode(mode).parquet(path)

  /** Idempotent per-batch write: rows land under (part, batch=batchTs) and
    * a REPLAY of the same batch dynamically overwrites exactly its own
    * partitions — the standard Spark exactly-once file-sink discipline.
    * Readers that must see only COMMITTED prior state filter the batch
    * column (see FeedPipeline.runBatch). */
  def writeBatch(log: DataFrame, path: String, batchTs: Long): Unit =
    log.withColumn("part", partitionCol(col("document_uri")))
      .withColumn("batch", lit(batchTs))
      .write.partitionBy("part", "batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).parquet(path)

  /** Open the store as a HyperStorage whose per-URI reads carry the
    * partition predicate (directory pruning before any IO). The `part`
    * column rides along in the log; engine projections ignore it. */
  def open(spark: SparkSession, path: String): HyperStorage =
    new HyperStorage(spark, spark.read.parquet(path),
      uriPruner = uri => col("part") === partitionOf(uri))

  /** Open an existing store, or an empty in-memory log when nothing has
    * been written yet (the bootstrap case of a write-back loop). Only
    * COMMITTED output counts as existing — a crashed first write leaves
    * `_temporary`/`_SUCCESS` debris that must not make the replay try to
    * read a store with no data files. */
  def openOrEmpty(spark: SparkSession, path: String): HyperStorage = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(s => !s.getPath.getName.startsWith("_"))
    if (hasData) open(spark, path)
    else HyperStorage(spark, Content.empty(spark))
  }
}

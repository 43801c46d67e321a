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

  /** Append (or overwrite) a content-log slice into the partitioned store.
    * Heals a half-finished compaction swap first — writing into the
    * delete-to-rename crash window would otherwise recreate the live dir
    * and permanently strand the pre-compaction data in `<path>.compact`. */
  def write(log: DataFrame, path: String,
      mode: SaveMode = SaveMode.Append): Unit = {
    recoverCompact(log.sparkSession, path)
    log.withColumn("part", partitionCol(col("document_uri")))
      .write.partitionBy("part").mode(mode).parquet(path)
  }

  /** Idempotent per-batch write: rows land under (part, batch=batchTs) and
    * a REPLAY of the same batch dynamically overwrites exactly its own
    * partitions — the standard Spark exactly-once file-sink discipline.
    * Readers that must see only COMMITTED prior state filter the batch
    * column (see FeedPipeline.runBatch). */
  def writeBatch(log: DataFrame, path: String, batchTs: Long): Unit = {
    recoverCompact(log.sparkSession, path)
    log.withColumn("part", partitionCol(col("document_uri")))
      .withColumn("batch", lit(batchTs))
      .write.partitionBy("part", "batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).parquet(path)
  }

  /** Open the store as a HyperStorage whose per-URI reads carry the
    * partition predicate (directory pruning before any IO). The `part`
    * column rides along in the log; engine projections ignore it. */
  def open(spark: SparkSession, path: String): HyperStorage = {
    recoverCompact(spark, path)
    new HyperStorage(spark, spark.read.parquet(path),
      uriPruner = uri => col("part") === partitionOf(uri))
  }

  /** Compaction — the role Cassandra's compaction plays for the reference
    * (scheme.cql's leveled store): rewrite the log keeping only the LATEST
    * revision per (document_uri, item_id). Every read path goes through
    * the latest-revision view, and per-key max revisions (hence static
    * revisions and tombstone visibility) are preserved, so reads are
    * invariant — but a store that accumulated one row per WRITE shrinks
    * back to one row per KEY. Latest tombstone rows are kept (dropping
    * them would lower collection static revisions); aging them out is a
    * separate retention policy.
    *
    * The rewrite lands in `<path>.compact` and swaps in whole; a crash
    * between delete and rename is healed by [[recoverCompact]] on the
    * next open or write. A `batch` column (FeedPipeline stores) keeps its
    * values and its partition layout, so batch-replay dynamic overwrite
    * and prior-state batch exclusion still address the right directories.
    *
    * Replay safety for batch stores: a crashed batch's replay re-derives
    * its revisions from the PRE-batch state (FeedPipeline.runBatch reads
    * `batch =!= ts`), so the rows of a batch that might still replay —
    * and every key's pre-state relative to it — must survive compaction
    * un-folded. Rows with `batch >= foldBelowBatch` are therefore passed
    * through raw; only the prefix folds. The default keeps the NEWEST
    * batch raw (a single-writer stream has at most one incomplete
    * trailing batch); pass `Long.MaxValue` only when every transaction is
    * known complete (e.g. Ledger.recoveryWorkList is empty). latestRows
    * of (folded prefix ∪ raw tail) equals latestRows of the original for
    * every tail batch's state read, so replays still see exact pre-batch
    * state. */
  def compact(spark: SparkSession, path: String,
      foldBelowBatch: Option[Long] = None): Unit = {
    recoverCompact(spark, path)
    val log = spark.read.parquet(path)
    val hasBatch = log.columns.contains("batch")
    val partCols = Seq("part") ++ (if (hasBatch) Seq("batch") else Nil)
    val compacted =
      if (!hasBatch) Content.latestRows(log)
      else {
        // partition-dir read-back narrows batch to int — cast before max
        val cutoff = foldBelowBatch.getOrElse(
          log.agg(max(col("batch").cast("long"))).collect()(0) match {
            case r if r.isNullAt(0) => Long.MinValue
            case r => r.getLong(0)
          })
        Content.latestRows(log.filter(col("batch") < cutoff))
          .unionByName(log.filter(col("batch") >= cutoff))
      }
    val tmp = s"$path.compact"
    compacted
      .repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*).mode(SaveMode.Overwrite).parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
    ()
  }

  /** Finish a compaction swap that crashed between delete and rename: a
    * COMMITTED tmp (has _SUCCESS) with no live store is adopted. */
  private def recoverCompact(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$path.compact")
    if (!fs.exists(p) &&
        fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")))
      fs.rename(tmp, p)
    ()
  }

  /** Open an existing store, or an empty in-memory log when nothing has
    * been written yet (the bootstrap case of a write-back loop). Only
    * COMMITTED output counts as existing — a crashed first write leaves
    * `_temporary`/`_SUCCESS` debris that must not make the replay try to
    * read a store with no data files. */
  def openOrEmpty(spark: SparkSession, path: String): HyperStorage = {
    recoverCompact(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(s => !s.getPath.getName.startsWith("_"))
    if (hasData) open(spark, path)
    else HyperStorage(spark, Content.empty(spark))
  }
}

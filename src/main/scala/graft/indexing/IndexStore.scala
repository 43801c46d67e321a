package graft.indexing

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import java.net.{URLDecoder, URLEncoder}

/** Durable home of index definitions and index tables — the Spark-native
  * counterpart of the reference's `index_def` / `pending_index` metadata
  * tables and per-shape `index_content*` tables (scheme.cql:31-108;
  * IndexDefTaskWorker.scala:71-110 persists the def BEFORE building so an
  * interrupted build is resumable after restart).
  *
  * Layout:
  * {{{
  *   <path>/defs                                — parquet, one row per def
  *   <path>/tables/<enc(uri)>/<enc(id)>/ipart=N — index rows, parquet,
  *       partitioned by crc32(item_id) % IndexPartitions
  * }}}
  *
  * The item-hash directory partitioning makes incremental maintenance
  * PARTITION-SCOPED: a feed batch touching k items rewrites at most
  * min(k, IndexPartitions) directories (partition-pruned read → anti-join
  * → tmp write → directory swap) and never re-reads or rewrites the rest
  * of the table — the row-wise MERGE the reference performs in Cassandra
  * (BackgroundContentTaskCompleter.scala:126-188) expressed as bulk
  * partition rewrites, with lineage truncated at every batch because the
  * table lives on disk, not in an ever-deepening cached union.
  *
  * Single writer per store path, mirroring the reference's one-owner-per-
  * shard discipline (ShardProcessor); readers may open concurrently.
  */
final class IndexStore(val spark: SparkSession, val path: String) {
  import IndexStore._

  private def fs =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def defsPath = s"$path/defs"

  def tableDir(uri: String, indexId: String): String =
    s"$path/tables/${enc(uri)}/${enc(indexId)}"

  def loadDefs(): Map[(String, String), IndexDef] = {
    // crash recovery for saveDefs' swap: a tmp file with no live file
    // means the crash hit between delete and rename — finish the swap
    val live = new Path(defsPath)
    val tmp = new Path(defsPath + ".tmp")
    if (!fs.exists(live) && fs.exists(tmp)) fs.rename(tmp, live)
    if (!fs.exists(live)) Map.empty
    else readUtf8(fs, live).split("\n").iterator.filter(_.nonEmpty).map { line =>
      val Array(uri, id, sortBy, filterBy, status, tableName) =
        line.split("\t", -1).map(f => URLDecoder.decode(f, "UTF-8"))
      val d = IndexDef(uri, id,
        Option(sortBy).filter(_.nonEmpty)
          .map(_.split(";", -1).toSeq.map(decodeItem)).getOrElse(Nil),
        Option(filterBy).filter(_.nonEmpty), status, tableName)
      (d.collectionUri, d.indexId) -> d
    }.toMap
  }

  /** Replace the (small, driver-held) def metadata. Called on every status
    * transition so a restarted manager resumes from the last one —
    * INDEXING defs surface as resumable builds, like `pending_index`.
    * A driver-side FS write (no Spark job — the metadata is a handful of
    * rows, and each index lifecycle transition would otherwise pay a full
    * job): written to a tmp file and swapped in, so a crash never leaves a
    * half-written live file; the delete→rename window is covered by
    * loadDefs' tmp recovery. */
  def saveDefs(defs: Iterable[IndexDef]): Unit = {
    val body = defs.toSeq.map { d =>
      Seq(d.collectionUri, d.indexId, d.sortBy.map(encodeItem).mkString(";"),
        d.filterBy.getOrElse(""), d.status, d.tableName)
        .map(f => URLEncoder.encode(f, "UTF-8")).mkString("\t")
    }.mkString("\n")
    val tmp = new Path(defsPath + ".tmp")
    writeUtf8(fs, tmp, body)
    fs.delete(new Path(defsPath), false)
    fs.rename(tmp, new Path(defsPath))
    ()
  }

  /** The `_schema` anchor makes empty tables readable: a partitioned write
    * of zero rows emits no parquet footers, so without it a NORMAL index
    * whose filter matched nothing would crash every open with
    * 'Unable to infer schema'. A driver-written JSON schema file (no Spark
    * job), underscore-prefixed so data reads of the table dir ignore it. */
  private def schemaAnchor(dir: String) = s"$dir/_schema.json"

  def writeTable(uri: String, indexId: String, rows: DataFrame): Unit = {
    val dir = tableDir(uri, indexId)
    writePartitioned(rows, dir)
    writeUtf8(fs, new Path(schemaAnchor(dir)), rows.schema.json)
  }

  /** Cluster rows by their target directory before the partitioned write:
    * without the repartition every input task opens a writer per ipart it
    * touches (up to tasks×IndexPartitions tiny files — the classic
    * small-files problem); with it each directory is written by exactly
    * one task per job. */
  private def writePartitioned(rows: DataFrame, dir: String): Unit = {
    rows.withColumn("ipart", ipartCol(col("item_id")))
      .repartition(IndexPartitions, col("ipart"))
      .write.partitionBy("ipart").mode(SaveMode.Overwrite).parquet(dir)
    ()
  }

  /** Open with the anchored schema (never inference) — zero-row tables and
    * merge-emptied partitions read as empty DataFrames, not errors. */
  def openTable(uri: String, indexId: String): DataFrame =
    openRaw(tableDir(uri, indexId)).drop("ipart")

  private def openRaw(dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(readUtf8(fs, new Path(schemaAnchor(dir))))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .add("ipart", org.apache.spark.sql.types.IntegerType)
    spark.read.schema(schema).parquet(dir)
  }

  def dropTable(uri: String, indexId: String): Unit = {
    fs.delete(new Path(tableDir(uri, indexId)), true)
    ()
  }

  /** Partition-scoped merge: drop all index rows of `touchedItems`, insert
    * `replacement`, touching only the item-hash partitions involved. The
    * tmp write fully materializes before any directory is swapped, so the
    * scoped self-read never races the rewrite.
    *
    * Known window: the per-partition swap loop is not atomic ACROSS
    * partitions — a crash mid-loop leaves some partitions merged and
    * others not (single-partition batches are safe). Closing it needs a
    * table-format commit manifest (the next durability step at cluster
    * scale); the reference has the same non-atomicity across its per-row
    * Cassandra index mutations (BackgroundContentTaskCompleter retries
    * row-wise until the feed transaction completes). */
  def mergeTable(uri: String, indexId: String, touchedItems: DataFrame,
      replacement: DataFrame, knownParts: Option[Seq[Int]] = None): Unit = {
    val dir = tableDir(uri, indexId)
    // bounded by IndexPartitions; callers that already aggregated the
    // touched item-hash partitions (applyFeed's one-pass uri stats) pass
    // them in and skip this job
    val parts = knownParts.getOrElse(touchedItems
      .select(ipartCol(col("item_id")).as("ipart")).distinct()
      .collect().map(_.getInt(0)).toSeq)
    if (parts.isEmpty) return
    val scoped = openRaw(dir)
      .filter(col("ipart").isin(parts.toSeq: _*)).drop("ipart")
    val updated = scoped
      .join(broadcast(touchedItems.select("item_id")), Seq("item_id"), "left_anti")
      .unionByName(replacement)
    val tmp = s"$dir.tmp-merge"
    writePartitioned(updated, tmp)
    parts.foreach { p =>
      val dst = new Path(s"$dir/ipart=$p")
      val src = new Path(s"$tmp/ipart=$p")
      fs.delete(dst, true)
      if (fs.exists(src)) fs.rename(src, dst)
    }
    fs.delete(new Path(tmp), true)
    ()
  }
}

object IndexStore {
  /** Item-hash directory partition count for index tables. Small enough to
    * keep little indexes compact; a 100 TB deployment raises it the same
    * way ContentStore.NumPartitions scales with the content log. */
  val IndexPartitions = 32

  def ipartCol(itemId: Column): Column =
    pmod(crc32(itemId), lit(IndexPartitions)).cast("int")

  private def writeUtf8(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      body: String): Unit = {
    val out = fs.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  private def readUtf8(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")

  private def encodeItem(it: IndexSortItem): String =
    Seq(it.fieldName, it.fieldType.getOrElse(""), it.order.getOrElse(""))
      .map(enc).mkString(":")

  private def decodeItem(s: String): IndexSortItem = {
    val Array(f, t, o) = s.split(":", -1)
    IndexSortItem(URLDecoder.decode(f, "UTF-8"),
      Some(t).filter(_.nonEmpty).map(URLDecoder.decode(_, "UTF-8")),
      Some(o).filter(_.nonEmpty).map(URLDecoder.decode(_, "UTF-8")))
  }
}

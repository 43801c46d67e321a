package graft.indexing

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}
import org.apache.hadoop.fs.Path
import java.net.{URLDecoder, URLEncoder}

/** Durable home of index definitions and index tables — the Spark-native
  * counterpart of the reference's `index_def` / `pending_index` metadata
  * tables and per-shape `index_content*` tables (scheme.cql:31-108;
  * IndexDefTaskWorker.scala:71-110 persists the def BEFORE building so an
  * interrupted build is resumable after restart).
  *
  * Layout — a manifest-committed mini table format:
  * {{{
  *   <path>/defs                     — driver-written def rows (atomic swap)
  *   <path>/tables/<enc(uri)>/<enc(id)>/
  *     _schema.json                  — driver-written Spark schema JSON
  *     _manifest                     — lines "ipart<TAB>root": which staging
  *                                     root currently owns each partition
  *     w-<G>/ipart=N/…parquet        — immutable staging roots, one per
  *                                     build/merge job
  * }}}
  * Index rows are hash-clustered by `crc32(item_id) % IndexPartitions`.
  *
  * The item-hash partitioning makes incremental maintenance
  * PARTITION-SCOPED: a feed batch touching k items reads and rewrites at
  * most min(k, IndexPartitions) partitions into a NEW immutable staging
  * root, then commits by atomically swapping the single `_manifest` file —
  * never mutating data in place. A crash before the manifest swap leaves
  * the previous table version fully intact (the half-written root is
  * unreferenced and garbage-collected later); a crash during the swap is
  * healed by loadManifest's tmp recovery. This closes the cross-partition
  * atomicity window a per-directory rename loop would have, the same
  * snapshot-commit discipline cluster table formats use. The row-wise
  * Cassandra MERGE the reference performs
  * (BackgroundContentTaskCompleter.scala:126-188) is thus expressed as
  * bulk partition rewrites with lineage truncated at every batch.
  *
  * When merges scatter a table's partitions across more than
  * [[IndexStore.MaxRoots]] roots, the table is compacted back into one
  * root (full rewrite, amortized over many merges) so read plans stay a
  * bounded union and small files don't accumulate.
  *
  * Single writer per store path, mirroring the reference's one-owner-per-
  * shard discipline (ShardProcessor); readers may open concurrently, but a
  * DataFrame held across a later commit may see its files GC'd — re-open
  * per query, as [[IndexManager.indexTable]] does.
  */
final class IndexStore(val spark: SparkSession, val path: String) {
  import IndexStore._

  private def fs =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def defsPath = s"$path/defs"

  def tableDir(uri: String, indexId: String): String =
    s"$path/tables/${enc(uri)}/${enc(indexId)}"

  def loadDefs(): Map[(String, String), IndexDef] = {
    // a DIRECTORY at the defs path is the pre-manifest parquet layout:
    // fail with intent, not an IO error deep in a parquet reader
    if (fs.exists(new Path(defsPath)) &&
        fs.getFileStatus(new Path(defsPath)).isDirectory)
      throw new IllegalStateException(
        s"$defsPath uses the old parquet def layout; rebuild the index store")
    Option(readSwapped(fs, defsPath)).map(_.split("\n").iterator
      .filter(_.nonEmpty).map { line =>
        val Array(uri, id, sortBy, filterBy, status, tableName) =
          line.split("\t", -1).map(f => URLDecoder.decode(f, "UTF-8"))
        val d = IndexDef(uri, id,
          Option(sortBy).filter(_.nonEmpty)
            .map(_.split(";", -1).toSeq.map(decodeItem)).getOrElse(Nil),
          Option(filterBy).filter(_.nonEmpty), status, tableName)
        (d.collectionUri, d.indexId) -> d
      }.toMap).getOrElse(Map.empty)
  }

  /** Replace the (small, driver-held) def metadata. Called on every status
    * transition so a restarted manager resumes from the last one —
    * INDEXING defs surface as resumable builds, like `pending_index`.
    * A driver-side FS write (no Spark job — the metadata is a handful of
    * rows, and each index lifecycle transition would otherwise pay a full
    * job), atomically swapped in. */
  def saveDefs(defs: Iterable[IndexDef]): Unit =
    writeSwapped(fs, defsPath, defs.toSeq.map { d =>
      Seq(d.collectionUri, d.indexId, d.sortBy.map(encodeItem).mkString(";"),
        d.filterBy.getOrElse(""), d.status, d.tableName)
        .map(f => URLEncoder.encode(f, "UTF-8")).mkString("\t")
    }.mkString("\n"))

  /** The `_schema` anchor makes empty tables readable: a partitioned write
    * of zero rows emits no parquet footers, so without it a NORMAL index
    * whose filter matched nothing would crash every open with
    * 'Unable to infer schema'. A driver-written JSON schema file (no Spark
    * job), underscore-prefixed so data reads of the table dir ignore it. */
  private def schemaAnchor(dir: String) = s"$dir/_schema.json"

  private def tableSchema(dir: String): StructType =
    DataType.fromJson(readSwapped(fs, schemaAnchor(dir)))
      .asInstanceOf[StructType]

  // ---------------------------------------------------------- manifest

  private def manifestPath(dir: String) = s"$dir/_manifest"

  /** ipart → staging-root name (relative to the table dir). */
  private def loadManifest(dir: String): Map[Int, String] =
    Option(readSwapped(fs, manifestPath(dir))).map(_.split("\n").iterator
      .filter(_.nonEmpty).map { line =>
        val Array(p, root) = line.split("\t", -1)
        p.toInt -> root
      }.toMap).getOrElse(Map.empty)

  /** THE commit point: a table version is exactly what its manifest lists.
    * After the atomic swap, unreferenced staging roots (superseded
    * partitions, aborted writes) are garbage. */
  private def commitManifest(dir: String, m: Map[Int, String]): Unit = {
    writeSwapped(fs, manifestPath(dir),
      m.toSeq.sorted.map { case (p, root) => s"$p\t$root" }.mkString("\n"))
    val live = m.values.toSet
    Option(fs.globStatus(new Path(s"$dir/w-*"))).getOrElse(Array.empty)
      .map(_.getPath).filterNot(p => live(p.getName))
      .foreach(fs.delete(_, true))
  }

  /** Next staging-root name: max existing generation + 1 (single writer). */
  private def nextRoot(dir: String): String = {
    val g = Option(fs.globStatus(new Path(s"$dir/w-*")))
      .getOrElse(Array.empty)
      .flatMap(s => s.getPath.getName.stripPrefix("w-").toIntOption)
    s"w-${if (g.isEmpty) 1 else g.max + 1}"
  }

  /** The ipart dirs a staging write actually produced (a partition whose
    * merge result is empty emits no dir — it simply leaves the manifest). */
  private def writtenParts(root: Path): Seq[Int] =
    Option(fs.globStatus(new Path(root, "ipart=*"))).getOrElse(Array.empty)
      .flatMap(_.getPath.getName.stripPrefix("ipart=").toIntOption).toSeq

  // ------------------------------------------------------------ tables

  /** Full (re)build: one fresh staging root owning every partition. The
    * schema anchor is a swapped write (a crash can never leave it
    * truncated), and it lands before the manifest commit; a table's
    * schema is a pure function of its IndexDef — a schema CHANGE always
    * goes through dropTable (delete + create) — so the
    * new-schema-over-old-manifest crash window rewrites an identical
    * schema and is benign. */
  def writeTable(uri: String, indexId: String, rows: DataFrame): Unit = {
    val dir = tableDir(uri, indexId)
    val root = nextRoot(dir)
    writePartitioned(rows, s"$dir/$root")
    writeSwapped(fs, schemaAnchor(dir), rows.schema.json)
    commitManifest(dir,
      writtenParts(new Path(dir, root)).map(_ -> root).toMap)
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

  /** Open the committed table version (manifest snapshot) with the
    * anchored schema — zero-row tables and merge-emptied partitions read
    * as empty DataFrames, not errors. */
  def openTable(uri: String, indexId: String): DataFrame =
    openRaw(tableDir(uri, indexId)).drop("ipart")

  /** Committed rows of the given partitions only (directory-level pruning
    * through the manifest — no file listing outside the named parts). */
  private def openParts(dir: String, m: Map[Int, String],
      parts: Iterable[Int]): DataFrame = {
    val schema = tableSchema(dir).add("ipart", IntegerType)
    val byRoot = parts.toSeq.flatMap(p => m.get(p).map(root => (root, p)))
      .groupBy(_._1)
    byRoot.toSeq.sortBy(_._1).map { case (root, ps) =>
      spark.read.option("basePath", s"$dir/$root").schema(schema)
        .parquet(ps.map(p => s"$dir/$root/ipart=${p._2}"): _*)
    }.reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))
  }

  private def openRaw(dir: String): DataFrame = {
    val m = loadManifest(dir)
    openParts(dir, m, m.keys)
  }

  def dropTable(uri: String, indexId: String): Unit = {
    fs.delete(new Path(tableDir(uri, indexId)), true)
    ()
  }

  /** Partition-scoped merge: drop all index rows of `touchedItems`, insert
    * `replacement`, touching only the item-hash partitions involved. The
    * new staging root fully materializes BEFORE the manifest swap, so the
    * scoped self-read never races the rewrite, and a crash at any point
    * leaves the previous committed version intact (atomicity across all
    * touched partitions — the manifest swap is the single commit point). */
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
    val m = loadManifest(dir)
    val scoped = openParts(dir, m, parts).drop("ipart")
    val updated = scoped
      .join(broadcast(touchedItems.select("item_id")), Seq("item_id"), "left_anti")
      .unionByName(replacement)
    val root = nextRoot(dir)
    writePartitioned(updated, s"$dir/$root")
    val merged = (m -- parts) ++
      writtenParts(new Path(dir, root)).map(_ -> root)
    commitManifest(dir, merged)
    compactIfScattered(dir, merged)
  }

  /** Bound read-plan width and file count: when a table's partitions are
    * scattered over more than [[MaxRoots]] staging roots, rewrite it into
    * one root (cost: one full-table job, amortized over the ≥MaxRoots
    * merges that caused it — the same background-compaction bargain
    * cluster table formats strike). */
  private def compactIfScattered(dir: String, m: Map[Int, String]): Unit =
    if (m.values.toSet.size > MaxRoots) {
      val rows = openParts(dir, m, m.keys).drop("ipart")
      val root = nextRoot(dir)
      writePartitioned(rows, s"$dir/$root")
      commitManifest(dir,
        writtenParts(new Path(dir, root)).map(_ -> root).toMap)
    }
}

object IndexStore {
  /** Item-hash partition count for index tables. Small enough to keep
    * little indexes compact; a 100 TB deployment raises it the same way
    * ContentStore.NumPartitions scales with the content log. */
  val IndexPartitions = 32

  /** Compaction threshold: maximum staging roots a table may scatter
    * across before it is rewritten into one. */
  val MaxRoots = 8

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

  /** Atomic single-file replace: write `<p>.tmp` (with a length header so
    * a partially-written tmp is detectable), delete live, rename. A crash
    * between delete and rename is healed on read (the COMPLETE tmp is
    * adopted); a crash mid-tmp-write leaves the live file untouched and
    * the invalid tmp is discarded. */
  private def writeSwapped(fs: org.apache.hadoop.fs.FileSystem, path: String,
      body: String): Unit = {
    val tmp = new Path(path + ".tmp")
    writeUtf8(fs, tmp, s"${body.getBytes("UTF-8").length}\n" + body)
    fs.delete(new Path(path), false)
    fs.rename(tmp, new Path(path))
    ()
  }

  /** Payload of a header-framed file, or null when incomplete/corrupt. */
  private def validPayload(content: String): String = {
    val nl = content.indexOf('\n')
    if (nl < 0) return null
    val payload = content.substring(nl + 1)
    content.substring(0, nl).toLongOption match {
      case Some(len) if payload.getBytes("UTF-8").length == len => payload
      case _ => null
    }
  }

  /** Read a [[writeSwapped]] file, finishing an interrupted swap; null if
    * the file has never been (completely) written. Only a tmp that passes
    * the length check is adopted — a crash mid-tmp-write must not replace
    * a readable store with garbage. */
  private def readSwapped(fs: org.apache.hadoop.fs.FileSystem,
      path: String): String = {
    val live = new Path(path)
    val tmp = new Path(path + ".tmp")
    if (!fs.exists(live) && fs.exists(tmp)) {
      if (validPayload(readUtf8(fs, tmp)) != null) fs.rename(tmp, live)
      else fs.delete(tmp, false) // partial write; live was never deleted
    }
    if (!fs.exists(live)) null
    else {
      val p = validPayload(readUtf8(fs, live))
      if (p == null)
        throw new IllegalStateException(s"corrupt swapped file: $path")
      p
    }
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

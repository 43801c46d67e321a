package graft.engine

import graft.hql.{FieldResolver, HqlParser, Translator}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Errors mirroring the reference's taxonomy (HyperbusAdapter.scala). */
sealed abstract class GraftError(msg: String) extends RuntimeException(msg)
final class NotFound(path: String) extends GraftError(s"not-found: $path")
final class Conflict(msg: String) extends GraftError(msg)
final class QuerySkippedRowsLimited(max: Int)
    extends GraftError(s"query-skipped-rows-limited: $max")

final case class SortBy(fieldName: String, descending: Boolean = false)
object SortBy {
  /** Parse `"a,-b"` → Seq(SortBy(a), SortBy(b, descending)). */
  def parse(s: String): Seq[SortBy] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map {
      case f if f.startsWith("-") => SortBy(f.substring(1), descending = true)
      case f if f.startsWith("+") => SortBy(f.substring(1))
      case f => SortBy(f)
    }.toSeq
}

final case class QueryResult(rows: DataFrame, revision: Long)

/** One write operation — the engine's "query language" for mutations
  * (reference §2.11: PUT/PATCH/DELETE/POST over documents and collection
  * items). `seq` orders operations within a batch; per-document application
  * is serialized by key exactly like the reference's per-key single worker
  * (ShardProcessor.scala:363-420), here via groupByKey+flatMapGroups. */
final case class WriteOp(seq: Long, method: String, path: String, body: String)

final case class ContentRow(
    document_uri: String, item_id: String, revision: Long,
    body: String, is_deleted: Boolean,
    created_at: java.sql.Timestamp, modified_at: java.sql.Timestamp)

/** Feed event emitted per applied write (reference ST1: method rewritten
  * PUT→feed:put etc., revision attached at transaction creation,
  * PrimaryWorker.scala:217-227). */
final case class FeedEvent(
    document_uri: String, item_id: String, method: String,
    revision: Long, body: String)

/** Batch write result: the new content log + the change feed slice. */
final case class ApplyResult(log: DataFrame, feed: DataFrame)

/** HyperStorage-on-Spark: the reference's query and mutation capabilities
  * over a content log DataFrame.
  *
  * Read path (§3.1 of SURVEY.md): filter expression → Catalyst Column via
  * the HQL translator; sort → orderBy with the reference's type rules;
  * size/skipMax → limit + scan-cap guard. Catalyst performs the pushdown /
  * top-k work the reference hand-implements (queryUntilFetched,
  * HyperbusAdapter.scala:268-309).
  */
final class HyperStorage(val spark: SparkSession, val log: DataFrame) {
  import HyperStorage._

  lazy val current: DataFrame = Content.latestView(log).cache()

  /** S1 point get: document (itemId="") or collection item. */
  def get(path: String): Option[Row] = {
    val (uri, itemId) = splitPath(path)
    current
      .filter(col("document_uri") === uri && col("item_id") === itemId)
      .collect().headOption
  }

  /** §3.1 collection query. Filter is an HQL expression over body fields;
    * itemIdFilter supports the S2 clustering-range form. */
  def query(
      collectionUri: String,
      filter: Option[String] = None,
      sort: Seq[SortBy] = Nil,
      size: Int = DefaultPageSize,
      skipMax: Int = DefaultMaxSkippedRows,
      itemIdFilter: Option[(String, String)] = None): QueryResult = {

    val base = current.filter(col("document_uri") === collectionUri)
    val resolver = FieldResolver.json(col("body"))

    val withRange = itemIdFilter.foldLeft(base) { case (df, (op, v)) =>
      df.filter(op match {
        case ">" => col("item_id") > v; case ">=" => col("item_id") >= v
        case "<" => col("item_id") < v; case "<=" => col("item_id") <= v
        case "=" => col("item_id") === v
      })
    }

    val filtered = filter match {
      case Some(f) => withRange.filter(Translator.predicate(f, resolver))
      case None => withRange
    }

    // The reference caps the rows it is willing to scan-and-skip past at
    // skipMax (error query-skipped-rows-limited); here the scan is a full
    // distributed pass so the cap is an explicit guarantee check: how many
    // rows the filter rejected. Only enforced when a filter is present
    // (HyperbusAdapter.scala:181-197, 279-283).
    if (filter.isDefined && skipMax >= 0) {
      val total = withRange.count()
      val kept = filtered.count()
      if (total - kept > skipMax) throw new QuerySkippedRowsLimited(skipMax)
    }

    val sorted =
      if (sort.isEmpty) filtered.orderBy(col("item_id").asc)
      else filtered.orderBy(sort.map(sortColumn(_, resolver)) :+ col("item_id").asc: _*)

    val revision = revisionOf(collectionUri)
    QueryResult(sorted.limit(size), revision)
  }

  /** S3 static row: collection-level revision (max over the log — the
    * reference keeps it as a Cassandra static column). */
  def revisionOf(uri: String): Long = {
    val r = log.filter(col("document_uri") === uri)
      .agg(max("revision")).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Apply a batch of write operations (M1-M5). Operations are grouped by
    * document and applied in `seq` order per key — a distributed, per-key
    * serialized fold, mirroring the reference's single-worker-per-URI
    * guarantee. Returns the appended log and the feed events. */
  def applyOps(ops: Dataset[WriteOp]): ApplyResult = {
    val sess = spark
    import sess.implicits._

    // base state per (uri,item): latest body + revision; plus collection max
    // revision per uri (static revision semantics)
    val latest = log
      .withColumn("__rn", row_number().over(
        Window.partitionBy("document_uri", "item_id").orderBy(col("revision").desc)))
      .filter(col("__rn") === 1).drop("__rn")
      .as[ContentRow]

    val opsByUri = ops.groupByKey(op => splitPath(op.path)._1)
    val stateByUri = latest.groupByKey(_.document_uri)

    val applied: Dataset[(ContentRow, FeedEvent)] =
      opsByUri.cogroup(stateByUri) { (uri, opIt, stateIt) =>
        applyForDocument(uri, opIt.toSeq.sortBy(_.seq), stateIt.toSeq)
      }

    val newRows = applied.map(_._1).toDF()
      .withColumn("created_at", lit(null).cast(TimestampType))
      .withColumn("modified_at", lit(null).cast(TimestampType))
      .select(Content.schema.fieldNames.map(col): _*)
    val feed = applied.map(_._2).toDF()
    ApplyResult(log.unionByName(newRows), feed)
  }
}

object HyperStorage {
  val DefaultPageSize = 100            // HyperbusAdapter.scala:35
  val DefaultMaxSkippedRows = 10000    // HyperbusAdapter.scala:33

  def apply(spark: SparkSession, log: DataFrame): HyperStorage =
    new HyperStorage(spark, log)

  /** Path split (reference ContentLogic.scala:13-40): a collection URI ends
    * with `~`; an item path is `collection~/itemId`; a plain document is
    * (path, ""). */
  def splitPath(path: String): (String, String) = {
    val idx = path.lastIndexOf('/')
    if (idx > 0 && path.substring(0, idx).endsWith("~"))
      (path.substring(0, idx), path.substring(idx + 1))
    else (path, "")
  }

  def isCollectionUri(path: String): Boolean = path.endsWith("~")

  /** Multi-field sort with the reference's dynamic-type rule
    * (CollectionOrdering, HyperbusAdapter.scala:341-376): numbers compare
    * as decimals when both sides are numeric, otherwise text; missing
    * field ⇒ null (sorts first asc / last desc — Spark default). The
    * pairwise rule is realized as a normalized sort key
    * (numeric-castable values order before text within a field). */
  def sortColumn(s: SortBy, resolver: FieldResolver): Column = {
    val raw = resolver.resolve(graft.hql.Ident(s.fieldName))
      .getOrElse(lit(null))
    val dec = raw.cast(StringType).try_cast(DecimalType(38, 18))
    val key = struct(
      when(raw.isNull, 2).when(dec.isNotNull, 0).otherwise(1).as("t"),
      dec.as("d"),
      raw.cast(StringType).as("s"))
    if (s.descending) key.desc else key.asc
  }

  implicit val writeOpEncoder: org.apache.spark.sql.Encoder[WriteOp] = Encoders.product[WriteOp]

  /** Sequentially fold one document's ops over its current items —
    * the reference's PrimaryWorker.updateResource semantics. */
  private[engine] def applyForDocument(
      uri: String, ops: Seq[WriteOp], state: Seq[ContentRow]): Iterator[(ContentRow, FeedEvent)] = {
    var items: Map[String, ContentRow] =
      state.map(r => r.item_id -> r).toMap
    var staticRevision: Long =
      if (state.isEmpty) 0L else state.map(_.revision).max
    var postCounter = 0L
    val out = Seq.newBuilder[(ContentRow, FeedEvent)]

    ops.foreach { op =>
      val (u, itemIdRaw) = splitPath(op.path)
      require(u == uri)
      val isCollection = isCollectionUri(uri)

      // POST → PUT rewrite with generated increasing id
      // (PrimaryWorker.scala:76-91); monotonic within the collection.
      val (method, itemId) = op.method.toUpperCase match {
        case "POST" if isCollection && itemIdRaw.isEmpty =>
          postCounter += 1
          ("PUT", f"${op.seq}%019d-$postCounter%04d")
        case m => (m, itemIdRaw)
      }

      val existing = items.get(itemId).filterNot(_.is_deleted)
      val rev = staticRevision + 1

      def emit(body: String, deleted: Boolean, feedMethod: String): Unit = {
        val row = ContentRow(uri, itemId, rev, body, deleted, null, null)
        items += itemId -> row
        staticRevision = rev
        out += ((row, FeedEvent(uri, itemId, s"feed:$feedMethod", rev, body)))
      }

      method match {
        case "PUT" =>
          val stripped = JsonOps.stripNulls(op.body)
          val body =
            if (isCollection && itemId.nonEmpty) JsonOps.appendId(stripped, itemId)
            else stripped
          emit(body, deleted = false, "put")
        case "PATCH" =>
          existing match {
            case None => // 404: absent or deleted (PrimaryWorker.scala:272-278)
            case Some(ex) =>
              JsonOps.mergePatch(Option(ex.body).getOrElse("{}"), op.body) match {
                case Some(merged) =>
                  val body =
                    if (isCollection && itemId.nonEmpty) JsonOps.appendId(merged, itemId)
                    else merged
                  emit(body, deleted = false, "patch")
                case None =>
                  emit(null, deleted = true, "patch")
              }
          }
        case "DELETE" =>
          if (existing.isDefined || (itemId.isEmpty && items.nonEmpty))
            emit(null, deleted = true, "delete")
        case other => sys.error(s"unsupported method: $other")
      }
    }
    out.result().iterator
  }
}

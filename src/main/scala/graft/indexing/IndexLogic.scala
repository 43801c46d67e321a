package graft.indexing

import com.fasterxml.jackson.databind.ObjectMapper
import graft.engine.SortBy
import graft.hql._

/** Index sort-field spec (reference api.HyperStorageIndexSortItem):
  * `fieldType` ∈ text|decimal (hyperstorage.raml:19-20), `order` ∈
  * asc|desc. */
final case class IndexSortItem(
    fieldName: String,
    fieldType: Option[String] = None,
    order: Option[String] = None) {
  def isDecimal: Boolean = fieldType.contains("decimal")
  def isDesc: Boolean = order.contains("desc")
}

/** Clustering-key field usable for an index scan: physical column +
  * direction (reference db.CkField). */
final case class CkField(name: String, ascending: Boolean)

/** Planner logic ported from the reference's indexing/IndexLogic.scala and
  * OrderFieldsLogic.scala — sort/filter weighing, CK extraction, physical
  * field naming, resume-key generation. */
object IndexLogic {

  /** Physical table name from the sort spec (IndexLogic.scala:14-33):
    * `index_content[_<t|d><a|d><pos>...]`. */
  def tableName(sortBy: Seq[IndexSortItem]): String =
    if (sortBy.isEmpty) "index_content"
    else sortBy.zipWithIndex.foldLeft(new StringBuilder("index_content_")) {
      case (sb, (item, i)) =>
        sb.append(if (item.isDecimal) "d" else "t")
          .append(if (item.isDesc) "d" else "a")
          .append(i)
    }.toString

  /** Physical column of a sort field (IndexLogic.scala:64-69): the
    * trailing implicit `id` maps to item_id; others to t<i>/d<i>. */
  def tableFieldName(item: IndexSortItem, size: Int, index: Int): String =
    if (index == size - 1 && item.fieldName == "id") "item_id"
    else (if (item.isDecimal) "d" else "t") + index.toString

  /** Order-match weight — the behavior of the reference's
    * OrderFieldsLogic.scala:8-44, pinned scenario-for-scenario by
    * OrderFieldsLogicSpec: the FIRST query field sets the scan polarity
    * (10 = follows the index order exactly, 5 = whole scan reversed,
    * -10 = not an index field); every later field must keep that
    * polarity — the first polarity flip (or running past the index's
    * fields) downgrades the match to partial (3), and a later non-index
    * field is fatal (-10). Empty query sort weighs 0. */
  def weighOrdering(query: Seq[SortBy], indexSortedBy: Seq[IndexSortItem]): Int = {
    if (query.isEmpty) return 0
    val idx = indexSortedBy.toVector
    val polarity = weighOne(query.head, idx.head)
    if (polarity == -10) return -10
    var i = 1
    while (i < query.size) {
      val w = if (i < idx.size) weighOne(query(i), idx(i)) else 3
      if (w == -10) return -10
      if (w != polarity) return 3
      i += 1
    }
    polarity
  }

  private def weighOne(queryEl: SortBy, indexEl: IndexSortItem): Int =
    if (queryEl.fieldName != indexEl.fieldName) -10
    else if (indexEl.isDesc == queryEl.descending) 10
    else 5

  /** Usable clustering prefix + whole-scan `reversed` flag — the behavior
    * of the reference's OrderFieldsLogic.scala:46-80 (pinned by
    * OrderFieldsLogicSpec): the first query field decides whether the
    * scan runs forward or reversed; the prefix extends while field names
    * line up positionally AND each field's direction keeps the chosen
    * scan polarity. */
  def extractIndexSortFields(
      querySortBy: Seq[SortBy], indexSortedBy: Seq[IndexSortItem]): (Seq[CkField], Boolean) = {
    val idx = indexSortedBy.toVector
    val size = querySortBy.size
    val prefix = scala.collection.mutable.ListBuffer.empty[CkField]
    var reversed = false
    var i = 0
    var open = true
    while (open && i < size && i < idx.size) {
      val q = querySortBy(i)
      val is = idx(i)
      // aligned = the index column's declared direction equals the
      // query's requested direction for this field
      val aligned = is.isDesc == q.descending
      if (is.fieldName != q.fieldName) open = false
      else {
        if (i == 0) reversed = !aligned
        if (aligned != reversed) // agrees with the chosen scan polarity
          prefix += CkField(tableFieldName(is, size, i), ascending = !q.descending)
        else open = false
      }
      i += 1
    }
    (prefix.toList, reversed)
  }

  /** Index usefulness weight (IndexLogic.scala:89-106): filter part via
    * AST subsumption (Equal=20/Wider=10/NotEqual=-1000001; index-filter
    * without query-filter disqualifies; query-filter without index-filter
    * -30) + order part. */
  def weighIndex(
      queryFilter: Option[Ast], querySort: Seq[SortBy],
      indexFilter: Option[Ast], indexSort: Seq[IndexSortItem]): Int = {
    val filterWeight = (queryFilter, indexFilter) match {
      case (None, Some(_)) => -1000000
      case (Some(_), None) => -30
      case (None, None) => 0
      case (Some(q), Some(i)) =>
        AstComparator.compare(i, q) match {
          case AstComparation.Equal => 20
          case AstComparation.Wider => 10
          case AstComparation.NotEqual => -1000001
        }
    }
    filterWeight + weighOrdering(querySort, indexSort)
  }

  // ---------------------------------------------------------- field values

  private val mapper = new ObjectMapper()

  /** Extract a (dotted) field of a JSON body as an HValue (reference
    * extractSortFieldValues, IndexLogic.scala:47-62; missing ⇒ Null). */
  def fieldValue(bodyJson: String, fieldName: String): HValue = {
    if (bodyJson == null) return HNull
    var node = mapper.readTree(bodyJson)
    fieldName.split('.').foreach { seg => if (node != null) node = node.get(seg) }
    if (node == null || node.isNull) HNull
    else if (node.isNumber) HNumber(BigDecimal(node.decimalValue()))
    else if (node.isBoolean) HBool(node.asBoolean())
    else if (node.isTextual) HText(node.asText())
    else HText(node.toString)
  }

  /** (physicalName, value) pairs of a body for the index's sort columns. */
  def extractSortFieldValues(
      sortBy: Seq[IndexSortItem], bodyJson: String): Seq[(String, HValue)] = {
    val size = sortBy.size
    sortBy.zipWithIndex.map { case (item, i) =>
      (tableFieldName(item, size, i), fieldValue(bodyJson, item.fieldName))
    }
  }

  private def asString(v: HValue): String = v match {
    case HText(s) => s
    case HNumber(n) => n.bigDecimal.toPlainString
    case HBool(b) => b.toString
    case HNull => "null"
    case l: HList => l.render
  }

  private def asDecimal(v: HValue): BigDecimal = v match {
    case HNumber(n) => n
    case HText(s) => BigDecimal(s)
    case HBool(b) => if (b) 1 else 0
    case _ => 0
  }

  def greater(a: HValue, b: HValue, decimal: Boolean): Boolean =
    if (decimal) asDecimal(a) > asDecimal(b) else asString(a) > asString(b)

  def valueRangeMatches(a: HValue, b: HValue, op: FilterOp, decimal: Boolean): Boolean =
    op match {
      case FilterGt => greater(a, b, decimal)
      case FilterGtEq => a == b || greater(a, b, decimal)
      case FilterLt => greater(b, a, decimal)
      case FilterLtEq => a == b || greater(b, a, decimal)
      case FilterEq => a == b
    }

  /** Per-position boundary value of the last page's final row: the
    * physical column, the body's value for it, and how the scan orders
    * it. Input to [[leastRowsFilterFields]]. */
  private final case class PageBound(
      column: String, value: HValue, ascending: Boolean, decimal: Boolean)

  /** O6 resume-key generation — the behavior of the reference's
    * IndexLogic.scala:108-165, driven live by `QueryPlanner.queryAfter`:
    * from the last row of the previous page, EQ filters pin the
    * clustering prefix and a strict GT/LT bounds the boundary position,
    * so the next clustering scan starts right after the cursor.
    *
    * The boundary position starts at the deepest clustering field and
    * retreats one position per exhausted sub-scan
    * (`prevFilterFieldsSize` = the previous MERGED filter count,
    * `prevFilterReachedEnd` = that sub-scan ran dry); positions already
    * pinned by the query's own EQ filters never resume. Returns empty —
    * end of the page chain — once the cursor sits outside any of the
    * query's own range bounds, or when the boundary has retreated past
    * every resumable position. */
  def leastRowsFilterFields(
      indexSortedBy: Seq[IndexSortItem],
      queryFilterFields: Seq[FieldFilter],
      prevFilterFieldsSize: Int,
      prevFilterReachedEnd: Boolean,
      lastBodyJson: String,
      reversed: Boolean): Seq[FieldFilter] = {
    val size = indexSortedBy.size
    val bounds = indexSortedBy.zipWithIndex.map { case (item, pos) =>
      PageBound(tableFieldName(item, size, pos),
        fieldValue(lastBodyJson, item.fieldName), !item.isDesc, item.isDecimal)
    }

    // cursor outside one of the query's own range filters ⇒ chain over
    val pastRangeEnd = queryFilterFields.exists { q =>
      q.op != FilterEq &&
        bounds.exists(b => b.column == q.name &&
          !valueRangeMatches(b.value, q.value, q.op, b.decimal))
    }
    if (pastRangeEnd) return Seq.empty

    val resumeFrom = bounds.lastIndexWhere(b =>
      queryFilterFields.exists(q => q.op == FilterEq && q.name == b.column)) + 1
    val boundaryPos =
      if (prevFilterFieldsSize == 0 || !prevFilterReachedEnd) size - 1
      else prevFilterFieldsSize - 2
    bounds.zipWithIndex
      .slice(resumeFrom, boundaryPos + 1)
      .map { case (b, pos) =>
        if (pos < boundaryPos) FieldFilter(b.column, b.value, FilterEq)
        else FieldFilter(b.column, b.value,
          // strict-after in scan direction: a reversed scan walks an
          // ascending column downward (and vice versa)
          if (reversed ^ b.ascending) FilterGt else FilterLt)
      }
  }

  /** Merge the query's EQ pushdowns with a resume filter
    * (IndexLogic.scala:184-191). */
  def mergeLeastQueryFilterFields(
      queryFilterFields: Seq[FieldFilter],
      leastFilterFields: Seq[FieldFilter]): Seq[FieldFilter] =
    if (leastFilterFields.isEmpty) queryFilterFields
    else queryFilterFields.filter(_.op == FilterEq) ++ leastFilterFields
}

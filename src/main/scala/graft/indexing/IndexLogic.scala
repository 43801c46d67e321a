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

  /** Order-match weight (OrderFieldsLogic.scala:8-44): per-field exact=10,
    * whole-scan-reversed=5, partial/mixed=3, mismatch=-10; empty query
    * sort = 0. */
  def weighOrdering(query: Seq[SortBy], indexSortedBy: Seq[IndexSortItem]): Int = {
    val v = indexSortedBy.toVector
    query.foldLeft((0 /*weight*/, 0 /*index*/)) {
      case ((0, 0), sortBy) => (weighOne(sortBy, indexSortedBy.head), 1)
      case ((5, index), sortBy) =>
        if (v.size > index) {
          val w = weighOne(sortBy, v(index))
          (if (w == 10) 3 else w, index + 1)
        } else (3, index + 1)
      case ((10, index), sortBy) =>
        if (v.size > index) {
          val w = weighOne(sortBy, v(index))
          (if (w == 5) 3 else w, index + 1)
        } else (3, index + 1)
      case ((weight, index), _) => (weight, index + 1)
    }._1
  }

  private def weighOne(queryEl: SortBy, indexEl: IndexSortItem): Int =
    if (queryEl.fieldName == indexEl.fieldName) {
      if (indexEl.isDesc == queryEl.descending) 10 else 5
    } else -10

  /** Usable clustering prefix + whole-scan `reversed` flag
    * (OrderFieldsLogic.scala:46-80). */
  def extractIndexSortFields(
      querySortBy: Seq[SortBy], indexSortedBy: Seq[IndexSortItem]): (Seq[CkField], Boolean) = {
    val v = indexSortedBy.toVector
    var reversed = false
    val size = querySortBy.size
    val fields = querySortBy.zipWithIndex.map { case (q, index) =>
      if (v.size > index) {
        val is = v(index)
        if (is.fieldName == q.fieldName) {
          if (!is.isDesc != q.descending && !reversed)
            Some(CkField(tableFieldName(is, size, index), ascending = !q.descending))
          else if (!is.isDesc == q.descending && reversed)
            Some(CkField(tableFieldName(is, size, index), ascending = !q.descending))
          else if (index == 0) {
            reversed = true
            Some(CkField(tableFieldName(is, size, index), ascending = !q.descending))
          } else None
        } else None
      } else None
    }.takeWhile(_.isDefined).flatten
    (fields, reversed)
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

  /** O6 resume-key generation (IndexLogic.scala:108-165): from the last
    * row seen, EQ on the sort prefix + GT/LT on the boundary field;
    * detects range end against the query's own range filters. */
  def leastRowsFilterFields(
      indexSortedBy: Seq[IndexSortItem],
      queryFilterFields: Seq[FieldFilter],
      prevFilterFieldsSize: Int,
      prevFilterReachedEnd: Boolean,
      lastBodyJson: String,
      reversed: Boolean): Seq[FieldFilter] = {
    val size = indexSortedBy.size
    val isbIdx = indexSortedBy.zipWithIndex.map { case (item, index) =>
      val fieldName = tableFieldName(item, size, index)
      (fieldName, fieldValue(lastBodyJson, item.fieldName),
        !item.isDesc, index, item.isDecimal)
    }

    val reachedEnd = !queryFilterFields.forall { q =>
      if (q.op != FilterEq) {
        isbIdx.find(_._1 == q.name).map { i =>
          valueRangeMatches(i._2, q.value, q.op, i._5)
        }.getOrElse(true)
      } else true
    }

    if (reachedEnd) Seq.empty
    else {
      val startIndex = isbIdx.lastIndexWhere(isb =>
        queryFilterFields.exists(qf => qf.name == isb._1 && qf.op == FilterEq)) + 1
      val lastIndex =
        if (prevFilterFieldsSize == 0 || !prevFilterReachedEnd) size - 1
        else prevFilterFieldsSize - 2
      isbIdx.flatMap {
        case (fieldName, fieldValue, fieldAscending, index, _) if index >= startIndex =>
          if (index == lastIndex) {
            val op = if (reversed ^ fieldAscending) FilterGt else FilterLt
            Some(FieldFilter(fieldName, fieldValue, op))
          } else if (index <= lastIndex) {
            Some(FieldFilter(fieldName, fieldValue, FilterEq))
          } else None
        case _ => None
      }
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

package graft.hql

/** Pushdown-filter extraction — the reference's
  * `indexing/FieldFiltersExtractor` (FieldFiltersExtractor.scala:18-61)
  * re-expressed over the graft AST.
  *
  * From an AND-tree of `{ident op const}` terms (op ∈ > >= < <= =, the
  * constant may sit on either side — the op is swapped), extract storage
  * range filters on the index sort fields: an EQ prefix plus at most one
  * range filter per field, in sort-field order. Any `or` anywhere ⇒ no
  * pushdown (the residual filter still applies in full).
  */
sealed trait FilterOp { def sql: String }
case object FilterEq extends FilterOp { val sql = "=" }
case object FilterGt extends FilterOp { val sql = ">" }
case object FilterGtEq extends FilterOp { val sql = ">=" }
case object FilterLt extends FilterOp { val sql = "<" }
case object FilterLtEq extends FilterOp { val sql = "<=" }

object FilterOp {
  def fromOp(op: String): Option[FilterOp] = op match {
    case "="  => Some(FilterEq)
    case ">"  => Some(FilterGt)
    case ">=" => Some(FilterGtEq)
    case "<"  => Some(FilterLt)
    case "<=" => Some(FilterLtEq)
    case _    => None
  }
}

final case class FieldFilter(name: String, value: HValue, op: FilterOp)

/** Sort-field spec of an index / primary key: field name + physical column
  * name (the reference maps `id`→`item_id` and index fields to `t0/d0/..`,
  * IndexLogic.scala:35-45). */
final case class SortField(fieldName: String, physicalName: String)

final class FieldFiltersExtractor(sortFields: Seq[SortField]) {

  def extract(ast: Ast): Seq[FieldFilter] = {
    val terms = andTerms(ast)
    if (terms.isEmpty) return Nil
    // candidate per field: first matching simple term
    val byField: Map[String, FieldFilter] = terms
      .flatMap(simpleTerm)
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.head._2 }
    // walk sort fields in order: EQ filters extend the prefix; the first
    // non-EQ (range) filter terminates extraction (clustering-key scan rule)
    val out = Seq.newBuilder[FieldFilter]
    var continue = true
    val it = sortFields.iterator
    while (continue && it.hasNext) {
      val sf = it.next()
      byField.get(sf.fieldName) match {
        case Some(ff) =>
          out += ff.copy(name = sf.physicalName)
          if (ff.op != FilterEq) continue = false
        case None => continue = false
      }
    }
    out.result()
  }

  /** Flatten an AND-tree; None if any OR occurs anywhere. */
  private def andTerms(ast: Ast): Seq[Ast] = {
    if (containsOr(ast)) Nil
    else ast match {
      case Binary(l, "and", r) => andTerms(l) ++ andTerms(r)
      case other => Seq(other)
    }
  }

  private def containsOr(ast: Ast): Boolean = ast match {
    case Binary(l, op, r) => op == "or" || containsOr(l) || containsOr(r)
    case Unary(_, a) => containsOr(a)
    case Func(_, args) => args.exists(containsOr)
    case _ => false
  }

  /** `{ident op const}` or `{const op ident}` (op swapped). */
  private def simpleTerm(t: Ast): Option[(String, FieldFilter)] = t match {
    case Binary(Ident(segs), op, Const(v: HValue)) if scalar(v) =>
      FilterOp.fromOp(op).map(fo => (segs.mkString("."),
        FieldFilter(segs.mkString("."), v, fo)))
    case Binary(Const(v: HValue), op, Ident(segs)) if scalar(v) =>
      FilterOp.fromOp(Ops.swap(op)).map(fo => (segs.mkString("."),
        FieldFilter(segs.mkString("."), v, fo)))
    case _ => None
  }

  private def scalar(v: HValue): Boolean = v match {
    case _: HList => false
    case _ => true
  }
}

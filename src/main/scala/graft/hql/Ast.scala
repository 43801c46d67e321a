package graft.hql

/** AST for the HyperStorage filter-expression language ("HQL").
  *
  * Shapes mirror the reference's external parser AST
  * (`eu.inn.parser.HParser`; see /root/reference
  * src/main/scala/eu/inn/hyperstorage/indexing/Comparation.scala:19-54 for
  * the shapes the engine consumes): constants, multi-segment identifiers,
  * unary/binary operations, and n-ary functions. Values follow the dynamic
  * JSON model (`Obj/Lst/Text/Number/Bool/Null`,
  * PrimaryWorker.scala:45-60) with `Number` as arbitrary-precision decimal
  * (IndexLogic.scala:179 compares via `asBigDecimal`).
  */
sealed trait HValue {
  def render: String = this match {
    case HText(s)   => "\"" + s + "\""
    case HNumber(n) => n.bigDecimal.toPlainString
    case HBool(b)   => b.toString
    case HNull      => "null"
    case HList(xs)  => xs.map(_.render).mkString("[", ",", "]")
  }
}
final case class HText(s: String) extends HValue
final case class HNumber(n: BigDecimal) extends HValue
final case class HBool(b: Boolean) extends HValue
case object HNull extends HValue
final case class HList(items: Seq[HValue]) extends HValue

sealed trait Ast {
  /** Every identifier referenced anywhere in this expression. */
  def identifiers: Seq[Ident] = this match {
    case i: Ident          => Seq(i)
    case Unary(_, a)       => a.identifiers
    case Binary(l, _, r)   => l.identifiers ++ r.identifiers
    case Func(_, args)     => args.flatMap(_.identifiers)
    case _                 => Nil
  }
  /** True when no identifiers occur (constant-foldable,
    * reference Comparation.scala:17). */
  def isConstant: Boolean = identifiers.isEmpty

  /** Render back to parseable HQL (fully parenthesized, so
    * `HqlParser(render)` reproduces this AST — pinned by scalacheck). */
  def render: String = this match {
    case Const(v)       => v.render
    case i: Ident       => i.segments.map(Ast.renderSegment).mkString(".")
    case Unary(op, a)   => s"$op(${a.render})"
    case Binary(l, "has", r)     => s"(${l.render}) has (${r.render})"
    case Binary(l, "has not", r) => s"(${l.render}) has not (${r.render})"
    case Binary(l, op, r) => s"(${l.render}) $op (${r.render})"
    case Func(n, args)  => s"$n(${args.map(_.render).mkString(", ")})"
  }
}
object Ast {
  private val Bare = "[A-Za-z_][A-Za-z0-9_]*".r
  private val Reserved = Set("and", "or", "not", "has", "true", "false", "null")
  private[hql] def renderSegment(seg: String): String =
    if (Bare.matches(seg) && !Reserved.contains(seg.toLowerCase)) seg
    else s"`$seg`"
}
final case class Const(v: HValue) extends Ast
/** Dotted identifier `a.b.c` → segments Seq("a","b","c"). */
final case class Ident(segments: Seq[String]) extends Ast {
  def name: String = segments.mkString(".")
}
object Ident { def apply(name: String): Ident = Ident(name.split('.').toSeq) }
final case class Unary(op: String, arg: Ast) extends Ast
final case class Binary(left: Ast, op: String, right: Ast) extends Ast
final case class Func(name: String, args: Seq[Ast]) extends Ast

object Ops {
  val Comparisons: Set[String] = Set("=", "!=", ">", ">=", "<", "<=")
  /** Swap operand sides: `5 < x` ⇒ `x > 5`
    * (reference FieldFiltersExtractor.scala swapOp). */
  def swap(op: String): String = op match {
    case ">" => "<"; case "<" => ">"
    case ">=" => "<="; case "<=" => ">="
    case other => other
  }
}

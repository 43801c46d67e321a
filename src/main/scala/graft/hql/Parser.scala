package graft.hql

import scala.util.parsing.combinator.RegexParsers
import scala.util.Try

/** Parser for the HyperStorage filter-expression grammar.
  *
  * The reference delegates to the external `eu.inn:expression-parser` lib
  * (reference build.sbt:55, used at HyperbusAdapter.scala:146); the observed
  * grammar (SURVEY.md §2.2 / FIXTURES.md §5) is:
  *
  *   literals:   "text", 123, 4.5, -7, true, false, null, [1,2,3]
  *   identifier: `a`, `a.b.c` (dotted segments), backquoted segments allowed
  *   arithmetic: + - * / %
  *   comparison: = != > >= < <=
  *   membership: `x has [1,2,3]`, `x has not [1,2]`
  *   logical:    and, or, not / !
  *   functions:  f(a, b, ...)
  *
  * Precedence (low→high): or, and, not, comparison/has, additive,
  * multiplicative, unary-minus, primary.
  */
object HqlParser extends RegexParsers {
  override def skipWhitespace = true

  private def number: Parser[Const] =
    """-?\d+(\.\d+)?([eE][+-]?\d+)?""".r ^^ (s => Const(HNumber(BigDecimal(s))))

  private def string: Parser[Const] =
    ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ { raw =>
      val body = raw.substring(1, raw.length - 1)
      Const(HText(unescape(body)))
    }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r'); case other => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def boolOrNull: Parser[Const] =
    ("true\\b".r ^^^ Const(HBool(true))) |
    ("false\\b".r ^^^ Const(HBool(false))) |
    ("null\\b".r ^^^ Const(HNull))

  private def listLiteral: Parser[Const] =
    "[" ~> repsep(scalarLiteral, ",") <~ "]" ^^ (xs => Const(HList(xs.map(_.v))))

  private def scalarLiteral: Parser[Const] = number | string | boolOrNull

  private val keyword = Set("and", "or", "not", "has", "true", "false", "null")

  // NO `-` inside bare segments: `b-1 > 0` must parse as the subtraction
  // `b - 1 > 0`, not as an identifier named "b-1" (which would silently
  // reject every row as an unknown field). Hyphenated field names remain
  // expressible with backquotes: `` `b-1` ``. The (text, quoted) pair lets
  // the keyword restriction apply to BARE heads only — `` `has` `` is a
  // legitimate field name.
  private def segment: Parser[(String, Boolean)] =
    ("`" ~> """[^`]+""".r <~ "`" ^^ (s => (s, true))) |
    ("""[A-Za-z_][A-Za-z0-9_]*""".r ^^ (s => (s, false)))

  private def identifier: Parser[Ident] =
    rep1sep(segment, ".") ^? ({
      case segs if segs.head._2 || !keyword.contains(segs.head._1.toLowerCase) ||
          segs.size > 1 =>
        Ident(segs.map(_._1))
    }, segs => s"reserved word used as identifier: ${segs.map(_._1).mkString(".")}")

  private def funcCall: Parser[Func] =
    identifier ~ ("(" ~> repsep(or, ",") <~ ")") ^^ {
      case id ~ args => Func(id.name, args)
    }

  private def parens: Parser[Ast] = "(" ~> or <~ ")"

  private def primary: Parser[Ast] =
    listLiteral | scalarLiteral | funcCall | identifier | parens

  private def unaryMinus: Parser[Ast] =
    ("-" ~> unaryMinus ^^ (a => Unary("-", a))) | primary

  private def multiplicative: Parser[Ast] =
    unaryMinus ~ rep(("*" | "/" | "%") ~ unaryMinus) ^^ foldBin

  private def additive: Parser[Ast] =
    multiplicative ~ rep(("+" | "-") ~ multiplicative) ^^ foldBin

  private def comparison: Parser[Ast] =
    additive ~ opt(
      (("!=" | ">=" | "<=" | ">" | "<" | "=") ~ additive ^^ {
        case op ~ r => (op, r)
      }) |
      ("has\\b".r ~> "not\\b".r ~> additive ^^ (r => ("has not", r))) |
      ("has\\b".r ~> additive ^^ (r => ("has", r)))
    ) ^^ {
      case l ~ None => l
      case l ~ Some((op, r)) => Binary(l, op, r)
    }

  private def notExpr: Parser[Ast] =
    (("not\\b".r | "!") ~> notExpr ^^ (a => Unary("!", a))) | comparison

  private def and: Parser[Ast] =
    notExpr ~ rep("and\\b".r ~> notExpr) ^^ {
      case first ~ rest => rest.foldLeft(first)((l, r) => Binary(l, "and", r))
    }

  private def or: Parser[Ast] =
    and ~ rep("or\\b".r ~> and) ^^ {
      case first ~ rest => rest.foldLeft(first)((l, r) => Binary(l, "or", r))
    }

  private def foldBin(p: Ast ~ List[String ~ Ast]): Ast = p match {
    case first ~ rest =>
      rest.foldLeft(first) { case (l, op ~ r) => Binary(l, op, r) }
  }

  def parse(input: String): Try[Ast] =
    parseAll(or, input) match {
      case Success(ast, _) => scala.util.Success(ast)
      case noSuccess: NoSuccess =>
        scala.util.Failure(new IllegalArgumentException(
          s"HQL parse error at ${noSuccess.next.pos}: ${noSuccess.msg}"))
    }

  /** Parse or throw — mirrors the reference's `HParser(str).get`. */
  def apply(input: String): Ast = parse(input).get
}

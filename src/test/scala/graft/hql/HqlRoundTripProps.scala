package graft.hql

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** parse ∘ render = identity over generated ASTs — guards the parser and
  * the renderer against precedence / quoting / keyword drift (VERDICT r2
  * next-round item 6). */
object HqlRoundTripProps extends Properties("HqlParser") {

  private val bareSeg: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(3, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val quotedSeg: Gen[String] =
    Gen.oneOf("has", "not-a-bare_seg", "1leading", "with space", "and")

  private val ident: Gen[Ident] = for {
    n    <- Gen.choose(1, 3)
    segs <- Gen.listOfN(n, Gen.frequency(4 -> bareSeg, 1 -> quotedSeg))
  } yield Ident(segs)

  // HNumber stays non-negative: a bare "-5" always parses as
  // Unary("-", 5) (the unary-minus branch wins over the number regex), so
  // Const(HNumber(-5)) is unreachable from source text by design
  private val scalar: Gen[HValue] = Gen.oneOf(
    Gen.choose(0L, 999999L).map(n => HNumber(BigDecimal(n))),
    Gen.choose(0, 99999).map(n => HNumber(BigDecimal(n) / 100)),
    Gen.alphaNumStr.map(HText),
    Gen.oneOf(true, false).map(HBool),
    Gen.const(HNull))

  private val listLit: Gen[HValue] =
    Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, scalar)).map(HList(_))

  private val leaf: Gen[Ast] =
    Gen.oneOf(ident, scalar.map(Const(_)), listLit.map(Const(_)))

  private def ast(depth: Int): Gen[Ast] =
    if (depth <= 0) leaf
    else Gen.frequency(
      2 -> leaf,
      1 -> (for {
        op <- Gen.oneOf("and", "or", "=", "!=", ">", ">=", "<", "<=",
          "+", "-", "*", "/", "%", "has", "has not")
        l <- ast(depth - 1); r <- ast(depth - 1)
      } yield Binary(l, op, r)),
      1 -> (for {
        op <- Gen.oneOf("!", "-"); a <- ast(depth - 1)
      } yield Unary(op, a)),
      1 -> (for {
        name <- Gen.oneOf("length", "lower", "coalesce", "f")
        n    <- Gen.choose(1, 3)
        args <- Gen.listOfN(n, ast(depth - 1))
      } yield Func(name, args)))

  property("parse(render(ast)) == ast") = forAll(ast(3)) { a =>
    HqlParser.parse(a.render).toOption.contains(a)
  }

  property("render is stable (parse twice)") = forAll(ast(3)) { a =>
    val once = HqlParser(a.render)
    HqlParser(once.render) == once
  }
}

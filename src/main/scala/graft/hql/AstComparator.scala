package graft.hql

/** Expression subsumption — the reference's `indexing/AstComparator`
  * (Comparation.scala:19-172) re-expressed over the graft AST.
  *
  * `compare(a, b)` answers: is predicate `a` implied by (or equal to)
  * predicate `b`? I.e., is `a`'s result set a superset of `b`'s?
  *   - Equal: structurally identical after constant folding.
  *   - Wider: every row satisfying `b` satisfies `a`.
  *   - NotEqual: neither established.
  *
  * Used by materialized-index selection: an index with filter `a` can serve
  * a query with filter `b` iff compare(a,b) ∈ {Equal, Wider} (the residual
  * query filter is always re-applied; IndexLogic.weighIndex:89-106).
  */
object AstComparation extends Enumeration {
  val Equal, Wider, NotEqual = Value
}

object AstComparator {
  import AstComparation._

  def compare(a: Ast, b: Ast): AstComparation.Value = {
    val fa = fold(a); val fb = fold(b)
    if (fa == fb) Equal
    else widerCheck(fa, fb)
  }

  /** Constant folding of identifier-free subtrees
    * (Comparation.scala:17,111-140). */
  def fold(ast: Ast): Ast = ast match {
    case b @ Binary(l, op, r) =>
      val bf = Binary(fold(l), op, fold(r))
      if (bf.isConstant) evalConst(bf).map(Const.apply).getOrElse(bf) else bf
    case u @ Unary(op, a) =>
      val uf = Unary(op, fold(a))
      if (uf.isConstant) evalConst(uf).map(Const.apply).getOrElse(uf) else uf
    case Func(n, args) => Func(n, args.map(fold))
    case other => other
  }

  /** Pure evaluation of a constant expression; None when not evaluable. */
  def evalConst(ast: Ast): Option[HValue] = ast match {
    case Const(v) => Some(v)
    case Unary("-", a) => evalConst(a).collect { case HNumber(n) => HNumber(-n) }
    case Unary("!", a) => evalConst(a).collect { case HBool(b) => HBool(!b) }
    case Binary(l, op, r) =>
      for {
        lv <- evalConst(l); rv <- evalConst(r)
        out <- binOp(lv, op, rv)
      } yield out
    case _ => None
  }

  private def binOp(l: HValue, op: String, r: HValue): Option[HValue] =
    (l, op, r) match {
      case (HNumber(a), "+", HNumber(b)) => Some(HNumber(a + b))
      case (HNumber(a), "-", HNumber(b)) => Some(HNumber(a - b))
      case (HNumber(a), "*", HNumber(b)) => Some(HNumber(a * b))
      case (HNumber(a), "/", HNumber(b)) if b != 0 => Some(HNumber(a / b))
      case (HNumber(a), "%", HNumber(b)) if b != 0 => Some(HNumber(a % b))
      case (HText(a), "+", HText(b))     => Some(HText(a + b))
      case (HNumber(a), cmp, HNumber(b)) if Ops.Comparisons(cmp) =>
        Some(HBool(cmpNum(a, cmp, b)))
      case (HText(a), cmp, HText(b)) if Ops.Comparisons(cmp) =>
        Some(HBool(cmpStr(a, cmp, b)))
      case (HBool(a), "and", HBool(b)) => Some(HBool(a && b))
      case (HBool(a), "or", HBool(b))  => Some(HBool(a || b))
      case (v, "has", HList(items))    => Some(HBool(items.contains(v)))
      case (v, "has not", HList(items)) => Some(HBool(!items.contains(v)))
      case _ => None
    }

  private def cmpNum(a: BigDecimal, op: String, b: BigDecimal): Boolean = op match {
    case "=" => a == b; case "!=" => a != b
    case ">" => a > b; case ">=" => a >= b
    case "<" => a < b; case "<=" => a <= b
  }
  private def cmpStr(a: String, op: String, b: String): Boolean = op match {
    case "=" => a == b; case "!=" => a != b
    case ">" => a > b; case ">=" => a >= b
    case "<" => a < b; case "<=" => a <= b
  }

  private val LowerOps = Set(">", ">=")
  private val UpperOps = Set("<", "<=")

  private def widerCheck(a: Ast, b: Ast): AstComparation.Value = (a, b) match {
    // range widening on the same left expression: x > 4 wider than x > 5
    case (Binary(la, opA, Const(HNumber(ca))), Binary(lb, opB, Const(HNumber(cb))))
        if la == lb && LowerOps(opA) && LowerOps(opB) =>
      if (ca < cb || (ca == cb && opA == ">=" && opB == ">")) Wider else NotEqual
    case (Binary(la, opA, Const(HNumber(ca))), Binary(lb, opB, Const(HNumber(cb))))
        if la == lb && UpperOps(opA) && UpperOps(opB) =>
      if (ca > cb || (ca == cb && opA == "<=" && opB == "<")) Wider else NotEqual
    case (Binary(la, opA, Const(HText(ca))), Binary(lb, opB, Const(HText(cb))))
        if la == lb && LowerOps(opA) && LowerOps(opB) =>
      if (ca < cb || (ca == cb && opA == ">=" && opB == ">")) Wider else NotEqual
    case (Binary(la, opA, Const(HText(ca))), Binary(lb, opB, Const(HText(cb))))
        if la == lb && UpperOps(opA) && UpperOps(opB) =>
      if (ca > cb || (ca == cb && opA == "<=" && opB == "<")) Wider else NotEqual

    // range a vs point b: x > 4 wider than x = 5
    case (Binary(la, opA, Const(ca)), Binary(lb, "=", Const(cb))) if la == lb =>
      val holds = (ca, cb) match {
        case (HNumber(x), HNumber(y)) => Ops.Comparisons(opA) && cmpNum(y, Ops.swap(opA), x)
        case (HText(x), HText(y))     => Ops.Comparisons(opA) && cmpStr(y, Ops.swap(opA), x)
        case _ => false
      }
      if (holds) Wider else NotEqual

    // has widening: a's list ⊇ b's list (AstComparationTest.scala:30)
    case (Binary(la, "has", Const(HList(ia))), Binary(lb, "has", Const(HList(ib))))
        if la == lb =>
      if (ib.toSet.subsetOf(ia.toSet)) Wider else NotEqual
    // has-not widening: a's list ⊆ b's list (fewer exclusions is wider)
    case (Binary(la, "has not", Const(HList(ia))), Binary(lb, "has not", Const(HList(ib))))
        if la == lb =>
      if (ia.toSet.subsetOf(ib.toSet)) Wider else NotEqual

    // or-widening: a = (x or y) is wider than b if either branch is
    // wider-or-equal to b (Comparation.scala:143-157)
    case (Binary(l, "or", r), bb) =>
      if (compare(l, bb) != NotEqual || compare(r, bb) != NotEqual) Wider
      else NotEqual

    // and-narrowing: b = (x and y) is narrower than a if a is
    // wider-or-equal to either conjunct (Comparation.scala:159-172)
    case (aa, Binary(l, "and", r)) =>
      if (compare(aa, l) != NotEqual || compare(aa, r) != NotEqual) Wider
      else NotEqual

    case _ => NotEqual
  }

  /** Validation of a filter expression against an empty context
    * (IndexLogic.scala:71-79: HEval with empty bindings, tolerating only
    * EvalIdentifierNotFound): parse must succeed, operators and functions
    * must be known with plausible arity, and any identifier-free,
    * function-free subtree must actually evaluate (so `5 and 4` is
    * rejected like the reference's eval error, while `x and b > 5` passes
    * on unresolved identifiers alone). */
  def validate(filter: String): Boolean =
    HqlParser.parse(filter).toOption.exists(semanticallyValid)

  private val KnownOps: Set[String] =
    Ops.Comparisons ++ Set("and", "or", "has", "has not", "+", "-", "*", "/", "%")

  /** name → (minArity, maxArity) of the translator's function surface. */
  private val KnownFuncs: Map[String, (Int, Int)] = Map(
    "length" -> (1, 1), "lower" -> (1, 1), "upper" -> (1, 1),
    "trim" -> (1, 1), "abs" -> (1, 1), "ceil" -> (1, 1), "floor" -> (1, 1),
    "round" -> (1, 2), "substr" -> (2, 3), "substring" -> (2, 3),
    "startswith" -> (2, 2), "endswith" -> (2, 2), "contains" -> (2, 2),
    "concat" -> (1, Int.MaxValue), "coalesce" -> (1, Int.MaxValue))

  def semanticallyValid(ast: Ast): Boolean = {
    def hasFunc(t: Ast): Boolean = t match {
      case _: Func => true
      case Binary(l, _, r) => hasFunc(l) || hasFunc(r)
      case Unary(_, a) => hasFunc(a)
      case _ => false
    }
    def constEvalOk(t: Ast): Boolean =
      !t.isConstant || hasFunc(t) || evalConst(t).isDefined
    def walk(t: Ast): Boolean = t match {
      case _: Const | _: Ident => true
      case u @ Unary(op, a) =>
        Set("-", "!")(op) && walk(a) && constEvalOk(u)
      case b @ Binary(l, op, r) =>
        KnownOps(op) && walk(l) && walk(r) && constEvalOk(b)
      case Func(name, args) =>
        KnownFuncs.get(name.toLowerCase).exists { case (lo, hi) =>
          args.size >= lo && args.size <= hi
        } && args.forall(walk)
    }
    walk(ast)
  }
}

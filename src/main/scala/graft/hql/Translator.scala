package graft.hql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Resolves an HQL identifier to a Spark Column.
  *
  * Two deployment shapes:
  *  - [[FieldResolver.struct]]: documents with a known (struct) schema —
  *    identifiers become typed column references; comparisons rely on the
  *    native column type.
  *  - [[FieldResolver.json]]: schema-free JSON bodies (the reference's
  *    native shape, scheme.cql:7 stores bodies as JSON text) — identifiers
  *    become `get_json_object` extractions; the translator drives casts
  *    from constant types, mirroring the reference's dynamic comparison
  *    rule (numbers compare as BigDecimal iff both sides numeric, else
  *    text; HyperbusAdapter.scala:341-376).
  */
trait FieldResolver {
  /** Column for the identifier, or None if statically known to be absent. */
  def resolve(ident: Ident): Option[Column]
  /** Static type of the identifier when known (struct schema). */
  def dataTypeOf(ident: Ident): Option[DataType] = None
  /** True when the resolved column is untyped JSON text (needs casts). */
  def isDynamic: Boolean
}

object FieldResolver {
  /** Identifiers map to (possibly nested) fields of a struct-typed row. */
  def struct(schema: StructType): FieldResolver = new FieldResolver {
    val isDynamic = false
    private def walk(dt: DataType, segs: Seq[String]): Option[DataType] =
      (dt, segs) match {
        case (d, Seq()) => Some(d)
        case (s: StructType, head +: tail) =>
          s.fields.find(_.name == head).flatMap(f => walk(f.dataType, tail))
        case _ => None
      }
    def resolve(ident: Ident): Option[Column] =
      walk(schema, ident.segments).map(_ => col(ident.name))
    override def dataTypeOf(ident: Ident): Option[DataType] =
      walk(schema, ident.segments)
  }

  /** Identifiers map to JSONPath extractions from a JSON-text column. */
  def json(body: Column): FieldResolver = new FieldResolver {
    val isDynamic = true
    def resolve(ident: Ident): Option[Column] =
      Some(get_json_object(body, "$." + ident.segments.mkString(".")))
  }

  /** Materialize every identifier in `idents` out of a JSON-text `body`
    * column with ONE parse per row, and resolve against the materialized
    * columns.
    *
    * The plain [[json]] resolver plants an independent `get_json_object`
    * per identifier occurrence — a filter + sort + guard over the same body
    * re-parses the JSON once per expression per row per action (Jackson
    * parser creation dominates the task profile on JSON-heavy scans; CSE
    * does not cross operator boundaries). Top-level fields ride a single
    * `json_tuple` generator (one parse extracts them all); nested paths
    * fall back to `get_json_object` (both return identical JSON-text
    * scalars). Callers drop `helperCols` before exposing rows. */
  def materializedJson(df: DataFrame, body: Column, idents: Seq[Ident])
      : (DataFrame, FieldResolver, Seq[String]) = {
    val distinct = idents.distinct
    val names = distinct.zipWithIndex
      .map { case (i, n) => i -> s"__jf$n" }.toMap
    val (tops, nested) = distinct.partition(_.segments.size == 1)
    val withTops =
      if (tops.isEmpty) df
      else df.select(col("*"),
        json_tuple(body, tops.map(_.segments.head): _*)
          .as(tops.map(names)))
    val out = nested.foldLeft(withTops) { (d, i) =>
      d.withColumn(names(i),
        get_json_object(body, "$." + i.segments.mkString(".")))
    }
    val resolver = new FieldResolver {
      val isDynamic = true
      def resolve(ident: Ident): Option[Column] = Some(
        names.get(ident).map(col).getOrElse(
          get_json_object(body, "$." + ident.segments.mkString("."))))
    }
    (out, resolver, distinct.map(names))
  }
}

/** HQL AST → Catalyst Column.
  *
  * Semantics mirrored from the reference:
  *  - Row-level eval failure ⇒ row rejected (HyperbusAdapter.scala:235-244):
  *    achieved by null-safe translation — the caller should wrap the final
  *    predicate in [[Translator.asPredicate]] which coalesces null→false.
  *  - Unknown identifier ⇒ eval error ⇒ row rejected, even under `or`
  *    (HEval throws EvalIdentifierNotFound): statically-absent identifiers
  *    therefore force the whole predicate to `false`.
  *  - `x has [a,b]` ⇒ ANY/intersects: scalar x ∈ list, or list-valued x
  *    shares at least one element with the list; `has not` negates (see
  *    [[Translator.has]] for why ANY matches the reference).
  *  - Numeric comparisons on dynamic (JSON) fields follow "decimal iff both
  *    numbers, else text" (IndexLogic.scala:179, CollectionOrdering
  *    HyperbusAdapter.scala:341-376).
  */
object Translator {

  def constColumn(v: HValue): Column = v match {
    case HText(s)   => lit(s)
    case HNumber(n) => lit(n.bigDecimal) // decimal literal, exact
    case HBool(b)   => lit(b)
    case HNull      => lit(null)
    case HList(xs)  => array(xs.map(constColumn): _*)
  }

  /** Translate a full filter expression into a boolean predicate Column:
    * null (eval failure) collapses to false, like the reference's
    * "row rejected on eval error".
    *
    * The reference evaluates the WHOLE expression per row and rejects on
    * any eval error (HEval, HyperbusAdapter.scala:238-242 catch ⇒ false):
    * a missing identifier or a non-boolean value in boolean position
    * fails the row EVEN under `or`. Spark's three-valued logic would keep
    * `a = 1 or b = 2` when a = 1 and b is absent, so the translated
    * predicate is conjoined with per-row eval guards. */
  def predicate(ast: Ast, resolver: FieldResolver): Column = {
    if (hasUnknownIdent(ast, resolver)) return lit(false)
    (asPredicate(translate(ast, resolver)) +: evalGuards(ast, resolver))
      .reduce(_ && _)
  }

  /** Per-row validity conditions the reference's evaluator enforces:
    * every referenced identifier resolves to a value, and every operand in
    * boolean position (and/or/not, or the root) is an actual boolean. */
  private def evalGuards(ast: Ast, r: FieldResolver): Seq[Column] = {
    if (!r.isDynamic) return Nil // typed schemas are checked statically
    val identGuards =
      ast.identifiers.distinct.flatMap(r.resolve).map(_.isNotNull)
    val truthy = boolPositions(ast).map { a =>
      val c = translate(a, r).cast(StringType)
      c === "true" || c === "false" // HEval asBoolean throws on non-bool
    }
    identGuards ++ truthy
  }

  /** Subexpressions evaluated for TRUTHINESS: operands of and/or/not (and
    * the root) that aren't themselves boolean-producing expressions. */
  private def boolPositions(ast: Ast): Seq[Ast] = ast match {
    case Binary(l, "and" | "or", r) => boolPositions(l) ++ boolPositions(r)
    case Unary("!", a)              => boolPositions(a)
    case Binary(_, op, _)
      if Ops.Comparisons.contains(op) || op == "has" || op == "has not" => Nil
    case other => Seq(other) // bare ident / func / arithmetic / const
  }

  /** Convenience: parse + predicate. */
  def predicate(filter: String, resolver: FieldResolver): Column =
    predicate(HqlParser(filter), resolver)

  def asPredicate(c: Column): Column =
    coalesce(c.cast(BooleanType), lit(false))

  private def hasUnknownIdent(ast: Ast, r: FieldResolver): Boolean =
    ast.identifiers.exists(i => r.resolve(i).isEmpty)

  def translate(ast: Ast, r: FieldResolver): Column = ast match {
    case Const(v) => constColumn(v)
    case i: Ident =>
      r.resolve(i).getOrElse(lit(null))
    case Unary("-", a) => -translate(a, r)
    case Unary("!", a) => !asBool(translate(a, r), isDyn = r.isDynamic)
    case Unary(op, _)  => sys.error(s"unsupported unary op: $op")

    case Binary(l, "and", rr) =>
      asBool(translate(l, r), r.isDynamic) && asBool(translate(rr, r), r.isDynamic)
    case Binary(l, "or", rr) =>
      asBool(translate(l, r), r.isDynamic) || asBool(translate(rr, r), r.isDynamic)

    case Binary(l, op, rr) if Ops.Comparisons.contains(op) =>
      comparison(l, op, rr, r)

    case Binary(l, "has", rr)     => has(l, rr, r)
    case Binary(l, "has not", rr) => !has(l, rr, r)

    case Binary(l, op @ ("+" | "-" | "*" | "/" | "%"), rr) =>
      val (lc, rc) = numericPair(l, rr, r)
      op match {
        case "+" => lc + rc; case "-" => lc - rc; case "*" => lc * rc
        case "/" => lc / rc; case "%" => lc % rc
      }

    case Func(name, args) => function(name, args, r)
    case Binary(_, op, _) => sys.error(s"unsupported binary op: $op")
  }

  /** Truthiness for bare identifiers in boolean position
    * (`x or y`, AstComparationTest.scala:38). */
  private def asBool(c: Column, isDyn: Boolean): Column =
    if (isDyn) {
      // JSON text: "true"/"false" strings, else non-null non-"false" is truthy
      when(c.isNull, lit(null)).otherwise(c.cast(StringType) === "true")
    } else c.cast(BooleanType)

  private def comparison(l: Ast, op: String, rt: Ast, r: FieldResolver): Column = {
    def applyOp(lc: Column, rc: Column): Column = op match {
      case "="  => lc === rc
      case "!=" => lc =!= rc
      case ">"  => lc > rc
      case ">=" => lc >= rc
      case "<"  => lc < rc
      case "<=" => lc <= rc
    }
    dynamicPair(l, rt, r) match {
      case Some((ls, rs, ld, rd)) =>
        // ident-vs-ident on dynamic JSON: decimal compare iff BOTH sides
        // parse as numbers, otherwise string compare — the reference's
        // "BigDecimal iff both numbers else asString"
        // (IndexLogic.scala:179; CollectionOrdering HyperbusAdapter:370-375)
        when(ld.isNotNull && rd.isNotNull, applyOp(ld, rd))
          .otherwise(applyOp(ls, rs))
      case None =>
        val (lc, rc) = alignForComparison(l, rt, r)
        applyOp(lc, rc)
    }
  }

  /** For a dynamic resolver with no typed constant on either side, both
    * operands are untyped JSON text: return (text, text, decimal?, decimal?)
    * so the comparison can branch per row. */
  private def dynamicPair(
      l: Ast, rt: Ast, r: FieldResolver): Option[(Column, Column, Column, Column)] = {
    def typedConst(a: Ast): Boolean = a match {
      case Const(_) => true
      case Unary("-", Const(HNumber(_))) => true
      case _ => false
    }
    if (!r.isDynamic || typedConst(l) || typedConst(rt)) None
    else {
      val ls = translate(l, r).cast(StringType)
      val rs = translate(rt, r).cast(StringType)
      Some((ls, rs, ls.try_cast(Dec), rs.try_cast(Dec)))
    }
  }

  private val Dec = DecimalType(38, 18)

  /** Align two operand columns for comparison. On a dynamic resolver the
    * constant's type decides: numeric constant ⇒ decimal compare
    * (try_cast so non-numeric rows yield null ⇒ rejected), string constant
    * ⇒ text compare — reference rule "BigDecimal iff both numbers else
    * string" (HyperbusAdapter.scala:350-366). */
  private def alignForComparison(l: Ast, rt: Ast, r: FieldResolver): (Column, Column) = {
    def numConst(a: Ast): Boolean = a match {
      case Const(HNumber(_)) => true
      case Unary("-", Const(HNumber(_))) => true
      case _ => false
    }
    val lc = translate(l, r); val rc = translate(rt, r)
    if (!r.isDynamic) (lc, rc)
    else if (numConst(l) || numConst(rt))
      (tryDec(lc, numConst(l)), tryDec(rc, numConst(rt)))
    else (lc.cast(StringType), rc.cast(StringType)) // string const ⇒ text compare
  }

  private def tryCastDec(c: Column): Column = c.cast(StringType).try_cast(Dec)

  private def tryDec(c: Column, isConst: Boolean): Column =
    if (isConst) c.cast(Dec) else tryCastDec(c)

  private def numericPair(l: Ast, rt: Ast, r: FieldResolver): (Column, Column) = {
    val lc = translate(l, r); val rc = translate(rt, r)
    if (r.isDynamic) (tryCastDec(lc), tryCastDec(rc)) else (lc, rc)
  }

  /** `x has [..]` — ANY/intersects semantics: scalar x ⇒ x ∈ list;
    * list-valued x ⇒ ∃ element of x in the list; `has not` negates. This is
    * what's consistent with the reference comparator's widening rules
    * (AstComparationTest.scala:30-31: `has [1,2,3]` is Wider than
    * `has [1,2]`, and `has not [1,2,3]` Wider than `has not [1,2,3,4]` —
    * both only hold under ANY semantics). */
  private def has(l: Ast, rt: Ast, r: FieldResolver): Column = {
    val lc = translate(l, r)
    val isArray = l match {
      case i: Ident => r.dataTypeOf(i).exists(_.isInstanceOf[ArrayType])
      case _        => false
    }
    rt match {
      case Const(HList(items)) =>
        if (r.isDynamic) {
          // JSON value extracted as text: either a JSON list "[1,2,3]" or a
          // scalar. Number items compare NUMERICALLY (reference HNumber ==
          // via BigDecimal: `x has [1]` matches {"x":1.0}); others
          // textually. (JSON-text extraction can't distinguish "1" from 1,
          // so numeric-looking strings also match number items — the one
          // divergence from the typed reference model.)
          val arr = from_json(lc.cast(StringType), ArrayType(StringType))
          items.map {
            case HNumber(n) =>
              val nl = lit(n.bigDecimal)
              when(arr.isNotNull, exists(arr, e => e.try_cast(Dec) === nl))
                .otherwise(tryCastDec(lc) === nl)
            case v =>
              val s = v match {
                case HText(t) => lit(t)
                case HBool(b) => lit(b.toString)
                case HNull => lit("null")
                case l: HList => lit(l.render)
                case _: HNumber => lit(null) // unreachable
              }
              when(arr.isNotNull, array_contains(arr, s))
                .otherwise(lc.cast(StringType) === s)
          }.reduce(_ || _)
        } else if (isArray) {
          items.map(v => array_contains(lc, constColumn(v))).reduce(_ || _)
        } else {
          lc.isin(items.map {
            case HText(t) => t; case HNumber(n) => n; case HBool(b) => b
            case HNull => null; case l: HList => l.render
          }: _*)
        }
      case other =>
        val rc = translate(other, r)
        if (isArray) array_contains(lc, rc) else lc === rc
    }
  }

  private def function(name: String, args: Seq[Ast], r: FieldResolver): Column = {
    val cols = args.map(a => translate(a, r))
    def s(i: Int) = cols(i).cast(StringType)
    def d(i: Int) = if (r.isDynamic) tryCastDec(cols(i)) else cols(i)
    name.toLowerCase match {
      case "length"     => length(s(0)).cast(Dec)
      case "lower"      => lower(s(0))
      case "upper"      => upper(s(0))
      case "trim"       => trim(s(0))
      case "abs"        => abs(d(0))
      case "round"      => round(d(0), if (cols.size > 1) args(1) match {
        case Const(HNumber(n)) => n.toInt; case _ => 0
      } else 0)
      case "ceil"       => ceil(d(0)).cast(Dec)
      case "floor"      => floor(d(0)).cast(Dec)
      case "concat"     => concat(cols.indices.map(s): _*)
      case "substr" | "substring" =>
        substring(s(0), d(1).cast("int"), if (cols.size > 2) d(2).cast("int") else lit(Int.MaxValue))
      case "startswith" => s(0).startsWith(s(1))
      case "endswith"   => s(0).endsWith(s(1))
      case "contains"   => s(0).contains(s(1))
      case "coalesce"   => coalesce(cols: _*)
      case other        => sys.error(s"unsupported function: $other")
    }
  }
}

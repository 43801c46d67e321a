package graft

import graft.engine.{JsonMergePatch, JsonNullStrip}
import graft.functions.{BitsetContains, BottomKDistinct, BottomKPairs, CdcChunks, CharWindows, CmsCounters, DotProduct, EwmaArray, HllRegisters, NgramStats, SeqSum, TermCounts, TokenStats, WordChunks, WordPairs, WordShingles}
import graft.hql.{FieldResolver, Translator}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the engine's custom expressions, both as a
  * `spark.sql.extensions=graft.GraftExtensions` plug-in and as an
  * imperative [[GraftFunctions.register]] for existing sessions:
  *
  *   SELECT dot_product(a, b)                -- codegen'd vector dot
  *   SELECT json_merge_patch(body, patch)    -- RFC-7386-style shallow merge
  *   SELECT json_null_strip(body)            -- recursive null removal
  *   SELECT hql(body, 'a > 5 and b = "x"')   -- the reference's filter
  *                                           -- language as a SQL predicate
  *   SELECT word_shingles(text, 3)           -- distinct word n-grams
  *   SELECT char_windows(text, 40, 10)       -- stride-sampled char windows
  *   SELECT token_stats(text)                -- [total, distinct, top]
  *   SELECT ngram_stats(text, 2)             -- [total, distinct, top,
  *                                           --  top-gram chars] (Gopher
  *                                           --  repetition gates)
  *   SELECT word_pairs(text)                 -- adjacent bigrams, repeats kept
  *   SELECT bitset_contains(bits, pos)       -- O(1) Bloom-bit probe
  *   SELECT word_chunks(text, 120)           -- fixed-width word chunks
  *   SELECT cdc_chunks(text, 6)              -- content-defined chunking
  *   SELECT term_counts(text, array('a','b'))-- per-term tf vector (BM25)
  *   SELECT seq_sum(xs)                      -- left-to-right double fold
  *                                           -- (order-pinned, replayable)
  *
  * plus the sketch aggregates: bottom_k_distinct (KMV), bottom_k_pairs
  * (KMV with payload), hll_registers, cms_counters, and ewma(xs, alpha).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach(ext.injectFunction)
}

object GraftFunctions {
  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getName, name)

  /** `hql(jsonBody, 'filter')` — the filter string must be a literal; it
    * parses at plan time into native Catalyst expressions (no UDF). */
  private def hqlBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(body, Literal(s: UTF8String, StringType)) =>
      Bridge.resolvedExpression(
        Translator.predicate(s.toString, FieldResolver.json(Bridge.column(body))))
    case _ => throw new IllegalArgumentException(
      "hql(body, 'filter') expects a JSON column and a literal filter string")
  }

  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args =>
      if (args.size == n) b(args)
      else throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.size}")

  val definitions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("dot_product"), info("dot_product", classOf[DotProduct]),
        arity("dot_product", 2)(args => DotProduct(args(0), args(1)))),
      (FunctionIdentifier("json_merge_patch"),
        info("json_merge_patch", classOf[JsonMergePatch]),
        arity("json_merge_patch", 2)(args => JsonMergePatch(args(0), args(1)))),
      (FunctionIdentifier("json_null_strip"),
        info("json_null_strip", classOf[JsonNullStrip]),
        arity("json_null_strip", 1)(args => JsonNullStrip(args(0)))),
      (FunctionIdentifier("hql"), info("hql", Translator.getClass),
        arity("hql", 2)(hqlBuilder)),
      (FunctionIdentifier("word_shingles"),
        info("word_shingles", classOf[WordShingles]),
        arity("word_shingles", 2)(args =>
          WordShingles(args(0), intLit(args(1), "word_shingles(text, n)")))),
      (FunctionIdentifier("char_windows"),
        info("char_windows", classOf[CharWindows]),
        arity("char_windows", 3)(args =>
          CharWindows(args(0), intLit(args(1), "char_windows width"),
            intLit(args(2), "char_windows stride")))),
      (FunctionIdentifier("token_stats"),
        info("token_stats", classOf[TokenStats]),
        arity("token_stats", 1)(args => TokenStats(args(0)))),
      (FunctionIdentifier("ngram_stats"),
        info("ngram_stats", classOf[NgramStats]),
        arity("ngram_stats", 2)(args =>
          NgramStats(args(0), intLit(args(1), "ngram_stats n")))),
      (FunctionIdentifier("word_pairs"),
        info("word_pairs", classOf[WordPairs]),
        arity("word_pairs", 1)(args => WordPairs(args(0)))),
      (FunctionIdentifier("bitset_contains"),
        info("bitset_contains", classOf[BitsetContains]),
        arity("bitset_contains", 2)(args => BitsetContains(args(0), args(1)))),
      (FunctionIdentifier("ewma"),
        info("ewma", classOf[EwmaArray]),
        arity("ewma", 2)(args =>
          EwmaArray(args(0), doubleLit(args(1), "ewma alpha")))),
      // sketch AGGREGATES: the registry takes the bare AggregateFunction —
      // the analyzer wraps it in an AggregateExpression, exactly as for
      // the built-in sum/avg entries
      (FunctionIdentifier("bottom_k_distinct"),
        info("bottom_k_distinct", classOf[BottomKDistinct]),
        arity("bottom_k_distinct", 2)(args =>
          BottomKDistinct(args(0), intLit(args(1), "bottom_k_distinct k")))),
      (FunctionIdentifier("hll_registers"),
        info("hll_registers", classOf[HllRegisters]),
        arity("hll_registers", 2)(args =>
          HllRegisters(args(0), intLit(args(1), "hll_registers p")))),
      (FunctionIdentifier("cms_counters"),
        info("cms_counters", classOf[CmsCounters]),
        arity("cms_counters", 3)(args =>
          CmsCounters(args(0), intLit(args(1), "cms_counters d"),
            intLit(args(2), "cms_counters wlog")))),
      (FunctionIdentifier("word_chunks"),
        info("word_chunks", classOf[WordChunks]),
        arity("word_chunks", 2)(args =>
          WordChunks(args(0), intLit(args(1), "word_chunks width")))),
      (FunctionIdentifier("cdc_chunks"),
        info("cdc_chunks", classOf[CdcChunks]),
        arity("cdc_chunks", 2)(args =>
          CdcChunks(args(0), intLit(args(1), "cdc_chunks maskBits")))),
      (FunctionIdentifier("term_counts"),
        info("term_counts", classOf[TermCounts]),
        arity("term_counts", 2)(args =>
          TermCounts(args(0), stringArrayLit(args(1), "term_counts terms")))),
      (FunctionIdentifier("seq_sum"),
        info("seq_sum", classOf[SeqSum]),
        arity("seq_sum", 1)(args => SeqSum(args(0)))),
      (FunctionIdentifier("bottom_k_pairs"),
        info("bottom_k_pairs", classOf[BottomKPairs]),
        arity("bottom_k_pairs", 3)(args =>
          BottomKPairs(args(0), args(1), intLit(args(2), "bottom_k_pairs k")))))

  /** Kernel size parameters fix the generated code, so they must be
    * plan-time literals. */
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(i: Int, org.apache.spark.sql.types.IntegerType) => i
    case _ => throw new IllegalArgumentException(
      s"$what expects a literal integer, got $e")
  }

  /** The kernel's term lookup is compiled at plan time, so the term list
    * must be a literal array (`array('a','b')` folds to one). */
  private def stringArrayLit(e: Expression, what: String): Seq[String] = e match {
    case Literal(a: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(StringType, _)) =>
      // a folded array literal can carry null elements (array('a', NULL)
      // constant-folds before reaching this branch) — raise the same
      // clean IllegalArgumentException the CreateArray branch does
      // instead of an opaque NPE from the UTF8String map
      a.toArray[UTF8String](StringType).map { u =>
        if (u == null) throw new IllegalArgumentException(
          s"$what expects non-null string literals")
        u.toString
      }.toSeq
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _)
        if children.forall(_.isInstanceOf[Literal]) =>
      children.map { case Literal(s: UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"$what expects string literals, got $other") }
    case _ => throw new IllegalArgumentException(
      s"$what expects a literal string array, got $e")
  }

  private def doubleLit(e: Expression, what: String): Double = e match {
    case Literal(d: Double, org.apache.spark.sql.types.DoubleType) => d
    case Literal(d: java.math.BigDecimal, _) => d.doubleValue
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case Literal(i: Int, org.apache.spark.sql.types.IntegerType) => i.toDouble
    case Literal(l: Long, org.apache.spark.sql.types.LongType) => l.toDouble
    case _ => throw new IllegalArgumentException(
      s"$what expects a literal number, got $e")
  }

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

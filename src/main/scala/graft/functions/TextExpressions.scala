package graft.functions

import java.util.{Arrays => JArrays, HashSet => JHashSet, LinkedHashSet => JLinkedHashSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Imperative per-row text kernels called from generated code.
  *
  * Why these exist: Spark's higher-order functions (`transform`,
  * `aggregate`, `filter`) are `CodegenFallback` — they evaluate through the
  * interpreted `Expression.eval` tree, k × |tokens| megamorphic virtual
  * dispatches per row. Besides the steady-state ~10× cost, that path is the
  * trigger of the intra-session throughput collapse we measured (a warm
  * session's C2-compiled eval methods deoptimize when later queries load
  * new generated classes into the same call sites; whole runs then execute
  * at bytecode-interpreter speed — observed 20-50× wall-time outliers on
  * `dedup_minhash_lsh`, stack-dump-confirmed in `ArrayTransform.nullSafeEval`).
  * A single static, monomorphic kernel call per row keeps its own stable
  * JIT profile and cannot be polluted by unrelated queries. */
object TextKernels {
  private val Space = UTF8String.fromString(" ")
  private val WsRegex = UTF8String.fromString("\\s+")

  /** Distinct word n-gram shingles, first-occurrence order — exact value
    * parity with
    * `array_distinct(transform(sequence(0, size(toks)-n), i => concat_ws(" ", slice(toks, i+1, n))))`
    * over `toks = split(text, " ")`, with the whole-text fallback for rows
    * shorter than n. */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.split(Space, -1)
    if (toks.length >= n) {
      val set = new JLinkedHashSet[UTF8String]()
      var i = 0
      val last = toks.length - n
      while (i <= last) {
        set.add(UTF8String.concatWs(Space, JArrays.copyOfRange(toks, i, i + n): _*))
        i += 1
      }
      new GenericArrayData(set.toArray())
    } else new GenericArrayData(Array[Any](text))
  }

  /** Adjacent word pairs ("w1 w2" strings) over the NON-EMPTY single-space
    * tokens, repeats kept (bigram counting needs multiplicity — unlike
    * [[wordShingles]], which dedupes into a set). Exact value parity with
    * DuckDB's `[t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]` over
    * `t = list_filter(string_split(text, ' '), t -> t != '')`; fewer than
    * two tokens ⇒ empty array (no whole-text fallback). */
  def wordPairs(text: UTF8String): ArrayData = {
    val raw = text.split(Space, -1)
    var n = 0
    var i = 0
    while (i < raw.length) { // compact non-empty tokens in place
      if (raw(i).numBytes() > 0) { raw(n) = raw(i); n += 1 }
      i += 1
    }
    if (n >= 2) {
      val out = new Array[Any](n - 1)
      i = 0
      while (i < n - 1) {
        out(i) = UTF8String.concatWs(Space, raw(i), raw(i + 1))
        i += 1
      }
      new GenericArrayData(out)
    } else new GenericArrayData(Array.empty[Any])
  }

  /** Single-pass per-document token statistics over single-space tokens:
    * `[total, distinct, topCount]` (top = the most frequent token's
    * count; single-space split, like DuckDB's `string_split(text, ' ')` —
    * empty text yields one empty token in both). The Gopher/C4-style
    * repetition metrics
    * (unique-token ratio, top-token dominance) derive from these three
    * numbers — computed HERE per row, shuffle-free, instead of the
    * explode→groupBy(doc,token)→re-groupBy(doc) formulation that moves
    * the whole tokenized corpus through two shuffles. */
  def tokenStats(text: UTF8String): ArrayData = {
    val toks = text.split(Space, -1)
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var top = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, (a: Integer, b: Integer) => a + b)
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array[Any](
      toks.length.toLong, counts.size.toLong, top.toLong))
  }

  /** Single-pass per-document word n-gram REPETITION statistics over
    * single-space tokens: `[totalGrams, distinctGrams, topCount,
    * topGramChars]` — grams are space-joined adjacent n-token windows
    * WITH multiplicity (repetition counting needs repeats, unlike
    * [[wordShingles]]' set). `topCount` is the most frequent gram's
    * count; among equal counts the lexicographically SMALLEST gram is
    * the top (deterministic, so `topGramChars` — its codepoint length —
    * replays in SQL via ORDER BY cnt DESC, gram ASC). The Gopher
    * duplicate-n-gram gates (dup-gram fraction, top-gram character
    * dominance) derive from these four numbers per ROW, shuffle-free —
    * never an explode→groupBy(doc, gram)→re-groupBy(doc) double
    * shuffle of the whole grammed corpus. Texts with fewer than n
    * tokens yield [0, 0, 0, 0]. */
  def ngramStats(text: UTF8String, n: Int): ArrayData = {
    val toks = text.split(Space, -1)
    val total = toks.length - n + 1
    if (total <= 0)
      new GenericArrayData(Array[Any](0L, 0L, 0L, 0L))
    else {
      val counts = new java.util.HashMap[UTF8String, Integer]()
      var top: UTF8String = null
      var topC = 0
      var i = 0
      while (i < total) {
        val g = UTF8String.concatWs(Space,
          JArrays.copyOfRange(toks, i, i + n): _*)
        val c: Int = counts.merge(g, 1, (a: Integer, b: Integer) => a + b)
        // incremental (count DESC, gram ASC) argmax: a strictly higher
        // count always wins; at the current max, the smaller gram wins —
        // equivalent to the final-counts ordering because counts only grow
        if (c > topC || (c == topC && g.compareTo(top) < 0)) {
          top = g; topC = c
        }
        i += 1
      }
      new GenericArrayData(Array[Any](total.toLong, counts.size.toLong,
        topC.toLong, top.numChars().toLong))
    }
  }

  /** Distinct fixed-width character windows sampled every `stride`
    * characters, first-occurrence order — the unit of exact-substring
    * (memorized-span) duplicate detection. Exact value parity with
    * DuckDB's
    * `list_distinct([substr(text, p, width) FOR p IN range(1, len - width + 2, stride)])`
    * (SQL SUBSTRING semantics: codepoint positions, 1-based). Texts
    * shorter than `width` yield an empty set. */
  def charWindows(text: UTF8String, width: Int, stride: Int): ArrayData = {
    val n = text.numChars()
    if (n < width) new GenericArrayData(Array.empty[Any])
    else {
      val set = new JLinkedHashSet[UTF8String]()
      var p = 0
      while (p + width <= n) {
        set.add(text.substringSQL(p + 1, width))
        p += stride
      }
      new GenericArrayData(set.toArray())
    }
  }

  /** Consecutive non-overlapping `w`-word chunks of single-space tokens,
    * in document order and NOT deduplicated (a chunk repeated within a
    * document is a distinct line occurrence; the trailing partial chunk is
    * kept). The pseudo-paragraph segmentation for corpora without real
    * line structure — exact value parity with DuckDB's
    * `[array_to_string(t[w*i+1 : w*i+w], ' ') FOR i IN range(0, CAST(ceil(len(t)/w) AS INT))]`
    * over `t = string_split(text, ' ')`. */
  def wordChunks(text: UTF8String, w: Int): ArrayData = {
    val toks = text.split(Space, -1)
    val nChunks = (toks.length + w - 1) / w
    val out = new Array[Any](nChunks)
    var i = 0
    while (i < nChunks) {
      val from = i * w
      val until = math.min(from + w, toks.length)
      out(i) = UTF8String.concatWs(Space, JArrays.copyOfRange(toks, from, until): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The 60-bit md5 token hash (first 15 hex chars of md5 as an integer —
    * the Dedup.md5TokenHash convention) over raw UTF-8 bytes: the first
    * 15 hex chars are exactly the top 60 bits of the digest. */
  def md5Hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Content-defined chunks of the non-empty single-space tokens: a token
    * whose 60-bit md5 hash ≡ 0 (mod 2^maskBits) CLOSES the current chunk
    * (boundary token included, chunk flushed after it); the trailing
    * partial chunk is kept. Exact value parity with the
    * explode → boundary window → groupBy collect_list formulation it
    * replaces — computed per ROW, so the corpus never explodes into
    * token rows and the per-doc window/reassembly shuffles disappear. */
  def cdcChunks(text: UTF8String, maskBits: Int): ArrayData = {
    val raw = text.split(Space, -1)
    val mask = (1L << maskBits) - 1L
    val out = new java.util.ArrayList[Any]()
    val cur = new java.util.ArrayList[UTF8String]()
    def flush(): Unit = {
      if (!cur.isEmpty) {
        out.add(UTF8String.concatWs(Space,
          cur.toArray(new Array[UTF8String](cur.size())): _*))
        cur.clear()
      }
    }
    var i = 0
    while (i < raw.length) {
      val tok = raw(i)
      if (tok.numBytes() > 0) {
        cur.add(tok)
        if ((md5Hash60(tok.getBytes) & mask) == 0L) flush()
      }
      i += 1
    }
    flush()
    new GenericArrayData(out.toArray())
  }

  /** Occurrence counts of each lookup term among the single-space tokens
    * of `text`, aligned with the plan-time term list — one hash probe per
    * token, one pass. Replaces the explode→broadcast-join→groupBy(doc,
    * term) postings formulation for PLAN-TIME term sets (BM25): the
    * per-(doc, term) tf is computed inside the scan, so the corpus never
    * explodes into per-token rows and the (doc, term) aggregation shuffle
    * disappears. Exact value parity with
    * `SUM(CASE WHEN tok = term THEN 1 ...)` over `split(text, ' ')`. */
  def termCounts(text: UTF8String,
      lookup: java.util.HashMap[UTF8String, Integer], k: Int): ArrayData = {
    val toks = text.split(Space, -1)
    val counts = new Array[Long](k)
    var i = 0
    while (i < toks.length) {
      val idx = lookup.get(toks(i))
      if (idx != null) counts(idx.intValue()) += 1L
      i += 1
    }
    new GenericArrayData(counts.map(c => c: java.lang.Long).toArray[Any])
  }

  /** Remove every line present in `drop` from `lines`, preserving order
    * and multiplicity of the kept lines; returns [joined text, kept
    * count]. The in-row equivalent of the anti-join → groupBy →
    * ordered-collect reassembly it replaces (boilerplate line removal):
    * the drop set arrives as a BROADCAST, so the corpus is never
    * exploded into line rows or reassembled through a shuffle. */
  def removeLines(lines: ArrayData, drop: JHashSet[UTF8String],
      sep: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val n = lines.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val l = lines.getUTF8String(i)
      if (!drop.contains(l)) kept.add(l)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        UTF8String.concatWs(sep,
          kept.toArray(new Array[UTF8String](kept.size())): _*),
        kept.size().toLong))
  }

  /** Per-set token hit counts over whitespace tokens of
    * `lower(trim(text))` — exact value parity with the per-language
    * `aggregate(split(lower(trim(text)), "\\s+"), …)` fold (tokens hitting
    * a set count once PER OCCURRENCE). One tokenization, one traversal. */
  def tokenSetHits(text: UTF8String, sets: Array[JHashSet[UTF8String]]): ArrayData = {
    val toks = text.trim().toLowerCase().split(WsRegex, -1)
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < toks.length) {
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(toks(i))) counts(j) += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(counts.map(c => c: java.lang.Integer).toArray[Any])
  }
}

/** Codegen'd distinct word n-gram shingles (see [[TextKernels]] for the
  * rationale and the exact HOF expression this replaces value-for-value).
  * NULL text ⇒ NULL shingle set — NULL-text rows drop out of dedup at the
  * downstream explode (the HOF form instead produced `[NULL]`; dedup over
  * a NULL document is meaningless either way, and this form makes the
  * exclusion explicit). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(text: Any): Any =
    TextKernels.wordShingles(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernels.wordShingles($t, $n)")

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** Adjacent word pairs with multiplicity — codegen'd; see
  * [[TextKernels.wordPairs]]. */
case class WordPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_pairs expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(text: Any): Any =
    TextKernels.wordPairs(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernels.wordPairs($t)")

  override protected def withNewChildInternal(c: Expression): WordPairs = copy(child = c)
}

/** Codegen'd per-set token hit counts (see [[TextKernels.tokenSetHits]]).
  * `sets` is fixed at plan time (stopword lists); the lookup HashSets ride
  * into generated code as a reference object. */
case class TokenSetHits(child: Expression, sets: Seq[Seq[String]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_set_hits expects a string input, got ${child.dataType.simpleString}")

  @transient private lazy val lookup: Array[JHashSet[UTF8String]] =
    sets.map { words =>
      val s = new JHashSet[UTF8String]()
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(text: Any): Any =
    TextKernels.tokenSetHits(text.asInstanceOf[UTF8String], lookup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSets", lookup, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernels.tokenSetHits($t, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): TokenSetHits = copy(child = c)
}

/** Codegen'd boilerplate-line removal (see [[TextKernels.removeLines]]):
  * drops every line in the BROADCAST set, rejoins the survivors with
  * `sep`, and returns struct(clean_text, kept_lines). The drop set is
  * runtime data (the cross-document duplicate-line dictionary), so it
  * travels as a proper Broadcast — torrent distribution, one
  * deserialization per executor — not a plan literal. NULL lines ⇒ NULL. */
case class RemoveLines(child: Expression,
    drop: org.apache.spark.broadcast.Broadcast[JHashSet[UTF8String]],
    sep: String) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("kept_lines", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"remove_lines expects array<string>, got ${t.simpleString}")
  }

  @transient private lazy val sepUtf8 = UTF8String.fromString(sep)

  override def nullSafeEval(lines: Any): Any =
    TextKernels.removeLines(lines.asInstanceOf[ArrayData], drop.value, sepUtf8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("dropLines", drop,
      "org.apache.spark.broadcast.Broadcast")
    val s = ctx.addReferenceObj("lineSep", sepUtf8,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.TextKernels.removeLines($x, " +
        s"(java.util.HashSet) $bc.value(), $s)")
  }

  override protected def withNewChildInternal(c: Expression): RemoveLines =
    copy(child = c)
}

/** Codegen'd content-defined chunking (see [[TextKernels.cdcChunks]]).
  * NULL text ⇒ NULL chunk list. */
case class CdcChunks(child: Expression, maskBits: Int)
    extends UnaryExpression {
  require(maskBits >= 1 && maskBits <= 20, s"maskBits in [1,20]: $maskBits")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(text: Any): Any =
    TextKernels.cdcChunks(text.asInstanceOf[UTF8String], maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.TextKernels.cdcChunks($t, $maskBits)")

  override protected def withNewChildInternal(c: Expression): CdcChunks =
    copy(child = c)
}

/** Codegen'd per-term occurrence counts aligned with the plan-time `terms`
  * list (see [[TextKernels.termCounts]]). NULL text ⇒ NULL. */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "term_counts needs at least one term")
  // a duplicate would silently win the lookup slot and zero the others'
  // counts — callers dedupe and map their own indices (Retrieval.slot)
  require(terms.distinct == terms, "term_counts terms must be distinct")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_counts expects a string input, got ${child.dataType.simpleString}")

  @transient private lazy val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), i)
    }
    m
  }

  override def nullSafeEval(text: Any): Any =
    TextKernels.termCounts(text.asInstanceOf[UTF8String], lookup, terms.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termIdx", lookup, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      t => s"graft.functions.TextKernels.termCounts($t, $ref, ${terms.size})")
  }

  override protected def withNewChildInternal(c: Expression): TermCounts =
    copy(child = c)
}

/** Codegen'd single-pass token statistics `[total, distinct, top]` (see
  * [[TextKernels.tokenStats]]). NULL text ⇒ NULL. */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_stats expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(text: Any): Any =
    TextKernels.tokenStats(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernels.tokenStats($t)")

  override protected def withNewChildInternal(c: Expression): TokenStats = copy(child = c)
}

/** Codegen'd word n-gram repetition stats (see [[TextKernels.ngramStats]]).
  * NULL text ⇒ NULL stats. */
case class NgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_stats expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(text: Any): Any =
    TextKernels.ngramStats(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernels.ngramStats($t, $n)")

  override protected def withNewChildInternal(c: Expression): NgramStats =
    copy(child = c)
}

/** Codegen'd non-overlapping word chunks (see [[TextKernels.wordChunks]]).
  * NULL text ⇒ NULL chunk list. */
case class WordChunks(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"chunk width must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_chunks expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(text: Any): Any =
    TextKernels.wordChunks(text.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernels.wordChunks($t, $w)")

  override protected def withNewChildInternal(c: Expression): WordChunks =
    copy(child = c)
}

/** Codegen'd stride-sampled character windows (see
  * [[TextKernels.charWindows]]). NULL text ⇒ NULL window set. */
case class CharWindows(child: Expression, width: Int, stride: Int)
    extends UnaryExpression {
  require(width >= 1, s"window width must be >= 1, got $width")
  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_windows expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(text: Any): Any =
    TextKernels.charWindows(text.asInstanceOf[UTF8String], width, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.TextKernels.charWindows($t, $width, $stride)")

  override protected def withNewChildInternal(c: Expression): CharWindows =
    copy(child = c)
}

object TextFunctions {
  /** Distinct word n-gram shingles of a text column — codegen'd. */
  def word_shingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))

  /** Adjacent word pairs (repeats kept) of a text column — codegen'd. */
  def word_pairs(text: Column): Column =
    Bridge.column(WordPairs(Bridge.expression(text)))

  /** Distinct stride-sampled fixed-width character windows — codegen'd. */
  def char_windows(text: Column, width: Int, stride: Int): Column =
    Bridge.column(CharWindows(Bridge.expression(text), width, stride))

  /** Non-overlapping `w`-word chunks in document order — codegen'd. */
  def word_chunks(text: Column, w: Int): Column =
    Bridge.column(WordChunks(Bridge.expression(text), w))

  /** Hit counts of whitespace tokens (of lower(trim(text))) against each
    * word set — codegen'd; returns array<int> aligned with `sets`. */
  def token_set_hits(text: Column, sets: Seq[Seq[String]]): Column =
    Bridge.column(TokenSetHits(Bridge.expression(text), sets))

  /** Occurrence counts of each plan-time term among single-space tokens —
    * codegen'd; returns array<long> aligned with `terms`. */
  def term_counts(text: Column, terms: Seq[String]): Column =
    Bridge.column(TermCounts(Bridge.expression(text), terms))

  /** Content-defined chunks (60-bit md5 boundaries, expected length
    * ≈ 2^maskBits tokens) — codegen'd. */
  def cdc_chunks(text: Column, maskBits: Int): Column =
    Bridge.column(CdcChunks(Bridge.expression(text), maskBits))

  /** struct(clean_text, kept_lines) after dropping the broadcast line
    * set — codegen'd. */
  def remove_lines(lines: Column,
      drop: org.apache.spark.broadcast.Broadcast[JHashSet[UTF8String]],
      sep: String): Column =
    Bridge.column(RemoveLines(Bridge.expression(lines), drop, sep))

  /** Single-pass token statistics `array<long>[total, distinct, top]` —
    * codegen'd, shuffle-free. */
  def token_stats(text: Column): Column =
    Bridge.column(TokenStats(Bridge.expression(text)))

  def ngram_stats(text: Column, n: Int): Column =
    Bridge.column(NgramStats(Bridge.expression(text), n))
}

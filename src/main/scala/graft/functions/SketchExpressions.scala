package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, DoubleType, IntegerType, LongType}

/** Bottom-k distinct values of a Long column — the KMV (k-minimum-values)
  * cardinality sketch's state, as a native aggregate.
  *
  * Why an aggregate and not `distinct + window row_number <= k`: the sketch
  * exists to AVOID materializing the distinct set. This aggregate carries at
  * most k longs per group per task (a bounded TreeSet), participates in
  * map-side partial aggregation (each task folds its own duplicates into a
  * k-capped buffer before anything shuffles), and merges buffers by set
  * union + re-cap — the shuffle moves k longs per (task, group), independent
  * of input cardinality. At 100 TB the distinct+window formulation shuffles
  * billions of rows; this shuffles kilobytes.
  *
  * Deterministic (no RNG; the input hash decides membership), so the DuckDB
  * oracle replays it with `row_number() OVER (ORDER BY h) <= k` over the
  * distinct hash set — same bottom-k set by construction.
  *
  * Result: the sorted (ascending) array of the at-most-k smallest distinct
  * non-NULL inputs. NULL inputs are ignored (SQL aggregate convention).
  */
case class BottomKDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"bottom_k_distinct: k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(
      buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // skip values already past the cap: no allocation for the common case
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) { buf.add(v); if (buf.size() > k) buf.pollLast() }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKDistinct =
    copy(child = newChild)
}

/** Bottom-k (hash, value) pairs — the deterministic uniform-sample
  * sketch behind continuous-domain quantile estimation.
  *
  * [[BottomKDistinct]] keeps the k smallest HASHES (cardinality);
  * this keeps the k pairs smallest by (hash, value), i.e. a uniform
  * k-sample of rows chosen by the engine-replayable 60-bit md5 hash of a
  * row key. Exact grouped quantiles via distinct-value compression
  * (Stats.groupQuantiles) degrade when the value domain is continuous —
  * the compressed table IS the row count; this sketch caps state at k
  * pairs per group per task with map-side partials, and the bottom-k
  * identity (bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)))
  * makes persisted sketch tables mergeable, like KMV.
  *
  * Result: the sampled VALUES ordered by (hash, value) — the caller
  * re-sorts by value for quantile selection. NULL hash or value ⇒ pair
  * ignored. Duplicate (hash, value) pairs collapse (set semantics);
  * with a unique row key duplicates never occur.
  */
case class BottomKPairs(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[(Long, Double), Unit]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 0, s"bottom_k_pairs: k must be positive, got $k")

  private implicit val ord: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeMap[(Long, Double), Unit] =
    new java.util.TreeMap[(Long, Double), Unit](ord)

  private def add(
      buf: java.util.TreeMap[(Long, Double), Unit], h: Long, v: Double): Unit = {
    val key = (h, v)
    if (buf.size() < k) { buf.put(key, ()); () }
    else if (ord.lt(key, buf.lastKey())) {
      buf.put(key, ())
      if (buf.size() > k) buf.pollLastEntry()
    }
  }

  override def update(
      buf: java.util.TreeMap[(Long, Double), Unit],
      input: InternalRow): java.util.TreeMap[(Long, Double), Unit] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(
      buf: java.util.TreeMap[(Long, Double), Unit],
      other: java.util.TreeMap[(Long, Double), Unit]): java.util.TreeMap[(Long, Double), Unit] = {
    val it = other.keySet().iterator()
    while (it.hasNext) { val (h, v) = it.next(); add(buf, h, v) }
    buf
  }

  override def eval(buf: java.util.TreeMap[(Long, Double), Unit]): Any = {
    val out = new Array[Double](buf.size())
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { out(i) = it.next()._2; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[(Long, Double), Unit]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.keySet().iterator()
    while (it.hasNext) {
      val (h, v) = it.next(); bb.putLong(h); bb.putDouble(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[(Long, Double), Unit] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put((bb.getLong, bb.getDouble), ()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKPairs =
    copy(left = newLeft, right = newRight)
}

/** HyperLogLog register array over a pre-hashed Long column — the
  * fixed-size mergeable cardinality sketch, as a native aggregate.
  *
  * The input is a 60-bit non-negative hash (the shared cross-engine
  * convention: `conv(substr(md5(x),1,15),16,10)` — 15 hex chars = 60 bits,
  * always positive). The top `p` bits pick a register, the remaining
  * w = 60-p bits contribute rho = (leading zeros within w bits) + 1, and
  * each register keeps the max rho it has seen. State is exactly
  * m = 2^p bytes per group per task — unlike KMV's k values it never
  * grows with k, and merge is an elementwise max, so the shuffle moves
  * m bytes per (task, group) regardless of input size. At 100 TB this is
  * THE practical distinct-count sketch; KMV ([[BottomKDistinct]]) stays
  * the exact-bottom-k alternative when the sketch itself must be
  * inspectable.
  *
  * Deterministic (register contents are a pure function of the input
  * hash set), so a SQL oracle replays it exactly:
  * `max(w - length(bin(h % 2^w)) + 1)` per `h // 2^w` bucket — integer
  * and string ops only, no floats anywhere in the state.
  *
  * Result: the m register values as ints (index = bucket). NULL inputs
  * ignored. Estimation (alpha·m²/Σ2^-rho) happens OUTSIDE the aggregate
  * so callers can keep it integer-exact (see Stats.hllDistinct's scaled
  * integer harmonic sum).
  */
case class HllRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll_registers: p must be in [4,16], got $p")

  private val m = 1 << p
  private val w = 60 - p // bits left after the bucket prefix

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> w).toInt // h is 60-bit, so bucket < 2^p
      val rest = h & ((1L << w) - 1)
      // rho = leading zeros within the w-bit window, + 1; rest == 0 ⇒ w+1
      val rho =
        if (rest == 0L) w + 1
        else w - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}

/** Count-Min sketch counters over a pre-hashed Long column — the bounded-
  * memory FREQUENCY sketch, as a native aggregate (the family's missing
  * member: KMV/HLL answer "how many distinct", Bloom answers "seen?",
  * CMS answers "how often" with a one-sided overestimate).
  *
  * The input is the shared 60-bit md5 hash ([[BottomKDistinct]]'s
  * convention). Row i of the sketch (i < d) takes its counter index from
  * BIT SLICE i of that hash: `(h >>> (i·wlog)) & (2^wlog − 1)` — d·wlog
  * must fit in the 60 hash bits. Slices of one strong hash stand in for
  * the classical d independent hash functions; the payoff is that a SQL
  * oracle replays every counter with integer shifts/masks alone, no
  * second hash family. State is exactly d·2^wlog longs per group per
  * task, participates in map-side partial aggregation, and merge is
  * elementwise ADDITION — so persisted per-slice sketch tables re-merge
  * by the same aggregate, like the KMV/HLL tables, and the shuffle moves
  * d·2^wlog longs per (task, group) regardless of input size.
  *
  * Result: the flattened counters, row-major (index = i·2^wlog + slot).
  * A point estimate is min over i of counter[i·w + slice_i(h)], taken
  * OUTSIDE the aggregate (element_at over the array — see
  * Stats.cmsEstimates) so probes stay codegen'd projections. NULL inputs
  * are ignored.
  */
case class CmsCounters(
    child: Expression,
    d: Int,
    wlog: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(d > 0, s"cms_counters: d must be positive, got $d")
  // wlog ≤ 24 also keeps `1 << wlog` far from Int overflow (1 << 31 would
  // crash; 1 << 32+ silently wraps the shift and degenerates the sketch)
  require(wlog > 0 && wlog <= 24 && d * wlog <= 60,
    s"cms_counters: need 0 < wlog <= 24 and d*wlog <= 60 hash bits, " +
      s"got d=$d wlog=$wlog")

  private val w = 1 << wlog
  private val mask = (w - 1).toLong

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < d) {
        buf(i * w + ((h >>> (i * wlog)) & mask).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsCounters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsCounters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsCounters =
    copy(child = newChild)
}

/** O(1) membership probe into a packed bitset: `bits[pos>>3] & (1<<(pos&7))`.
  *
  * `bits` is a (typically literal/broadcast) BINARY column holding the
  * Bloom filter's bit array; `pos` a long in [0, 8·|bits|). Codegen'd to a
  * two-instruction mask test inside the scan stage — the probe side of a
  * Bloom prefilter never leaves whole-stage codegen and never shuffles.
  * Out-of-range positions return false (not an error): callers size `pos`
  * by construction (pmod by the bit count).
  */
case class BitsetContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bitset_contains expects (binary, bigint), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def nullSafeEval(bitsAny: Any, posAny: Any): Any = {
    val bits = bitsAny.asInstanceOf[Array[Byte]]
    val pos = posAny.asInstanceOf[Long]
    // range-check in LONG before narrowing: pos ≥ 2³⁴ would wrap the Int
    // index (negative ⇒ AIOOBE; larger ⇒ aliased bit read = spurious true)
    pos >= 0 && pos < (bits.length.toLong << 3) &&
      (bits((pos >>> 3).toInt) & (1 << (pos & 7).toInt)) != 0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, pos) => {
      s"""
         |${ev.value} = $pos >= 0L && $pos < ((long)$bits.length << 3) &&
         |  ($bits[(int)($pos >>> 3)] & (1 << (int)($pos & 7))) != 0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitsetContains =
    copy(l, r)
}

object SketchFunctions {
  /** bottom_k_distinct(c, k): sorted array of the k smallest distinct
    * non-NULL longs — the KMV sketch state. */
  def bottom_k_distinct(c: Column, k: Int): Column =
    Bridge.column(BottomKDistinct(Bridge.expression(c), k).toAggregateExpression())

  /** hll_registers(h60, p): the 2^p HyperLogLog register values for a
    * column of 60-bit hashes. */
  def hll_registers(c: Column, p: Int): Column =
    Bridge.column(HllRegisters(Bridge.expression(c), p).toAggregateExpression())

  /** bottom_k_pairs(h, v, k): values of the k (hash, value) pairs
    * smallest by (hash, value) — a deterministic uniform k-sample. */
  def bottom_k_pairs(h: Column, v: Column, k: Int): Column =
    Bridge.column(BottomKPairs(
      Bridge.expression(h), Bridge.expression(v), k).toAggregateExpression())

  /** cms_counters(h60, d, wlog): row-major d×2^wlog Count-Min counters
    * for a column of 60-bit hashes. */
  def cms_counters(c: Column, d: Int, wlog: Int): Column =
    Bridge.column(CmsCounters(Bridge.expression(c), d, wlog).toAggregateExpression())

  /** bitset_contains(bits, pos): bit `pos` set in the packed binary? */
  def bitset_contains(bits: Column, pos: Column): Column =
    Bridge.column(BitsetContains(Bridge.expression(bits), Bridge.expression(pos)))
}

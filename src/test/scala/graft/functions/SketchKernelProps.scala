package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM property pins for the newest kernels (no SparkSession):
  * WordPairs against a directly-written reference, BitsetContains against
  * set membership. */
object SketchKernelProps extends Properties("SketchKernels") {

  // texts with empty tokens, repeats and unicode mixed in
  private val token: Gen[String] = Gen.frequency(
    5 -> Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString),
    1 -> Gen.const(""),            // consecutive-space artifact
    1 -> Gen.const("émö"),         // non-ASCII
    2 -> Gen.const("dup"))         // force repeated pairs
  private val text: Gen[String] =
    Gen.listOf(token).map(_.mkString(" "))

  property("wordPairs = adjacent non-empty pairs, repeats kept") =
    forAll(text) { s =>
      val toks = s.split(" ", -1).filter(_.nonEmpty).toSeq
      val want =
        if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
        else Seq.empty[String]
      val got = TextKernels.wordPairs(UTF8String.fromString(s))
        .toObjectArray(StringType).map(_.toString).toSeq
      got == want
    }

  private val posSet: Gen[(Set[Long], Int)] = for {
    mBytes <- Gen.choose(1, 64)
    ps <- Gen.listOf(Gen.choose(0L, mBytes * 8L - 1))
  } yield (ps.toSet, mBytes)

  property("bitsetContains = membership of the set bits") =
    forAll(posSet) { case (ps, mBytes) =>
      val bits = new Array[Byte](mBytes)
      ps.foreach { p =>
        bits((p >>> 3).toInt) =
          (bits((p >>> 3).toInt) | (1 << (p & 7).toInt)).toByte
      }
      val expr = (p: Long) => BitsetContains(
        Literal(bits, BinaryType), Literal(p, LongType))
        .eval(null).asInstanceOf[Boolean]
      // out-of-range is false, not error — including positions whose
      // byte index overflows Int (would alias a live bit or throw if the
      // range check ran after the narrowing)
      val outOfRange = Seq(mBytes * 8L, -1L, Long.MinValue, Long.MaxValue,
        1L << 34, (1L << 34) + ps.headOption.getOrElse(0L), (1L << 35) + 7L)
      (0L until mBytes * 8L).forall(p => expr(p) == ps.contains(p)) &&
        outOfRange.forall(p => !expr(p))
    }

  private val hashes60: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, (1L << 60) - 1))

  private val pairs: Gen[List[(Long, Double)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 1000L), Gen.choose(-50.0, 50.0)))

  property("bottomKPairs = sort-take-k reference; merge = re-cap") =
    forAll(pairs, pairs, Gen.choose(1, 8)) { (xs, ys, k) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      import org.apache.spark.sql.types.DoubleType
      val agg = BottomKPairs(
        BoundReference(0, LongType, nullable = true),
        BoundReference(1, DoubleType, nullable = true), k)
      def run(vs: List[(Long, Double)]) =
        vs.foldLeft(agg.createAggregationBuffer()) { (b, p) =>
          agg.update(b, InternalRow(p._1, p._2))
        }
      def values(buf: java.util.TreeMap[(Long, Double), Unit]) =
        agg.eval(buf).asInstanceOf[
          org.apache.spark.sql.catalyst.util.GenericArrayData]
          .toDoubleArray().toSeq
      def ref(vs: List[(Long, Double)]) =
        vs.distinct.sorted.take(k).map(_._2)
      values(run(xs)) == ref(xs) &&
        values(agg.merge(run(xs), run(ys))) == ref(xs ::: ys)
    }

  property("cmsCounters = per-slice occurrence counts, merge = vector add") =
    forAll(hashes60, hashes60, Gen.choose(1, 4), Gen.choose(3, 9)) {
      (xs, ys, d, wlog) =>
        import org.apache.spark.sql.catalyst.InternalRow
        import org.apache.spark.sql.catalyst.expressions.BoundReference
        val w = 1 << wlog
        val agg = CmsCounters(BoundReference(0, LongType, nullable = true), d, wlog)
        def run(vs: List[Long]): Array[Long] =
          vs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
            agg.update(b, InternalRow(v))
          }
        def ref(vs: List[Long]): Array[Long] = {
          val c = new Array[Long](d * w)
          vs.foreach { h =>
            (0 until d).foreach { i =>
              c(i * w + ((h >>> (i * wlog)) & (w - 1)).toInt) += 1L
            }
          }
          c
        }
        // every row's counters sum to the input size; point estimates
        // (min over rows at a hash's slots) never undercount
        val got = run(xs)
        val rowSumsOk = (0 until d).forall { i =>
          (i * w until (i + 1) * w).map(got(_)).sum == xs.length
        }
        val overEstOk = xs.forall { h =>
          val est = (0 until d).map(i =>
            got(i * w + ((h >>> (i * wlog)) & (w - 1)).toInt)).min
          est >= xs.count(_ == h)
        }
        got.sameElements(ref(xs)) && rowSumsOk && overEstOk &&
          agg.merge(run(xs), run(ys)).sameElements(ref(xs ::: ys))
    }

  property("hllRegisters = per-bucket max rho, merge = elementwise max") =
    forAll(hashes60, hashes60) { (xs, ys) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      val agg = HllRegisters(BoundReference(0, LongType, nullable = true), 6)
      def run(vs: List[Long]): Array[Byte] =
        vs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
          agg.update(b, InternalRow(v))
        }
      def ref(vs: List[Long]): Array[Byte] = {
        val regs = new Array[Byte](64)
        vs.foreach { h =>
          val b = (h >>> 54).toInt
          val rest = h & ((1L << 54) - 1)
          val rho = if (rest == 0L) 55
            else 54 - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
          if (rho > regs(b)) regs(b) = rho.toByte
        }
        regs
      }
      val mergeOk = {
        val m = agg.merge(run(xs), run(ys))
        m.sameElements(ref(xs ::: ys))
      }
      run(xs).sameElements(ref(xs)) && mergeOk
    }
}

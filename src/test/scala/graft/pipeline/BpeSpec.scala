package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** BPE tokenizer training (Bpe.learn) against the Sennrich-style worked
  * example, hand-computed: corpus {low×5, lower×2, newest×6, widest×3}
  * with end-of-word markers. Round-by-round pair totals:
  *   r1: (e,s)=9 (s,t)=9 (t,</w>)=9 → tie → lexicographic → "e s"
  *   r2: (es,t)=9 (t,</w>)=9 → "es t"
  *   r3: (est,</w>)=9 → "est </w>"
  *   r4: (l,o)=7 (o,w)=7 → "l o"
  */
class BpeSpec extends AnyFreeSpec with Matchers with SparkFixture {
  import spark.implicits._

  private lazy val corpus = Seq(
    ("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3)
  ).toDF("text")

  "Bpe.learn" - {
    "reproduces the hand-computed merge sequence with counts" in {
      val (merges, words) = Bpe.learn(corpus, col("text"), 4)
      words.unpersist()
      merges.map(m => (m.rank, m.lhs, m.rhs, m.merged, m.pairCount)) shouldBe
        Seq((1, "e", "s", "es", 9L), (2, "es", "t", "est", 9L),
          (3, "est", "</w>", "est</w>", 9L), (4, "l", "o", "lo", 7L))
    }

    "final symbolization reflects the applied merges" in {
      val (_, words) = Bpe.learn(corpus, col("text"), 4)
      val syms = words.collect().map(r =>
        r.getString(0) -> r.getString(2)).toMap
      words.unpersist()
      syms("newest") shouldBe " n e w est</w> "
      syms("low") shouldBe " lo w </w> "
      syms("lower") shouldBe " lo w e r </w> "
      syms("widest") shouldBe " w i d est</w> "
    }

    "vocab aggregates weighted token counts in (n DESC, tok ASC) order" in {
      val (_, words) = Bpe.learn(corpus, col("text"), 4)
      val v = Bpe.vocab(words, 5).as[(String, Long)].collect().toSeq
      words.unpersist()
      // hand count: w appears in low(5)+lower(2)+newest(6)+widest(3)=16;
      // est</w> 6+3=9; e in newest(6)+lower(2)=8; </w> low 5 + lower 2=7;
      // lo 5+2=7 — tie with </w> broken lexicographically ('<' < 'l')
      v shouldBe Seq(("w", 16L), ("est</w>", 9L), ("e", 8L),
        ("</w>", 7L), ("lo", 7L))
    }

    "stops early when no pair remains" in {
      val (merges, words) = Bpe.learn(
        Seq("a b a b").toDF("text"), col("text"), 10)
      words.unpersist()
      // each word is one char + marker: pairs (a,</w>)=2, (b,</w>)=2 →
      // merge a</w>, then b</w>; after that every word is ONE symbol
      merges.map(_.merged) shouldBe Seq("a</w>", "b</w>")
    }

    "merge application is the documented two-pass fixpoint replace" in {
      // run of identical symbols: " a a a a </w> " under merge (a,a) —
      // pass 1 merges the first occurrence and SKIPS the second (its
      // leading space was consumed): " aa a a </w> "; pass 2 catches it:
      // " aa aa </w> " — the greedy index-walk result for a 4-run
      val (merges, words) = Bpe.learn(
        Seq("aaaa aaaa aaaa").toDF("text"), col("text"), 1)
      val sym = words.collect().map(_.getString(2)).head
      words.unpersist()
      merges.head.merged shouldBe "aa"
      sym shouldBe " aa aa </w> "
    }

    "alternating repeats converge to the index-walk result" in {
      // "abab" = " a b a b " under merge (a,b): one pass alone yields
      // " ab a b " (the r7 advisory's divergence case); the fixpoint
      // matches classic Sennrich BPE: " ab ab "
      val (merges, words) = Bpe.learn(
        Seq("abab abab abab").toDF("text"), col("text"), 1)
      val sym = words.collect().map(_.getString(2)).head
      words.unpersist()
      merges.head.merged shouldBe "ab"
      sym shouldBe " ab ab </w> "
    }

    "encode emits dense full-vocab ids, docs reassemble in order" in {
      // after 4 merges the final symbols are (weighted count, tok):
      // w=16, est</w>=9, e=8, </w>=7, lo=7, n=6, d=3, i=3, r=2 → ids
      // 1..9 in (n DESC, tok ASC) order; "</w>"(7) sorts before "lo"(7)
      val (_, words) = Bpe.learn(corpus, col("text"), 4)
      val docs = Seq((1L, "low widest"), (2L, "newest")).toDF("id", "txt")
      val got = Bpe.encode(docs, col("id"), col("txt"), words, headIds = 48)
        .orderBy("id")
        .as[(Long, Long, Seq[Long])].collect().toSeq
      words.unpersist()
      // low = [lo w </w>] = [5,1,4]; widest = [w i d est</w>] = [1,8,7,2]
      // newest = [n e w est</w>] = [6,3,1,2]
      got shouldBe Seq(
        (1L, 7L, Seq(5L, 1L, 4L, 1L, 8L, 7L, 2L)),
        (2L, 4L, Seq(6L, 3L, 1L, 2L)))
    }

    "driver-memory and distributed paths learn identically" in {
      // the probe-and-inline cutover (MaxInlinedVocab) must be invisible:
      // force the distributed loop (maxInlined = 0) and pin merge list +
      // final symbolization against the driver-memory path. The corpus
      // includes the escaped-'<' case so the UTF-8-byte tie-break is
      // exercised on a multi-byte symbol (U+E000) too.
      val docs = Seq(("low " * 5) + ("lower " * 2) + ("newest " * 6) +
        ("widest " * 3) + "a</w> a</w> a</w>").toDF("text")
      val (ml, wl) = Bpe.learn(docs, col("text"), 6)
      val (md, wd) = Bpe.learn(docs, col("text"), 6, maxInlined = 0)
      def dump(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("w").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
      val (sl, sd) = (dump(wl), dump(wd))
      wd.unpersist()
      md shouldBe ml
      sd shouldBe sl
    }

    "content '<' cannot conflate with the end-of-word marker" in {
      // raw word "a</w>" splits to ESCAPED content symbols, so no merge
      // chain can produce a content symbol equal to the marker string;
      // outputs render '<' restored. Hand trace (all pair counts tie at
      // 3, lexicographic ascending on the escaped pair picks): /w, /w>,
      // /w></w>, a+esc, then the full word — and early stop
      val (merges, words) = Bpe.learn(
        Seq("a</w> a</w> a</w>").toDF("text"), col("text"), 6)
      val toks = Bpe.vocab(words, 20).as[(String, Long)].collect().toMap
      words.unpersist()
      // merges render with '<' restored, never the private-use escape
      merges.foreach(m => m.merged should not include Bpe.LtEscape)
      // the fully merged word renders as the raw text + ONE real marker —
      // a distinct string from the marker itself, impossible un-escaped
      merges.map(_.merged) should contain("a</w></w>")
      toks should contain("a</w></w>" -> 3L)
    }
  }
}

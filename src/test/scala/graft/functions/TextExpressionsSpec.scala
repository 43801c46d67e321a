package graft.functions

import graft.SparkFixture
import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** The codegen'd text kernels (WordShingles / TokenSetHits) are drop-in
  * value replacements for the interpreted HOF formulations they retired —
  * pinned here element-for-element on the real corpus plus edge rows. */
class TextExpressionsSpec extends AnyFreeSpec with Matchers with SparkFixture {
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private lazy val edge = {
    import spark.implicits._
    Seq(
      "",                        // empty: shingles to [""]
      " ",                       // single space: tokens ["",""]
      "one",                     // shorter than n: whole-text shingle
      "one two",                 //
      "one two three",           // exactly n
      "a b c d e f g",           //
      "dup dup dup dup",         // repeated shingles collapse (distinct)
      "the and of to in is that the end",  // en stopwords, repeated hits
      "der und die  das",        // double space: empty token
      "  leading and trailing  " // trim matters for token hits
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  "WordShingles matches the HOF formulation on the corpus (n=3)" in {
    val mismatches = docs.select(
        Dedup.shingles(col("text"), 3).as("k"),
        Dedup.shinglesHof(col("text"), 3).as("h"))
      .filter(!(col("k") <=> col("h"))).count()
    mismatches shouldBe 0L
  }

  "WordShingles matches the HOF formulation on edge rows (n=2..4)" in {
    (2 to 4).foreach { n =>
      val bad = edge.select(col("text"),
          Dedup.shingles(col("text"), n).as("k"),
          Dedup.shinglesHof(col("text"), n).as("h"))
        .filter(!(col("k") <=> col("h"))).collect()
      withClue(s"n=$n: ${bad.mkString(", ")}") { bad shouldBe empty }
    }
  }

  "WordPairs matches the filtered-HOF formulation on corpus + edge rows" in {
    // executable spec: adjacent pairs over the non-empty tokens, repeats kept
    def hof(text: org.apache.spark.sql.Column) = {
      val F = org.apache.spark.sql.functions
      val t = F.filter(split(text, " "), x => x =!= "")
      when(F.size(t) >= 2,
        transform(sequence(lit(0), F.size(t) - 2),
          i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
        .otherwise(array())
    }
    Seq(docs, edge).foreach { df =>
      val bad = df.select(col("text"),
          graft.functions.TextFunctions.word_pairs(col("text")).as("k"),
          hof(col("text")).as("h"))
        .filter(!(col("k") <=> col("h"))).collect()
      withClue(bad.mkString(", ")) { bad shouldBe empty }
    }
  }

  "WordPairs keeps multiplicity and skips empty tokens" in {
    import spark.implicits._
    val got = Seq("a  b a b", "x", "", " ").toDF("text")
      .select(graft.functions.TextFunctions.word_pairs(col("text")))
      .collect().map(_.getSeq[String](0))
    got(0) shouldBe Seq("a b", "b a", "a b") // double space skipped, repeat kept
    got(1) shouldBe Nil
    got(2) shouldBe Nil
    got(3) shouldBe Nil
  }

  "WordShingles is NULL on NULL text (rows drop out of dedup)" in {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c d"))).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    got(1L) shouldBe None
    got(2L) should not be None
    // and the signature pipeline emits nothing for the NULL row
    val sh = df.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
    Dedup.minhashSignatures(sh, 4).select("id").collect().map(_.getLong(0)).toSet shouldBe Set(2L)
  }

  "WordChunks matches the transform+slice formulation (w=2..9)" in {
    // HOF reference: non-overlapping w-word groups, trailing partial kept
    def hofChunks(text: org.apache.spark.sql.Column, w: Int) = {
      val F = org.apache.spark.sql.functions
      val toks = split(text, " ")
      transform(sequence(lit(0),
          F.ceil(F.size(toks).cast("double") / w).cast("int") - 1),
        i => concat_ws(" ", slice(toks, i * lit(w) + 1, lit(w))))
    }
    for (w <- Seq(2, 3, 8, 9)) {
      Seq(docs.limit(500), edge).foreach { df =>
        val bad = df.select(col("text"),
            TextFunctions.word_chunks(col("text"), w).as("k"),
            hofChunks(col("text"), w).as("h"))
          .filter(!(col("k") <=> col("h"))).collect()
        withClue(s"w=$w: ${bad.mkString(", ")}") { bad shouldBe empty }
      }
    }
  }

  "TokenSetHits matches the aggregate-HOF hit counts" in {
    val langs = TextAnalysis.Stopwords.toSeq.sortBy(_._1)
    // the retired formulation, reconstructed inline as the executable spec
    def hofHits(text: org.apache.spark.sql.Column) = {
      val zero = array(langs.map(_ => lit(0)): _*)
      aggregate(split(lower(trim(text)), "\\s+"), zero,
        (acc, t) => array(langs.zipWithIndex.map { case ((_, words), i) =>
          element_at(acc, i + 1) +
            when(array_contains(typedlit(words), t), 1).otherwise(0)
        }: _*))
    }
    Seq(docs.limit(500), edge).foreach { df =>
      val bad = df.select(
          TextFunctions.token_set_hits(col("text"), langs.map(_._2)).as("k"),
          hofHits(col("text")).as("h"))
        .filter(!(col("k") <=> col("h"))).count()
      bad shouldBe 0L
    }
  }

  "langId still picks dominant language and falls back to und" in {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "xyzzy plugh qwerty"),
      (4L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got shouldBe Map(1L -> "en", 2L -> "de", 3L -> "und", 4L -> "und")
  }

  "stopwordRatio counts per-occurrence hits over the token count" in {
    import spark.implicits._
    val df = Seq((1L, "the the cat"), (2L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.stopwordRatio(col("text"), TextAnalysis.Stopwords("en")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got(1L) shouldBe (2.0 / 3.0) +- 1e-12
    got(2L) shouldBe 0.0 // "" tokenizes to [""], 0 hits
  }

  "TokenStats matches the explode+groupBy formulation (corpus + edges)" in {
    Seq(docs, edge).foreach { df =>
      val viaShuffle = df
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
        .groupBy("doc_id", "tok").count()
        .groupBy("doc_id").agg(
          sum("count").as("total"), count(lit(1)).as("distinct"),
          max("count").as("top"))
      val viaKernel = df.select(col("doc_id"),
        element_at(TextAnalysis.tokenStats(col("text")), 1).as("total"),
        element_at(TextAnalysis.tokenStats(col("text")), 2).as("distinct"),
        element_at(TextAnalysis.tokenStats(col("text")), 3).as("top"))
      viaKernel.collect().toSeq should contain theSameElementsAs
        viaShuffle.collect().toSeq
    }
    // NULL text => NULL stats
    import spark.implicits._
    val n = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(TextAnalysis.tokenStats(col("text"))).collect()
    Option(n.head.get(0)) shouldBe None
  }

  "NgramStats matches the explode+window formulation (corpus + edges)" in {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.{functions => F} // size/length shadow scalatest
    (2 to 3).foreach { n =>
      Seq(docs, edge).foreach { df =>
        val toks = split(col("text"), " ", -1)
        val grams = when(F.size(toks) >= n,
          transform(sequence(lit(0), F.size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
          .otherwise(array().cast("array<string>"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("count").desc, col("g").asc)
        val viaShuffle = df
          .select(col("doc_id"), explode(grams).as("g"))
          .groupBy("doc_id", "g").count()
          .withColumn("rn", row_number().over(w))
          .groupBy("doc_id").agg(
            sum("count").as("total"), count(lit(1)).as("distinct"),
            max(when(col("rn") === 1, col("count"))).as("top"),
            max(when(col("rn") === 1, F.length(col("g"))))
              .cast("long").as("topchars"))
        val st = TextFunctions.ngram_stats(col("text"), n)
        val viaKernel = df.select(col("doc_id"),
          element_at(st, 1).as("total"), element_at(st, 2).as("distinct"),
          element_at(st, 3).as("top"), element_at(st, 4).as("topchars"))
        withClue(s"n=$n:") {
          viaKernel.filter(col("total") > 0).collect().toSeq should
            contain theSameElementsAs viaShuffle.collect().toSeq
          // the rows the shuffle form drops (fewer than n tokens) are
          // exactly the kernel's all-zero rows
          viaKernel.filter(col("total") === 0).count() shouldBe
            (df.count() - viaShuffle.count())
        }
      }
    }
    // NULL text => NULL stats
    import spark.implicits._
    val nul = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(TextFunctions.ngram_stats(col("text"), 2)).collect()
    Option(nul.head.get(0)) shouldBe None
  }

  "redactPii replaces every email/phone/ip occurrence and nothing else" in {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@sub.example.org twice a.b@c.de end"),
      (2L, "call +1-555-0199 or 44-123-4567 now"),
      (3L, "host 10.0.255.7 clean text stays"),
      (4L, "no pii here at all")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got(1L) shouldBe "mail <EMAIL> twice <EMAIL> end"
    got(2L) shouldBe "call <PHONE> or <PHONE> now"
    got(3L) shouldBe "host <IP> clean text stays"
    got(4L) shouldBe "no pii here at all"
  }

  "lshCandidatePairs band hashes are chain-identical to the slice form" in {
    import spark.implicits._
    // same recall contract as before the element_at rewrite: the xxhash64
    // fold over (band, sig[b*r+1..b*r+r]) must equal hashing the slice
    val sigs = Seq((1L, Seq(11L, 22L, 33L, 44L)), (2L, Seq(11L, 22L, 99L, 44L)))
      .toDF("id", "sig")
    val viaSlice = sigs.select(col("id"),
      xxhash64(lit(0), slice(col("sig"), 1, 2)).as("b0"),
      xxhash64(lit(1), slice(col("sig"), 3, 2)).as("b1"))
    val viaElems = sigs.select(col("id"),
      xxhash64(lit(0), element_at(col("sig"), 1), element_at(col("sig"), 2)).as("b0"),
      xxhash64(lit(1), element_at(col("sig"), 3), element_at(col("sig"), 4)).as("b1"))
    viaSlice.collect().toSeq should contain theSameElementsAs viaElems.collect().toSeq
    // and the pairs come out the same
    val pairs = Dedup.lshCandidatePairs(sigs, "id", "sig", bands = 2, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((1L, 2L)) // collide on band 0, differ on band 1
  }

  "CharWindows matches the substr-comprehension formulation (corpus + edges)" in {
    // the HOF equivalent of the kernel (and of the DuckDB oracle):
    // distinct substr windows at 1-based positions 1, 1+stride, ...
    def hof(width: Int, stride: Int) = {
      val n = org.apache.spark.sql.functions.length(col("text"))
      when(n >= width,
        array_distinct(transform(
          sequence(lit(1), n - width + 1, lit(stride)),
          p => substr(col("text"), p, lit(width)))))
        .otherwise(array().cast("array<string>"))
    }
    for ((w, s) <- Seq((40, 10), (3, 2), (5, 5))) {
      val mismatches = docs.select("doc_id", "text").unionByName(edge).select(
          TextFunctions.char_windows(col("text"), w, s).as("k"),
          hof(w, s).as("h"))
        .filter(!(col("k") <=> col("h"))).count()
      withClue(s"width=$w stride=$s") { mismatches shouldBe 0L }
    }
  }

  "CharWindows samples 1-based positions by stride and is NULL on NULL" in {
    import spark.implicits._
    val got = Seq("abcdef").toDF("text")
      .select(TextFunctions.char_windows(col("text"), 3, 2))
      .collect().head.getSeq[String](0)
    got shouldBe Seq("abc", "cde") // p=5 would overrun: 5+3-1 > 6
    Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.char_windows(col("text"), 3, 2))
      .collect().head.isNullAt(0) shouldBe true
  }
}

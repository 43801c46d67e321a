package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** BM25 retrieval, DSIR importance weighting, shuffle order, and text
  * normalization — the round-6 retrieval/curation cohort. */
class RetrievalSpec extends AnyFreeSpec with Matchers with SparkFixture {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  "Retrieval.bm25TopK" - {
    "ranks a hand-built corpus by term frequency and length" in {
      // same dl everywhere → single-term BM25 order = tf order
      val df = Seq(
        (1L, "spark spark spark pad pad"),
        (2L, "spark spark other pad pad"),
        (3L, "spark other other pad pad"),
        (4L, "other other other pad pad")
      ).toDF("doc_id", "text")
      val got = Retrieval.bm25TopK(df, "doc_id", col("text"), Seq("spark"))
        .select("doc_id", "rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe Map(1L -> 1L, 2L -> 2L, 3L -> 3L)
      // doc 4 has no query term — not a candidate at all
    }

    "a repeated query term contributes its full partial per occurrence" in {
      // regression (round-8 review): the kernel lookup dedupes terms, so
      // each duplicate must still map to the shared tf slot — a repeated
      // term's score is exactly twice the single-term score
      val df = Seq(
        (1L, "spark spark pad"),
        (2L, "spark other pad"),
        (3L, "other other pad")
      ).toDF("doc_id", "text")
      def scores(terms: Seq[String]) =
        Retrieval.bm25TopK(df, "doc_id", col("text"), terms)
          .select("doc_id", "score").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val once = scores(Seq("spark"))
      val twice = scores(Seq("spark", "spark"))
      twice.keySet shouldBe once.keySet
      once.foreach { case (id, s) => twice(id) shouldBe (s + s) }
    }

    "prefers the shorter document at equal tf" in {
      val df = Seq(
        (1L, "spark pad"),
        (2L, "spark pad pad pad pad pad pad pad")
      ).toDF("doc_id", "text")
      val top = Retrieval.bm25TopK(df, "doc_id", col("text"), Seq("spark"))
        .orderBy("rank").select("doc_id").as[Long].collect()
      top shouldBe Array(1L, 2L)
    }

    "weighs rare terms above common ones" in {
      // 'rare' df=1, 'common' df=4: one hit of each, same dl
      val df = Seq(
        (1L, "rare pad pad"),
        (2L, "common pad pad"),
        (3L, "common x pad"), (4L, "common y pad"), (5L, "common z pad")
      ).toDF("doc_id", "text")
      val got = Retrieval.bm25TopK(df, "doc_id", col("text"),
        Seq("rare", "common")).orderBy("rank")
        .select("doc_id").as[Long].collect()
      got.head shouldBe 1L
    }

    "plans a TakeOrdered top-k over broadcast stats - no global sort, no cartesian" in {
      val plan = Retrieval.bm25TopK(docs, "doc_id", col("text"),
        Seq("spark", "customer"), topK = 10)
        .queryExecution.executedPlan.toString
      plan should include("TakeOrderedAndProject")
      // the 1-row stats/dfs sides broadcast; the corpus must never feed a
      // cartesian or a full range-partitioned sort
      plan should not include "CartesianProduct"
      plan should not include "Exchange rangepartitioning"
    }

    "matches a driver-side reference on seeded random corpora" in {
      val vocab = Vector("red", "green", "blue", "pad", "x", "y")
      val rnd = new scala.util.Random(0xC0FFEE)
      (1 to 3).foreach { _ =>
        val corpus = (1L to 30L).map { id =>
          id -> Seq.fill(2 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        }
        val terms = Seq("red", "blue")
        // naive reference: same rational-idf BM25, same fixed term order
        val n = corpus.size
        val dls = corpus.map { case (id, toks) => id -> toks.length.toLong }.toMap
        val avgdl = dls.values.sum.toDouble / n.toDouble
        val dfs = terms.map(t =>
          t -> corpus.count(_._2.contains(t)).toLong).toMap
        val want = corpus
          .filter { case (_, toks) => terms.exists(toks.contains) }
          .map { case (id, toks) =>
            val score = terms.map { t =>
              val tf = toks.count(_ == t).toDouble
              val idf = ((n - dfs(t)).toDouble + 0.5) / (dfs(t).toDouble + 0.5)
              // (1.2 + 1.0), not a 2.2 literal: mirror the module's
              // lit(k1 + 1.0) bit-for-bit
              idf * (tf * (1.2 + 1.0)) /
                (tf + 1.2 * (0.25 + 0.75 * dls(id) / avgdl))
            }.reduceLeft(_ + _)
            (id, score)
          }
          .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
        val df = corpus.map { case (id, toks) => (id, toks.mkString(" ")) }
          .toDF("doc_id", "text")
        val got = Retrieval.bm25TopK(df, "doc_id", col("text"), terms,
            topK = 5)
          .orderBy("rank").select("doc_id").as[Long].collect().toSeq
        got shouldBe want
      }
    }

    "is deterministic and caps at topK with contiguous ranks" in {
      val a = Retrieval.bm25TopK(docs, "doc_id", col("text"),
        Seq("spark", "customer", "window"), topK = 10).collect()
      val b = Retrieval.bm25TopK(docs, "doc_id", col("text"),
        Seq("spark", "customer", "window"), topK = 10).collect()
      a.map(_.toString) shouldBe b.map(_.toString)
      a.length shouldBe 10
      a.map(_.getAs[Long]("rank")).sorted shouldBe (1L to 10L).toArray
      // scores descend with rank
      val byRank = a.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
      byRank.zip(byRank.tail).foreach { case (hi, lo) => hi should be >= lo }
    }
  }

  "Retrieval.bm25BatchTopK" - {
    "a single alphabetically-ordered query equals the single-query operator bit-for-bit" in {
      // same df/N/avgdl definitions and the same fold order (batch sorts
      // terms; pass the single query pre-sorted) ⇒ identical scores
      val qs = Seq((7L, "customer"), (7L, "spark")).toDF("query_id", "term")
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_id", "score", "rank").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      val batch = rows(Retrieval.bm25BatchTopK(docs, "doc_id", col("text"),
        qs, topK = 10))
      val single = rows(Retrieval.bm25TopK(docs, "doc_id", col("text"),
        Seq("customer", "spark"), topK = 10))
      batch shouldBe single
    }

    "queries are isolated; an absent-term query yields no rows" in {
      val qs = Seq((1L, "spark"), (2L, "zzz_nope")).toDF("query_id", "term")
      val got = Retrieval.bm25BatchTopK(docs, "doc_id", col("text"), qs,
        topK = 3)
      got.filter(col("query_id") === 2L).count() shouldBe 0L
      got.filter(col("query_id") === 1L).count() shouldBe 3L
      // per-query ranks are contiguous from 1
      got.filter(col("query_id") === 1L).select("rank").as[Long]
        .collect().sorted shouldBe Array(1L, 2L, 3L)
    }

    "the distributed large-table path is bit-identical to the compiled path" in {
      // force the distributed formulation by shrinking the driver-collect
      // bound below the table size: same fold order (canonical term sort
      // from a 0.0 seed), same candidates ⇒ identical doubles
      val qs = Seq((7L, "customer"), (7L, "spark"), (8L, "query"),
        (9L, "table"), (9L, "zzz_nope")).toDF("query_id", "term")
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "doc_id", "score", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val dist = Retrieval.bm25BatchTopKBounded(docs, "doc_id", col("text"),
        qs, k1 = 1.2, b = 0.75, topK = 5, maxCollected = 2)
      val compiled = Retrieval.bm25BatchTopK(docs, "doc_id", col("text"),
        qs, topK = 5)
      rows(dist) shouldBe rows(compiled)
      dist.unpersist() // distributed path returns a caller-owned cache
    }
  }

  "Sampling.importanceWeights" - {
    "scores target-only vocabulary above raw-typical vocabulary" in {
      val raw = Seq(
        (1L, "alpha alpha alpha alpha"), // raw-heavy tokens
        (2L, "beta beta beta beta"),     // target-typical tokens
        (3L, "alpha alpha beta beta")
      ).toDF("doc_id", "text")
      val target = Seq((10L, "beta beta beta beta")).toDF("doc_id", "text")
      val w = Sampling.importanceWeights(raw, "doc_id", col("text"),
          target, col("text"), buckets = 64)
        .collect().map(r =>
          r.getAs[Long]("doc_id") -> r.getAs[Double]("weight")).toMap
      w(2L) should be > w(3L)
      w(3L) should be > w(1L)
      // doc 2: each of its 4 'beta' tokens sees target mass 4 and raw mass
      // 6 (4 from doc 2 + 2 from doc 3) → (16+1)/(24+1), normalized by
      // R_total/T_total = 12/4; 'alpha'/'beta' land in distinct buckets
      // (59 vs 43 of 64 — checked)
      w(2L) shouldBe ((17.0 / 25.0) * (12.0 / 4.0))
      // beta-heavy docs clear the kept gate, the alpha-only doc does not
      val kept = Sampling.importanceWeights(raw, "doc_id", col("text"),
          target, col("text"), buckets = 64)
        .filter(col("kept")).select("doc_id").as[Long].collect().toSet
      kept shouldBe Set(2L, 3L)
    }

    "masses are exact integer sums and kept is weight > 1" in {
      val rows = Sampling.importanceWeights(docs, "doc_id", col("text"),
        docs.filter(col("lang") === "en"), col("text"), buckets = 256)
        .collect()
      rows.length shouldBe docs.count()
      val tok = (d: org.apache.spark.sql.DataFrame) =>
        d.select(explode(split(col("text"), " ")).as("t"))
          .filter(col("t") =!= "").count()
      val rt = tok(docs)
      val tt = tok(docs.filter(col("lang") === "en"))
      rows.foreach { r =>
        val w = r.getAs[Double]("weight")
        w shouldBe ((r.getAs[Long]("t_mass") + 1.0) /
          (r.getAs[Long]("r_mass") + 1.0) * (rt.toDouble / tt.toDouble))
        r.getAs[Boolean]("kept") shouldBe (w > 1.0)
      }
      // the English slice itself must skew target-like: its mean weight
      // exceeds the non-English mean
      val en = docs.filter(col("lang") === "en").select("doc_id").as[Long]
        .collect().toSet
      val (e, o) = rows.partition(r => en(r.getAs[Long]("doc_id")))
      val mean = (xs: Array[org.apache.spark.sql.Row]) =>
        xs.map(_.getAs[Double]("weight")).sum / xs.length
      mean(e) should be > mean(o)
    }
  }

  "Sampling.weightedHashSample" - {
    "keeps everything at weight >= 1/f, nothing at weight <= 0" in {
      val w = docs.withColumn("w",
        when(col("doc_id") % 2 === 0, lit(10.0)).otherwise(lit(0.0)))
      val kept = Sampling.weightedHashSample(w, "doc_id", col("w"), 0.3)
        .select("doc_id").as[Long].collect().toSet
      // min(1, 0.3·10) = 1 ⇒ every even id survives; 0-weight rows never
      kept shouldBe docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id").as[Long].collect().toSet
    }

    "is monotone in fraction and weight (samples nest)" in {
      val w = docs.withColumn("w",
        (pmod(col("doc_id"), lit(5)) + 1).cast("double") / 5.0)
      def ids(f: Double, scale: Double) =
        Sampling.weightedHashSample(
          w.withColumn("w", col("w") * scale), "doc_id", col("w"), f)
          .select("doc_id").as[Long].collect().toSet
      val narrow = ids(0.2, 1.0)
      val wider = ids(0.5, 1.0)
      val heavier = ids(0.2, 2.0)
      narrow.subsetOf(wider) shouldBe true
      narrow.subsetOf(heavier) shouldBe true
      // and the sample is deterministic
      ids(0.2, 1.0) shouldBe narrow
    }

    "approximates per-row probabilities min(1, f*w)" in {
      // weight 1 everywhere ⇒ behaves like hashSample(f): binomial check
      val w = docs.withColumn("w", lit(1.0))
      val n = docs.count().toDouble
      val kept = Sampling.weightedHashSample(w, "doc_id", col("w"), 0.4).count()
      kept.toDouble should be(0.4 * n +- 0.15 * n)
    }
  }

  "Sampling.assignSplits" - {
    "partitions the corpus into the requested fractions, stably" in {
      val out = Sampling.assignSplits(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val n = docs.count().toDouble
      val bys = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      bys.values.sum shouldBe n.toLong
      bys("train").toDouble should be(0.8 * n +- 0.1 * n)
      // growth stability: the split of an existing doc never changes when
      // the corpus doubles
      val bigger = docs.union(docs.withColumn("doc_id",
        col("doc_id") + 1000000L))
      val before = out.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      Sampling.assignSplits(bigger, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .filter(col("doc_id") < 1000000L)
        .collect().foreach { r =>
          r.getAs[String]("split") shouldBe before(r.getAs[Long]("doc_id"))
        }
    }

    "rejects fractions that do not sum to 1" in {
      an[IllegalArgumentException] should be thrownBy
        Sampling.assignSplits(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  "Sampling.shuffleOrder" - {
    "is a permutation: global positions are exactly 0..n-1" in {
      val out = Sampling.shuffleOrder(docs, "doc_id", shards = 8)
      val n = docs.count()
      out.count() shouldBe n
      out.select("global_pos").as[Long].collect().sorted shouldBe
        (0L until n).toArray
    }

    "global order is (shard, hash, id) and pos is contiguous per shard" in {
      val rows = Sampling.shuffleOrder(docs, "doc_id", shards = 8)
        .select("shard", "pos", "global_pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // within a shard, global_pos ordered like pos and contiguous
      rows.groupBy(_._1).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._2)
        sorted.map(_._2) shouldBe (1L to rs.length).toArray
        sorted.map(_._3).zip(sorted.map(_._3).tail)
          .foreach { case (a, b) => b shouldBe a + 1 }
      }
      // shards occupy disjoint contiguous global ranges in shard order
      val ranges = rows.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (s, rs) => (s, rs.map(_._3).min, rs.map(_._3).max) }
      ranges.zip(ranges.tail).foreach { case ((_, _, hi), (_, lo, _)) =>
        lo shouldBe hi + 1
      }
    }

    "positions are stable across runs (a real permutation, not RNG)" in {
      val a = Sampling.shuffleOrder(docs, "doc_id", 8)
        .select("doc_id", "global_pos").as[(Long, Long)].collect().toMap
      val b = Sampling.shuffleOrder(docs, "doc_id", 8)
        .select("doc_id", "global_pos").as[(Long, Long)].collect().toMap
      a shouldBe b
    }
  }

  "TextAnalysis.normalizeText" - {
    "folds typographic punctuation and collapses whitespace" in {
      val df = Seq(
        (1L, "“Hello”—world"),
        (2L, "  A \t\t B C  "),
        (3L, "It’s – fine")
      ).toDF("id", "text")
      val got = df.select(col("id"),
          TextAnalysis.normalizeText(col("text")).as("t"))
        .as[(Long, String)].collect().toMap
      got(1L) shouldBe "\"hello\"-world"
      got(2L) shouldBe "a b c"
      got(3L) shouldBe "it's - fine"
    }

    "keeps punctuation (unlike the fingerprint key) and is idempotent" in {
      val df = Seq((1L, "Keep, punct! “quoted”  x")).toDF("id", "text")
      val once = df.select(TextAnalysis.normalizeText(col("text")).as("t"))
      val t1 = once.as[String].head()
      t1 shouldBe "keep, punct! \"quoted\" x"
      once.select(TextAnalysis.normalizeText(col("t")).as("t"))
        .as[String].head() shouldBe t1
    }
  }

  "Retrieval.bm25PrfTopK" - {
    val corpus = Seq(
      (1L, "apple banana cherry pad"),
      (2L, "apple banana durian pad"),
      (3L, "apple elderberry fig pad"),
      (4L, "kiwi lime mango pad"),
      (5L, "banana cherry durian pad")
    ).toDF("doc_id", "text")

    "mines the most frequent NEW terms from the feedback docs" in {
      // round 1 on "apple": docs 1,2,3 tie (same tf, same dl) → top-2 by
      // id = {1,2}; their tokens minus "apple"/short: banana ×2,
      // cherry ×1, durian ×1, pad ×2 → top-3 by (count desc, term) =
      // banana, pad, cherry
      Retrieval.prfExpansionTerms(corpus, "doc_id", col("text"),
        Seq("apple"), fbDocs = 2, fbTerms = 3) shouldBe
        Seq("banana", "pad", "cherry")
      // original terms and sub-3-char tokens are never mined
      Retrieval.prfExpansionTerms(corpus, "doc_id", col("text"),
        Seq("apple"), fbDocs = 2, fbTerms = 10) should not contain "apple"
      // fbTerms = 0 disables expansion
      Retrieval.prfExpansionTerms(corpus, "doc_id", col("text"),
        Seq("apple"), fbDocs = 2, fbTerms = 0) shouldBe Nil
    }

    "expanded retrieval equals the batch scorer on originals + mined terms" in {
      val mined = Retrieval.prfExpansionTerms(corpus, "doc_id",
        col("text"), Seq("apple"), fbDocs = 2, fbTerms = 2)
      val viaPrf = Retrieval.bm25PrfTopK(corpus, "doc_id", col("text"),
          Seq("apple"), fbDocs = 2, fbTerms = 2, topK = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val viaBatch = Retrieval.bm25BatchTopKLocal(corpus, "doc_id",
          col("text"), ("apple" +: mined).map(t => (0L, t)), topK = 5)
        .select(col("doc_id"), col("score"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      viaPrf.sortBy(_._3) shouldBe viaBatch.sortBy(_._3)
      // the recall win PRF exists for: doc 5 has NO original term but
      // carries the expansion vocabulary, so round 2 retrieves it
      viaPrf.map(_._1) should contain(5L)
    }

    "a query with zero candidates expands to nothing and returns empty" in {
      Retrieval.bm25PrfTopK(corpus, "doc_id", col("text"),
        Seq("zzzabsent"), fbDocs = 2, fbTerms = 2).count() shouldBe 0L
    }
  }

  "Retrieval.bm25IndexTables" - {
    "the stored-index path equals the inline path through a parquet round trip" in {
      val terms = Seq("the", "data", "the") // repeated term exercises slots
      val inline = Retrieval.bm25TopK(docs, "doc_id", col("text"), terms)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val out = java.nio.file.Files.createTempDirectory("bm25idx").toString
      val (p, d, st) = Retrieval.bm25IndexTables(docs, "doc_id", col("text"))
      p.write.mode("overwrite").parquet(s"$out/postings")
      d.write.mode("overwrite").parquet(s"$out/doclens")
      st.write.mode("overwrite").parquet(s"$out/stats")
      val stored = Retrieval.bm25TopKFromTables(
          spark.read.parquet(s"$out/postings"),
          spark.read.parquet(s"$out/doclens"),
          spark.read.parquet(s"$out/stats"), "doc_id", terms)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      inline should not be empty
      stored.toSeq shouldBe inline.toSeq // scores bit-equal, same order
    }

    "empty corpus index serves an empty result, not an exception" in {
      val none = docs.filter(lit(false))
      val (p, d, st) = Retrieval.bm25IndexTables(none, "doc_id", col("text"))
      Retrieval.bm25TopKFromTables(p, d, st, "doc_id", Seq("spark"))
        .count() shouldBe 0L
      Retrieval.bm25BatchTopKFromTables(p, d, st, "doc_id",
        Seq(1L -> "spark")).count() shouldBe 0L
    }

    "the stored-index BATCH path equals the inline batch through a parquet round trip" in {
      // the mining-scale serving shape (r11 #2): a multi-query batch —
      // including a REPEATED (query, term) pair, a term two queries
      // share, and a query whose term occurs nowhere — served from the
      // stored postings must land the inline batch's exact rows (the
      // absent-term partial is +0.0 in the inline fold, so skipping its
      // missing posting row changes no bit)
      val queries = Seq(
        1L -> "the", 1L -> "data", 1L -> "data", // repeated pair
        2L -> "the", 2L -> "spark",              // shares "the" with q1
        3L -> "zzz_absent_term")                 // no candidates at all
      val inline = Retrieval.bm25BatchTopKLocal(docs, "doc_id",
          col("text"), queries, topK = 5)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      val out = java.nio.file.Files.createTempDirectory("bm25bidx").toString
      val (p, d, st) = Retrieval.bm25IndexTables(docs, "doc_id", col("text"))
      p.write.mode("overwrite").parquet(s"$out/postings")
      d.write.mode("overwrite").parquet(s"$out/doclens")
      st.write.mode("overwrite").parquet(s"$out/stats")
      val stored = Retrieval.bm25BatchTopKFromTables(
          spark.read.parquet(s"$out/postings"),
          spark.read.parquet(s"$out/doclens"),
          spark.read.parquet(s"$out/stats"), "doc_id", queries, topK = 5)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      inline should not be empty
      inline.map(_._1).toSet shouldBe Set(1L, 2L) // q3 absent on both sides
      stored.toSeq shouldBe inline.toSeq // scores bit-equal, same order
      // the postings scan is term-pruned: the isin filter reaches the
      // parquet source (at scale: file pruning on term partitions)
      val plan = Retrieval.bm25BatchTopKFromTables(
        spark.read.parquet(s"$out/postings"),
        spark.read.parquet(s"$out/doclens"),
        spark.read.parquet(s"$out/stats"), "doc_id", queries, topK = 5)
        .queryExecution.executedPlan.toString
      plan should include("PushedFilters: [In(term")
      // past the inlining cutoff the stored path falls back to the row
      // formulation — same rows as the inline batch (which routes to its
      // own row formulation at this size)
      val big = (1L to 150L).flatMap(q => Seq(q -> "the", q -> "data"))
      val bigInline = Retrieval.bm25BatchTopKLocal(docs, "doc_id",
          col("text"), big, topK = 3)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      val bigStored = Retrieval.bm25BatchTopKFromTables(
          spark.read.parquet(s"$out/postings"),
          spark.read.parquet(s"$out/doclens"),
          spark.read.parquet(s"$out/stats"), "doc_id", big, topK = 3)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      bigInline should not be empty
      bigStored.toSeq shouldBe bigInline.toSeq
    }

    "append maintenance: appended index serves bit-identically to a full rebuild" in {
      // the r12 review's #1: a new document batch must APPEND to the
      // stored postings/doclens (parquet mode("append") — old files
      // never rewritten) and fold the one-row stats incrementally; the
      // appended index then serves both query paths exactly like a
      // rebuild over old ∪ new (dfs derive at query time from pruned
      // postings, so no stored piece is stale)
      val base = docs.filter(col("doc_id") % 10 =!= 0)
      val delta = docs.filter(col("doc_id") % 10 === 0)
      delta.count() should be > 0L
      val out = java.nio.file.Files.createTempDirectory("bm25app").toString
      val (p0, d0, st0) = Retrieval.bm25IndexTables(base, "doc_id", col("text"))
      p0.write.mode("overwrite").parquet(s"$out/postings")
      d0.write.mode("overwrite").parquet(s"$out/doclens")
      st0.write.mode("overwrite").parquet(s"$out/stats")
      val (pd, dd, merged) = Retrieval.bm25AppendToTables(delta, "doc_id",
        col("text"), spark.read.parquet(s"$out/stats"))
      // merged stats must be computed BEFORE the overwrite replaces its
      // own input files — one row, so the collect is free
      val mergedRow = merged.collect()
      pd.write.mode("append").parquet(s"$out/postings")
      dd.write.mode("append").parquet(s"$out/doclens")
      spark.createDataFrame(
          spark.sparkContext.parallelize(mergedRow.toSeq), merged.schema)
        .write.mode("overwrite").parquet(s"$out/stats")
      // the merged one-row stats equals the rebuilt row exactly
      val (_, _, stFull) = Retrieval.bm25IndexTables(docs, "doc_id", col("text"))
      spark.read.parquet(s"$out/stats").collect().toSeq shouldBe
        stFull.collect().toSeq
      val terms = Seq("the", "data")
      val queries = Seq(1L -> "the", 1L -> "data", 2L -> "spark")
      val fromFull = Retrieval.bm25TopK(docs, "doc_id", col("text"), terms)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val fromAppended = Retrieval.bm25TopKFromTables(
          spark.read.parquet(s"$out/postings"),
          spark.read.parquet(s"$out/doclens"),
          spark.read.parquet(s"$out/stats"), "doc_id", terms)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      fromFull should not be empty
      fromAppended.toSeq shouldBe fromFull.toSeq
      val batchFull = Retrieval.bm25BatchTopKLocal(docs, "doc_id",
          col("text"), queries, topK = 5)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      val batchAppended = Retrieval.bm25BatchTopKFromTables(
          spark.read.parquet(s"$out/postings"),
          spark.read.parquet(s"$out/doclens"),
          spark.read.parquet(s"$out/stats"), "doc_id", queries, topK = 5)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      batchFull should not be empty
      batchAppended.toSeq shouldBe batchFull.toSeq
    }

    "delete maintenance: shrunk index serves bit-identically to a rebuild on the remaining corpus" in {
      // the other half of the lifecycle: remove a document set from the
      // stored index (anti-joined postings/doclens, stats folded DOWN)
      // and serve exactly what a fresh build over the survivors serves —
      // dfs derive at query time, so deleted docs vanish from every
      // term's df with no term-level bookkeeping. A deleted id that was
      // never indexed is a no-op.
      val deleted = docs.filter(col("doc_id") % 7 === 0)
      deleted.count() should be > 0L
      val remaining = docs.filter(col("doc_id") % 7 =!= 0)
      val (p0, d0, st0) = Retrieval.bm25IndexTables(docs, "doc_id", col("text"))
      val ghosts = deleted.select(col("doc_id"))
        .unionByName(spark.range(1).select(lit(999999L).as("doc_id")))
      val (p1, d1, st1) = Retrieval.bm25DeleteFromTables(
        ghosts, "doc_id", p0, d0, st0)
      // the folded-down one-row stats equals the rebuilt row exactly
      val (_, _, stRemaining) =
        Retrieval.bm25IndexTables(remaining, "doc_id", col("text"))
      st1.collect().toSeq shouldBe stRemaining.collect().toSeq
      val terms = Seq("the", "data")
      val queries = Seq(1L -> "the", 1L -> "data", 2L -> "spark")
      val fromRebuild = Retrieval.bm25TopK(remaining, "doc_id",
          col("text"), terms)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val fromShrunk = Retrieval.bm25TopKFromTables(p1, d1, st1,
          "doc_id", terms)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      fromRebuild should not be empty
      fromShrunk.toSeq shouldBe fromRebuild.toSeq
      val batchRebuild = Retrieval.bm25BatchTopKLocal(remaining, "doc_id",
          col("text"), queries, topK = 5)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      val batchShrunk = Retrieval.bm25BatchTopKFromTables(p1, d1, st1,
          "doc_id", queries, topK = 5)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      batchRebuild should not be empty
      batchShrunk.toSeq shouldBe batchRebuild.toSeq
      // deleting only unknown ids changes nothing
      import spark.implicits._
      val (pSame, dSame, stSame) = Retrieval.bm25DeleteFromTables(
        Seq(424242L).toDF("doc_id"), "doc_id", p0, d0, st0)
      stSame.collect().toSeq shouldBe st0.collect().toSeq
      pSame.count() shouldBe p0.count()
      dSame.count() shouldBe d0.count()
    }

    "deleting EVERY document restores the empty-index convention" in {
      val (p0, d0, st0) = Retrieval.bm25IndexTables(docs, "doc_id", col("text"))
      val (p1, d1, st1) = Retrieval.bm25DeleteFromTables(
        docs.select(col("doc_id")), "doc_id", p0, d0, st0)
      p1.count() shouldBe 0L
      d1.count() shouldBe 0L
      // (n=0, sumdl=NULL) — byte-identical to a fresh empty build
      val (_, _, stEmpty) = Retrieval.bm25IndexTables(
        docs.filter(lit(false)), "doc_id", col("text"))
      st1.collect().toSeq shouldBe stEmpty.collect().toSeq
      Retrieval.bm25TopKFromTables(p1, d1, st1, "doc_id", Seq("the"))
        .count() shouldBe 0L
    }

    "append onto an EMPTY index equals a fresh build of the batch" in {
      val none = docs.filter(lit(false))
      val (_, _, st0) = Retrieval.bm25IndexTables(none, "doc_id", col("text"))
      val (pd, dd, merged) = Retrieval.bm25AppendToTables(docs, "doc_id",
        col("text"), st0)
      val (_, _, stFull) = Retrieval.bm25IndexTables(docs, "doc_id", col("text"))
      merged.collect().toSeq shouldBe stFull.collect().toSeq
      val inline = Retrieval.bm25TopK(docs, "doc_id", col("text"), Seq("the"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val served = Retrieval.bm25TopKFromTables(pd, dd, merged, "doc_id",
          Seq("the"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      inline should not be empty
      served.toSeq shouldBe inline.toSeq
    }
  }

  "Retrieval.hardNegatives" - {
    "positives drop out and negatives renumber in retriever order" in {
      // single-term BM25 at equal dl ranks by tf: 1 > 2 > 3; doc 4 is
      // never a candidate (no query term)
      val df = Seq(
        (1L, "spark spark spark pad pad"),
        (2L, "spark spark other pad pad"),
        (3L, "spark other other pad pad"),
        (4L, "other other other pad pad")
      ).toDF("doc_id", "text")
      val queries = Seq((1L, "spark")).toDF("query_id", "term")
      val positives = Seq((1L, 1L)).toDF("query_id", "doc_id")
      val got = Retrieval.hardNegatives(df, "doc_id", col("text"),
          queries, positives, topK = 2, depth = 3)
        .select("query_id", "doc_id", "neg_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // top-ranked doc 1 is a known positive: doc 2 becomes negative #1
      got.toSeq.sortBy(_._3) shouldBe Seq((1L, 2L, 1L), (1L, 3L, 2L))
    }

    "depth below topK is rejected (the overfetch contract)" in {
      val df = Seq((1L, "spark")).toDF("doc_id", "text")
      val q = Seq((1L, "spark")).toDF("query_id", "term")
      val p = Seq.empty[(Long, Long)].toDF("query_id", "doc_id")
      an[IllegalArgumentException] should be thrownBy
        Retrieval.hardNegatives(df, "doc_id", col("text"), q, p,
          topK = 5, depth = 3)
    }
  }

  "Retrieval.ndcgAtK" - {
    "hand-computed binary nDCG; all-relevant prefix is exactly 1.0" in {
      val ranked = Seq(
        (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), // rel at ranks 1, 3
        (2L, 20L, 1L), (2L, 21L, 2L),                // rel at ranks 1, 2
        (3L, 30L, 1L)                                // no rel anywhere
      ).toDF("query_id", "doc_id", "rank")
      val qrels = Seq((1L, 10L), (1L, 12L),
        (2L, 20L), (2L, 21L), (2L, 99L)).toDF("query_id", "doc_id")
      val (d, idcg) = Retrieval.dcgDiscounts(5)
      val got = Retrieval.ndcgAtK(ranked, qrels, k = 5).collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      // same left fold as the operator: ((((0+t1)+t2)+t3)+t4)+t5
      val dcg1 = Seq(d(0), 0.0, d(2), 0.0, 0.0).foldLeft(0.0)(_ + _)
      got(1L) shouldBe ((dcg1, dcg1 / idcg(1))) // R=2 -> idcg at 2
      val dcg2 = Seq(d(0), d(1), 0.0, 0.0, 0.0).foldLeft(0.0)(_ + _)
      // q2: every retrieved rank is relevant and R=3 caps idcg at 3 —
      // but only 2 candidates exist, so dcg = prefix(2) < idcg(3)
      got(2L) shouldBe ((dcg2, dcg2 / idcg(2)))
      got(3L) shouldBe ((0.0, 0.0))
      // a query whose top-k is ENTIRELY relevant with R >= k scores
      // exactly 1.0 (identical fold association on both sides)
      val perfect = (1 to 5).map(i => (9L, i.toLong + 100, i.toLong))
        .toDF("query_id", "doc_id", "rank")
      val pq = (1 to 9).map(i => (9L, i.toLong + 100)).toDF("query_id", "doc_id")
      Retrieval.ndcgAtK(perfect, pq, k = 5).collect()(0).getDouble(2) shouldBe 1.0
    }
  }

  "Retrieval.reciprocalRank" - {
    "first relevant rank per query, zero for no hit, cutoff respected" in {
      val ranked = Seq(
        (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), // q1: rel at rank 2
        (2L, 20L, 1L), (2L, 21L, 2L),                // q2: no rel at all
        (3L, 30L, 1L), (3L, 31L, 6L)                 // q3: rel only PAST k
      ).toDF("query_id", "doc_id", "rank")
      val qrels = Seq((1L, 11L), (1L, 12L), (3L, 31L), (9L, 99L))
        .toDF("query_id", "doc_id")
      val got = Retrieval.reciprocalRank(ranked, qrels, k = 5).collect()
        .map(r => r.getLong(0) ->
          ((Option(r.get(1)).map(_.asInstanceOf[Long]), r.getDouble(2)))).toMap
      got(1L) shouldBe ((Some(2L), 0.5)) // min of ranks 2 and 3
      got(2L) shouldBe ((None, 0.0))
      got(3L) shouldBe ((None, 0.0))     // rank 6 is beyond k=5
      got.keySet shouldBe Set(1L, 2L, 3L) // qrels-only query 9 absent
    }
  }

  "Retrieval.rrfFuse" - {
    "hand-computed fusion: both-list docs beat single-list docs, absent = 0" in {
      val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
      val den = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
      val got = Retrieval.rrfFuse(Seq(lex, den), Seq("doc_id"), c = 60)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val score = got.map(t => t._1 -> t._2).toMap
      score(20L) shouldBe (1.0 / 62 + 1.0 / 61)
      score(10L) shouldBe (1.0 / 61) // absent from dense: exactly zero added
      score(40L) shouldBe (1.0 / 62)
      score(30L) shouldBe (1.0 / 63)
      // doc 20 is in BOTH lists: fusion puts it first despite rank 2 lexically
      got.sortBy(_._3).map(_._1).toSeq shouldBe Seq(20L, 10L, 40L, 30L)
    }

    "equal scores tie-break by ascending doc id" in {
      val a = Seq((7L, 1L), (3L, 2L)).toDF("doc_id", "rank")
      val b = Seq((3L, 1L), (7L, 2L)).toDF("doc_id", "rank")
      val got = Retrieval.rrfFuse(Seq(a, b), Seq("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      got.toSeq.sortBy(_._2) shouldBe Seq((3L, 1L), (7L, 2L)) // same score
    }

    "fusion plans equi-joins only (candidate lists never cross-join)" in {
      val a = Seq((10L, 1L)).toDF("doc_id", "rank")
      val b = Seq((11L, 1L)).toDF("doc_id", "rank")
      val plan = Retrieval.rrfFuse(Seq(a, b), Seq("doc_id"))
        .queryExecution.executedPlan.toString
      plan should not include "CartesianProduct"
      plan should not include "BroadcastNestedLoopJoin"
    }

    "batch fusion partitions ranks per query key" in {
      val a = Seq((1L, 10L, 1L), (2L, 10L, 1L)).toDF("query_id", "doc_id", "rank")
      val b = Seq((1L, 11L, 1L), (2L, 10L, 1L)).toDF("query_id", "doc_id", "rank")
      val got = Retrieval.rrfFuse(Seq(a, b), Seq("query_id", "doc_id"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
      // q1: docs 10 and 11 each appear in one list at rank 1 — equal
      // scores, ascending doc id breaks the tie WITHIN query 1 only
      got((1L, 10L)) shouldBe 1L
      got((1L, 11L)) shouldBe 2L
      got((2L, 10L)) shouldBe 1L // q2: doc 10 in both lists, rank 1
    }
  }
}

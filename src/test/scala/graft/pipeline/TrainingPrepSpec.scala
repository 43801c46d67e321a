package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** Benchmark decontamination, sequence packing, semantic dedup. */
class TrainingPrepSpec extends AnyFreeSpec with Matchers with SparkFixture {
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  "Decontaminate" - {
    "flags exactly the docs sharing an n-gram with the eval set" in {
      import spark.implicits._
      val corpus = Seq(
        (1L, "alpha beta gamma delta"),     // shares "alpha beta gamma"
        (2L, "delta epsilon zeta eta"),     // no 3-gram overlap
        (3L, "x alpha beta gamma y")        // shares the same 3-gram
      ).toDF("doc_id", "text")
      val eval = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
      val hits = Decontaminate.overlapHits(corpus, eval, "doc_id", "text", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      hits shouldBe Map(1L -> 1L, 3L -> 1L)
      Decontaminate.decontaminated(corpus, eval, "doc_id", "text", 3)
        .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(2L)
    }

    "counts distinct shared n-grams, not occurrences" in {
      import spark.implicits._
      // doc 1 shares two DISTINCT eval 2-grams; the repeat of "a b" in the
      // doc must not inflate the count (shingle sets are distinct)
      val corpus = Seq((1L, "a b c a b")).toDF("doc_id", "text")
      val eval = Seq((9L, "a b"), (10L, "b c")).toDF("doc_id", "text")
      val hits = Decontaminate.overlapHits(corpus, eval, "doc_id", "text", 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      hits shouldBe Map(1L -> 2L)
    }

    "clean corpus passes through untouched" in {
      val eval = docs.filter(col("doc_id") % 101 === 0)
      val corpus = docs.filter(col("doc_id") % 101 =!= 0)
      val out = Decontaminate.decontaminated(corpus, eval, "doc_id", "text", 3)
      // decontaminated ⊆ corpus and (corpus − flagged) = decontaminated
      val flagged =
        Decontaminate.overlapHits(corpus, eval, "doc_id", "text", 3).count()
      out.count() shouldBe corpus.count() - flagged
    }
  }

  "Packing.packSequences" - {
    lazy val packed = Packing.packSequences(
      docs, "doc_id", TextAnalysis.tokenCount(col("text")),
      budget = 256, shards = 4).cache()

    "keeps every row and assigns non-negative shard/pack/offset" in {
      packed.count() shouldBe docs.count()
      packed.filter(col("shard") < 0 || col("shard") >= 4 ||
        col("pack_no") < 0 || col("start_tok") < 0).count() shouldBe 0L
    }

    "start_tok is the running token count in hash order within a shard" in {
      // reconstruct the cumsum independently: sort each shard by the md5
      // hash and fold token counts
      val rows = packed
        .withColumn("__h", Sampling.md5Hash60(col("doc_id")))
        .withColumn("tok", TextAnalysis.tokenCount(col("text")).cast("long"))
        .select("shard", "__h", "doc_id", "start_tok", "tok")
        .collect()
        .groupBy(_.getLong(0))
      rows.values.foreach { shardRows =>
        var acc = 0L
        shardRows.sortBy(r => (r.getLong(1), r.getLong(2))).foreach { r =>
          r.getLong(3) shouldBe acc
          acc += r.getLong(4)
        }
      }
    }

    "pack_no = floor(start_tok / budget); packs are contiguous per shard" in {
      packed.filter(col("pack_no") =!=
        floor(col("start_tok") / 256)).count() shouldBe 0L
      // every pack index from 0 to max is populated (contiguous layout)
      packed.groupBy("shard").agg(
          countDistinct("pack_no").as("n"), max("pack_no").as("mx"))
        .filter(col("n") =!= col("mx") + 1).count() shouldBe 0L
    }

    "is deterministic across runs" in {
      val again = Packing.packSequences(
        docs, "doc_id", TextAnalysis.tokenCount(col("text")),
        budget = 256, shards = 4)
      packed.select("doc_id", "shard", "pack_no", "start_tok")
        .exceptAll(again.select("doc_id", "shard", "pack_no", "start_tok"))
        .count() shouldBe 0L
    }
  }

  "Packing.shardManifest" - {
    def manifest(df: org.apache.spark.sql.DataFrame) =
      Packing.shardManifest(df, "doc_id",
        TextAnalysis.tokenCount(col("text")),
        org.apache.spark.sql.functions.length(col("text")),
        Sampling.md5Hash60(col("text")), shards = 8)

    "masses and counts reconcile with the corpus totals" in {
      val m = manifest(docs).collect()
      m.map(_.getLong(1)).sum shouldBe docs.count()
      m.map(_.getLong(3)).sum shouldBe
        docs.agg(sum(org.apache.spark.sql.functions.length(col("text"))))
          .collect()(0).getLong(0)
      // shard ids inside range, every non-empty shard exactly once
      val ids = m.map(_.getLong(0))
      ids.distinct.length shouldBe ids.length
      all(ids) should (be >= 0L and be < 8L)
    }

    "the checksum is partitioning-invariant (order-independent fold)" in {
      val a = manifest(docs).collect()
        .map(r => r.getLong(0) -> r.getLong(4)).toMap
      val b = manifest(docs.repartition(17).sortWithinPartitions("n_chars"))
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
      b shouldBe a
    }

    "appending a batch only ADDS to shards: old manifest lines stay prefixes" in {
      // hash sharding => a doc's shard never changes when others arrive;
      // per-shard counters only grow and min/max ranges only widen
      val before = manifest(docs.filter(col("doc_id") % 3 =!= 0)).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val after = manifest(docs).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      before.foreach { case (shard, (docs0, tok0, bytes0)) =>
        val (docs1, tok1, bytes1) = after(shard)
        docs1 should be >= docs0
        tok1 should be >= tok0
        bytes1 should be >= bytes0
      }
    }
  }

  "Dedup.substringDupPairs" - {
    "finds docs sharing an aligned width-char run; counts distinct windows" in {
      import spark.implicits._
      val run = ('a' to 'z').mkString * 2 // 52 chars, shared verbatim
      val corpus = Seq(
        (1L, run + " tail one"),
        (2L, run + " other ending"),
        (3L, "completely unrelated text that is long enough to window")
      ).toDF("doc_id", "text")
      val pairs = Dedup.substringDupPairs(corpus, "text", "doc_id", 40, 10)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      pairs.keySet shouldBe Set((1L, 2L))
      pairs((1L, 2L)) shouldBe 2L // positions 1 and 11 fit inside the run
    }

    "ubiquitous-window pruning drops boilerplate matches" in {
      import spark.implicits._
      val boiler = "this header appears everywhere in the corpus!!"
      val corpus = (1L to 5L).map(i => (i, boiler + s" unique tail $i"))
        .toDF("doc_id", "text")
      Dedup.substringDupPairs(corpus, "text", "doc_id", 40, 10)
        .count() should be > 0L // without pruning: all pairs match
      Dedup.substringDupPairs(corpus, "text", "doc_id", 40, 10,
        maxDocsPerWindow = Some(3)).count() shouldBe 0L
    }

    "texts shorter than the window emit nothing" in {
      import spark.implicits._
      val corpus = Seq((1L, "short"), (2L, "short")).toDF("doc_id", "text")
      Dedup.substringDupPairs(corpus, "text", "doc_id", 40, 10)
        .count() shouldBe 0L
    }
  }

  "plan shapes hold the 100 TB contracts" - {
    "decontaminate: eval side broadcasts; the corpus never shuffles below the join" in {
      val eval = docs.filter(col("doc_id") % 101 === 0)
      val corpus = docs.filter(col("doc_id") % 101 =!= 0)
      val plan = Decontaminate.overlapHits(corpus, eval, "doc_id", "text", 3)
        .queryExecution.executedPlan.toString
      plan should include("BroadcastHashJoin")
      // the only Exchanges are the eval-side distinct and the post-join
      // hit count — the corpus branch (Generate..FileScan) has none
      val corpusBranch = plan.linesIterator
        .dropWhile(!_.contains("BroadcastHashJoin")).takeWhile(l =>
          !l.contains("BroadcastExchange")).mkString("\n")
      corpusBranch should not include "Exchange hashpartitioning"
    }

    "packSequences: exactly one Exchange (the shard partitioning)" in {
      // params differ from the cached `packed` above: a cache hit would
      // splice the already-executed AQE plan (Initial+Final) into the
      // string and double-count the Exchange
      val plan = Packing.packSequences(docs, "doc_id",
          TextAnalysis.tokenCount(col("text")), 128, 2)
        .queryExecution.executedPlan.toString
      withClue(plan) {
        "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
        plan should not include "Exchange rangepartitioning" // no global sort
      }
    }

    "substringDupPairs (pruned): join-free — window exchange + pair agg only" in {
      val plan = Dedup.substringDupPairs(docs, "text", "doc_id", 40, 10,
          maxDocsPerWindow = Some(50))
        .queryExecution.executedPlan.toString
      withClue(plan) {
        // the prune count and the bounded bucket-group ride ONE exchange
        // on the window; the pair aggregate is the only other shuffle
        plan should not include "Join"
        "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 2
      }
    }

    "rollup report: one Expand over one scan, not a union of scans" in {
      val plan = docs.rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("docs"))
        .queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include("Expand")
        "FileScan".r.findAllIn(plan).size shouldBe 1
      }
    }

    "semanticDedupPairs: the cell join is sort-merge, never a corpus broadcast" in {
      val plan = Similarity
        .semanticDedupPairs(embeddings, "vec_id", "embedding", 0.4, nlist = 8)
        .queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      // the only broadcast is the tiny centroid set (nested-loop cross
      // join for assignment) — never a corpus-sized hash side
      plan should not include "BroadcastHashJoin"
    }
  }

  "TextAnalysis.repetitionStats" - {
    "hand-computed Gopher repetition gates, tie-break, short-doc zeroes" in {
      import spark.implicits._
      val df = Seq(
        (1L, "a b a b a b"), // bigrams: "a b"×3, "b a"×2
        (2L, "z y z x"),     // all bigrams unique; tie → smallest gram
        (3L, "one")          // < 2 tokens: zero grams, zero fractions
      ).toDF("id", "text")
      val got = TextAnalysis.repetitionStats(df, "id", col("text"),
          n = 2, chunkWords = 2)
        .collect().map(r => r.getLong(0) -> r).toMap

      val a = got(1L)
      a.getLong(1) shouldBe 5L // total bigrams
      a.getLong(2) shouldBe 2L // distinct
      a.getDouble(3) shouldBe (1.0 - 2.0 / 5.0) // dup_gram_frac
      // top gram "a b" (cnt 3, 3 chars) over len 11
      a.getDouble(4) shouldBe (3.0 * 3.0 / 11.0)
      // 2-word chunks: ["a b","a b","a b"] → 1 distinct of 3
      a.getDouble(5) shouldBe (1.0 - 1.0 / 3.0)

      val b = got(2L)
      b.getLong(1) shouldBe 3L
      b.getLong(2) shouldBe 3L
      b.getDouble(3) shouldBe 0.0
      // all counts tie at 1 → lexicographically smallest bigram "y z"
      // (3 chars) wins; len("z y z x") = 7
      b.getDouble(4) shouldBe (3.0 / 7.0)
      // chunks ["z y","z x"] — distinct
      b.getDouble(5) shouldBe 0.0

      val c = got(3L)
      c.getLong(1) shouldBe 0L
      c.getLong(2) shouldBe 0L
      c.getDouble(3) shouldBe 0.0
      c.getDouble(4) shouldBe 0.0
      c.getDouble(5) shouldBe 0.0
    }

    "a looped document maxes the gates a unique-text corpus passes" in {
      import spark.implicits._
      val df = Seq(
        (1L, ("spam loop " * 40).trim),
        (2L, "every word here is different from the others entirely")
      ).toDF("id", "text")
      val got = TextAnalysis.repetitionStats(df, "id", col("text"),
          n = 2, chunkWords = 4)
        .collect().map(r => r.getLong(0) -> r).toMap
      got(1L).getDouble(3) should be > 0.9  // dup_gram_frac → 1
      got(1L).getDouble(5) should be > 0.8  // dup_chunk_frac → 1
      got(2L).getDouble(3) shouldBe 0.0
      got(2L).getDouble(5) shouldBe 0.0
    }
  }

  "TextAnalysis.topTerms" - {
    "ranks by tf desc, then rarity (df asc), then token asc" in {
      import spark.implicits._
      val df = Seq(
        (1L, "apple apple banana cherry"),
        (2L, "banana cherry cherry")).toDF("doc_id", "text")
      // doc 1: apple tf=2 (rank 1); banana/cherry tf=1 df=2 → token order
      // doc 2: cherry tf=2 (rank 1); banana tf=1
      val got = TextAnalysis.topTerms(df, "doc_id", "text", 3)
        .collect().map(r => (r.getLong(0), r.getInt(4), r.getString(1))).toSet
      got shouldBe Set(
        (1L, 1, "apple"), (1L, 2, "banana"), (1L, 3, "cherry"),
        (2L, 1, "cherry"), (2L, 2, "banana"))
    }

    "rarity breaks tf ties: rarer token ranks higher" in {
      import spark.implicits._
      val df = Seq(
        (1L, "common rare"),
        (2L, "common filler"),
        (3L, "common other")).toDF("doc_id", "text")
      // doc 1: tf(common)=tf(rare)=1, df(common)=3 > df(rare)=1 → rare first
      val doc1 = TextAnalysis.topTerms(df, "doc_id", "text", 2)
        .filter(col("doc_id") === 1).orderBy("rank")
        .collect().map(_.getString(1)).toSeq
      doc1 shouldBe Seq("rare", "common")
    }
  }

  "TextAnalysis.stripMarkup" - {
    "drops script/style bodies, strips tags, decodes entities, collapses space" in {
      import spark.implicits._
      val html = "<html><script>var hidden = 1;</script><style>b{}</style>" +
        "<p>Hello   <b>world</b></p>&amp; more &lt;tag&gt; &nbsp;end</html>"
      val got = Seq(html).toDF("t")
        .select(TextAnalysis.stripMarkup(col("t"))).collect()(0).getString(0)
      got shouldBe "Hello world & more <tag> end"
    }

    "decodes &amp; last so double-encoded text cannot re-form entities" in {
      import spark.implicits._
      val got = Seq("&amp;lt;still-text&amp;gt;").toDF("t")
        .select(TextAnalysis.stripMarkup(col("t"))).collect()(0).getString(0)
      got shouldBe "&lt;still-text&gt;"
    }

    "plain text passes through trimmed" in {
      import spark.implicits._
      Seq("  just   words  ").toDF("t")
        .select(TextAnalysis.stripMarkup(col("t")))
        .collect()(0).getString(0) shouldBe "just words"
    }

    "uppercase SCRIPT/Style blocks are dropped too (crawled HTML is sloppy)" in {
      import spark.implicits._
      val got = Seq("<SCRIPT>var t = track();</SCRIPT><Style>b{}</Style>ok")
        .toDF("t").select(TextAnalysis.stripMarkup(col("t")))
        .collect()(0).getString(0)
      got shouldBe "ok"
    }
  }

  "TextAnalysis.collocations" - {
    "computes hand-checked lift and breaks ties by (w1, w2)" in {
      import spark.implicits._
      val df = Seq("new york new york", "old york").toDF("text")
      // unigrams: new 2, york 3, old 1 (N=6); bigrams: "new york" 2,
      // "york new" 1, "old york" 1 (N=4)
      // lift(new york) = 2*36/(2*3*4) = 3.0; lift(old york) = 36/(1*3*4)
      // = 3.0 (tie → "new" < "old"); lift(york new) = 36/(3*2*4) = 1.5
      val got = TextAnalysis.collocations(df, col("text"), minCount = 1L, k = 10)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(5)))
      got.toSeq shouldBe Seq(
        ("new", "york", 3.0), ("old", "york", 3.0), ("york", "new", 1.5))
    }

    "minCount floors rare pairs out of the ranking" in {
      import spark.implicits._
      val df = Seq("a b a b", "c d").toDF("text")
      val got = TextAnalysis.collocations(df, col("text"), minCount = 2L, k = 10)
        .collect().map(r => (r.getString(0), r.getString(1)))
      got.toSeq shouldBe Seq(("a", "b")) // "b a"/"c d" occur once
    }

    "plans top-k via TakeOrdered with no cartesian join" in {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
      val plan = TextAnalysis.collocations(docs, col("text"), 5L, 100)
        .queryExecution.executedPlan.toString
      plan should include("TakeOrderedAndProject")
      // the only nested-loop joins are the broadcast scalar attaches
      // (1-row N_uni / N_bi totals); a real cartesian would plan as
      // CartesianProduct (both sides partitioned)
      plan should not include "CartesianProduct"
    }
  }

  "Sampling.mixExact" - {
    "takes exactly ceil(fraction_i * n_i) rows per stratum" in {
      val mix = Map("src0" -> 0.5, "src1" -> 0.25)
      val per = Sampling.mixExact(docs, "source", "doc_id", mix, default = 0.1)
        .groupBy("source").count()
      val want = docs.groupBy("source").count()
        .withColumn("frac",
          when(col("source") === "src0", 0.5)
            .when(col("source") === "src1", 0.25).otherwise(0.1))
        .withColumn("want", ceil(col("count") * col("frac"))).drop("count")
      per.join(want, "source")
        .filter(col("count") =!= col("want")).count() shouldBe 0L
    }

    "default 0.0 drops unlisted strata entirely" in {
      val only = Sampling.mixExact(docs, "source", "doc_id",
        Map("src0" -> 1.0))
      only.filter(col("source") =!= "src0").count() shouldBe 0L
      only.count() shouldBe docs.filter(col("source") === "src0").count()
    }

    "agrees with stratifiedExact when every fraction is equal" in {
      val strata = docs.select("source").distinct()
        .collect().map(_.getString(0))
      val viaMix = Sampling.mixExact(docs, "source", "doc_id",
        strata.map(_ -> 0.2).toMap)
      val viaStrat = Sampling.stratifiedExact(docs, "source", "doc_id", 0.2)
      viaMix.select("doc_id").exceptAll(viaStrat.select("doc_id"))
        .count() shouldBe 0L
      viaMix.count() shouldBe viaStrat.count()
    }
  }

  "Clustering.kmediansAssign" - {
    "assigns every row to a cluster in [0, k)" in {
      val out = Clustering.kmediansAssign(
        embeddings, "vec_id", "embedding", k = 4, iters = 1)
      out.count() shouldBe embeddings.count()
      out.filter(col("cluster") < 0 || col("cluster") >= 4)
        .count() shouldBe 0L
      // no degenerate single-cluster collapse on real data
      out.select("cluster").distinct().count() should be > 1L
    }

    "is deterministic across runs" in {
      def run() = Clustering.kmediansAssign(
          embeddings, "vec_id", "embedding", k = 4, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      run() shouldBe run()
    }

    "identical vectors always share a cluster" in {
      val base = embeddings.limit(10)
      val dups = base.withColumn("vec_id", col("vec_id") + 1000000L)
      val out = Clustering.kmediansAssign(
          base.unionByName(dups), "vec_id", "embedding", k = 3, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0 until 10).foreach { i =>
        val id = base.collect()(i).getLong(0)
        out(id + 1000000L) shouldBe out(id)
      }
    }
  }

  "Similarity.semanticDedupPairs" - {
    "finds within-cluster pairs only, as a subset of the exact pair set" in {
      val exact = Similarity
        .cosineNearDupPairs(embeddings, "vec_id", "embedding", 0.4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sem = Similarity
        .semanticDedupPairs(embeddings, "vec_id", "embedding", 0.4, nlist = 8)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      sem.subsetOf(exact) shouldBe true
    }

    "identical vectors always land in the same cluster and are flagged" in {
      import spark.implicits._
      // a planted exact duplicate must be found regardless of clustering
      val dup = embeddings.limit(1)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      val sem = Similarity.semanticDedupPairs(
          embeddings.unionByName(dup), "vec_id", "embedding",
          threshold = 0.999, nlist = 8)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val origId = embeddings.limit(1)
        .select("vec_id").collect().head.getLong(0)
      sem should contain((origId, origId + 1000000L))
    }

    "pair cost is bounded by cluster occupancy (no cross-cluster pairs)" in {
      val sem = Similarity.semanticDedupPairs(
        embeddings, "vec_id", "embedding", -1.0, nlist = 8) // keep all pairs
      // with threshold -1 every within-cluster pair is emitted; the count
      // must equal sum over clusters of n_c·(n_c−1)/2 — proves the search
      // space is exactly the cluster-scoped one
      val perCell = sem.groupBy("cid").count()
      val byAssign = sem.select(explode(array(col("id_a"), col("id_b")))
          .as("id"), col("cid"))
        .distinct().groupBy("cid").agg(countDistinct("id").as("n"))
        .withColumn("expect", col("n") * (col("n") - 1) / 2)
      perCell.join(byAssign, "cid")
        .filter(col("count") =!= col("expect")).count() shouldBe 0L
    }
  }

  "TextAnalysis.classifierScore" - {
    "matches a driver-side computation of the same features" in {
      import spark.implicits._
      val rows = Seq(
        (1L, "the cat and the dog"),         // stopwords, one repeat
        (2L, "x x x x x x"),                 // pure repetition
        (3L, ""),                            // empty: one empty token
        (4L, "rich varied vocabulary with the many different words here"))
        .toDF("doc_id", "text")
      val w = TextAnalysis.DefaultClassifierWeights
      val stop = TextAnalysis.Stopwords("en").toSet
      def ref(text: String): Double = {
        val toks = text.split(" ", -1)
        val counts = toks.groupBy(identity).view.mapValues(_.length)
        val stopHits = text.trim.toLowerCase.split("\\s+", -1).count(stop)
        w(0) + toks.length * w(1) + counts.size * w(2) +
          counts.values.max * w(3) + stopHits * w(4) + text.length * w(5)
      }
      val got = rows.select(col("doc_id"),
          TextAnalysis.classifierScore(col("text")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for ((id, text) <- Seq((1L, "the cat and the dog"), (2L, "x x x x x x"),
          (3L, ""), (4L, "rich varied vocabulary with the many different words here")))
        withClue(s"doc $id: ") { got(id) shouldBe ref(text) } // EXACT, no +-
    }

    "scores are dyadic-exact: score × 2^6 is an integer" in {
      val nonIntegral = docs
        .select((TextAnalysis.classifierScore(col("text")) * 64).as("s64"))
        .filter(col("s64") =!= floor(col("s64"))).count()
      nonIntegral shouldBe 0L
    }
  }

  "TextAnalysis.ruleClean" - {
    "applies word-count, blocklist and terminal-punctuation rules in order" in {
      import spark.implicits._
      val df = Seq(
        (1L, Seq("This sentence has enough words today.",
                 "too short.",                       // < 4 words
                 "enable javascript to view content.", // blocklisted
                 "Another good long sentence stands here.")),
        (2L, Seq("no terminal punctuation on this line",  // dropped: terminal
                 "A proper ending appears right here!")),
        (3L, Seq("every single line", "gets dropped"))    // all < 4 w/ punct
      ).toDF("doc_id", "lines")
      val got = TextAnalysis.ruleClean(df, "doc_id", col("lines"),
          minWords = 4, banned = Seq("javascript", "lorem ipsum"),
          requireTerminal = true, minKeptLines = 1, sep = " | ")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      got shouldBe Map(
        1L -> ("This sentence has enough words today. | Another good long sentence stands here.", 2L),
        2L -> ("A proper ending appears right here!", 1L)) // doc 3 vanished
    }

    "minKeptLines drops sparse documents and blocklist is case-insensitive" in {
      import spark.implicits._
      val df = Seq(
        (1L, Seq("Only one surviving line here.", "LOREM IPSUM dolor sit amet.")),
        (2L, Seq("First keeper line stands here.", "Second keeper line stands here."))
      ).toDF("doc_id", "lines")
      val got = TextAnalysis.ruleClean(df, "doc_id", col("lines"),
          minWords = 4, banned = Seq("lorem ipsum"),
          requireTerminal = true, minKeptLines = 2)
        .collect().map(_.getLong(0)).toSet
      got shouldBe Set(2L) // doc 1 kept only 1 line after the blocklist hit
    }
  }

  "TextAnalysis.ngramNovelty" - {
    "scores crafted docs by their share of corpus-unique n-grams" in {
      import spark.implicits._
      val df = Seq(
        (1L, "a b c d"),   // bigrams {a b, b c, c d}; "a b" shared with 2
        (2L, "a b x y"),   // {a b, b x, x y}
        (3L, "p q r s")    // fully unique
      ).toDF("doc_id", "text")
      val got = TextAnalysis.ngramNovelty(df, "doc_id", col("text"), 2)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      got shouldBe Map(
        1L -> ((3L, 2L, 2.0 / 3.0)),
        2L -> ((3L, 2L, 2.0 / 3.0)),
        3L -> ((3L, 3L, 1.0)))
    }

    "within-doc repeats do not dilute document frequency" in {
      import spark.implicits._
      // "a b" appears twice inside doc 1 but nowhere else: it must still
      // count as unique-to-doc-1 (shingle sets are distinct per doc)
      val df = Seq((1L, "a b c a b"), (2L, "z z z")).toDF("doc_id", "text")
      val got = TextAnalysis.ngramNovelty(df, "doc_id", col("text"), 2)
        .filter(col("id") === 1L).collect().head
      got.getLong(2) shouldBe got.getLong(1) // every shingle unique
      got.getDouble(3) shouldBe 1.0
    }

    "every doc duplicated means zero novelty everywhere" in {
      val twice = docs.select(col("doc_id"), col("text"))
        .union(docs.select(col("doc_id") + 100000, col("text")))
      val out = TextAnalysis.ngramNovelty(twice, "doc_id", col("text"), 3)
      out.filter(col("novelty") =!= 0.0).count() shouldBe 0L
    }
  }

  "TextAnalysis.boilerplateLineDedup" - {
    "drops lines above the doc-frequency bar, keeps order, drops empty docs" in {
      import spark.implicits._
      val df = Seq(
        (1L, Seq("COOKIE BANNER", "real content one", "more text")),
        (2L, Seq("COOKIE BANNER", "other words here")),
        (3L, Seq("COOKIE BANNER", "COOKIE BANNER")), // all boilerplate
        (4L, Seq("unique only"))
      ).toDF("doc_id", "lines")
      val got = TextAnalysis.boilerplateLineDedup(
          df, "doc_id", col("lines"), maxDocFreq = 1, sep = " | ")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      got shouldBe Map(
        1L -> ("real content one | more text", 2L),
        2L -> ("other words here", 1L),
        4L -> ("unique only", 1L)) // doc 3 vanished entirely
    }

    "repeats within one document do not make a line boilerplate" in {
      import spark.implicits._
      val df = Seq(
        (1L, Seq("chorus", "verse", "chorus")), // 2 occurrences, 1 doc
        (2L, Seq("bridge"))
      ).toDF("doc_id", "lines")
      val got = TextAnalysis.boilerplateLineDedup(
          df, "doc_id", col("lines"), maxDocFreq = 1)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got(1L) shouldBe "chorus verse chorus" // countDistinct(doc) = 1, kept
    }

    "the anti-join fallback path matches the in-row broadcast path" in {
      import spark.implicits._
      val df = Seq(
        (1L, Seq("NAV BAR", "FOOTER", "body a", "body b")),
        (2L, Seq("NAV BAR", "FOOTER", "body c")),
        (3L, Seq("NAV BAR", "only nav")),
        (4L, Seq("FOOTER")) // all boilerplate — must vanish on both paths
      ).toDF("doc_id", "lines")
      def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // bound 1 < |{NAV BAR, FOOTER}| forces the fallback
      val fallback = TextAnalysis.boilerplateLineDedupBounded(
        df, "doc_id", col("lines"), maxDocFreq = 1, sep = " | ",
        maxBroadcast = 1)
      val inRow = TextAnalysis.boilerplateLineDedup(
        df, "doc_id", col("lines"), maxDocFreq = 1, sep = " | ")
      rows(fallback) shouldBe rows(inRow)
      rows(fallback).map(_._1) shouldBe Set(1L, 2L, 3L)
      fallback.unpersist() // fallback returns a caller-owned cache
    }
  }

  "Snapshot.diff" - {
    "classifies added/removed/changed and omits unchanged" in {
      import spark.implicits._
      val old = Seq((1L, "same"), (2L, "gone"), (3L, "before"))
        .toDF("doc_id", "text")
      val cur = Seq((1L, "same"), (3L, "after"), (4L, "fresh"))
        .toDF("doc_id", "text")
      val got = Snapshot.diff(old, cur, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got shouldBe Map(2L -> "removed", 3L -> "changed", 4L -> "added")
    }

    "identical snapshots produce an empty delta" in {
      Snapshot.diff(docs, docs, "doc_id", "text").count() shouldBe 0L
    }

    "NULL text means present-with-NULL, not absent" in {
      import org.apache.spark.sql.types._
      def df(rows: Seq[(Long, String)]) = spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2)): _*),
        StructType(Seq(StructField("doc_id", LongType, false),
          StructField("text", StringType, true))))
      // text → NULL is 'changed'; NULL → NULL is unchanged (no row)
      val got = Snapshot.diff(
          df(Seq(1L -> "x", 2L -> null)), df(Seq(1L -> null, 2L -> null)),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got shouldBe Map(1L -> "changed")
    }

    "shuffles fingerprints, not document bodies" in {
      // the exchange must sit above the (id, md5) projection: text never
      // crosses the network
      val plan = Snapshot.diff(docs, docs, "doc_id", "text")
        .queryExecution.executedPlan.toString
      val exchangeIdx = plan.indexOf("Exchange")
      exchangeIdx should be >= 0
      // no Exchange row carries the raw text column (projections below
      // the shuffle reduce to id + fingerprint)
      plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
        .foreach(l => l should not include "text")
    }
  }
}

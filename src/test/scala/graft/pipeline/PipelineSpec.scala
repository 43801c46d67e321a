package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** Dedup / similarity / text-analysis / multimodal behavior on the
  * sf0.001 fixtures + crafted rows. */
class PipelineSpec extends AnyFreeSpec with Matchers with SparkFixture {
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  "Dedup" - {
    "exact survivors keep the smallest id per content" in {
      import spark.implicits._
      val df = Seq((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "aa"))
        .toDF("doc_id", "text")
      val got = Dedup.exactSurvivors(df, "text", "doc_id")
        .select("doc_id", "copies").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe Set((1L, 3L), (2L, 1L))
    }

    "normSurvivors: longest variant wins, tie breaks to the smallest id" in {
      import spark.implicits._
      val df = Seq(
        (1L, "Hello,  world!"),       // group A: normalizes to "hello world"
        (2L, "hello world"),          // shorter variant
        (3L, "HELLO *** WORLD ***"),  // longest variant → survivor
        (4L, "other doc"),            // singleton
        (5L, "OTHER DOC"),            // same length (9) as 4 → tie → id 4
        (6L, "unrelated")).toDF("doc_id", "text")
      val got = Dedup.normSurvivors(df, "text", "doc_id")
        .select("doc_id", "copies", "max_len").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got shouldBe Set((3L, 3L, 19L), (4L, 2L, 9L), (6L, 1L, 9L))
    }

    "cdcChunkDupCounts: identical docs share all chunks; prefix shift survives" in {
      import spark.implicits._
      val text = (1 to 40).map(i => s"tok$i").mkString(" ")
      // identical pair: every chunk shared exactly twice
      val twins = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      val g1 = Dedup.cdcChunkDupCounts(twins, "doc_id", col("text"), 3)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      g1 should not be empty
      g1.foreach { case (d, o) => d shouldBe 2L; o shouldBe 2L }
      // PREFIX-SHIFTED copy: interior boundaries don't move, so shared
      // chunks survive — the case every fixed-stride window scheme misses
      val shifted = Seq((1L, text), (2L, "zzz " + text)).toDF("doc_id", "text")
      val g2 = Dedup.cdcChunkDupCounts(shifted, "doc_id", col("text"), 3)
        .collect()
      g2.length should be >= 1
      // only the chunk containing the prefix can differ: shifted doc
      // shares all but at most one of the identical-pair chunk set
      g2.length should be >= g1.length - 1
    }

    "minhashEstimates: identical docs hit the est=1 ceiling; estimates bounded" in {
      import spark.implicits._
      val df = Seq(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "alpha beta gamma delta epsilon zeta"), // exact copy of 1
        (3L, "alpha beta gamma delta eta theta"),    // partial overlap
        (4L, "iota kappa lambda mu nu xi")           // disjoint
      ).toDF("doc_id", "text")
      val got = Dedup.minhashEstimates(df, "doc_id", col("text"),
          shingleN = 3, k = 8, bands = 4)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getDouble(3)))).toMap
      got((1L, 2L)) shouldBe ((8L, 1.0)) // identical signatures everywhere
      got.foreach { case (_, (m, e)) =>
        m should (be >= 0L and be <= 8L)
        e shouldBe m.toDouble / 8.0
      }
      // the disjoint doc shares no shingles, so its signature mins come
      // from different hash draws — it never reaches the ceiling with 1/2/3
      got.keys.filter(p => p._1 == 4L || p._2 == 4L).foreach { p =>
        got(p)._2 should be < 1.0
      }
    }

    "mega-bucket occupancy split: join fallback is exact and pair-complete" in {
      import spark.implicits._
      // adversarial skew: one LSH bucket with 10⁴ members (a mass-
      // duplicated doc, every signature identical). Under the default
      // bucket-group shape this was ONE non-spillable collect_list buffer
      // holding all 10⁴ members; with the occupancy split (maxBucket=64)
      // no aggregation buffer ever holds more than 64 — the mega bucket
      // routes through the spillable merge join — and the pair set is
      // bit-identical: all C(10⁴,2) pairs, none dropped, none invented.
      val n = 10000
      val sigs = spark.range(n).select(col("id"),
        array(lit(7L), lit(11L), lit(13L), lit(17L)).as("sig"))
      val cnt = Dedup.lshCandidatePairs(sigs, "id", "sig", bands = 2, k = 4,
        maxBucket = 64).count()
      cnt shouldBe n.toLong * (n - 1) / 2
    }

    "mega-bucket split: both routes agree on a mixed-skew corpus" in {
      import spark.implicits._
      // 60 copies of one doc (mega bucket under maxBucket=8) + near-dups
      // + disjoint docs: force the join route and compare against the
      // pure bucket-group route — identical pairs, matches, estimates.
      val rows = (1L to 60L).map(i => (i, "alpha beta gamma delta epsilon zeta")) ++
        Seq((100L, "alpha beta gamma delta eta theta"),
            (101L, "iota kappa lambda mu nu xi"),
            (102L, "iota kappa lambda mu nu xi"))
      val df = rows.toDF("doc_id", "text")
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
      canon(Dedup.minhashEstimates(df, "doc_id", col("text"), 3, 8, 4,
          maxBucket = 8)) shouldBe
        canon(Dedup.minhashEstimates(df, "doc_id", col("text"), 3, 8, 4))
      canon(Dedup.simhashPairs(df, "text", "doc_id", maxHamming = 3,
          maxBucket = 8)) shouldBe
        canon(Dedup.simhashPairs(df, "text", "doc_id", maxHamming = 3))
    }

    "mega-bucket split: one band shuffle feeds both routes (AQE reuse)" in {
      import spark.implicits._
      // the occupancy split must not triple-scan the corpus: at runtime
      // the mega-join's two sides resolve to ReusedExchange of the small
      // route's single (band, bh) shuffle — the banding subtree runs once
      val sigs = spark.range(200).select(col("id"),
        array(lit(3L), lit(5L), lit(7L), lit(9L)).as("sig"))
      val p = Dedup.lshCandidatePairs(sigs, "id", "sig", bands = 2, k = 4,
        maxBucket = 16)
      p.collect()
      val plan = p.queryExecution.executedPlan.toString
      withClue(plan) {
        "ReusedExchange".r.findAllIn(plan).size should be >= 2
      }
    }

    "lshBandStats: identical docs share every bucket, occupancy algebra exact" in {
      import spark.implicits._
      // two identical docs + one unrelated (no shared shingles): in EVERY
      // band the twins land in one bucket of 2, the loner in its own →
      // n_buckets=2, max=2, singletons=1, candidate_pairs=1
      val df = Seq(
        (1L, "alpha beta gamma delta epsilon"),
        (2L, "alpha beta gamma delta epsilon"),
        (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
      val got = Dedup.lshBandStats(df, "doc_id", col("text"),
          shingleN = 3, k = 8, bands = 4)
        .as[(Int, Long, Long, Long, Long)].collect().toSeq
      got shouldBe (0 until 4).map(b => (b, 2L, 2L, 1L, 1L))
    }

    "lshBandStats: disjoint corpora yield singleton buckets, zero candidates" in {
      import spark.implicits._
      val df = (1L to 6L).map(i =>
        (i, s"tok${i}a tok${i}b tok${i}c tok${i}d")).toDF("doc_id", "text")
      val got = Dedup.lshBandStats(df, "doc_id", col("text"),
          shingleN = 3, k = 4, bands = 2)
        .as[(Int, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq((0, 6L, 1L, 6L, 0L), (1, 6L, 1L, 6L, 0L))
    }

    "as-of join: latest at-or-before per key, inclusive ties, null when none" in {
      import spark.implicits._
      val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 15L, "p3"))
        .toDF("k", "ts", "name")
      val right = Seq((1L, 5L, "r5"), (1L, 10L, "r10"), (1L, 25L, "r25"),
        (3L, 1L, "rX")).toDF("k", "ts", "v")
      val got = AsOfJoin.asof(left, right, "k", "ts", Seq("v"))
        .select("name", "v_right").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      got shouldBe Map(
        "p1" -> Some("r10"), // tie at ts=10 matches (inclusive at-or-before)
        "p2" -> Some("r10"), // r25 is after, r10 latest prior
        "p3" -> None)        // key 2 has no right rows; key 3 never leaks
    }

    "as-of join: NULL keys never match; right-side ties pick deterministically" in {
      import spark.implicits._
      val left = Seq((Option.empty[Long], 10L, "pN"), (Some(1L), 10L, "p1"))
        .toDF("k", "ts", "name")
      val right = Seq((Option.empty[Long], 5L, "rN"),
        (Some(1L), 5L, "rA"), (Some(1L), 5L, "rB")).toDF("k", "ts", "v")
      val got = AsOfJoin.asof(left, right, "k", "ts", Seq("v"))
        .select("name", "v_right").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      got shouldBe Map(
        "pN" -> None,       // NULL key: SQL semantics, no NULL-to-NULL match
        "p1" -> Some("rB")) // tie at (k=1, ts=5): greatest payload wins
    }

    "forward as-of: earliest at-or-after per key, inclusive ties, null when none" in {
      import spark.implicits._
      val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 30L, "p3"))
        .toDF("k", "ts", "name")
      val right = Seq((1L, 10L, "r10"), (1L, 25L, "r25"), (1L, 5L, "r5"))
        .toDF("k", "ts", "v")
      val got = AsOfJoin.asof(left, right, "k", "ts", Seq("v"),
          forward = true)
        .select("name", "v_right").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      got shouldBe Map(
        "p1" -> Some("r10"), // tie at ts=10 matches (inclusive at-or-after)
        "p2" -> Some("r25"), // r10 is before; r25 is the next
        "p3" -> None)        // nothing after ts=30
    }

    "as-of join plans exactly one shuffle (no range-join explosion)" in {
      import spark.implicits._
      val left = Seq((1L, 10L, "p1")).toDF("k", "ts", "name")
      val right = Seq((1L, 5L, "r5")).toDF("k", "ts", "v")
      val plan = AsOfJoin.asof(left, right, "k", "ts", Seq("v"))
        .queryExecution.executedPlan.toString
      "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
      plan should not include "CartesianProduct"
      plan should not include "BroadcastNestedLoopJoin"
    }

    "duplicate clusters: min-label components, chains included" in {
      import spark.implicits._
      // 1-2-3 is a CHAIN (no direct 1-3 pair): propagation must walk
      // hops, not just fold direct pairs; 5-6 is a separate component
      val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
      val got = Dedup.duplicateClusters(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe Set((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
    }

    "star components match label propagation on chains, stars and random graphs" in {
      import spark.implicits._
      // a LONG PATH is label propagation's worst case (O(diameter)
      // rounds) and the reason the star algorithm exists — include one
      // outright, plus seeded random graphs with singleton-free shapes
      val path = (0L until 17L).sliding(2).map(s => (s(0), s(1))).toSeq
      val rnd = new scala.util.Random(7)
      val random = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      val dup = Seq((9L, 3L), (3L, 9L), (9L, 3L)) // duplicates + both orders
      for (pairSeq <- Seq(path, random, dup, path ++ random)) {
        val pairs = pairSeq.toDF("id_a", "id_b")
        val viaStar = Dedup.duplicateClustersStar(pairs).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val viaLabels = Dedup.duplicateClusters(pairs).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        viaStar shouldBe viaLabels
      }
      // empty pair table: no spin, empty output
      Dedup.duplicateClustersStar(
        Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() shouldBe 0L
    }

    "soft dedup weights: every copy kept, mass sums to one per content" in {
      import spark.implicits._
      val df = Seq((1L, "aa"), (3L, "aa"), (7L, "aa"), (2L, "bb"))
        .toDF("doc_id", "text")
      val got = Dedup.softDedupWeights(df, "text", "doc_id").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      got shouldBe Map(
        1L -> ((3L, 1.0 / 3)), 3L -> ((3L, 1.0 / 3)), 7L -> ((3L, 1.0 / 3)),
        2L -> ((1L, 1.0)))
    }

    "exact duplicate pairs point at the canonical" in {
      import spark.implicits._
      val df = Seq((1L, "aa"), (3L, "aa"), (2L, "bb")).toDF("doc_id", "text")
      Dedup.exactDuplicatePairs(df, "text", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((3L, 1L))
    }

    "minhash-LSH finds the same near-dup pairs as exact n-gram Jaccard" in {
      val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id")
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Dedup.minhashDedupPairs(docs, "text", "doc_id")
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact should not be empty
      lsh shouldBe exact
    }

    "containment catches a doc embedded in a much larger doc that Jaccard misses" in {
      import spark.implicits._
      val small = "alpha beta gamma delta epsilon zeta"
      val filler = (1 to 60).map(i => s"tok$i").mkString(" ")
      val df = Seq(
        (1L, small),                    // the contained page
        (2L, s"$filler $small"),        // wrapped verbatim in 10x boilerplate
        (3L, "unrelated words entirely different content here")
      ).toDF("doc_id", "text")
      val cont = Dedup.containmentPairs(df, "text", "doc_id", n = 3, pct = 80)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // every 3-shingle of doc 1 appears in doc 2 => containment 1.0
      cont.keySet shouldBe Set((1L, 2L))
      cont((1L, 2L)) shouldBe 1.0
      // while Jaccard on the same pair is far below any dedup threshold
      val jac = Dedup.ngramJaccardPairs(df, "text", "doc_id",
        n = 3, threshold = 0.5).collect()
      jac shouldBe empty
    }

    "containment threshold is the exact integer predicate" in {
      import spark.implicits._
      // doc 4 has 5 shingles, 4 of which appear in doc 5: 4*100 >= 5*80
      // holds exactly at the boundary; doc 6 shares 3 of 5: below
      val df = Seq(
        (4L, "a b c d e f g"),            // shingles: abc bcd cde def efg
        (5L, "a b c d e f x"),            // shares abc bcd cde def (4 of 5)
        (6L, "a b c d e x y")             // shares abc bcd cde     (3 of 5)
      ).toDF("doc_id", "text")
      val got = Dedup.containmentPairs(df, "text", "doc_id", n = 3, pct = 80)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      got.keySet should contain((4L, 5L))   // 0.8 passes (>=)
      got.keySet should not contain ((4L, 6L)) // 0.6 fails
      got((4L, 5L)) shouldBe 0.8
    }

    "fuzzy key matching recovers deletion/substitution typos within maxEdits" in {
      import spark.implicits._
      val df = Seq(
        (1L, "albert einstein physics"),
        (2L, "albert einstein physic"),   // one deletion  -> dist 1
        (3L, "albert einstein phxsics"),  // one substitution -> dist 1
        (4L, "marie curie chemistry"),    // unrelated
        (5L, "albert einstein history")   // shares grams, dist > 1
      ).toDF("id", "key")
      val got = Dedup.fuzzyKeyPairs(df, "key", "id", maxEdits = 1, q = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      got.keySet shouldBe Set((1L, 2L), (1L, 3L))
      got((1L, 2L)) shouldBe 1L
      got((1L, 3L)) shouldBe 1L
      // 2 vs 3: deletion + substitution stack to distance 2 — excluded
    }

    "fuzzy key gram prune drops boilerplate-format pairs, replayably" in {
      import spark.implicits._
      // every key shares the format prefix; with the prefix grams pruned
      // (freq > 2) only the genuinely-close pair survives blocking
      val df = Seq(
        (1L, "ITEM-00001 widget alpha"),
        (2L, "ITEM-00001 widget alphb"),
        (3L, "ITEM-00002 gizmos delta"),
        (4L, "ITEM-00003 sprocket rho")
      ).toDF("id", "key")
      val got = Dedup.fuzzyKeyPairs(df, "key", "id",
          maxEdits = 1, q = 4, maxGramFreq = Some(2))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe Set((1L, 2L))
    }

    "prefix-filtered Jaccard join is LOSSLESS and actually prunes" in {
      // equivalence on the shared gate corpus: prefix path ≡ brute path
      val brute = Dedup.ngramJaccardPairs(docs, "text", "doc_id")
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val pref = Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id")
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      brute should not be empty
      pref shouldBe brute
    }

    "prefix filter drops candidate pairs the all-shared join would generate" in {
      import spark.implicits._
      // docs 1/2 share ONLY the corpus-ubiquitous shingle "c1 c2 c3"
      // (df 4 — their rarer prefixes exclude it), so the pair never
      // becomes a candidate under t=0.9; docs 3/4 are near-identical
      // and must still be found through their rare prefixes
      val df = Seq(
        (1L, "c1 c2 c3 a1 a2 a3 a4 a5 a6 a7 a8 a9"),
        (2L, "c1 c2 c3 b1 b2 b3 b4 b5 b6 b7 b8 b9"),
        (3L, "c1 c2 c3 d1 d2 d3 d4 d5 d6 d7 d8 d9"),
        (4L, "c1 c2 c3 d1 d2 d3 d4 d5 d6 d7 d8 d9")).toDF("doc_id", "text")
      val sh = Dedup.shingled(df, "text", "doc_id", 3)
      val allShared = Dedup.sharedShingleCandidates(sh).count()
      val found = Dedup.ngramJaccardPairsPrefix(df, "text", "doc_id",
          n = 3, threshold = 0.9)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      found shouldBe Set((3L, 4L)) // identical pair found, sim 1.0
      // the all-shared generator pairs EVERY doc with every other via
      // the ubiquitous shingles; the losslessness of the prefix cut is
      // pinned by the equivalence test above and the oracle gate
      allShared shouldBe 6
    }

    "a stop-shingle prune scopes candidates only — the score is full-set Jaccard" in {
      import spark.implicits._
      // shingle "x y z" occurs in 5 docs (> m=4) and is pruned from
      // candidate generation; docs 1 and 2 still pair via their rarer
      // shared shingles, and the SCORE must count the pruned shingle in
      // both |∩| and |∪| (3/5 = 0.6, not the hybrid 2/(4+4-2) = 0.33)
      val df = Seq(
        (1L, "x y z a b c"), (2L, "x y z a b d"),
        (3L, "x y z q1 q2 q3"), (4L, "x y z r1 r2 r3"),
        (5L, "x y z s1 s2 s3")).toDF("doc_id", "text")
      val got = Dedup.ngramJaccardPairs(df, "text", "doc_id",
          n = 3, threshold = 0.5, maxShingleFreq = Some(4))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      got.keySet shouldBe Set((1L, 2L))
      got((1L, 2L)) shouldBe 0.6 // 3 shared of (4 + 4 - 3) full-set
      // containment under the same prune: full-set intersection too
      val cont = Dedup.containmentPairs(df, "text", "doc_id",
          n = 3, pct = 60, maxShingleFreq = Some(4))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      cont((1L, 2L)) shouldBe 0.75 // 3 of min(4, 4)
    }

    "incremental dedup = cross-corpus subset of the exact pair set, oriented batch→corpus" in {
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 2 === 1)
      // ground truth: exact pairs over the union, restricted to one odd
      // and one even endpoint, oriented (odd, even)
      val crossExact = Dedup.ngramJaccardPairs(docs, "text", "doc_id")
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) => a % 2 != b % 2 }
        .map { case (a, b) => if (a % 2 == 1) (a, b) else (b, a) }.toSet
      val got = Dedup.minhashDedupAgainst(corpus, batch, "text", "doc_id")
        .select("batch_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      crossExact should not be empty
      got shouldBe crossExact
      all(got.map(_._1 % 2)) shouldBe 1 // no corpus-corpus or batch-batch pair
      all(got.map(_._2 % 2)) shouldBe 0
    }

    "incremental dedup from PERSISTED corpus tables equals the inline form" in {
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 2 === 1)
      // write the corpus's shingle + banded-signature tables to parquet
      // (the production layout) and dedup the batch against the FILES
      val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
      val shC = Dedup.shingled(corpus, "text", "doc_id", 3)
      shC.write.mode("overwrite").parquet(s"$dir/shingles")
      Dedup.bandedSignatures(Dedup.minhashSignatures(shC, 32), "id", "sig", 16, 32)
        .write.mode("overwrite").parquet(s"$dir/banded")
      val fromTables = Dedup.minhashDedupAgainstTables(
          spark.read.parquet(s"$dir/shingles"), spark.read.parquet(s"$dir/banded"),
          batch, "text", "doc_id")
        .select("batch_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val inline = Dedup.minhashDedupAgainst(corpus, batch, "text", "doc_id")
        .select("batch_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      inline should not be empty
      fromTables shouldBe inline
    }

    "incremental dedup of a clean batch flags nothing" in {
      import spark.implicits._
      val corpus = Seq((2L, "alpha beta gamma delta")).toDF("doc_id", "text")
      val clean = Seq((1L, "totally unrelated fresh content here"))
        .toDF("doc_id", "text")
      Dedup.minhashDedupAgainst(corpus, clean, "text", "doc_id")
        .count() shouldBe 0L
    }

    "simhash of identical text collides; hamming of near-identical is small" in {
      import spark.implicits._
      val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
        .toDF("doc_id", "text")
      val pairs = Dedup.simhashPairs(df, "text", "doc_id", maxHamming = 0).collect()
      pairs.length shouldBe 1
      pairs(0).getAs[Long]("hamming") shouldBe 0
    }

    "no crossJoin in the LSH plan (bucketed join)" in {
      val plan = Dedup.minhashDedupPairs(docs, "text", "doc_id")
        .queryExecution.executedPlan.toString
      plan should not include "CartesianProduct"
      plan should not include "BroadcastNestedLoopJoin"
    }
  }

  "Similarity" - {
    "residual IVF-PQ: exactly-representable residuals score as true dots" in {
      import spark.implicits._
      // one list (centroid = vector 0), residuals take exactly the two
      // seed values per subspace (zero and rA) — the codebook reproduces
      // them bit-exactly, so q·c + ADC equals the TRUE inner product
      // q·v for every candidate (all values dyadic ⇒ exact arithmetic)
      val c = Seq(1.0f, 0f, 0f, 0f)
      val vA = Seq(1.5f, 0f, 0.25f, 0f) // c + rA, rA nonzero in BOTH subspaces
      val df = Seq(
        (0L, c), (1L, vA), (2L, vA), (3L, c),
        (9L, Seq(0.5f, 0.25f, 0.125f, 1.0f))
      ).toDF("vec_id", "embedding")
      val got = Similarity.annIvfPqResidualTopK(df, "vec_id", "embedding",
          col("vec_id") === 9, k = 4, nlist = 1, nprobe = 1,
          m = 2, ncodes = 2, trainIters = 2)
        .orderBy("rank").collect()
        .map(r => (r.getLong(1), r.getDouble(3)))
      got.map(_._1).toSeq shouldBe Seq(1L, 2L, 0L, 3L) // ties → id order
      // q·(c+rA) = .75 + .03125 = 0.78125; q·c = 0.5 — exact doubles
      got.map(_._2).toSeq shouldBe Seq(0.78125, 0.78125, 0.5, 0.5)
    }

    "residual IVF-PQ stored tables ≡ inline through a real parquet round trip" in {
      // the by_residual serving gap the r11 verdict named: the residual
      // code/centroid/book tables persist at build time; the query path
      // reads them, derives each probe's q·c term from the STORED cv,
      // and must land the inline form's exact rows (integer codes +
      // bit-exact double round trips ⇒ equality, not approximation)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-resid-tables").toString
      val book = Similarity.trainResidualPq(emb, "vec_id", "embedding",
        nlist = 8, m = 8, ncodes = 8, trainIters = 2)
      val cents = Similarity.centroidTable(emb, "vec_id", "embedding", 8)
      Similarity.annIvfPqResidualEncodeTable(emb, "vec_id", "embedding",
          book, cents)
        .write.mode("overwrite").parquet(s"$dir/codes")
      cents.write.mode("overwrite").parquet(s"$dir/cents")
      Similarity.pqBookTable(spark, book)
        .write.mode("overwrite").parquet(s"$dir/book")
      val book2 = Similarity.pqBookFromTable(spark.read.parquet(s"$dir/book"))
      book2 shouldBe book
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "neighbor_id", "rank", "score")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toSet
      val stored = rows(Similarity.annIvfPqResidualTopKFromTables(
        spark.read.parquet(s"$dir/codes"), spark.read.parquet(s"$dir/cents"),
        book2, emb, "vec_id", "embedding", col("vec_id") < 5,
        k = 4, nprobe = 2))
      stored shouldBe rows(Similarity.annIvfPqResidualTopK(
        emb, "vec_id", "embedding", col("vec_id") < 5, k = 4,
        nlist = 8, nprobe = 2, m = 8, ncodes = 8, trained = Some(book)))
      stored.size shouldBe 20 // 5 queries × k=4
      // maintenance is append-only against the FROZEN centroids + book:
      // encoding a new batch appends, and the union serves identically
      val old = emb.filter(col("vec_id") % 2 === 0)
      val fresh = emb.filter(col("vec_id") % 2 === 1)
      Similarity.annIvfPqResidualEncodeTable(old, "vec_id", "embedding",
          book, cents)
        .write.mode("overwrite").parquet(s"$dir/inc")
      Similarity.annIvfPqResidualEncodeTable(fresh, "vec_id", "embedding",
          book, cents)
        .write.mode("append").parquet(s"$dir/inc")
      rows(Similarity.annIvfPqResidualTopKFromTables(
        spark.read.parquet(s"$dir/inc"), spark.read.parquet(s"$dir/cents"),
        book2, emb, "vec_id", "embedding", col("vec_id") < 5,
        k = 4, nprobe = 2)) shouldBe stored
      // stored path keeps the query side broadcast (the code table is
      // the corpus at scale — never the build side)
      Similarity.annIvfPqResidualTopKFromTables(
        spark.read.parquet(s"$dir/codes"), spark.read.parquet(s"$dir/cents"),
        book2, emb, "vec_id", "embedding", col("vec_id") < 5,
        k = 4, nprobe = 2)
        .queryExecution.executedPlan.toString should
        include("BroadcastHashJoin [cid")
    }

    "mmrRerank: an all-NaN candidate group fails loudly, not with AIOOBE" in {
      import spark.implicits._
      // NaN-component candidates make every cosine NaN (the zero-norm
      // form already fails in cosineTopK's ANSI division) — the
      // documented caller contract violation; the kernel must name the
      // query and the cause instead of throwing ArrayIndexOutOfBounds(-1)
      val df = Seq(
        (1L, Seq(Float.NaN, 0.5f)), (2L, Seq(Float.NaN, 1.0f)),
        (9L, Seq(1.0f, 0.0f))
      ).toDF("vec_id", "embedding")
      val e = intercept[Exception] {
        Similarity.mmrRerank(df, "vec_id", "embedding",
          col("vec_id") === 9, poolK = 2, outK = 2).collect()
      }
      val messages = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString("\n")
      messages should include("scored NaN")
    }

    "mmrRerank: diversity outranks a crowded near-duplicate" in {
      import spark.implicits._
      // query at 45°; candidates at 11.5° (closest), 0° (crowded by the
      // first pick) and 90° (diverse). Pure relevance orders b, a, c;
      // MMR must order b, c, a — the 90° vector's low max-sim beats the
      // 0° vector's higher relevance after b is selected
      val df = Seq(
        (1L, Seq(1.0f, 0.0f)),           // a: 0°
        (2L, Seq(0.98f, 0.2f)),          // b: ~11.5° — top relevance
        (3L, Seq(0.0f, 1.0f)),           // c: 90° — diverse
        (9L, Seq(0.70710678f, 0.70710678f)) // the query, 45°
      ).toDF("vec_id", "embedding")
      val got = Similarity.mmrRerank(df, "vec_id", "embedding",
          col("vec_id") === 9, poolK = 3, outK = 3)
        .orderBy("mmr_rank").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      got.map(_._1).toSeq shouldBe Seq(2L, 3L, 1L)
      got.map(_._2).toSeq shouldBe Seq(1L, 2L, 3L)
      // first pick's score is exactly half its relevance (max-sim = 0)
      val relB = {
        val q = Array(0.70710678f, 0.70710678f); val b = Array(0.98f, 0.2f)
        var ab = 0.0; var aa = 0.0; var bb = 0.0
        for (i <- 0 to 1) {
          ab += q(i).toDouble * b(i); aa += q(i).toDouble * q(i)
          bb += b(i).toDouble * b(i)
        }
        ab / (math.sqrt(aa) * math.sqrt(bb))
      }
      got(0)._3 shouldBe 0.5 * relB - 0.5 * 0.0
    }

    "recallAtK: hand-computed hits, zero-hit queries present, extras ignored" in {
      import spark.implicits._
      val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
          (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L), (2L, 24L))
        .toDF("query_id", "neighbor_id")
      // q1: 3 of 5 right (99 is a miss that must not count);
      // q2: nothing returned at all — still a row, recall 0.0
      val approx = Seq((1L, 10L), (1L, 12L), (1L, 14L), (1L, 99L), (1L, 98L))
        .toDF("query_id", "neighbor_id")
      val got = Similarity.recallAtK(approx, exact, k = 5).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      got shouldBe Map(1L -> ((3L, 0.6)), 2L -> ((0L, 0.0)))
    }

    "randomProjection equals driver-side dots against the same planes" in {
      val got = Similarity.randomProjection(emb, "vec_id", "embedding", k = 4)
        .collect().map(r => r.getLong(0) ->
          (0 until 4).map(p => r.getDouble(p + 1))).toMap
      val planes = (0 until 4).map(p => Similarity.planeVectorF(p, 64).toArray)
      val rows = emb.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      rows.foreach { case (id, v) =>
        val want = planes.map { pl =>
          // left-to-right fold, matching the codegen'd kernel exactly
          var s = 0.0; var j = 0
          while (j < v.length) { s += v(j) * pl(j); j += 1 }
          s
        }
        got(id) shouldBe want.toSeq // bit-exact, not approximate
      }
    }

    "scalarQuantize matches a driver-side per-dimension map" in {
      val got = Similarity.scalarQuantize(emb, "vec_id", "embedding")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val rows = emb.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      val dim = rows.head._2.length
      val mins = (0 until dim).map(i => rows.map(_._2(i)).min)
      val maxs = (0 until dim).map(i => rows.map(_._2(i)).max)
      rows.foreach { case (id, v) =>
        val want = (0 until dim).map { i =>
          if (maxs(i) == mins(i)) 0L
          else // HALF_UP like Spark's round() on a nonnegative argument
            BigDecimal((v(i) - mins(i)) / (maxs(i) - mins(i)) * 255.0)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }
        got(id) shouldBe want
        all(got(id)) should (be >= 0L and be <= 255L)
      }
    }

    "randomProjection preserves self-similarity structure" in {
      // identical input vectors project identically; the projection is a
      // deterministic pure function (two runs agree)
      val a = Similarity.randomProjection(emb, "vec_id", "embedding", k = 8)
        .collect().map(_.toString).sorted
      val b = Similarity.randomProjection(emb, "vec_id", "embedding", k = 8)
        .collect().map(_.toString).sorted
      a shouldBe b
    }

    "brute-force top-k matches a driver-side computation" in {
      val rows = emb.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val expect = rows.filter(_._1 < 3).map { case (qid, qv) =>
        qid -> rows.filter(_._1 != qid)
          .map { case (id, v) => (id, cos(qv, v)) }
          .sortBy { case (id, s) => (-s, id) }.take(4).map(_._1).toSeq
      }.toMap
      val got = Similarity.cosineTopK(emb, "vec_id", "embedding", col("vec_id") < 3, 4)
        .orderBy("query_id", "rank").collect()
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq)
        .toMap
      got shouldBe expect
    }

    "LSH ANN achieves usable recall vs exact top-k and is deterministic" in {
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", col("vec_id") < 10, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def run() = Similarity.annLshTopK(emb, "vec_id", "embedding", col("vec_id") < 10, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val a1 = run(); val a2 = run()
      a1 shouldBe a2 // deterministic hyperplanes
      val recall = (a1 & exact).size.toDouble / exact.size
      recall should be >= 0.3 // approximate by design; exact re-rank of candidates
    }

    "PQ ANN matches a driver-side replay incl. codebook training, and compresses the scored side" in {
      val rows = emb.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1)
      val (m, ncodes, sub, iters) = (8, 8, 8, 2)
      val seeds = rows.take(ncodes).map(_._2)
      def d2(s: Array[Double], w: Array[Double]): Double = {
        def dot(a: Array[Double], b: Array[Double]) =
          a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
        (dot(s, s) - 2.0 * dot(s, w)) + dot(w, w)
      }
      // the lower-median rule groupQuantiles pins (smallest value whose
      // cumulative count reaches ceil(n/2)) — what DuckDB replays too
      def median(xs: Seq[Double]): Double = {
        val s = xs.sorted
        s(math.max(1, math.ceil(s.size * 0.5).toInt) - 1)
      }
      // Lloyd training replay: L2-argmin assignment (ties → lowest code),
      // exact component-wise median update, empty cells keep their word
      var words: IndexedSeq[IndexedSeq[Array[Double]]] = (0 until m).map(j =>
        (0 until ncodes).map(c => seeds(c).slice(j * sub, (j + 1) * sub)))
      for (_ <- 1 to iters) {
        val byCell = rows.flatMap { case (_, v) =>
          (0 until m).map { j =>
            val s = v.slice(j * sub, (j + 1) * sub)
            val ds = (0 until ncodes).map(c => d2(s, words(j)(c)))
            (j, ds.indexOf(ds.min)) -> s
          }
        }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        words = (0 until m).map { j =>
          (0 until ncodes).map { c =>
            byCell.get((j, c)) match {
              case Some(ss) =>
                Array.tabulate(sub)(p => median(ss.map(_(p)).toSeq))
              case None => words(j)(c)
            }
          }
        }
      }
      def encode(v: Array[Double]): IndexedSeq[Int] =
        (0 until m).map { j =>
          val s = v.slice(j * sub, (j + 1) * sub)
          val ds = (0 until ncodes).map(c => d2(s, words(j)(c)))
          ds.indexOf(ds.min)
        }
      def adc(qv: Array[Double], codes: IndexedSeq[Int]): Double =
        (0 until m).foldLeft(0.0) { (acc, j) =>
          val qs = qv.slice(j * sub, (j + 1) * sub)
          val w = words(j)(codes(j))
          acc + qs.indices.foldLeft(0.0)((a, i) => a + qs(i) * w(i))
        }
      val codes = rows.map { case (id, v) => id -> encode(v) }.toMap
      val expect = rows.filter(_._1 < 5).map { case (qid, qv) =>
        qid -> rows.filter(_._1 != qid)
          .map { case (id, _) => (id, adc(qv, codes(id))) }
          .sortBy { case (id, s) => (-s, id) }.take(4).map(_._1).toSeq
      }.toMap
      val got = Similarity.annPqTopK(emb, "vec_id", "embedding",
          col("vec_id") < 5, k = 4, m = m, ncodes = ncodes, trainIters = iters)
        .orderBy("query_id", "rank").collect()
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq)
        .toMap
      got shouldBe expect
      // recall vs the EXACT dot-product top-k (PQ's ADC approximates the
      // dot product), measured wide enough to be stable (50 queries,
      // k=10, driver-side — the replay equality above ties driver math to
      // the Spark plan): trained books must clear an absolute floor AND
      // must not be worse than the untrained seed books
      def dotd(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val seedBook: IndexedSeq[IndexedSeq[Array[Double]]] = (0 until m).map(
        j => (0 until ncodes).map(c => seeds(c).slice(j * sub, (j + 1) * sub)))
      def recallOf(book: IndexedSeq[IndexedSeq[Array[Double]]]): Double = {
        def enc(v: Array[Double]) = (0 until m).map { j =>
          val s = v.slice(j * sub, (j + 1) * sub)
          val ds = (0 until ncodes).map(c => d2(s, book(j)(c)))
          ds.indexOf(ds.min)
        }
        val cs = rows.map { case (id, v) => id -> enc(v) }.toMap
        def adcB(qv: Array[Double], codes: IndexedSeq[Int]) =
          (0 until m).foldLeft(0.0) { (acc, j) =>
            acc + dotd(qv.slice(j * sub, (j + 1) * sub), book(j)(codes(j)))
          }
        val qs = rows.filter(_._1 < 50)
        val hits = qs.map { case (qid, qv) =>
          val others = rows.filter(_._1 != qid)
          val ex = others.map { case (id, v) => (id, dotd(qv, v)) }
            .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
          val ap = others.map { case (id, _) => (id, adcB(qv, cs(id))) }
            .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
          (ex & ap).size
        }.sum
        hits.toDouble / (qs.length * 10)
      }
      val rTrained = recallOf(words)
      val rSeed = recallOf(seedBook)
      rTrained should be >= 0.15
      rTrained should be >= (rSeed - 0.03)
      // scale shape: the query side broadcasts (corpus never shuffles to
      // score) and the streamed corpus side carries only (id, m codes) —
      // the full-precision vector column stays inside the encode scan
      val plan = Similarity.annPqTopK(emb, "vec_id", "embedding",
        col("vec_id") < 5, k = 4, m = m, ncodes = ncodes)
        .queryExecution.executedPlan.toString
      plan should include("BroadcastNestedLoopJoin BuildRight")
    }

    "IVF-PQ composes list pruning with code scoring, deterministically" in {
      // neighbor sets must be a subset of the probed IVF lists: every
      // (query, neighbor) the composed index returns also appears in the
      // plain IVF candidate universe (same nlist/nprobe, k = corpus)
      val ivfAll = Similarity.annIvfTopK(emb, "vec_id", "embedding",
          col("vec_id") < 5, k = 1000, nlist = 8, nprobe = 2)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def run() = Similarity.annIvfPqTopK(emb, "vec_id", "embedding",
          col("vec_id") < 5, k = 4, nlist = 8, nprobe = 2, m = 8, ncodes = 8)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val a1 = run(); val a2 = run()
      a1 shouldBe a2 // deterministic centroids AND codebooks
      a1.size shouldBe 20 // 5 queries × k=4
      (a1 -- ivfAll) shouldBe empty
      // the scored join is equi on the probed list id with the query side
      // broadcast — never a nested-loop over the whole corpus
      val plan = Similarity.annIvfPqTopK(emb, "vec_id", "embedding",
        col("vec_id") < 5, k = 4, nlist = 8, nprobe = 2)
        .queryExecution.executedPlan.toString
      plan should include("BroadcastHashJoin [cid")
    }

    "stored-table ANN ≡ inline ANN through a real parquet round trip" in {
      // the production serving shape (minhashDedupAgainstTables applied
      // to ANN): codes/assignments/centroids/codebook persist as parquet
      // at build time; the query path reads them and must return exactly
      // the inline form's rows — integer codes and bit-exact double
      // round-trips make this equality, not approximation
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ann-tables").toString
      val book = Similarity.trainPq(emb, "vec_id", "embedding",
        m = 8, ncodes = 8, trainIters = 2)
      val cents = Similarity.centroidTable(emb, "vec_id", "embedding", 8)

      Similarity.pqBookTable(spark, book)
        .write.mode("overwrite").parquet(s"$dir/book")
      Similarity.annPqEncodeTable(emb, "vec_id", "embedding", book)
        .write.mode("overwrite").parquet(s"$dir/pq")
      Similarity.annIvfPqEncodeTable(emb, "vec_id", "embedding", book, cents)
        .write.mode("overwrite").parquet(s"$dir/ivfpq")
      Similarity.annIvfAssignTable(emb, "vec_id", "embedding", cents)
        .write.mode("overwrite").parquet(s"$dir/ivf")
      cents.write.mode("overwrite").parquet(s"$dir/cents")

      val book2 = Similarity.pqBookFromTable(spark.read.parquet(s"$dir/book"))
      book2 shouldBe book

      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "neighbor_id", "rank")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

      rows(Similarity.annPqTopKFromTable(spark.read.parquet(s"$dir/pq"),
        emb, "vec_id", "embedding", col("vec_id") < 5, k = 4, book2)) shouldBe
        rows(Similarity.annPqTopK(emb, "vec_id", "embedding",
          col("vec_id") < 5, k = 4, m = 8, ncodes = 8,
          trained = Some(book)))

      rows(Similarity.annIvfPqTopKFromTables(
        spark.read.parquet(s"$dir/ivfpq"), spark.read.parquet(s"$dir/cents"),
        book2, emb, "vec_id", "embedding", col("vec_id") < 5,
        k = 4, nprobe = 2)) shouldBe
        rows(Similarity.annIvfPqTopK(emb, "vec_id", "embedding",
          col("vec_id") < 5, k = 4, nlist = 8, nprobe = 2, m = 8,
          ncodes = 8, trained = Some(book)))

      rows(Similarity.annIvfTopKFromTables(
        spark.read.parquet(s"$dir/ivf"), spark.read.parquet(s"$dir/cents"),
        emb, "vec_id", "embedding", col("vec_id") < 5,
        k = 4, nprobe = 2)) shouldBe
        rows(Similarity.annIvfTopK(emb, "vec_id", "embedding",
          col("vec_id") < 5, k = 4, nlist = 8, nprobe = 2))

      // index MAINTENANCE is append-only: a new batch encoded against
      // the FROZEN artifacts (book + centroids) appends to the stored
      // code table, and the union equals a one-shot full encode — the
      // per-batch cost is the batch, never the corpus
      val old = emb.filter(col("vec_id") % 2 === 0)
      val fresh = emb.filter(col("vec_id") % 2 === 1)
      Similarity.annIvfPqEncodeTable(old, "vec_id", "embedding", book, cents)
        .write.mode("overwrite").parquet(s"$dir/inc")
      Similarity.annIvfPqEncodeTable(fresh, "vec_id", "embedding", book, cents)
        .write.mode("append").parquet(s"$dir/inc")
      val appended = spark.read.parquet(s"$dir/inc")
      val full = spark.read.parquet(s"$dir/ivfpq")
      appended.count() shouldBe full.count()
      appended.exceptAll(full).count() shouldBe 0L
      // ...and the query path over the appended table is unchanged
      rows(Similarity.annIvfPqTopKFromTables(appended,
        spark.read.parquet(s"$dir/cents"), book2, emb, "vec_id",
        "embedding", col("vec_id") < 5, k = 4, nprobe = 2)) shouldBe
        rows(Similarity.annIvfPqTopKFromTables(full,
          spark.read.parquet(s"$dir/cents"), book2, emb, "vec_id",
          "embedding", col("vec_id") < 5, k = 4, nprobe = 2))

      // plan shape on the STORED path: the query probes broadcast and
      // the code table streams — never the reverse, whatever the file
      // stats of a small local index suggest (at scale the code table
      // is the corpus)
      val tPlan = Similarity.annIvfPqTopKFromTables(full,
        spark.read.parquet(s"$dir/cents"), book2, emb, "vec_id",
        "embedding", col("vec_id") < 5, k = 4, nprobe = 2)
        .queryExecution.executedPlan.toString
      tPlan should include("BroadcastHashJoin [cid")
    }

    "IVF ANN achieves usable recall vs exact top-k and is deterministic" in {
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", col("vec_id") < 10, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def run() = Similarity.annIvfTopK(emb, "vec_id", "embedding",
          col("vec_id") < 10, 5, nlist = 8, nprobe = 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val a1 = run(); val a2 = run()
      a1 shouldBe a2 // deterministic centroids (first nlist ids)
      val recall = (a1 & exact).size.toDouble / exact.size
      recall should be >= 0.3 // nprobe/nlist trade; exact re-rank of candidates
    }

    "trained-IVF: deterministic, recall at least matches the seeded quantizer" in {
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding",
          col("vec_id") < 10, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def run() = Similarity.annIvfTrainedTopK(emb, "vec_id", "embedding",
          col("vec_id") < 10, k = 5, nlist = 8, nprobe = 3, trainIters = 2)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val a1 = run(); val a2 = run()
      a1 shouldBe a2 // exact-median training is deterministic end-to-end
      val recall = (a1 & exact).size.toDouble / exact.size
      recall should be >= 0.3
    }
  }

  "DotProduct expression" - {
    "matches the interpreted zip_with/aggregate formulation and codegens" in {
      import graft.functions.VectorFunctions.dot_product
      val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val both = e.select(
        dot_product(col("v"), col("v")).as("native"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0d), (a, x) => a + x).as("hof"))
      both.filter(col("native") =!= col("hof")).count() shouldBe 0
      // alone, the expression participates in whole-stage codegen (the HOF
      // formulation would poison its projection out of codegen)
      val nativeOnly = e.select(dot_product(col("v"), col("v")).as("d"))
      nativeOnly.queryExecution.executedPlan.toString should
        include regex """\*\(\d+\) Project \[dotproduct"""
    }
  }

  "salted exact dedup" - {
    "matches the unsalted aggregation" in {
      import spark.implicits._
      val df = Seq((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "aa"), (5L, "bb"))
        .toDF("doc_id", "text")
      val plain = Dedup.exactSurvivors(df, "text", "doc_id")
        .select("doc_id", "copies").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val salted = Dedup.exactSurvivorsSalted(df, "text", "doc_id", salts = 4)
        .select("doc_id", "copies").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      salted shouldBe plain
    }
  }

  "fuzzy decontamination" - {
    "flags planted leaks at the matches=k ceiling with the min-id witness" in {
      import spark.implicits._
      val train = Seq(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "the quick brown fox jumps over the lazy dog today"),
        (3L, "completely unrelated content about spark physical plans"))
        .toDF("doc_id", "text")
      // eval ids 100/101 share identical text — the tie must resolve to
      // the SMALLER eval id; doc 2 is a verbatim leak of it
      val heldOut = Seq(
        (100L, "the quick brown fox jumps over the lazy dog today"),
        (101L, "the quick brown fox jumps over the lazy dog today"))
        .toDF("doc_id", "text")
      val got = Dedup.fuzzyDecontaminate(train, heldOut, "doc_id",
          col("text"), shingleN = 3, k = 8, bands = 4, minMatches = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      got shouldBe Array((2L, 100L, 8L, 1.0))
    }

    "fuzzy decontamination plan: eval side broadcasts, corpus never merge-joins" in {
      import spark.implicits._
      val train = Seq((1L, "a b c d e")).toDF("doc_id", "text")
      val heldOut = Seq((9L, "a b c d e")).toDF("doc_id", "text")
      val plan = Dedup.fuzzyDecontaminate(train, heldOut, "doc_id",
          col("text"), shingleN = 3, k = 8, bands = 4, minMatches = 4)
        .queryExecution.executedPlan.toString
      // the probe is an explicit broadcast of the held-out bands — the
      // training corpus streams through with no sort-merge pairing and
      // no per-pair dedup aggregate (the rank window is the only
      // post-probe exchange)
      plan should include("BroadcastHashJoin")
      plan should not include "SortMergeJoin"
      plan should include("WindowGroupLimit")
    }

    "sub-threshold agreement is dropped" in {
      import spark.implicits._
      val train = Seq((1L, "x y z w v u t s r q")).toDF("doc_id", "text")
      val heldOut = Seq((9L, "a b c d e f g h i j")).toDF("doc_id", "text")
      // disjoint shingle sets: even if a band collides by hash accident
      // the agreement count stays below minMatches
      Dedup.fuzzyDecontaminate(train, heldOut, "doc_id", col("text"),
        shingleN = 3, k = 8, bands = 4, minMatches = 4).count() shouldBe 0L
    }
  }

  "embedding cosine near-dup" - {
    "LSH-bucketed variant finds a subset of the exact pairs, deterministically" in {
      val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Similarity.cosineNearDupPairsLsh(emb, "vec_id", "embedding", 0.4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      lsh.subsetOf(exact) shouldBe true
      if (exact.nonEmpty) (lsh.size.toDouble / exact.size) should be >= 0.2
    }

    "knnGraph plan: top-k cut below the rank shuffle, no quadratic join" in {
      // scale shape: WindowGroupLimit trims each map partition to k rows
      // BEFORE the per-node rank exchange, and candidates come from the
      // bucket equi-join — never a cartesian/BNLJ corpus pairing
      val plan = Similarity.knnGraph(emb, "vec_id", "embedding", 3)
        .queryExecution.executedPlan.toString
      plan should include("WindowGroupLimit")
      plan should not include "CartesianProduct"
      plan should not include "BroadcastNestedLoopJoin"
    }

    "knnGraph matches a driver-side replay of the probe-ball rank" in {
      // exact replay: same sign buckets (full-precision planeVector
      // constants, left-to-right dot), Hamming<=1 candidate sets, cosine,
      // (sim DESC, neighbor ASC) rank — pins candidates, ranks AND the
      // no-dedup-needed claim (each pair arises from exactly one probe)
      val k = 3
      val vecs = emb.select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
        .sortBy(_._1)
      val planes = (0 until 6).map(p => Similarity.planeVector(p, 64).toArray)
      def dotd(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      val bucket = vecs.map { case (id, v) =>
        id -> planes.zipWithIndex.map { case (pl, p) =>
          if (dotd(v, pl) >= 0) 1L << p else 0L }.sum
      }.toMap
      val byId = vecs.toMap
      val expect = vecs.flatMap { case (id, v) =>
        val cands = vecs.filter { case (idB, _) =>
          idB != id &&
            java.lang.Long.bitCount(bucket(id) ^ bucket(idB)) <= 1 }
        cands.map { case (idB, vb) =>
          val sim = dotd(v, vb) /
            (math.sqrt(dotd(v, v)) * math.sqrt(dotd(vb, vb)))
          (id, idB, sim)
        }.sortBy { case (_, idB, sim) => (-sim, idB) }
          .take(k).zipWithIndex
          .map { case ((a, bId, _), i) => (a, bId, i + 1L) }
      }.toSet
      val got = Similarity.knnGraph(emb, "vec_id", "embedding", k)
        .select("node_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
      got shouldBe expect
      expect.nonEmpty shouldBe true
    }
  }

  "TextAnalysis" - {
    "token counting on crafted strings" in {
      import spark.implicits._
      val df = Seq(("a b  c", 1L), ("", 2L), ("hi, there!", 3L)).toDF("text", "id")
      val got = df.select(col("id"),
        TextAnalysis.tokenCount(col("text")).as("ws"),
        TextAnalysis.bpeTokenCount(col("text")).as("bpe"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      got shouldBe Set((1L, 3, 3), (2L, 0, 0), (3L, 2, 4))
    }

    "fingerprint collapses case/punctuation/whitespace variants" in {
      import spark.implicits._
      val df = Seq(("Hello,   World!", 1L), ("hello world", 2L), ("other", 3L))
        .toDF("text", "id")
      val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      fps(1L) shouldBe fps(2L)
      fps(3L) should not be fps(1L)
    }

    "langId picks the language whose stopwords dominate" in {
      import spark.implicits._
      val df = Seq(
        ("the cat and the dog in the house", 1L),
        ("der hund ist nicht mit der katze", 2L),
        ("xyzzy qwerty", 3L)).toDF("text", "id")
      val got = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      got(1L) shouldBe "en"
      got(2L) shouldBe "de"
      got(3L) shouldBe "und"
    }
  }

  "Multimodal" - {
    "frameSample explodes fixed-size chunks with stride" in {
      import spark.implicits._
      val df = Multimodal.fromText(
        Seq((1L, "x" * 130)).toDF("id", "t"), "id", "t")
      val frames = Multimodal.frameSample(df, chunkBytes = 64).collect()
      frames.length shouldBe 3 // 130 bytes → 64+64+2
      frames.map(_.getAs[Array[Byte]]("frame").length).toSeq shouldBe Seq(64, 64, 2)
      Multimodal.frameSample(df, 64, stride = 2).count() shouldBe 2 // frames 0,2
    }

    "frameSample emits no frames for empty media" in {
      import spark.implicits._
      val df = Multimodal.fromText(Seq((1L, "")).toDF("id", "t"), "id", "t")
      Multimodal.frameSample(df, chunkBytes = 64).count() shouldBe 0
    }

    "byteSubsample shrinks opaque blobs by the stride factor" in {
      import spark.implicits._
      val df = Multimodal.fromText(Seq((1L, "abcdefgh")).toDF("id", "t"), "id", "t")
      val out = Multimodal.byteSubsample(df, factor = 2).collect()(0)
      new String(out.getAs[Array[Byte]]("media")) shouldBe "aceg"
    }

    "syntheticPng encodes real PNGs that decodeImages recovers exactly" in {
      import spark.implicits._
      val ids = Seq(0L, 1L, 7L, 123L)
      val media = Multimodal.syntheticPng(ids.toDF("id"), "id").repartition(3)
      // the blobs really are PNG (magic bytes), not a fake container
      media.collect().foreach { r =>
        val b = r.getAs[Array[Byte]]("media")
        (b(0) & 0xff, b(1), b(2), b(3)) shouldBe ((0x89, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      }
      val got = Multimodal.decodeImages(media).collect()
        .map(r => r.getAs[Long]("media_id") -> r).toMap
      ids.foreach { id =>
        val r = got(id)
        r.getAs[Boolean]("decoded_ok") shouldBe true
        val w = Multimodal.synthW(id); val h = Multimodal.synthH(id)
        r.getAs[Int]("width") shouldBe w
        r.getAs[Int]("height") shouldBe h
        val expR = (for { y <- 0 until h; x <- 0 until w }
          yield Multimodal.synthR(id, x, y).toLong).sum.toDouble / (w * h)
        r.getAs[Double]("mean_r") shouldBe expR
      }
    }

    "decodeImages flags undecodable blobs instead of failing" in {
      import spark.implicits._
      val df = Multimodal.fromText(
        Seq((1L, "this is not an image")).toDF("id", "t"), "id", "t")
      val r = Multimodal.decodeImages(df).collect()(0)
      r.getAs[Boolean]("decoded_ok") shouldBe false
      r.isNullAt(r.fieldIndex("width")) shouldBe true
    }

    "decompression bomb is rejected from the HEADER, before any raster" in {
      import spark.implicits._
      // a syntactically valid PNG signature + IHDR declaring 10000×10000
      // (100 Mpx > the 64 Mpx cap) with no pixel data at all: the
      // header-first guard must reject on the declared dimensions — the
      // old ImageIO.read path would have allocated the ~400 MB raster
      // first (and a crafted 25000² bomb ~2.5 GB) before any check ran
      def bombPng(w: Int, h: Int): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G',
          0x0d, 0x0a, 0x1a, 0x0a))
        val ihdr = java.nio.ByteBuffer.allocate(13)
          .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
          .put(0.toByte).put(0.toByte).put(0.toByte).array()
        val typ = "IHDR".getBytes("US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(typ); crc.update(ihdr)
        bos.write(java.nio.ByteBuffer.allocate(4).putInt(13).array())
        bos.write(typ); bos.write(ihdr)
        bos.write(java.nio.ByteBuffer.allocate(4)
          .putInt(crc.getValue.toInt).array())
        bos.toByteArray
      }
      val df = Seq((1L, bombPng(10000, 10000)))
        .toDF("media_id", "media")
      val r = Multimodal.decodeImages(df).collect()(0)
      r.getAs[Boolean]("decoded_ok") shouldBe false
      r.isNullAt(r.fieldIndex("width")) shouldBe true
    }

    "perceptual banding rejects bands < 2 (unmaskable 64-bit band)" in {
      import spark.implicits._
      // bands=1 passes the pigeonhole and divisibility checks but its
      // band mask (1L << 64) − 1 is 0 on the JVM — every fingerprint
      // would land in one mega-bucket (silent all-pairs degeneration)
      val ids = Seq((1L, 1L)).toDF("media_id", "basis")
      val media = Multimodal.syntheticPng(ids, "media_id", basisCol = "basis")
      val ex = intercept[IllegalArgumentException] {
        Multimodal.imageDedupPairs(media, maxHamming = 0, bands = 1)
      }
      ex.getMessage should include("bands >= 2")
    }

    "aspectBuckets: nearest canonical ratio, exact ties-to-earliest" in {
      import spark.implicits._
      val buckets = Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16))
      val canonical = Seq(
        (100, 100, 1, 1), (1024, 768, 4, 3), (768, 1024, 3, 4),
        (1920, 1080, 16, 9), (1080, 1920, 9, 16),
        (8, 5, 16, 9) // 1.6 sits between 4:3 (1.33) and 16:9 (1.78)
      )
      val got = Multimodal.aspectBuckets(
          canonical.map { case (w, h, _, _) => (w, h) }.toDF("w", "h"),
          col("w"), col("h"), buckets)
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getInt(2), r.getInt(3)))).toMap
      canonical.foreach { case (w, h, n, d) =>
        withClue(s"($w x $h): ") { got((w, h)) shouldBe ((n, d)) }
      }
      // exact tie: 5/4 is equidistant from 1/1 and 3/2 -> earliest wins
      val tie = Multimodal.aspectBuckets(
          Seq((5, 4)).toDF("w", "h"), col("w"), col("h"),
          Seq((1, 1), (3, 2)))
        .collect()(0)
      (tie.getInt(2), tie.getInt(3)) shouldBe ((1, 1))
    }

    "aspectBuckets: matches a driver-side argmin over a geometry grid, and the SQL render matches the operator" in {
      import spark.implicits._
      val buckets = Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16))
      val prod = buckets.map(_._2.toLong).product
      def ref(w: Long, h: Long): Int = {
        val keys = buckets.map { case (n, d) =>
          math.abs(w * d - h * n) * (prod / d)
        }
        keys.indexOf(keys.min)
      }
      val grid = for (w <- 1 to 24; h <- 1 to 24) yield (w, h)
      val df = grid.toDF("w", "h")
      val got = Multimodal.aspectBuckets(df, col("w"), col("h"), buckets)
        .withColumn("sql_idx", expr(
          Multimodal.aspectBucketSql("w", "h", buckets)))
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
      grid.foreach { case (w, h) =>
        val i = ref(w, h)
        withClue(s"($w x $h): ") {
          got((w, h)) shouldBe ((buckets(i)._1, buckets(i)._2, i))
        }
      }
    }

    "imageDHash: identical pixels give identical fingerprints; dedup finds them" in {
      import spark.implicits._
      // planted copy: media 900 reuses media 3's pixel basis — a REAL
      // decode round trip must land both on one fingerprint (hamming 0);
      // unrelated bases almost surely differ in far more than 3 bits
      val ids = Seq((3L, 3L), (5L, 5L), (900L, 3L))
        .toDF("media_id", "basis")
      val media = Multimodal.syntheticPng(ids, "media_id", basisCol = "basis")
      val fps = Multimodal.imageDHash(media).collect()
        .map(r => r.getAs[Long]("media_id") ->
          ((r.getAs[Long]("lo"), r.getAs[Long]("hi")))).toMap
      fps(3L) shouldBe fps(900L)
      val pairs = Multimodal.imageDedupPairs(media, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      pairs((3L, 900L)) shouldBe 0
      // banded candidates are LOSSLESS vs brute force at maxHamming < bands
      val brute = fps.toSeq.combinations(2).count { case Seq((_, a), (_, b)) =>
        java.lang.Long.bitCount(a._1 ^ b._1) +
          java.lang.Long.bitCount(a._2 ^ b._2) <= 3
      }
      pairs.size shouldBe brute
    }

    "stored-fingerprint pairs equal inline imageDedupPairs through parquet" in {
      import spark.implicits._
      // the image serving shape (r12 verdict #2): dHash once at ingest,
      // write the 16-byte/asset fingerprint table, and every later sweep
      // reads it — fingerprints are exact integers, so the stored path
      // must pair identically to the inline decode-every-run path
      val ids = ((1L to 20L).map(i => (i, i)) :+ ((900L, 4L)))
        .toDF("media_id", "basis")
      val media = Multimodal.syntheticPngNoisy(ids, "media_id",
        basisCol = "basis")
      val inline = Multimodal.imageDedupPairs(media, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val out = java.nio.file.Files.createTempDirectory("imgfp").toString
      Multimodal.imageDHash(media).filter(col("decoded_ok"))
        .select(col("media_id").as("id"), col("lo"), col("hi"))
        .write.mode("overwrite").parquet(out)
      val stored = Multimodal.fingerprintDedupPairs(
          spark.read.parquet(out), maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      inline should contain((4L, 900L, 0))
      stored shouldBe inline
    }

    "fingerprintDedupAgainst: bipartite probe is lossless vs brute force" in {
      import spark.implicits._
      // continuous-ingestion shape: the batch probes the stored corpus,
      // never itself — a batch-internal duplicate pair (700/701 share a
      // basis) must NOT be emitted; the planted copy of a corpus asset
      // must pair at hamming 0
      val corpusIds = (1L to 15L).map(i => (i, i)).toDF("media_id", "basis")
      val batchIds = Seq((700L, 4L), (701L, 4L), (702L, 99L))
        .toDF("media_id", "basis")
      def fps(ids: org.apache.spark.sql.DataFrame) =
        Multimodal.imageDHash(Multimodal.syntheticPngNoisy(ids, "media_id",
            basisCol = "basis"))
          .filter(col("decoded_ok"))
          .select(col("media_id").as("id"), col("lo"), col("hi"))
      val corpus = fps(corpusIds)
      val batch = fps(batchIds)
      val got = Multimodal.fingerprintDedupAgainst(batch, corpus,
          maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // brute-force bipartite ground truth (banding must be lossless)
      val cfp = corpus.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
      val bfp = batch.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
      val brute = (for {
        (bid, (blo, bhi)) <- bfp; (cid, (clo, chi)) <- cfp
        h = java.lang.Long.bitCount(blo ^ clo) +
          java.lang.Long.bitCount(bhi ^ chi)
        if h <= 3
      } yield (bid, cid, h)).toSet
      got shouldBe brute
      got should contain((700L, 4L, 0))
      got should contain((701L, 4L, 0))
      // batch-internal pair (700, 701) absent by construction; the
      // no-corpus-match batch asset emits nothing
      got.map(_._1) should not contain 702L
    }

    "noisy fixture has fingerprint entropy: distinct bases, distinct hashes" in {
      import spark.implicits._
      // the linear-congruence fixture is DEGENERATE for dHash (constant
      // channel gradients except at wraps — massive fp collisions); the
      // middle-square fixture must separate every base here
      val ids = (1L to 30L).map(i => (i, i)).toDF("media_id", "basis")
      val fps = Multimodal.imageDHash(
          Multimodal.syntheticPngNoisy(ids, "media_id", basisCol = "basis"))
        .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toSet
      fps.size shouldBe 30
    }

    "imageDHash flags undecodable blobs like the other codec paths" in {
      import spark.implicits._
      val df = Multimodal.fromText(
        Seq((1L, "not an image at all")).toDF("id", "t"), "id", "t")
      val r = Multimodal.imageDHash(df).collect()(0)
      r.getAs[Boolean]("decoded_ok") shouldBe false
      r.isNullAt(r.fieldIndex("lo")) shouldBe true
    }

    "syntheticWav encodes real WAVs that decodeAudio recovers exactly" in {
      import spark.implicits._
      val ids = Seq(0L, 5L, 42L)
      val media = Multimodal.syntheticWav(ids.toDF("id"), "id").repartition(2)
      media.collect().foreach { r => // RIFF container magic
        new String(r.getAs[Array[Byte]]("media").take(4), "US-ASCII") shouldBe "RIFF"
      }
      val got = Multimodal.decodeAudio(media).collect()
        .map(r => r.getAs[Long]("media_id") -> r).toMap
      ids.foreach { id =>
        val r = got(id)
        r.getAs[Boolean]("decoded_ok") shouldBe true
        val n = Multimodal.synthSamples(id)
        r.getAs[Long]("n_samples") shouldBe n.toLong
        r.getAs[Int]("sample_rate") shouldBe 8000
        val amps = (0 until n).map(Multimodal.synthAmp(id, _))
        r.getAs[Long]("sum_amp") shouldBe amps.map(_.toLong).sum
        r.getAs[Int]("peak") shouldBe amps.map(math.abs).max
      }
    }

    "audioDHash: planted clip copies pair at hamming 0; entropy holds" in {
      import spark.implicits._
      val ids = ((1L to 25L).map(i => (i, i)) :+ ((900L, 4L)))
        .toDF("media_id", "basis")
      val media = Multimodal.syntheticWav(ids, "media_id",
        basisCol = "basis", noisy = true)
      val fps = Multimodal.audioDHash(media).collect()
        .map(r => r.getAs[Long]("media_id") ->
          ((r.getAs[Long]("lo"), r.getAs[Long]("hi")))).toMap
      fps(900L) shouldBe fps(4L)
      // distinct bases separate (pseudo-random sample gradients)
      fps.values.toSet.size should be >= 24
      val pairs = Multimodal.audioDedupPairs(media, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      pairs((4L, 900L)) shouldBe 0
      // lossless vs driver-side brute force
      val brute = fps.toSeq.combinations(2).count { case Seq((_, a), (_, b)) =>
        java.lang.Long.bitCount(a._1 ^ b._1) +
          java.lang.Long.bitCount(a._2 ^ b._2) <= 3
      }
      pairs.size shouldBe brute
    }

    "decodeAudio flags non-audio blobs instead of failing" in {
      import spark.implicits._
      val df = Multimodal.fromText(
        Seq((1L, "definitely not a wav file")).toDF("id", "t"), "id", "t")
      val r = Multimodal.decodeAudio(df).collect()(0)
      r.getAs[Boolean]("decoded_ok") shouldBe false
      r.isNullAt(r.fieldIndex("n_samples")) shouldBe true
    }

    "decodeAudio: non-16-bit PCM keeps geometry, nulls amplitude features" in {
      import spark.implicits._
      // an 8-bit WAV decodes fine (geometry is real) but the amplitude
      // reducer only understands 16-bit — it must emit NULL sum/peak,
      // never 0 (a zero would be indistinguishable from genuine silence,
      // and decodePcm16/audioDHash flag the same blob unusable)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
      val pcm = Array.tabulate[Byte](40)(i => (i * 3 + 1).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val df = Seq((1L, bos.toByteArray)).toDF("media_id", "media")
      val r = Multimodal.decodeAudio(df).collect()(0)
      r.getAs[Boolean]("decoded_ok") shouldBe true
      r.getAs[Long]("n_samples") shouldBe 40L
      r.getAs[Int]("sample_rate") shouldBe 8000
      r.isNullAt(r.fieldIndex("sum_amp")) shouldBe true
      r.isNullAt(r.fieldIndex("peak")) shouldBe true
      // ...and the acoustic-hash path refuses the same blob outright
      val h = Multimodal.audioDHash(df).collect()(0)
      h.getAs[Boolean]("decoded_ok") shouldBe false
    }

    "resizeImages nearest-neighbor samples even source coordinates" in {
      import spark.implicits._
      val id = 6L // W=5, H=4 → resized 3×2
      val media = Multimodal.syntheticPng(Seq(id).toDF("id"), "id")
      val r = Multimodal.decodeImages(Multimodal.resizeImages(media, 2))
        .collect()(0)
      r.getAs[Int]("width") shouldBe 3
      r.getAs[Int]("height") shouldBe 2
      val kept = for { y <- Seq(0, 2); x <- Seq(0, 2, 4) }
        yield Multimodal.synthG(id, x, y).toLong
      r.getAs[Double]("mean_g") shouldBe kept.sum.toDouble / kept.size
      // resize rewrites meta geometry too
      val meta = Multimodal.resizeImages(media, 2).collect()(0).getAs[Row]("meta")
      (meta.getAs[Int]("width"), meta.getAs[Int]("height")) shouldBe ((3, 2))
    }

    "frameDedup pairs identical blobs, position-free, boilerplate-capped" in {
      import spark.implicits._
      val a = "A" * 64 + "B" * 64 + "C" * 64     // frames {A,B,C}
      val b = "B" * 64 + "C" * 64 + "A" * 64     // same SET, shifted order
      val c = "D" * 64 + "E" * 64 + "F" * 64     // disjoint
      val df = Multimodal.fromText(
        Seq((1L, a), (2L, b), (3L, c)).toDF("id", "t"), "id", "t")
      val got = Multimodal.frameDedup(df, 64, maxDf = 20, minJaccard = 0.5)
        .collect()
      got.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((1L, 2L))
      got(0).getAs[Double]("jaccard") shouldBe 1.0 // identical frame sets
    }

    "stored frame-checksum table serves identically to inline frameDedup" in {
      import spark.implicits._
      // the serving split (same as the dHash fingerprint tables): the
      // checksum table is built once at ingest, written to parquet, and
      // the sweep over the stored rows must land the inline pass's exact
      // pairs — checksums are exact md5 strings
      val a = "A" * 64 + "B" * 64 + "C" * 64
      val b = "B" * 64 + "C" * 64 + "A" * 64
      val c = "D" * 64 + "E" * 64 + "F" * 64
      val df = Multimodal.fromText(
        Seq((1L, a), (2L, b), (3L, c)).toDF("id", "t"), "id", "t")
      val inline = Multimodal.frameDedup(df, 64, maxDf = 20,
          minJaccard = 0.5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
        .toSet
      val out = java.nio.file.Files.createTempDirectory("framechk").toString
      Multimodal.frameChecksumTable(df, 64)
        .write.mode("overwrite").parquet(out)
      val stored = Multimodal.frameDedupFromTable(
          spark.read.parquet(out), maxDf = 20, minJaccard = 0.5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
        .toSet
      inline should not be empty
      stored shouldBe inline
    }

    "frameDedupAgainst: corpus-df boilerplate drops, absent frames dilute" in {
      import spark.implicits._
      val x = "X" * 64 // boilerplate: in all 3 corpus assets (maxDf = 2)
      val corpusDocs = Seq(
        (1L, x + "A" * 64 + "B" * 64 + "C" * 64), // {A,B,C} after drop
        (2L, x + "D" * 64 + "E" * 64),            // {D,E}
        (3L, x + "F" * 64))                       // {F}
        .toDF("id", "t")
      val batchDocs = Seq(
        // copy of asset 1 (same non-boilerplate set {A,B,C}) → j = 1.0
        (901L, x + "A" * 64 + "B" * 64 + "C" * 64),
        // {D, E, Z}: Z is absent from the corpus but still counts in
        // nf_batch → j(902, 2) = 2/(3+2-2) = 2/3
        (902L, "D" * 64 + "E" * 64 + "Z" * 64),
        // pure boilerplate: drops to an empty set, pairs with nothing
        (903L, x))
        .toDF("id", "t")
      def frames(df: org.apache.spark.sql.DataFrame) =
        Multimodal.frameChecksumTable(
          Multimodal.fromText(df, "id", "t"), 64)
      val got = Multimodal.frameDedupAgainst(frames(batchDocs),
          frames(corpusDocs), maxDf = 2, minJaccard = 0.5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard"))
        .toMap
      got.keySet shouldBe Set((901L, 1L), (902L, 2L))
      got((901L, 1L)) shouldBe 1.0
      got((902L, 2L)) shouldBe (2.0 / 3.0)
      // batch-internal pairs are never emitted (901/902 share nothing
      // here, but 903's boilerplate-only set pairs with NO corpus asset
      // even though every corpus asset contains x)
    }

    "frameDedup drops frames above the df cap from both sides" in {
      import spark.implicits._
      // frame X is in EVERY asset (boilerplate); with maxDf=2 it is
      // dropped, so assets sharing only X never pair
      val x = "X" * 64
      val df = Multimodal.fromText(
        Seq((1L, x + "A" * 64), (2L, x + "B" * 64), (3L, x + "C" * 64))
          .toDF("id", "t"), "id", "t")
      Multimodal.frameDedup(df, 64, maxDf = 2, minJaccard = 0.01)
        .count() shouldBe 0
    }
  }

  "Chunking" - {
    "chunkByTokens windows with overlap, short tail, dense chunk_idx" in {
      import spark.implicits._
      val text = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
      val df = Seq((7L, text)).toDF("doc_id", "text")
      val got = TextAnalysis.chunkByTokens(df, "doc_id", col("text"), 4, 3)
        .orderBy("chunk_idx").collect()
      got.map(_.getInt(1)).toSeq shouldBe Seq(0, 1, 2, 3)
      got.map(_.getInt(2)).toSeq shouldBe Seq(4, 4, 4, 1) // tail short
      got(0).getString(3) shouldBe "w1 w2 w3 w4"
      got(1).getString(3) shouldBe "w4 w5 w6 w7" // 1-token overlap
      got(3).getString(3) shouldBe "w10"
    }

    "chunkByTokens emits nothing for null text and plans zero shuffles" in {
      import spark.implicits._
      val df = Seq((1L, Option.empty[String]), (2L, Some("a b")))
        .toDF("doc_id", "text")
      val out = TextAnalysis.chunkByTokens(df, "doc_id", col("text"), 2, 2)
      out.collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
      out.queryExecution.executedPlan.toString should not include "Exchange"
    }
  }

  "LM bucket score" - {
    "mean_freq_bucket is the exact mean of floor(log2(corpus count))" in {
      import spark.implicits._
      // corpus counts: a=4 (bucket 2), b=2 (bucket 1), c=1 (bucket 0)
      val df = Seq((1L, "a a b"), (2L, "a a b c")).toDF("doc_id", "text")
      val got = TextAnalysis.lmBucketScore(df, "doc_id", col("text"))
        .orderBy("id").collect()
      got(0).getLong(1) shouldBe 3L               // n_tokens
      got(0).getLong(2) shouldBe (2L + 2L + 1L)   // sum_bucket
      got(1).getLong(2) shouldBe (2L + 2L + 1L + 0L)
      got(1).getDouble(3) shouldBe (5.0 / 4.0)
    }
  }

  "HLL distinct" - {
    "register state matches a by-hand replay and the estimate is sane" in {
      import spark.implicits._
      val df = (1 to 2000).map(i => ("g", s"v$i")).toDF("g", "v")
      val got = Stats.hllDistinct(df, "g", col("v"), p = 6).collect()(0)
      val nonempty = got.getLong(1)
      nonempty should be <= 64L
      nonempty should be >= 60L // 2000 distinct ⇒ nearly all buckets hit
      val est = got.getDouble(3)
      est should (be >= 1200.0 and be <= 3200.0) // ~13% SE at m=64
      // harmonic_scaled is the exact integer Σ 2^(55-rho): recompute from
      // the aggregate's own registers via a second, independent query path
      val regs = df.select(graft.pipeline.Sampling.md5Hash60(col("v")).as("h"))
        .collect().map(_.getLong(0))
        .groupBy(h => (h >>> 54).toInt)
        .map { case (_, hs) => hs.map { h =>
          val rest = h & ((1L << 54) - 1)
          if (rest == 0L) 55
          else 54 - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
        }.max }
      val expectedScaled = regs.map(r => 1L << (55 - r)).sum +
        (64 - regs.size).toLong * (1L << 55)
      got.getLong(2) shouldBe expectedScaled
    }

    "HLL sketches merge by max: union estimate equals one-shot estimate" in {
      import spark.implicits._
      val all = (1 to 500).map(i => ("g", s"v$i")).toDF("g", "v")
      val even = all.filter(expr("CAST(substring(v, 2, 10) AS INT) % 2 = 0"))
      val odd = all.filter(expr("CAST(substring(v, 2, 10) AS INT) % 2 = 1"))
      def regsOf(d: org.apache.spark.sql.DataFrame) =
        d.select(graft.pipeline.Sampling.md5Hash60(col("v")).as("h"))
          .groupBy(lit(1))
          .agg(graft.functions.SketchFunctions.hll_registers(col("h"), 6)
            .as("regs"))
          .select("regs").collect()(0).getSeq[Int](0)
      val merged = regsOf(even).zip(regsOf(odd)).map { case (x, y) => math.max(x, y) }
      merged shouldBe regsOf(all)
    }
  }
}

package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** Sampling / grouped quantiles / heavy hitters / interval join. */
class SamplingStatsSpec extends AnyFreeSpec with Matchers with SparkFixture {
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  "Sampling" - {
    "hashSample is deterministic and roughly the requested fraction" in {
      val a = Sampling.hashSample(docs, "doc_id", 0.25)
      val b = Sampling.hashSample(docs, "doc_id", 0.25)
      val na = a.count()
      na shouldBe b.count() // identical set on every run
      val n = docs.count().toDouble
      na.toDouble should be(0.25 * n +- 0.12 * n) // binomial tolerance
      // a is a subset of a larger-fraction sample (thresholds nest)
      val wide = Sampling.hashSample(docs, "doc_id", 0.5)
      a.join(wide, Seq("doc_id"), "left_anti").count() shouldBe 0L
    }

    "stratifiedExact takes exactly ceil(fraction*n) rows per stratum" in {
      val per = Sampling.stratifiedExact(docs, "lang", "doc_id", 0.2)
        .groupBy("lang").count()
      val want = docs.groupBy("lang").count()
        .withColumn("want", ceil(col("count") * 0.2)).drop("count")
      per.join(want, "lang")
        .filter(col("count") =!= col("want")).count() shouldBe 0L
    }

    "stratifiedExact picks the same rows on every run" in {
      val a = Sampling.stratifiedExact(docs, "lang", "doc_id", 0.2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val b = Sampling.stratifiedExact(docs, "lang", "doc_id", 0.2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      a shouldBe b
    }
  }

  "Stats.winsorize" - {
    "clamps into each group's own exact [q(pLo), q(pHi)]" in {
      import spark.implicits._
      // group g: 1..21 → qLo = ceil(21·0.05) = 2nd smallest = 2,
      // qHi = ceil(21·0.95) = 20th = 20 (both as the SAME IEEE double
      // products any replaying engine computes).
      // group c is constant: lo = hi, everything clamps to the constant.
      val df = (1 to 21).map(v => ("g", v.toLong))
        .++(Seq(("c", 7L), ("c", 7L))).toDF("grp", "v")
      val got = Stats.winsorize(df, "grp", col("v"), 0.05, 0.95)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      got(("g", 1L)) shouldBe 2L   // below qLo -> clamped up
      got(("g", 2L)) shouldBe 2L
      got(("g", 20L)) shouldBe 20L
      got(("g", 21L)) shouldBe 20L // above qHi -> clamped down
      got(("g", 10L)) shouldBe 10L // interior untouched
      got(("c", 7L)) shouldBe 7L
    }

    "rejects an inverted quantile pair" in {
      import spark.implicits._
      val df = Seq(("g", 1L)).toDF("grp", "v")
      an[IllegalArgumentException] should be thrownBy
        Stats.winsorize(df, "grp", col("v"), 0.9, 0.1)
    }

    "a NULL input value stays NULL — least/greatest must not fabricate the low bound" in {
      import spark.implicits._
      val df = ((1 to 21).map(v => ("g", Some(v.toLong)))
        :+ ("g", Option.empty[Long])).toDF("grp", "v")
      val got = Stats.winsorize(df, "grp", col("v"), 0.05, 0.95).collect()
      got.length shouldBe 22
      val nullRow = got.filter(_.isNullAt(1))
      nullRow.length shouldBe 1
      nullRow.head.isNullAt(2) shouldBe true // not clamped to q05 = 2
    }

    "a NULL group key is data, not absence — its rows clamp within their own group" in {
      import spark.implicits._
      // null group gets its own quantile bounds; an equi join would
      // silently drop these rows (review finding, round 9)
      val df = ((1 to 21).map(v => (null.asInstanceOf[String], v.toLong))
        :+ ("g", 5L)).toDF("grp", "v")
      val got = Stats.winsorize(df, "grp", col("v"), 0.05, 0.95).collect()
      got.length shouldBe 22 // every input row survives
      val nullRows = got.filter(_.isNullAt(0))
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      nullRows(1L) shouldBe 2L   // clamped inside the NULL group's bounds
      nullRows(21L) shouldBe 20L
      got.filter(!_.isNullAt(0)).map(r => r.getLong(2)).toSeq shouldBe Seq(5L)
    }
  }

  "Stats.groupQuantiles" - {
    "matches the definition q(p) = min{v : |x <= v| >= ceil(p*n)}" in {
      import spark.implicits._
      // group g: values 1..10 → p50 = 5, p90 = 9, p100-ish (0.99) = 10
      val df = (1 to 10).map(v => ("g", v.toLong)).toDF("grp", "v")
      val got = Stats.groupQuantiles(df, "grp", col("v"), Seq(0.5, 0.9, 0.99))
        .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
      got shouldBe Map(0.5 -> 5L, 0.9 -> 9L, 0.99 -> 10L)
    }

    "handles duplicated values and single-row groups" in {
      import spark.implicits._
      val df = Seq(("a", 7L), ("b", 1L), ("b", 1L), ("b", 2L))
        .toDF("grp", "v")
      val got = Stats.groupQuantiles(df, "grp", col("v"), Seq(0.5))
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      got shouldBe Map("a" -> 7L, "b" -> 1L) // ceil(0.5*3)=2nd of (1,1,2) = 1
    }

    "never sorts raw rows: the window input is the compressed value table" in {
      import spark.implicits._
      val df = (1 to 1000).map(i => ("g", (i % 5).toLong)).toDF("grp", "v")
      // 5 distinct values → the plan's window sees ≤5 rows per group;
      // verify via the aggregated count feeding the window
      val q = Stats.groupQuantiles(df, "grp", col("v"), Seq(0.5))
      q.collect().map(_.getLong(2)).toSeq shouldBe Seq(2L)
      val plan = q.queryExecution.optimizedPlan.toString
      // an Aggregate must sit below the Window operator
      plan.indexOf("Window") should be < plan.lastIndexOf("Aggregate")
    }
  }

  "Stats.groupQuantilesFromCounts" - {
    "agrees with groupQuantiles when fed the value-count table" in {
      import spark.implicits._
      val df = Seq(("a", 7L), ("b", 1L), ("b", 1L), ("b", 2L), ("b", 9L))
        .toDF("grp", "v")
      val counts = df.groupBy(col("grp"), col("v").as("val"))
        .agg(count(lit(1)).as("c"))
      val fromCounts = Stats
        .groupQuantilesFromCounts(counts, "grp", "val", "c", Seq(0.5, 0.9))
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
        .toMap
      val direct = Stats.groupQuantiles(df, "grp", col("v"), Seq(0.5, 0.9))
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
        .toMap
      fromCounts shouldBe direct
    }
  }

  "Stats.topTokens" - {
    "exact counts, deterministic tie-break on the token" in {
      import spark.implicits._
      val df = Seq("b a a", "c b", "a  c").toDF("text") // double space → empty token dropped
      val got = Stats.topTokens(df, "text", 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      got shouldBe Seq(("a", 3L), ("b", 2L), ("c", 2L))
    }
  }

  "Stats.corpusOverlap" - {
    "exact shared-shingle counts and containment per source pair" in {
      import spark.implicits._
      // n=2 shingles: A = {a b, b c} ∪ {c d}, B = {a b}∪{x y}, C = {q r}
      val df = Seq(
        ("A", "a b c"), ("A", "c d"),
        ("B", "a b"), ("B", "x y"),
        ("C", "q r")).toDF("source", "text")
      val got = Stats.corpusOverlap(df, "source", "text", n = 2)
        .collect().map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      // only A∩B is non-empty: shared = {a b}; |A| = 3, |B| = 2
      got.keySet shouldBe Set(("A", "B"))
      got(("A", "B")) shouldBe ((1L, 3L, 2L, 1.0 / 3.0))
    }

    "pairs are oriented src_a < src_b and jaccard uses the true union" in {
      val got = Stats.corpusOverlap(docs, "source", "text", n = 3)
        .collect()
      got should not be empty
      got.foreach { r =>
        r.getString(0) should be < r.getString(1)
        val (i, ta, tb) = (r.getLong(2), r.getLong(3), r.getLong(4))
        r.getDouble(6) shouldBe i.toDouble / (ta + tb - i)
      }
    }

    "fails FAST on a high-cardinality group column (buffer guard)" in {
      import spark.implicits._
      // groupCol = the doc id itself: the per-shingle collect_set would be
      // bounded only by corpus size — the guard must reject it up front
      // (one narrow distinct scan), before any shingle ever explodes
      val docsAsGroups = (1 to 6)
        .map(i => (s"doc$i", "same shared text")).toDF("source", "text")
      val ex = intercept[IllegalArgumentException] {
        Stats.corpusOverlap(docsAsGroups, "source", "text", n = 2,
          maxGroups = 5)
      }
      ex.getMessage should include("distinct groups")
      // at-the-limit cardinality still works
      Stats.corpusOverlap(docsAsGroups, "source", "text", n = 2,
        maxGroups = 6).count() shouldBe 15 // all C(6,2) pairs share all
    }
  }

  "Stats.tokenDrift" - {
    "matches a hand-computed total-variation distance" in {
      import spark.implicits._
      // A: {x:2, y:1} N=3; B(rest of A): {x:1, z:1} N=2
      // TVD = ½(|2/3−1/2| + |1/3−0| + |0−1/2|) = ½ — numerator per A:
      // x |2·2−1·3|=1, y |1·2−0·3|=2, absent-token fold 3·(2−1)=3 → 6;
      // 6 / (2·3·2) = 0.5
      val df = Seq(("A", "x x y"), ("B", "x z")).toDF("source", "text")
      val got = Stats.tokenDrift(df, "source", col("text"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      got shouldBe Map("A" -> ((3L, 6L, 0.5)), "B" -> ((2L, 6L, 0.5)))
    }

    "identical slices drift zero; with two groups tvd is symmetric" in {
      import spark.implicits._
      val same = Seq(("A", "a b c"), ("B", "a b c")).toDF("source", "text")
      Stats.tokenDrift(same, "source", col("text"))
        .collect().foreach(_.getDouble(3) shouldBe 0.0)
      val two = docs.withColumn("half",
        when(col("doc_id") % 2 === 0, "even").otherwise("odd"))
      val tv = Stats.tokenDrift(two, "half", col("text"))
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      tv("even") shouldBe tv("odd") // both compare against the other half
      tv("even") should (be > 0.0 and be < 1.0)
    }

    "a single-group corpus yields NULL tvd, not NaN" in {
      import spark.implicits._
      val one = Seq(("only", "a b c")).toDF("source", "text")
      val row = Stats.tokenDrift(one, "source", col("text")).collect()(0)
      row.isNullAt(3) shouldBe true
    }
  }

  "Sampling.temperatureHalf" - {
    "keeps the smallest stratum whole and cuts larger ones to the geometric mean" in {
      import spark.implicits._
      // strata sizes: a=4, b=100 → quotas: a=4, b=ceil(sqrt(400))=20
      val df = ((1 to 4).map(i => (s"a", i.toLong)) ++
        (1 to 100).map(i => ("b", 100L + i))).toDF("src", "id")
      val got = Sampling.temperatureHalf(df, "src", "id")
        .groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      got shouldBe Map("a" -> 4L, "b" -> 20L)
    }

    "is deterministic and a subset of the input" in {
      val a = Sampling.temperatureHalf(docs, "source", "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val b = Sampling.temperatureHalf(docs, "source", "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      a shouldBe b
      val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
      a.subsetOf(all) shouldBe true
    }
  }

  "Stats.sampleQuantiles" - {
    "matches a driver-side replay of the hash-sample estimator" in {
      import spark.implicits._
      val rows = (1 to 500).map(i => ("g", i.toLong, math.sin(i) * 100))
      val df = rows.toDF("g", "id", "v")
      val got = Stats.sampleQuantiles(df, "g", col("id"), col("v"),
          k = 64, ps = Seq(0.5, 0.9))
        .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
      // reference: same hash order, driver-side
      val hashed = df.select(col("id"),
          graft.pipeline.Sampling.md5Hash60(col("id")).as("h"), col("v"))
        .collect().map(r => (r.getLong(1), r.getDouble(2)))
      val sample = hashed.sortBy(identity).take(64).map(_._2).sorted
      def q(p: Double) = sample(math.max(1, math.ceil(64 * p).toInt) - 1)
      got shouldBe Map(0.5 -> q(0.5), 0.9 -> q(0.9))
    }

    "is partitioning-invariant (pins the sketch merge path)" in {
      import spark.implicits._
      val df = (1 to 1000).map(i => (s"g${i % 3}", i.toLong, i * 0.7))
        .toDF("g", "id", "v")
      def run(d: org.apache.spark.sql.DataFrame) =
        Stats.sampleQuantiles(d, "g", col("id"), col("v"),
            k = 32, ps = Seq(0.25, 0.75))
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
          .toSet
      run(df.repartition(13)) shouldBe run(df.coalesce(1))
    }

    "below-k groups give exact discrete quantiles" in {
      import spark.implicits._
      val df = Seq(("g", 1L, 10.0), ("g", 2L, 20.0), ("g", 3L, 30.0),
        ("g", 4L, 40.0)).toDF("g", "id", "v")
      val got = Stats.sampleQuantiles(df, "g", col("id"), col("v"),
          k = 256, ps = Seq(0.5, 1.0))
        .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
      got shouldBe Map(0.5 -> 20.0, 1.0 -> 40.0) // every row sampled
    }
  }

  "Sampling.upsampleEpochs" - {
    "repeats whole epochs and truncates the last to the exact quota" in {
      import spark.implicits._
      // stratum a: 4 rows, quota 10 → 2 full epochs + 2 rows of epoch 2;
      // stratum b: 3 rows, quota 2 → cut to 2 (epoch 0); c unlisted → drop
      val df = ((1 to 4).map(i => ("a", i.toLong)) ++
        (1 to 3).map(i => ("b", 10L + i)) ++
        Seq(("c", 99L))).toDF("src", "id")
      val got = Sampling.upsampleEpochs(df, "src", "id",
        Map("a" -> 10L, "b" -> 2L))
      got.filter(col("src") === "c").count() shouldBe 0
      val aByEpoch = got.filter(col("src") === "a")
        .groupBy("epoch").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      aByEpoch shouldBe Map(0L -> 4L, 1L -> 4L, 2L -> 2L)
      got.filter(col("src") === "b").count() shouldBe 2
      // the partial epoch is a PREFIX of the full one (hash order)
      val partial = got.filter(col("src") === "a" && col("epoch") === 2)
        .select("id").collect().map(_.getLong(0)).toSet
      val full = got.filter(col("src") === "a" && col("epoch") === 0)
        .select("id").collect().map(_.getLong(0)).toSet
      partial.subsetOf(full) shouldBe true
    }

    "quota at or below n degenerates to an exact cut, epoch 0 only" in {
      import spark.implicits._
      val df = (1 to 8).map(i => ("a", i.toLong)).toDF("src", "id")
      val got = Sampling.upsampleEpochs(df, "src", "id", Map("a" -> 8L))
      got.count() shouldBe 8
      got.select("epoch").distinct().collect().map(_.getLong(0)).toSeq shouldBe Seq(0L)
    }
  }

  "Sampling.tokenBudgetSample" - {
    "fills each shard's quota with overshoot of at most one doc tail" in {
      import spark.implicits._
      val df = (1 to 200).map(i => (i.toLong, "w " * 10 + "w")).toDF("doc_id", "text")
      val out = Sampling.tokenBudgetSample(df, "doc_id",
        TextAnalysis.tokenCount(col("text")), budget = 160L, shards = 4)
      // quota 40 tokens/shard, docs are 11 tokens: last kept doc STARTS
      // below 40, so per-shard mass is in [40, 50]
      val byShard = out.groupBy("shard").agg(sum("n_tok").as("m"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      byShard.keySet shouldBe Set(0L, 1L, 2L, 3L)
      byShard.values.foreach { m =>
        m should (be >= 40L and be <= 50L)
      }
      // every kept doc's start offset is below its shard quota
      out.filter(col("start_tok") >= 40).count() shouldBe 0
    }

    "is nested: a bigger budget strictly extends the smaller sample" in {
      import spark.implicits._
      val df = (1 to 100).map(i => (i.toLong, "a b c")).toDF("doc_id", "text")
      def ids(b: Long) = Sampling.tokenBudgetSample(df, "doc_id",
          TextAnalysis.tokenCount(col("text")), budget = b, shards = 2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val small = ids(30L)
      val big = ids(90L)
      small.subsetOf(big) shouldBe true
      big.size should be > small.size
    }

    "distributes the budget remainder to the first shards" in {
      import spark.implicits._
      // 1-token docs, budget 5 over 2 shards → quotas 3 and 2
      val df = (1 to 50).map(i => (i.toLong, "x")).toDF("doc_id", "text")
      val got = Sampling.tokenBudgetSample(df, "doc_id",
          TextAnalysis.tokenCount(col("text")), budget = 5L, shards = 2)
        .groupBy("shard").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe Map(0L -> 3L, 1L -> 2L)
    }
  }

  "Stats.vocabCoverage" - {
    "picks the smallest count-threshold vocabulary reaching the share" in {
      import spark.implicits._
      // counts: a=4, b=2, c=1 (total 7); cum desc: 4 (57%), 6 (86%), 7
      val df = Seq("a a a a b b c").toDF("text")
      val r95 = Stats.vocabCoverage(df, col("text"), 95).collect()(0)
      (r95.getLong(0), r95.getLong(1), r95.getLong(2), r95.getLong(3)) shouldBe
        ((1L, 3L, 7L, 7L))
      val r80 = Stats.vocabCoverage(df, col("text"), 80).collect()(0)
      (r80.getLong(0), r80.getLong(1), r80.getLong(2), r80.getLong(3)) shouldBe
        ((2L, 2L, 6L, 7L))
    }

    "covers at least the share on the corpus" in {
      val r = Stats.vocabCoverage(docs, col("text"), 95).collect()(0)
      (r.getLong(2) * 100) should be >= (r.getLong(3) * 95)
      r.getLong(1) should be > 0L
    }
  }

  "Stats.kmvDistinct" - {
    "is exact below the cap (sketch_size = true distinct count)" in {
      import spark.implicits._
      // 7 distinct values across 20 rows, k=64 » 7 ⇒ exact
      val df = (1 to 20).map(i => ("g", s"v${i % 7}")).toDF("grp", "v")
      val row = Stats.kmvDistinct(df, "grp", col("v"), k = 64).collect()(0)
      row.getLong(1) shouldBe 7L
      row.getDouble(3) shouldBe 7.0
    }

    "ignores NULL values" in {
      import spark.implicits._
      val df = Seq(("g", "a"), ("g", null), ("g", "b")).toDF("grp", "v")
      Stats.kmvDistinct(df, "grp", col("v"), k = 8)
        .collect()(0).getLong(1) shouldBe 2L
    }

    "is partitioning-invariant (pins the buffer merge path)" in {
      val tok = docs.select(col("source"),
        explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val a = Stats.kmvDistinct(tok, "source", col("tok"), k = 32)
        .orderBy("source").collect().toSeq
      val b = Stats.kmvDistinct(tok.repartition(17), "source", col("tok"), k = 32)
        .orderBy("source").collect().toSeq
      a shouldBe b
    }

    "aggregates with a map-side partial (the sketch's whole point)" in {
      val tok = docs.select(col("source"),
        explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val plan = Stats.kmvDistinct(tok, "source", col("tok"), k = 32)
        .queryExecution.executedPlan.toString
      // TypedImperativeAggregate plans as ObjectHashAggregate, once in
      // partial mode below the exchange and once in final mode above it
      "ObjectHashAggregate".r.findAllIn(plan).size shouldBe 2
      plan should include("partial_bottomkdistinct")
    }

    "merging slice sketches equals the direct whole-input sketch" in {
      val tok = docs.select(col("source"),
        explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val direct = Stats.kmvDistinct(tok, "source", col("tok"), k = 32)
        .orderBy("source").collect().toSeq
      // three arbitrary slices, sketched independently then merged
      val slices = (0 until 3).map(i =>
        Stats.kmvSketches(tok.filter(pmod(xxhash64(col("tok")), lit(3)) === i),
          "source", col("tok"), k = 32))
      val merged = Stats.kmvEstimate(
        Stats.kmvMergeSketches(slices.reduce(_ unionByName _), "source", 32),
        "source", 32).orderBy("source").collect().toSeq
      merged shouldBe direct
    }

    "estimates true cardinality within KMV error bounds" in {
      import spark.implicits._
      // 5000 distinct ids, k=256 ⇒ relative error ~1/√254 ≈ 6%; allow 5σ
      val df = (1 to 5000).map(i => ("g", i.toString)).toDF("grp", "v")
      val est = Stats.kmvDistinct(df, "grp", col("v"), k = 256)
        .collect()(0).getDouble(3)
      est should be(5000.0 +- 1600.0)
    }
  }

  "IntervalJoin.followWithin" - {
    "counts strictly-after rows within span, per equi key, zero-filled" in {
      import spark.implicits._
      val ev = Seq(
        (1L, "x", 0L), (2L, "x", 500L), (3L, "x", 1500L),
        (4L, "y", 100L), (5L, "y", 5000L)).toDF("id", "typ", "ts_ms")
      val got = IntervalJoin.followWithin(ev, ev, "id", "ts_ms",
          spanMs = 1000L, equi = Seq("typ"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
      got shouldBe Set(
        (1L, 1L, Some(500L)),  // 500 ∈ (0, 1000]; 1500 is outside
        (2L, 1L, Some(1500L)), // 1500 ∈ (500, 1500]
        (3L, 0L, None),
        (4L, 0L, None),        // 5000 > 100+1000
        (5L, 0L, None))
    }

    "window boundaries are (exclusive, inclusive]" in {
      import spark.implicits._
      val ev = Seq((1L, "x", 0L), (2L, "x", 1000L), (3L, "x", 0L))
        .toDF("id", "typ", "ts_ms")
      val got = IntervalJoin.followWithin(ev, ev, "id", "ts_ms", 1000L, Seq("typ"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // ts=0 rows: the other ts=0 row is NOT after (strict >); ts=1000 IS (inclusive ≤)
      got shouldBe Map(1L -> 1L, 2L -> 0L, 3L -> 1L)
    }

    "plans an equi join on (keys, bucket), not a nested-loop range join" in {
      import spark.implicits._
      val ev = Seq((1L, "x", 0L)).toDF("id", "typ", "ts_ms")
      val plan = IntervalJoin.followWithin(ev, ev, "id", "ts_ms", 1000L, Seq("typ"))
        .queryExecution.executedPlan.toString
      plan should not include "BroadcastNestedLoopJoin"
      plan should not include "CartesianProduct"
    }
  }

  "Stats.ksDrift" - {
    "identical samples give ks 0; disjoint samples give ks 1" in {
      import spark.implicits._
      val same = Seq((1.0, true), (2.0, true), (3.0, true),
        (1.0, false), (2.0, false), (3.0, false)).toDF("v", "a")
      val r0 = Stats.ksDrift(same, col("v"), col("a")).collect()(0)
      r0.getAs[Double]("ks") shouldBe 0.0
      r0.getAs[Long]("n_a") shouldBe 3L
      val apart = Seq((1.0, true), (2.0, true), (5.0, false), (6.0, false))
        .toDF("v", "a")
      val r1 = Stats.ksDrift(apart, col("v"), col("a")).collect()(0)
      r1.getAs[Double]("ks") shouldBe 1.0
      r1.getAs[Double]("at_value") shouldBe 2.0 // gap first complete at 2
    }

    "matches the hand-computed max CDF gap with ties and repeats" in {
      import spark.implicits._
      // A = [1,1,2], B = [3]: F_a(1)=2/3,F_b(1)=0; F_a(2)=1,F_b(2)=0 ⇒ ks=1@2
      val df = Seq((1.0, true), (1.0, true), (2.0, true), (3.0, false))
        .toDF("v", "a")
      val r = Stats.ksDrift(df, col("v"), col("a")).collect()(0)
      r.getAs[Long]("n_a") shouldBe 3L
      r.getAs[Long]("n_b") shouldBe 1L
      r.getAs[Double]("ks") shouldBe 1.0
      r.getAs[Double]("at_value") shouldBe 2.0
      // overlapping: A=[1,3], B=[2,4]: gaps .5,.5(tie at 1? compute), max .5 at 1
      val o = Seq((1.0, true), (3.0, true), (2.0, false), (4.0, false))
        .toDF("v", "a")
      val ro = Stats.ksDrift(o, col("v"), col("a")).collect()(0)
      ro.getAs[Double]("ks") shouldBe 0.5
      ro.getAs[Double]("at_value") shouldBe 1.0 // tie (gap .5 at 1 and 3) → smallest v
    }

    "returns zero rows on an empty input (matching the SQL GROUP BY)" in {
      import spark.implicits._
      val empty = Seq.empty[(Double, Boolean)].toDF("v", "a")
      Stats.ksDrift(empty, col("v"), col("a")).count() shouldBe 0L
      // all-null values filter to empty too
      val nulls = Seq((Option.empty[Double], true)).toDF("v", "a")
      Stats.ksDrift(nulls, col("v"), col("a")).count() shouldBe 0L
    }
  }

  "Stats.cmsTokenEstimates" - {
    "never undercounts, and is exact for every probe at a wide sketch" in {
      import spark.implicits._
      val exact = docs
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      // ~30 distinct tokens in the corpus vs 4×2^9 counters: collisions
      // within a 9-bit slice are possible, but four independent slices
      // colliding for the same pair is not — est == cnt for every token
      val got = Stats.cmsTokenEstimates(docs, col("text"), exact, "token",
          d = 4, wlog = 9)
        .select("token", "cnt", "est").collect()
      got.length should be > 0
      got.foreach { r =>
        r.getAs[Long]("est") should be >= r.getAs[Long]("cnt")
      }
      got.count(r => r.getAs[Long]("est") == r.getAs[Long]("cnt")) shouldBe
        got.length
    }

    "a deliberately narrow sketch overestimates colliding tokens" in {
      import spark.implicits._
      // 1 row × 2^3 slots and dozens of distinct tokens: pigeonhole forces
      // collisions, so SOME estimate must exceed its exact count — and the
      // sketch still never undercounts
      val exact = docs
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      val got = Stats.cmsTokenEstimates(docs, col("text"), exact, "token",
          d = 1, wlog = 3)
        .select("cnt", "est").as[(Long, Long)].collect()
      got.foreach { case (cnt, est) => est should be >= cnt }
      got.count { case (cnt, est) => est > cnt } should be > 0
    }
  }

  "Stats.vocabGrowth" - {
    "curve is monotone and saturates at the full corpus counts" in {
      import spark.implicits._
      val docs = (1L to 30L).map(i =>
        (i, (1 to 5).map(j => s"tok${(i * 7 + j) % 40}").mkString(" ")))
        .toDF("doc_id", "text")
      val got = Stats.vocabGrowth(docs, "doc_id", col("text"),
          checkpoints = Seq(5, 10, 30, 100), shards = 4)
        .as[(Int, Long, Long, Long)].collect().toSeq
      got.map(_._1) shouldBe Seq(5, 10, 30, 100)
      // docs/tokens/types all nondecreasing in c
      got.sliding(2).foreach { case Seq(a, b) =>
        b._2 should be >= a._2; b._3 should be >= a._3; b._4 should be >= a._4
      }
      // past the corpus size the curve saturates at the full counts
      got.last shouldBe ((100, 30L, 150L,
        docs.select(explode(split(col("text"), " "))).distinct().count()))
      got(0)._2 shouldBe 5L   // exactly c docs seen below each prefix
      got(1)._2 shouldBe 10L
    }
  }

  "Stats.hllOverlap" - {
    "identical groups: union = single, inclusion-exclusion returns the single" in {
      import spark.implicits._
      val vals = (1 to 400).flatMap(i => Seq(("a", s"v$i"), ("b", s"v$i")))
      val got = Stats.hllOverlap(vals.toDF("g", "v"), "g", col("v"), p = 6)
        .collect()(0)
      val (ea, eb, eu, ov) = (got.getDouble(2), got.getDouble(3),
        got.getDouble(4), got.getDouble(5))
      ea shouldBe eb     // same value set, same registers
      eu shouldBe ea     // union of identical registers is unchanged
      ov shouldBe ea     // a + a − a is exact in IEEE
    }

    "union estimate dominates both singles; disjoint overlap is small" in {
      import spark.implicits._
      val vals = (1 to 300).map(i => ("a", s"x$i")) ++
        (1 to 300).map(i => ("b", s"y$i"))
      val got = Stats.hllOverlap(vals.toDF("g", "v"), "g", col("v"), p = 6)
        .collect()(0)
      val (ea, eb, eu, ov) = (got.getDouble(2), got.getDouble(3),
        got.getDouble(4), got.getDouble(5))
      eu should be >= math.max(ea, eb) // max-merge can only raise registers
      math.abs(ov) should be < 0.35 * (ea + eb) // noise floor, not a match
    }
  }

  "Stats.tokenGini" - {
    "hand-computed coefficient; uniform and singleton groups are zero" in {
      import spark.implicits._
      // g1: counts {a:1, b:1, c:2} → ranks asc (1,1,2) at (1,2,3):
      //     2A = 2(1·1 + 2·1 + 3·2) = 18; n=3, S=4 → G = (18−16)/12 = 1/6
      // g2: counts {x:2, y:2} → 2A = 12; n=2, S=4 → G = (12−12)/8 = 0
      // g3: one type → always 0
      val df = Seq(
        ("g1", "a b c c"), ("g2", "x x y y"), ("g3", "z z z")
      ).toDF("source", "text")
      val got = Stats.tokenGini(df, "source", col("text"))
        .orderBy("source")
        .as[(String, Long, Long, Double)].collect().toSeq
      got shouldBe Seq(("g1", 3L, 4L, 1.0 / 6.0), ("g2", 2L, 4L, 0.0),
        ("g3", 1L, 3L, 0.0))
    }

    "concentration raises the coefficient monotonically" in {
      import spark.implicits._
      val flat = ("flat", (1 to 20).map(i => s"t$i").mkString(" "))
      val skew = ("skew", ((1 to 20).map(i => s"t$i") ++
        Seq.fill(80)("t1")).mkString(" "))
      val g = Stats.tokenGini(Seq(flat, skew).toDF("source", "text"),
          "source", col("text"))
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      g("flat") shouldBe 0.0
      g("skew") should be > 0.7
    }
  }

  "Stats.kAnonymityRisk" - {
    "returns exactly the sub-k quasi-identifier groups with their sizes" in {
      import spark.implicits._
      val df = Seq(
        ("en", "web", 1L), ("en", "web", 1L), ("en", "web", 1L), // n=3
        ("en", "web", 2L),                                       // n=1
        ("de", "web", 1L), ("de", "web", 1L),                    // n=2
        ("de", "book", 9L), ("de", "book", 9L), ("de", "book", 9L)
      ).toDF("lang", "source", "bucket")
      val got = Stats.kAnonymityRisk(df,
          Seq(col("lang"), col("source"), col("bucket")), k = 3)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
          r.getLong(3)).toMap
      got shouldBe Map(
        ("en", "web", 2L) -> 1L,
        ("de", "web", 1L) -> 2L)
    }

    "a k-anonymous table yields no findings; k is validated" in {
      import spark.implicits._
      val df = Seq.fill(4)(("en", 1L)).toDF("lang", "bucket")
      Stats.kAnonymityRisk(df, Seq(col("lang"), col("bucket")), k = 4)
        .count() shouldBe 0L
      an[IllegalArgumentException] should be thrownBy
        Stats.kAnonymityRisk(df, Seq(col("lang")), k = 1)
      an[IllegalArgumentException] should be thrownBy
        Stats.kAnonymityRisk(df, Seq.empty, k = 5)
    }
  }
}

package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

class EventAnalyticsSpec extends AnyFreeSpec with Matchers with SparkFixture {
  import spark.implicits._

  "EventAnalytics.funnel" - {
    "counts strictly-ordered first completions per stage" in {
      val ev = Seq(
        // user 1 completes A(10) -> B(20) -> C(30)
        (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
        // user 2: B before A — stalls at A
        (2L, "B", 5L), (2L, "A", 10L),
        // user 3: A then C (no B) — stalls after A
        (3L, "A", 1L), (3L, "C", 2L),
        // user 4: never does A
        (4L, "B", 1L), (4L, "C", 2L)).toDF("user_id", "typ", "ts")
      val got = EventAnalytics.funnel(ev, "user_id", "typ", "ts",
          Seq("A", "B", "C"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      got shouldBe Map("A" -> 3L, "B" -> 1L, "C" -> 1L)
    }

    "simultaneous events do not advance the funnel (strict >)" in {
      val ev = Seq((1L, "A", 10L), (1L, "B", 10L)).toDF("user_id", "typ", "ts")
      val got = EventAnalytics.funnel(ev, "user_id", "typ", "ts", Seq("A", "B"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      got shouldBe Map("A" -> 1L, "B" -> 0L)
    }

    "first-completion anchoring maximizes depth (earliest A counts, not latest)" in {
      // A at 10 and 100; B at 50: anchoring at A=10 lets B=50 qualify
      val ev = Seq((1L, "A", 10L), (1L, "A", 100L), (1L, "B", 50L))
        .toDF("user_id", "typ", "ts")
      val got = EventAnalytics.funnel(ev, "user_id", "typ", "ts", Seq("A", "B"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      got shouldBe Map("A" -> 1L, "B" -> 1L)
    }
  }

  "EventAnalytics.retentionCohorts" - {
    "builds the (cohort, offset) triangle from distinct active periods" in {
      val ev = Seq(
        // user 1: weeks 0, 1, 3 (cohort 0)
        (1L, 5L), (1L, 15L), (1L, 35L), (1L, 36L),
        // user 2: weeks 1, 3 (cohort 1)
        (2L, 12L), (2L, 33L),
        // user 3: week 3 only (cohort 3)
        (3L, 30L)).toDF("user_id", "ts")
      val got = EventAnalytics.retentionCohorts(ev, "user_id", col("ts"), 10L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      got shouldBe Map(
        (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
        (1L, 0L) -> 1L, (1L, 2L) -> 1L,
        (3L, 0L) -> 1L)
    }

    "offset zero equals the cohort size" in {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(col("user_id"),
          (unix_micros(col("ts").cast("timestamp")) / 1000).cast("long").as("ts_ms"))
      val tri = EventAnalytics.retentionCohorts(ev, "user_id", col("ts_ms"),
        604800000L)
      val zero = tri.filter(col("offset") === 0)
        .agg(sum("users")).collect()(0).getLong(0)
      val users = ev.select("user_id").distinct().count()
      zero shouldBe users
    }
  }

  "EventAnalytics.countAnomalies" - {
    "flags a spike against the trailing observed-bucket mean" in {
      // type x, buckets 0..4 with counts [10,10,10,100,10]; window 24 ⇒
      // bucket 3 sees trailing (10,10,10): 100·3 > 2·30 → anomaly;
      // bucket 0 has no history; bucket 4 sees (10,10,10,100): 40 ≯ 260
      val ev = (for {
        (b, c) <- Seq((0L, 10), (1L, 10), (2L, 10), (3L, 100), (4L, 10))
        i <- 0 until c
      } yield ("x", b * 1000L + i)).toDF("typ", "ts_ms")
      val got = EventAnalytics.countAnomalies(ev, "typ", col("ts_ms"),
          bucketMs = 1000L, window = 24)
        .orderBy("bucket").collect()
      got.map(_.getAs[Long]("cnt")).toSeq shouldBe Seq(10L, 10L, 10L, 100L, 10L)
      got.map(_.getAs[Boolean]("anomaly")).toSeq shouldBe
        Seq(false, false, false, true, false)
      got(3).getAs[Long]("trail_n") shouldBe 3L
      got(3).getAs[Long]("trail_sum") shouldBe 30L
      got(4).getAs[Long]("trail_sum") shouldBe 130L
    }

    "window slides: old buckets age out of the baseline" in {
      // window 2: bucket 3's baseline is buckets 1,2 only
      val ev = (for {
        (b, c) <- Seq((0L, 100), (1L, 1), (2L, 1), (3L, 4))
        i <- 0 until c
      } yield ("x", b * 1000L + i)).toDF("typ", "ts_ms")
      val got = EventAnalytics.countAnomalies(ev, "typ", col("ts_ms"),
          bucketMs = 1000L, window = 2)
        .orderBy("bucket").collect()
      // bucket 3: trailing (1,1) → 4·2 > 2·2 → anomaly despite the old 100
      got(3).getAs[Boolean]("anomaly") shouldBe true
      got(3).getAs[Long]("trail_sum") shouldBe 2L
      // bucket 2: trailing (100,1) → 1·2 > 2·101 is false
      got(2).getAs[Boolean]("anomaly") shouldBe false
    }
  }

  "EventAnalytics.topPaths" - {
    "counts first-depth sequences; ties break by path" in {
      val ev = Seq(
        (1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "C", 30L, 3L),
        (2L, "A", 10L, 4L), (2L, "B", 20L, 5L),
        (3L, "A", 1L, 6L), (3L, "B", 2L, 7L), (3L, "C", 3L, 8L),
        (3L, "D", 4L, 9L), (3L, "E", 5L, 10L), // depth cut: D,E beyond 3
        (4L, "B", 5L, 12L), (4L, "A", 5L, 11L) // same ts → id breaks tie
      ).toDF("user_id", "event_type", "ts", "event_id")
      val got = EventAnalytics.topPaths(ev, "user_id", "event_type",
          col("ts"), col("event_id"), depth = 3, k = 10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // tie at users=2 → path ASC: "A>B" (a prefix) sorts before "A>B>C"
      got shouldBe Seq(("A>B", 2L), ("A>B>C", 2L))
    }
  }

  "EventAnalytics.transitionMatrix" - {
    "counts adjacent pairs per user; rows normalize to 1" in {
      val ev = Seq(
        (1L, "A", 1L, 1L), (1L, "B", 2L, 2L), (1L, "A", 3L, 3L),
        (2L, "A", 1L, 4L), (2L, "A", 2L, 5L)
      ).toDF("user_id", "event_type", "ts", "event_id")
      val got = EventAnalytics.transitionMatrix(ev, "user_id",
          "event_type", col("ts"), col("event_id"))
        .orderBy("from_type", "to_type").collect()
        .map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getDouble(4)))).toMap
      got shouldBe Map(
        ("A", "A") -> ((1L, 0.5)), ("A", "B") -> ((1L, 0.5)),
        ("B", "A") -> ((1L, 1.0)))
    }
  }

  "EventAnalytics.ewmaSmooth" - {
    "hand-computed smoothing; gaps skipped, types isolated" in {
      // type a: bucket 1 → 4 events, bucket 2 → 8, bucket 5 → 2 (gap);
      // α=0.25: ewma = 4; 0.25·8+0.75·4 = 5; 0.25·2+0.75·5 = 4.25
      val ev = (for {
        (t, b, c) <- Seq(("a", 1L, 4), ("a", 2L, 8), ("a", 5L, 2),
          ("b", 3L, 7))
        i <- 0 until c
      } yield (t, b * 10L + i)).toDF("typ", "ts_ms")
      val got = EventAnalytics.ewmaSmooth(ev, "typ", col("ts_ms"),
          bucketMs = 10L, alpha = 0.25)
        .orderBy("typ", "bucket").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      got shouldBe Seq(("a", 1L, 4L, 4.0), ("a", 2L, 8L, 5.0),
        ("a", 5L, 2L, 4.25), ("b", 3L, 7L, 7.0))
    }

    "kernel equals the driver-side left fold exactly" in {
      val xs = Seq(3.0, 17.0, 1.0, 1.0, 256.0, 9.0, 0.0, 41.0)
      val alpha = 0.125
      val expect = xs.tail.scanLeft(xs.head)(
        (acc, x) => alpha * x + (1.0 - alpha) * acc)
      val got = Seq(Tuple1(xs)).toDF("xs")
        .select(graft.functions.SeriesFunctions.ewma(col("xs"), alpha))
        .collect()(0).getSeq[Double](0)
      got shouldBe expect // bit-exact, no tolerance
    }
  }
}

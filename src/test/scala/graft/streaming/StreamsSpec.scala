package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers
import java.nio.file.Files

/** Watermarked windowed aggregation: append mode emits a window only once
  * the watermark finalizes it, and rows arriving behind the watermark are
  * dropped — the state-bounding contract. */
class StreamsSpec extends AnyFreeSpec with Matchers with SparkFixture {

  "Streams.windowedCounts" - {
    "finalizes windows on watermark advance and drops late rows" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[Long] // event-time millis
      val counts = Streams.windowedCounts(
        src.toDS().select(timestamp_millis(col("value")).as("t")),
        "t", "1 minute", "1 minute")
      val q = counts.writeStream.format("memory").queryName("wc")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-wc").toString)
        .outputMode("append").start()
      try {
        src.addData(5000L, 15000L, 65000L) // window 0 ×2, window 1 ×1
        q.processAllAvailable()
        // watermark after this batch = 200000 - 60000 = 140000:
        // windows [0,60s) and [60s,120s) finalize and emit
        src.addData(200000L)
        q.processAllAvailable()
        // LATE: behind the watermark — silently dropped, window 0 stays 2
        src.addData(1000L)
        q.processAllAvailable()
        // push the watermark past window [180s,240s) to flush it
        src.addData(400000L)
        q.processAllAvailable()
        val rows = spark.table("wc").collect()
          .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime,
            r.getAs[Long]("cnt"))).toMap
        rows(0L) shouldBe 2L       // the late 1000L was NOT counted
        rows(60000L) shouldBe 1L
        rows(180000L) shouldBe 1L
      } finally q.stop()
    }

    "sessionCounts merges within the gap and finalizes on watermark" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[(Long, Long)] // (user, event-time millis)
      val sess = Streams.sessionCounts(
        src.toDS().select(col("_1").as("u"),
          timestamp_millis(col("_2")).as("t")),
        "u", "t", "1 minute", "1 minute")
      val q = sess.writeStream.format("memory").queryName("sc")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sc").toString)
        .outputMode("append").start()
      try {
        // user 1: 5s and 10s merge (gap < 1 min); 100s opens a new session
        src.addData((1L, 5000L), (1L, 10000L), (1L, 100000L), (2L, 7000L))
        q.processAllAvailable()
        src.addData((1L, 500000L)) // watermark 440s: finalizes the above
        q.processAllAvailable()
        src.addData((1L, 900000L)) // watermark 840s: finalizes the 500s one
        q.processAllAvailable()
        val rows = spark.table("sc").collect()
          .map(r => ((r.getAs[Long]("u"),
            r.getAs[java.sql.Timestamp]("session_start").getTime),
            r.getAs[Long]("n_events"))).toMap
        rows((1L, 5000L)) shouldBe 2L
        rows((1L, 100000L)) shouldBe 1L
        rows((2L, 7000L)) shouldBe 1L
      } finally q.stop()
    }

    "the same transformation runs in batch mode (oracle shape)" in {
      import spark.implicits._
      val batch = Seq(5000L, 15000L, 65000L, 1000L)
        .toDF("value").select(timestamp_millis(col("value")).as("t"))
      val got = Streams.windowedCounts(batch, "t", "1 minute", "1 minute")
        .select(unix_millis(col("window_start")).as("ms"), col("cnt"))
        .orderBy("ms").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      got shouldBe Seq((0L, 3L), (60000L, 1L)) // batch sees everything
    }
  }

  "Streams.intervalJoin" - {
    // geometry: lookback 60 s, both delays 10 s. Batch 1 pushes both
    // sides' max event time to t=2000 ⇒ global watermark 1990 for
    // batch 2. The batch-2 click at t=1970 is LATE (< 1990): in batch
    // mode it matches the t=1945 view, in streaming it must be dropped
    // before it joins — the production contract the 40-day replay bound
    // in st11 deliberately bypasses.
    "drops late rows beyond the watermark and evicts state" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val vsrc = MemoryStream[(Long, Long, Long)] // (view_id, user, sec)
      val csrc = MemoryStream[(Long, Long, Long)] // (click_id, user, sec)
      val views = vsrc.toDS().toDF("view_id", "v_user", "vsec")
        .select(col("view_id"), col("v_user"),
          timestamp_seconds(col("vsec")).as("vts"))
      val clicks = csrc.toDS().toDF("click_id", "c_user", "csec")
        .select(col("click_id"), col("c_user"),
          timestamp_seconds(col("csec")).as("cts"))
      val joined = Streams.intervalJoin(
          views, "vts", "10 seconds", clicks, "cts", "10 seconds",
          col("c_user") === col("v_user"), "1 minute")
        .select("click_id", "view_id")
      val q = joined.writeStream.format("memory").queryName("ij")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ij").toString)
        .start()
      try {
        vsrc.addData((100L, 1L, 1000L), (300L, 3L, 1945L), (900L, 9L, 2000L))
        csrc.addData((110L, 1L, 1010L), (910L, 9L, 2000L))
        q.processAllAvailable()
        // late click (u3, t=1970) — dropped; on-time click (u9, t=2005)
        // still matches the u9 view held in state
        csrc.addData((310L, 3L, 1970L), (920L, 9L, 2005L))
        q.processAllAvailable()
        val got = spark.table("ij").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        got shouldBe Set((110L, 100L), (910L, 900L), (920L, 900L))
        // state is BOUNDED: rows behind the watermark/interval horizon
        // are evicted (the t=1000 view and t=1010 click), so the store
        // holds strictly fewer rows than arrived
        val stateRows = q.lastProgress.stateOperators
          .map(_.numRowsTotal).sum
        stateRows should be < 7L
      } finally q.stop()
    }

    "left_outer emits unmatched probe rows once the watermark closes them" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val vsrc = MemoryStream[(Long, Long, Long)]
      val csrc = MemoryStream[(Long, Long, Long)]
      val views = vsrc.toDS().toDF("view_id", "v_user", "vsec")
        .select(col("view_id"), col("v_user"),
          timestamp_seconds(col("vsec")).as("vts"))
      val clicks = csrc.toDS().toDF("click_id", "c_user", "csec")
        .select(col("click_id"), col("c_user"),
          timestamp_seconds(col("csec")).as("cts"))
      val joined = Streams.intervalJoin(
          views, "vts", "10 seconds", clicks, "cts", "10 seconds",
          col("c_user") === col("v_user"), "1 minute",
          joinType = "left_outer")
        .select("click_id", "view_id")
      val q = joined.writeStream.format("memory").queryName("ijo")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ijo").toString)
        .start()
      try {
        // u2's click (t=1005) has no view; u3's click sits at t=1998,
        // inside the final watermark horizon — its window never closes
        vsrc.addData((100L, 1L, 1000L), (900L, 9L, 2000L))
        csrc.addData((110L, 1L, 1010L), (210L, 2L, 1005L),
          (910L, 9L, 2000L), (930L, 3L, 1998L))
        q.processAllAvailable()
        csrc.addData((920L, 9L, 2005L))
        q.processAllAvailable()
        val got = spark.table("ijo").collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
        // u2's null-joined row emitted exactly once, AFTER the watermark
        // (1990) proved no view can still match it; u3's click is STILL
        // HELD (1998 ≥ watermark — a matching view could yet arrive):
        // outer rows emit on watermark closure, never on arrival
        got shouldBe Set((110L, Some(100L)), (910L, Some(900L)),
          (920L, Some(900L)), (210L, None))
        got.map(_._1) should not contain 930L
      } finally q.stop()
    }

    "full_outer emits unmatched rows from BOTH sides exactly once on closure" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val vsrc = MemoryStream[(Long, Long, Long)]
      val csrc = MemoryStream[(Long, Long, Long)]
      val views = vsrc.toDS().toDF("view_id", "v_user", "vsec")
        .select(col("view_id"), col("v_user"),
          timestamp_seconds(col("vsec")).as("vts"))
      val clicks = csrc.toDS().toDF("click_id", "c_user", "csec")
        .select(col("click_id"), col("c_user"),
          timestamp_seconds(col("csec")).as("cts"))
      val joined = Streams.intervalJoin(
          views, "vts", "10 seconds", clicks, "cts", "10 seconds",
          col("c_user") === col("v_user"), "1 minute",
          joinType = "full_outer")
        .select("click_id", "view_id")
      val q = joined.writeStream.format("memory").queryName("ijf")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ijf").toString)
        .start()
      try {
        // u4's view (t=1050) never converts — the LEFT-side funnel drop
        // left_outer cannot count; u2's click (t=1005) has no view (the
        // RIGHT-side drop); u3's view at t=1998 stays inside the final
        // horizon — held, not emitted
        vsrc.addData((100L, 1L, 1000L), (400L, 4L, 1050L),
          (300L, 3L, 1998L), (900L, 9L, 2000L))
        csrc.addData((110L, 1L, 1010L), (210L, 2L, 1005L),
          (910L, 9L, 2000L))
        q.processAllAvailable()
        // batch 2 runs under watermark 1990: u4's window closed at
        // 1050 + 60 < 1990 ⇒ its null-extended row flushes now
        csrc.addData((920L, 9L, 2005L))
        q.processAllAvailable()
        def cell(r: org.apache.spark.sql.Row, i: Int) =
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        val got = spark.table("ijf").collect()
          .map(r => (cell(r, 0), cell(r, 1))).toSet
        got shouldBe Set(
          (Some(110L), Some(100L)), (Some(910L), Some(900L)),
          (Some(920L), Some(900L)),
          (Some(210L), None), // unmatched RIGHT, once, after closure
          (None, Some(400L))) // unmatched LEFT, once, after closure
      } finally q.stop()
    }

    "right_outer emits unmatched LEFT rows once — no operand swap needed" in {
      // the r12 verdict's #4: "views that never converted" WITHOUT the
      // caller hand-swapping operands (and mis-assigning the asymmetric
      // delay/lookback parameters)
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val vsrc = MemoryStream[(Long, Long, Long)]
      val csrc = MemoryStream[(Long, Long, Long)]
      val views = vsrc.toDS().toDF("view_id", "v_user", "vsec")
        .select(col("view_id"), col("v_user"),
          timestamp_seconds(col("vsec")).as("vts"))
      val clicks = csrc.toDS().toDF("click_id", "c_user", "csec")
        .select(col("click_id"), col("c_user"),
          timestamp_seconds(col("csec")).as("cts"))
      val joined = Streams.intervalJoin(
          views, "vts", "10 seconds", clicks, "cts", "10 seconds",
          col("c_user") === col("v_user"), "1 minute",
          joinType = "right_outer")
        .select("click_id", "view_id")
      val q = joined.writeStream.format("memory").queryName("ijr")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ijr").toString)
        .start()
      try {
        // u4's view (t=1050) never converts; u2's click (t=1005) has no
        // view — right_outer must DROP it (only left_outer/full_outer
        // retain the click side); u3's view at t=1998 stays inside the
        // final horizon — held, not emitted
        vsrc.addData((100L, 1L, 1000L), (400L, 4L, 1050L),
          (300L, 3L, 1998L), (900L, 9L, 2000L))
        csrc.addData((110L, 1L, 1010L), (210L, 2L, 1005L),
          (910L, 9L, 2000L))
        q.processAllAvailable()
        // batch 2 runs under watermark 1990: u4's window closed at
        // 1050 + 60 < 1990 ⇒ its null-extended row flushes now, once
        csrc.addData((920L, 9L, 2005L))
        q.processAllAvailable()
        def cell(r: org.apache.spark.sql.Row, i: Int) =
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        val got = spark.table("ijr").collect()
          .map(r => (cell(r, 0), cell(r, 1))).toSet
        got shouldBe Set(
          (Some(110L), Some(100L)), (Some(910L), Some(900L)),
          (Some(920L), Some(900L)),
          (None, Some(400L))) // unmatched LEFT, once, after closure
        // eventually-batch-identical: the same rows, minus the view the
        // final watermark still holds open, match the BATCH right join
        val bviews = Seq((100L, 1L, 1000L), (400L, 4L, 1050L),
            (900L, 9L, 2000L)).toDF("view_id", "v_user", "vsec")
          .select(col("view_id"), col("v_user"),
            timestamp_seconds(col("vsec")).as("vts"))
        val bclicks = Seq((110L, 1L, 1010L), (210L, 2L, 1005L),
            (910L, 9L, 2000L), (920L, 9L, 2005L))
          .toDF("click_id", "c_user", "csec")
          .select(col("click_id"), col("c_user"),
            timestamp_seconds(col("csec")).as("cts"))
        val batch = Streams.intervalJoin(
            bviews, "vts", "10 seconds", bclicks, "cts", "10 seconds",
            col("c_user") === col("v_user"), "1 minute",
            joinType = "right_outer")
          .select("click_id", "view_id").collect()
          .map(r => (cell(r, 0), cell(r, 1))).toSet
        got shouldBe batch
      } finally q.stop()
    }

    "a malformed or non-fixed lookback fails at operator construction" in {
      import spark.implicits._
      val views = Seq((100L, 1L, 1000L)).toDF("view_id", "v_user", "vsec")
        .select(col("view_id"), col("v_user"),
          timestamp_seconds(col("vsec")).as("vts"))
      val clicks = Seq((110L, 1L, 1010L)).toDF("click_id", "c_user", "csec")
        .select(col("click_id"), col("c_user"),
          timestamp_seconds(col("csec")).as("cts"))
      def join(lb: String) = Streams.intervalJoin(
        views, "vts", "10 seconds", clicks, "cts", "10 seconds",
        col("c_user") === col("v_user"), lb)
      intercept[IllegalArgumentException] { join("10 bananas") }
        .getMessage should include("not a valid SQL interval")
      intercept[IllegalArgumentException] { join("1 month") }
        .getMessage should include("calendar months")
      intercept[IllegalArgumentException] { join("-5 seconds") }
        .getMessage should include("positive duration")
      noException should be thrownBy join("10 minutes") // valid form passes
    }

    "batch mode equals the full interval join (oracle shape)" in {
      import spark.implicits._
      val views = Seq((100L, 1L, 1000L), (300L, 3L, 1945L), (900L, 9L, 2000L))
        .toDF("view_id", "v_user", "vsec")
        .select(col("view_id"), col("v_user"),
          timestamp_seconds(col("vsec")).as("vts"))
      val clicks = Seq((110L, 1L, 1010L), (910L, 9L, 2000L),
          (310L, 3L, 1970L), (920L, 9L, 2005L))
        .toDF("click_id", "c_user", "csec")
        .select(col("click_id"), col("c_user"),
          timestamp_seconds(col("csec")).as("cts"))
      val got = Streams.intervalJoin(
          views, "vts", "10 seconds", clicks, "cts", "10 seconds",
          col("c_user") === col("v_user"), "1 minute")
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch sees the (310, 300) pair streaming correctly drops as late
      got shouldBe Set((110L, 100L), (910L, 900L), (920L, 900L),
        (310L, 300L))
    }
  }

  "Streams.dedupFirstArrival" - {
    "keeps the first arrival per hash across batches, min id within one" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[(Long, String)]
      val q = Streams.dedupFirstArrival(src.toDS())
        .toDF("id", "h")
        .writeStream.format("memory").queryName("sd")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sd").toString)
        .outputMode("append").start()
      try {
        src.addData((1L, "a"), (2L, "a"), (3L, "b"))
        q.processAllAvailable()
        // batch 2: "a"/"b" already seen — dropped even with SMALLER ids;
        // "c" is new within the batch → its min id survives
        src.addData((0L, "a"), (5L, "c"), (4L, "c"), (9L, "b"))
        q.processAllAvailable()
        val got = spark.table("sd").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toSet
        got shouldBe Set(1L -> "a", 3L -> "b", 4L -> "c")
      } finally q.stop()
    }

    "batch mode degenerates to exact min-id dedup" in {
      import spark.implicits._
      val ds = Seq((5L, "x"), (2L, "x"), (7L, "y")).toDS()
      Streams.dedupFirstArrival(ds).collect().toSet shouldBe
        Set((2L, "x"), (7L, "y"))
    }
  }

  "Streams.hllMaintain" - {
    "streamed registers converge to the one-shot batch sketch" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val hs = (1 to 300).map(i =>
        graft.pipeline.Sampling.hashThreshold(0.0) + // 0L, keeps it obvious
          (i * 2654435761L) % (1L << 60))
      val src = MemoryStream[(String, Long)]
      val q = Streams.hllMaintain(src.toDS(), p = 6)
        .toDF("g", "upd", "regs")
        .writeStream.format("memory").queryName("hm")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-hm").toString)
        .outputMode("update").start()
      try {
        src.addData(hs.take(150).map(("g1", _)): _*)
        q.processAllAvailable()
        src.addData(hs.drop(150).map(("g1", _)): _*)
        q.processAllAvailable()
        val last = spark.table("hm").orderBy(col("upd").desc)
          .collect()(0)
        last.getLong(1) shouldBe 2L // two updates for the group
        // reference: one-shot fold of ALL hashes
        val ref = new Array[Int](64)
        hs.foreach { h =>
          val b = (h >>> 54).toInt
          val rest = h & ((1L << 54) - 1)
          val rho = if (rest == 0L) 55
            else 54 - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
          if (rho > ref(b)) ref(b) = rho
        }
        last.getSeq[Int](2) shouldBe ref.toSeq
      } finally q.stop()
    }
  }

  "Streams.trendingTopK" - {
    "ranks keys per window, count desc then key, capped at k" in {
      import spark.implicits._
      // window [0,60s): a×3 b×2 c×1; window [60s,120s): b×2 a×1
      val rows = Seq.fill(3)(("a", 5L)) ++ Seq.fill(2)(("b", 10L)) ++
        Seq(("c", 20L)) ++ Seq.fill(2)(("b", 70L)) ++ Seq(("a", 80L))
      val ev = rows.toDF("k", "sec")
        .select(col("k"), timestamp_millis(col("sec") * 1000).as("t"))
      val got = Streams.trendingTopK(ev, "t", col("k"),
          "1 minute", "1 minute", k = 2)
        .select(unix_millis(col("window_start")).as("w"), col("key"),
          col("cnt"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      got shouldBe Set(
        (0L, "a", 3L, 1L), (0L, "b", 2L, 2L), // c cut by k
        (60000L, "b", 2L, 1L), (60000L, "a", 1L, 2L))
    }

    "equal counts break toward the smaller key" in {
      import spark.implicits._
      val ev = Seq(("z", 1L), ("y", 2L)).toDF("k", "sec")
        .select(col("k"), timestamp_millis(col("sec") * 1000).as("t"))
      val got = Streams.trendingTopK(ev, "t", col("k"),
          "1 minute", "1 minute", k = 2)
        .select("key", "rank").as[(String, Long)].collect().toMap
      got shouldBe Map("y" -> 1L, "z" -> 2L)
    }
  }

  "parquet file sink (exactly-once across restart)" - {
    "a stopped-and-restarted query neither loses nor duplicates rows" in {
      import spark.implicits._
      val base = java.nio.file.Files
        .createTempDirectory("graft-st15").toString
      val rows = (1L to 40L).map(i => (i, s"doc$i"))
      rows.take(20).toDF("id", "body").coalesce(1)
        .write.mode("append").parquet(s"$base/in")
      rows.drop(20).toDF("id", "body").coalesce(1)
        .write.mode("append").parquet(s"$base/in")
      val schema = spark.read.parquet(s"$base/in").schema
      def start() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      // first incarnation: one trigger, then die
      val q1 = start()
      try {
        while (q1.recentProgress.length < 1) Thread.sleep(50)
      } finally q1.stop()
      // restart from the checkpoint: the sink's _spark_metadata commit
      // log must dedupe any batch replay
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val got = spark.read.parquet(s"$base/out")
        .select("id").as[Long].collect().sorted
      got shouldBe (1L to 40L).toArray // nothing lost, nothing doubled
    }
  }

  "Streams.cmsMaintain" - {
    "streamed counters converge to the one-shot batch sketch" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val d = 2
      val wlog = 5
      val w = 1 << wlog
      val hs = (1 to 300).map(i => (i * 2654435761L) % (1L << 60))
      val src = MemoryStream[(String, Long)]
      val q = Streams.cmsMaintain(src.toDS(), d, wlog)
        .toDF("g", "upd", "cnts")
        .writeStream.format("memory").queryName("cm")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-cm").toString)
        .outputMode("update").start()
      try {
        src.addData(hs.take(100).map(("g1", _)): _*)
        q.processAllAvailable()
        src.addData(hs.drop(100).map(("g1", _)): _*)
        q.processAllAvailable()
        val last = spark.table("cm").orderBy(col("upd").desc).collect()(0)
        last.getLong(1) shouldBe 2L
        // reference: one-shot fold of ALL hashes
        val ref = new Array[Long](d * w)
        hs.foreach { h =>
          (0 until d).foreach { i =>
            ref(i * w + ((h >>> (i * wlog)) & (w - 1)).toInt) += 1L
          }
        }
        last.getSeq[Long](2) shouldBe ref.toSeq
        // each row's counters account for every occurrence
        (0 until d).foreach { i =>
          (i * w until (i + 1) * w).map(ref(_)).sum shouldBe hs.length.toLong
        }
      } finally q.stop()
    }
  }

  "Streams.anomalyMaintain" - {
    "trailing baseline carries across batches; window slides; frontier drops" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[(String, Long, Long)]
      val q = Streams.anomalyMaintain(src.toDS(), window = 2, factor = 2L)
        .toDF("g", "bucket", "cnt", "trail_n", "trail_sum", "anomaly")
        .writeStream.format("memory").queryName("am")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-am").toString)
        .outputMode("update").start()
      try {
        src.addData(("x", 0L, 100L), ("x", 1L, 1L), ("x", 2L, 1L))
        q.processAllAvailable()
        // batch 2: bucket 3's baseline is (1,1) from buckets 1,2 — the
        // old 100 aged out of the 2-window; 4·2 > 2·2 → anomaly. The
        // re-delivered bucket 2 is behind the frontier and dropped
        src.addData(("x", 3L, 4L), ("x", 2L, 999L))
        q.processAllAvailable()
        val got = spark.table("am").orderBy("g", "bucket").collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getBoolean(5))).toSeq
        got shouldBe Seq(
          (0L, 100L, 0L, 0L, false), // no history
          (1L, 1L, 1L, 100L, false),
          (2L, 1L, 2L, 101L, false),
          (3L, 4L, 2L, 2L, true))    // streamed flag ≡ batch operator
      } finally q.stop()
    }
  }

  "Streams.ewmaMaintain" - {
    "folds across batches; frontier drops late and re-delivered buckets" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[(String, Long, Long)]
      val q = Streams.ewmaMaintain(src.toDS(), alpha = 0.25)
        .toDF("g", "bucket", "cnt", "ewma")
        .writeStream.format("memory").queryName("ew")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ew").toString)
        .outputMode("update").start()
      try {
        src.addData(("a", 1L, 4L), ("a", 2L, 8L), ("b", 3L, 7L))
        q.processAllAvailable()
        // batch 2: bucket 5 continues a's fold from state (e=5.0);
        // bucket 2 is a re-delivery and bucket 0 is late — both dropped
        src.addData(("a", 5L, 2L), ("a", 2L, 999L), ("a", 0L, 999L))
        q.processAllAvailable()
        val got = spark.table("ew").orderBy("g", "bucket").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).toSeq
        got shouldBe Seq(("a", 1L, 4L, 4.0), ("a", 2L, 8L, 5.0),
          ("a", 5L, 2L, 4.25), ("b", 3L, 7L, 7.0))
      } finally q.stop()
    }

    "in-order arrival equals the batch ewmaSmooth fold" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[(String, Long, Long)]
      val q = Streams.ewmaMaintain(src.toDS(), alpha = 0.25)
        .toDF("g", "bucket", "cnt", "ewma")
        .writeStream.format("memory").queryName("ew2")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ew2").toString)
        .outputMode("update").start()
      try {
        val counts = Seq(("x", 1L, 3L), ("x", 2L, 9L), ("x", 4L, 1L),
          ("x", 7L, 5L), ("y", 2L, 6L), ("y", 3L, 2L))
        src.addData(counts.filter(_._2 <= 3): _*)
        q.processAllAvailable()
        src.addData(counts.filter(_._2 > 3): _*)
        q.processAllAvailable()
        val got = spark.table("ew2").orderBy("g", "bucket").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSeq
        // batch reference: events expanded so ewmaSmooth re-derives the
        // same per-bucket counts (cnt copies of a row in each bucket)
        val ev = counts.flatMap { case (g, b, c) =>
          Seq.fill(c.toInt)((g, b * 10L)) }.toDF("g", "ts_ms")
        val ref = graft.pipeline.EventAnalytics.ewmaSmooth(
            ev, "g", col("ts_ms"), bucketMs = 10L, alpha = 0.25)
          .orderBy("g", "bucket").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSeq
        got shouldBe ref // bit-exact identity, no tolerance
      } finally q.stop()
    }
  }

  // ---- kill-and-replay: the FeedPipelineSpec property for the r7
  // maintainers. A file-source query dies MID-TRIGGER (poison row in the
  // second file while the crash switch is armed), restarts from the same
  // checkpoint, and must replay that batch from committed state: the
  // union of rows emitted across both incarnations equals the clean
  // one-shot fold — nothing lost, nothing double-folded.

  private def replayDrive(
      tag: String,
      startQuery: (String, String) => org.apache.spark.sql.streaming.StreamingQuery)
      : Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val base = Files.createTempDirectory(s"graft-$tag").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$base/in"))
      .map(_.getPath).filter(_.getName.startsWith("part-")).toSet
    val rows1 = (0L until 10L).map(b => ("g1", b, b % 4 + 1))
    val rows2 = (10L until 20L).map(b => ("g1", b, b % 5 + 2))
    rows1.toDF("g", "bucket", "cnt").coalesce(1)
      .write.mode("append").parquet(s"$base/in")
    val batch1 = dataFiles()
    rows2.toDF("g", "bucket", "cnt").coalesce(1)
      .write.mode("append").parquet(s"$base/in")
    val batch2 = dataFiles() -- batch1
    // FileStreamSource orders by mtime only — pin distinct times so the
    // two files are two deterministic triggers
    val t0 = System.currentTimeMillis()
    batch1.foreach(p => fs.setTimes(p, t0 - 120000L, -1L))
    batch2.foreach(p => fs.setTimes(p, t0 - 60000L, -1L))
    val ckpt = s"$base/ckpt"
    ReplayBuffer.clear(tag)
    // incarnation 1: trigger 1 commits, trigger 2 hits the poison row
    // (the memory sink cannot recover from a checkpoint, so the sink is
    // foreachBatch into a batchId-keyed buffer — a replayed batch lands
    // on its original key, which is exactly the sink-idempotence
    // contract a production exactly-once sink provides)
    ReplayCrash.armed = true
    val q1 = startQuery(base, ckpt)
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    died.getMessage should include("injected mid-trigger crash")
    // incarnation 2: restart from the SAME checkpoint; the failed batch
    // replays against the state trigger 1 committed
    ReplayCrash.armed = false
    val q2 = startQuery(base, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    ReplayBuffer.rows(tag)
  }

  private def sourceDS(base: String) = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$base/in").schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      .select(col("g"), col("bucket"), col("cnt"))
      .as[(String, Long, Long)]
      .map { r =>
        ReplayCrash.check(r._2)
        r
      }
  }

  "Streams.ewmaMaintain kill-and-replay" - {
    "a mid-trigger crash replays cleanly: streamed union ≡ batch fold" in {
      val rows = replayDrive("st16replay", (base, ckpt) =>
        Streams.ewmaMaintain(sourceDS(base), alpha = 0.25)
          .toDF("g", "bucket", "cnt", "ewma")
          .writeStream
          .foreachBatch(ReplayBuffer.sink("st16replay") _)
          .option("checkpointLocation", ckpt)
          .outputMode("update").start())
      val got = rows
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      // clean one-shot fold over all 20 buckets in order
      var e = 0.0
      val ref = (0L until 20L).map { b =>
        val c = if (b < 10) b % 4 + 1 else b % 5 + 2
        e = if (b == 0L) c.toDouble else 0.25 * c.toDouble + 0.75 * e
        ("g1", b, c, e)
      }
      got shouldBe ref // bit-exact: replay neither skipped nor re-folded
    }
  }

  "Streams.anomalyMaintain kill-and-replay" - {
    "a mid-trigger crash replays cleanly: streamed union ≡ batch baseline" in {
      val rows = replayDrive("st17replay", (base, ckpt) =>
        Streams.anomalyMaintain(sourceDS(base), window = 3, factor = 2L)
          .toDF("g", "bucket", "cnt", "trail_n", "trail_sum", "anomaly")
          .writeStream
          .foreachBatch(ReplayBuffer.sink("st17replay") _)
          .option("checkpointLocation", ckpt)
          .outputMode("update").start())
      val got = rows
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5)))
        .sortBy(t => (t._1, t._2))
      var trail = Seq.empty[(Long, Long)]
      val ref = (0L until 20L).map { b =>
        val c = if (b < 10) b % 4 + 1 else b % 5 + 2
        val (tn, ts) = (trail.size.toLong, trail.map(_._2).sum)
        val anomaly = tn > 0 && c * tn > 2L * ts
        trail = (trail :+ (b -> c)).takeRight(3)
        ("g1", b, c, tn, ts, anomaly)
      }
      got shouldBe ref
    }
  }
}

/** Crash switch for the kill-and-replay tests: local[*] shares one JVM,
  * so the volatile flag arms the poison row across "executor" tasks. */
object ReplayCrash {
  @volatile var armed = false
  def check(bucket: Long): Unit =
    if (armed && bucket == 10L)
      throw new RuntimeException("injected mid-trigger crash")
}

/** Idempotent foreachBatch sink for the kill-and-replay tests: rows land
  * under their (tag, batchId) key, so a REPLAYED batch overwrites its
  * original slot instead of duplicating — the sink-idempotence contract
  * of a production exactly-once sink, in-memory. The batch collects
  * before the put, so a mid-batch crash stores nothing. */
object ReplayBuffer {
  private val buf =
    new scala.collection.concurrent.TrieMap[(String, Long),
      Seq[org.apache.spark.sql.Row]]()
  def sink(tag: String)(df: org.apache.spark.sql.DataFrame,
      batchId: Long): Unit = {
    val rows = df.collect().toSeq
    buf.put((tag, batchId), rows)
    ()
  }
  def rows(tag: String): Seq[org.apache.spark.sql.Row] =
    buf.toSeq.filter(_._1._1 == tag).sortBy(_._1._2).flatMap(_._2)
  def clear(tag: String): Unit =
    buf.keys.filter(_._1 == tag).foreach(buf.remove)
}

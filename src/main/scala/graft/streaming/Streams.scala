package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time windowed aggregation — the Structured Streaming shape for
  * continuous analytics over the event stream (readStream → window agg →
  * writeStream).
  *
  * The watermark is the state bound: a tumbling window finalizes (append
  * mode emits it) once event time passes window end + delay, and later
  * rows for it are DROPPED — at cluster scale the state store holds only
  * the open windows, not history. The same transformation runs unchanged
  * on a batch DataFrame (withWatermark is a no-op in batch mode), which
  * is what the driver's oracle entry checks. */
object Streams {

  /** Tumbling-window event counts. `tsCol` must be a timestamp column. */
  def windowedCounts(events: DataFrame, tsCol: String,
      windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("cnt"))

  /** Windowed trending top-k: per tumbling window, the k heaviest keys
    * (count DESC, key ASC) with their rank — the "what's trending this
    * minute" feed. The windowed aggregation is the streaming-capable
    * stage (same watermark/state story as [[windowedCounts]]); the rank
    * is a per-window window function, which streaming cannot run over an
    * open aggregate — in a live pipeline the counts stream appends
    * FINALIZED windows to the sink and this same rank runs there
    * (foreachBatch / downstream view), which is exactly the shape the
    * batch form verifies: rank over completed windows. State per open
    * window is its key counts; the rank never holds state.
    *
    * Scale: one shuffle for the (window, key) aggregate (map-side
    * partials absorb hot keys), one for the per-window rank — both keyed
    * by window, so the rank partition is bounded by a window's distinct
    * keys. */
  def trendingTopK(events: DataFrame, tsCol: String, keyCol: Column,
      windowDur: String, watermarkDelay: String, k: Int): DataFrame = {
    val counts = events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"), keyCol.as("key"))
      .agg(count(lit(1)).as("cnt"))
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy("w").orderBy(col("cnt").desc, col("key"))
    counts
      .withColumn("rank", row_number().over(rank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("w.start").as("window_start"), col("key"),
        col("cnt"), col("rank"))
  }

  /** Per-key session windows (gap-based): a session extends while
    * consecutive events arrive within `gap`; an event at-or-past the
    * previous window's end (diff >= gap) opens a new session — Spark's
    * native `session_window`, whose merging state the streaming runtime
    * bounds with the watermark exactly like tumbling windows. The same
    * transformation runs unchanged in batch (the oracle shape): one
    * shuffle by key, sessionization inside the aggregation. */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("w.start").as("session_start"), col("n_events"))

  /** Stream-stream time-INTERVAL inner join — the correlation shape
    * ("each click joins the same user's views from the preceding
    * `lookback`") as a first-class operator with the PRODUCTION state
    * contract in its signature, not buried in an assembly: each side
    * declares its own watermark delay (its disorder bound), and the
    * interval condition is what lets Spark's symmetric hash join EVICT —
    * a left row is droppable once the right watermark passes
    * leftTs + lookback, a right row once the left watermark passes its
    * rightTs, so state ∝ rate × (delay + lookback), NEVER unbounded.
    * Input rows older than their side's watermark are dropped before
    * they join (the late-data contract; spec-pinned). Without the time
    * bound a stream-stream inner join would have to retain both streams
    * forever — the interval is not an optimization, it is what makes
    * the join runnable at all at 100 TB.
    *
    * `keyCond` is the equality part (e.g. `col("c_user") ===
    * col("v_user")`); `leftTsCol`/`rightTsCol` are event-time timestamp
    * columns; `lookback` is a SQL interval body ("10 minutes"). The
    * match window is leftTs ∈ [rightTs − lookback, rightTs]. Runs
    * unchanged in batch mode (withWatermark is a no-op there), which is
    * the oracle shape.
    *
    * `joinType`: "inner" (default), "left_outer" for the probe-retaining
    * form — every RIGHT row is emitted, with nulls on the left columns
    * when no left row fell in its window ("clicks that converted from no
    * view" / funnel-drop analysis) — "right_outer" for the mirror form —
    * every LEFT row is emitted, null-extended when no right row claimed
    * it ("views that never converted", WITHOUT hand-swapping the
    * operands and their asymmetric delay/lookback parameters, which is
    * exactly the error-prone rewrite this joinType exists to avoid) —
    * or "full_outer", which emits both unmatched sides. An outer row
    * is NOT emitted on arrival: the runtime holds it until the watermark
    * closes its match window (for a right row, leftWatermark > rightTs —
    * no earlier view can still arrive; for a left row, the right
    * watermark passing leftTs + lookback — no click can still claim it),
    * then emits the null-joined row exactly once — so outer results are
    * eventually identical to the batch join of the same type, at the
    * cost of watermark-delayed emission. Same state bound as the inner
    * form: the time constraint is what lets both sides evict.
    *
    * NOTE: the physical join is built as `right.join(left, …)` (the
    * probe/click stream drives), and joinType passes through to that
    * call unchanged — so "left_outer" retains every row of `right` and
    * "right_outer" every row of `left`, exactly the readings above. */
  def intervalJoin(
      left: DataFrame, leftTsCol: String, leftDelay: String,
      right: DataFrame, rightTsCol: String, rightDelay: String,
      keyCond: Column, lookback: String,
      joinType: String = "inner"): DataFrame = {
    require(
      Set("inner", "left_outer", "right_outer", "full_outer")
        .contains(joinType),
      s"joinType must be inner, left_outer, right_outer or full_outer, " +
        s"got $joinType")
    // fail at operator construction, not minutes later inside the
    // running stream: the lookback is interpolated into an INTERVAL
    // literal, so a malformed unit would otherwise surface as a parse
    // error at stream-start (this is a public library operator — the
    // require's message names the argument, the late error would not)
    val parsed =
      try org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(lookback))
      catch { case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"lookback '$lookback' is not a valid SQL interval body " +
            s"(expected e.g. \"10 minutes\"): ${e.getMessage}", e)
      }
    require(parsed.months == 0,
      s"lookback '$lookback' uses calendar months — the join window " +
        "must be a fixed duration (days/hours/minutes/seconds)")
    require(parsed.days >= 0 && parsed.microseconds >= 0 &&
        (parsed.days > 0 || parsed.microseconds > 0),
      s"lookback '$lookback' must be a positive duration")
    val l = left.withWatermark(leftTsCol, leftDelay)
    val r = right.withWatermark(rightTsCol, rightDelay)
    r.join(l, keyCond &&
      col(leftTsCol) <= col(rightTsCol) &&
      col(leftTsCol) >= col(rightTsCol) - expr(s"INTERVAL '$lookback'"),
      joinType)
  }

  /** Dedup-on-arrival: emit only the FIRST document carrying each content
    * hash, across micro-batches — the streaming-ingest twin of
    * [[graft.pipeline.Dedup.exactSurvivors]]. State per key is one
    * boolean ("seen"); within a batch the smallest id wins, across
    * batches the earlier batch wins (later arrivals of a seen hash emit
    * nothing). Runs unchanged in batch mode (one batch ⇒ min-id per
    * hash).
    *
    * Scale: state is |distinct hashes| booleans sharded by the state
    * store; per-key single-task execution is Spark's
    * flatMapGroupsWithState contract, so no CAS is needed. A production
    * deployment bounds state with a timeout (accepting re-admittance of
    * hashes idle longer than the horizon); the contract here keeps
    * NoTimeout for exact first-arrival semantics. */
  def dedupFirstArrival(
      events: Dataset[(Long, String)]): Dataset[(Long, String)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (hash: String, rows: Iterator[(Long, String)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single((rows.map(_._1).min, hash))
          }
      }
  }

  /** Streaming HyperLogLog maintenance: per group, fold each
    * micro-batch's 60-bit hashes into the 2^p-byte register state
    * (same bucket/rho arithmetic as
    * [[graft.functions.HllRegisters]]) and emit the group's
    * post-update registers with a per-group update counter. Because the
    * merge is an elementwise max, the registers after the LAST update
    * for a group equal the one-shot batch sketch over everything the
    * group has seen — regardless of how triggers split the input; the
    * oracle entry checks exactly that identity. State per group is
    * 2^p bytes + one long, bounded forever (the sketch never grows —
    * this is THE always-on distinct-count shape: no timeout needed,
    * unlike first-arrival dedup whose state tracks the key set).
    *
    * Output rows: (group, upd, registers). Downstream takes max_by(upd)
    * per group and feeds [[graft.pipeline.Stats.hllEstimate]]. */
  def hllMaintain(
      hashes: Dataset[(String, Long)], p: Int): Dataset[(String, Long, Seq[Int])] = {
    import hashes.sparkSession.implicits._
    val m = 1 << p
    val w = 60 - p
    hashes.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Array[Byte]), (String, Long, Seq[Int])](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long)],
         state: GroupState[(Long, Array[Byte])]) =>
          val (upd, regs) = state.getOption.getOrElse((0L, new Array[Byte](m)))
          rows.foreach { case (_, h) =>
            val b = (h >>> w).toInt
            val rest = h & ((1L << w) - 1)
            val rho =
              if (rest == 0L) w + 1
              else w - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
            if (rho > regs(b)) regs(b) = rho.toByte
          }
          state.update((upd + 1, regs))
          Iterator.single((g, upd + 1, regs.map(_.toInt).toSeq))
      }
  }

  /** Streaming Count-Min maintenance — [[hllMaintain]]'s frequency twin:
    * per group, fold each micro-batch's 60-bit hashes into the d×2^wlog
    * counter state (same bit-slice arithmetic as
    * [[graft.functions.CmsCounters]]) and emit the post-update counters
    * with an update counter. Counter ADDITION is associative and
    * commutative over batches, so the counters after a group's LAST
    * update equal the one-shot batch sketch over everything the group
    * has seen — the gate checks that identity, like st12's max-merge.
    * State per group is d·2^wlog longs + one long, bounded forever:
    * always-on frequency monitoring with no timeout and no growth.
    *
    * Output rows: (group, upd, counters row-major). Downstream takes
    * max_by(upd) per group and probes with element_at + least, exactly
    * as [[graft.pipeline.Stats.cmsTokenEstimates]] does in batch. */
  def cmsMaintain(
      hashes: Dataset[(String, Long)], d: Int,
      wlog: Int): Dataset[(String, Long, Seq[Long])] = {
    import hashes.sparkSession.implicits._
    require(d > 0 && wlog > 0 && wlog <= 24 && d * wlog <= 60,
      s"cmsMaintain: need 0 < wlog <= 24 and d*wlog <= 60, got d=$d wlog=$wlog")
    val w = 1 << wlog
    val mask = (w - 1).toLong
    hashes.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Array[Long]), (String, Long, Seq[Long])](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long)],
         state: GroupState[(Long, Array[Long])]) =>
          val (upd, cnt) =
            state.getOption.getOrElse((0L, new Array[Long](d * w)))
          rows.foreach { case (_, h) =>
            var i = 0
            while (i < d) {
              cnt(i * w + ((h >>> (i * wlog)) & mask).toInt) += 1L
              i += 1
            }
          }
          state.update((upd + 1, cnt))
          Iterator.single((g, upd + 1, cnt.toSeq))
      }
  }

  /** Streaming rolling-rate anomaly — [[ewmaMaintain]]'s alarm twin,
    * maintaining [[graft.pipeline.EventAnalytics.countAnomalies]]'s
    * trailing-`window` baseline across micro-batches: state per group is
    * the bucket frontier + the last `window` observed (bucket, count)
    * pairs, bounded forever. Same monotone-frontier contract as
    * ewmaMaintain (late/re-delivered buckets dropped); in-order arrival
    * makes the streamed flags equal the batch operator row-for-row,
    * which the st17 gate verifies against the e7 oracle.
    *
    * Output (group, bucket, cnt, trail_n, trail_sum, anomaly). */
  def anomalyMaintain(
      counts: Dataset[(String, Long, Long)], window: Int, factor: Long)
      : Dataset[(String, Long, Long, Long, Long, Boolean)] = {
    import counts.sparkSession.implicits._
    require(window > 0 && factor > 0, "window and factor must be positive")
    counts.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[(Long, Long)]),
          (String, Long, Long, Long, Long, Boolean)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Seq[(Long, Long)])]) =>
          var (frontier, trail) =
            state.getOption.getOrElse((Long.MinValue, Seq.empty[(Long, Long)]))
          val out = Seq.newBuilder[(String, Long, Long, Long, Long, Boolean)]
          rows.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, b, c) =>
            if (b > frontier) {
              val trailN = trail.size.toLong
              val trailSum = trail.iterator.map(_._2).sum
              val anomaly = trailN > 0 && c * trailN > factor * trailSum
              out += ((g, b, c, trailN, trailSum, anomaly))
              trail = (trail :+ (b -> c)).takeRight(window)
              frontier = b
            }
          }
          state.update((frontier, trail))
          out.result().iterator
      }
  }

  /** Streaming EWMA maintenance — the ORDER-SENSITIVE companion of the
    * sketch maintainers: per group the state is just (last bucket, last
    * ewma), two numbers, bounded forever. Each micro-batch folds its
    * finalized (bucket, count) rows in bucket order through the same
    * recurrence as [[graft.functions.SeriesKernels.ewma]]; rows at or
    * before the state's bucket frontier are DROPPED (re-delivery and
    * late stragglers can't corrupt the fold — monotone frontier, the
    * watermark contract in miniature). When bucket counts arrive
    * nondecreasing across triggers (the windowed-counts-on-watermark
    * output feeding it), the emitted rows equal the one-shot batch
    * [[graft.pipeline.EventAnalytics.ewmaSmooth]] over the union —
    * the gate entry checks exactly that identity.
    *
    * Input (group, bucket, cnt); output (group, bucket, cnt, ewma). */
  def ewmaMaintain(counts: Dataset[(String, Long, Long)], alpha: Double)
      : Dataset[(String, Long, Long, Double)] = {
    import counts.sparkSession.implicits._
    require(alpha > 0.0 && alpha <= 1.0,
      s"ewmaMaintain: alpha must be in (0, 1], got $alpha")
    val beta = 1.0 - alpha
    counts.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (String, Long, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Double)]) =>
          val sorted = rows.toArray.sortBy(r => (r._2, r._3))
          var (last, e) = state.getOption.getOrElse((Long.MinValue, 0.0))
          val out = Array.newBuilder[(String, Long, Long, Double)]
          var seeded = state.exists
          sorted.foreach { case (_, b, c) =>
            if (b > last) {
              e = if (!seeded) c.toDouble else alpha * c.toDouble + beta * e
              seeded = true
              last = b
              out += ((g, b, c, e))
            }
          }
          state.update((last, e))
          out.result().iterator
      }
  }
}

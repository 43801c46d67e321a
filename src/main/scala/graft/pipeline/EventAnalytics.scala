package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics beyond joins/windows: ordered funnels and retention
  * cohorts — the product-analytics queries every event store serves.
  */
object EventAnalytics {

  /** Strictly-ordered funnel: how many users completed step 1, then step 2
    * AFTER their step-1 time, then step 3 after that, … (first-completion
    * semantics: each stage anchors at the EARLIEST time it could have
    * happened, which maximizes the users counted at every depth — the
    * standard product-funnel definition). Returns one row per step:
    * (step, step_no, users).
    *
    * Plan at scale: stage i is `events σ(type=sᵢ) ⋈_user stage_{i-1}` +
    * a min-aggregate — each step scans the log ONCE filtered to its own
    * event type (filter inside the scan; shuffle ∝ that type's rows,
    * never the whole log), and the accumulator side is user-count-sized.
    * On a user-bucketed layout ([[graft.sources.BucketedStore]]) the
    * per-user joins are co-located and plan zero Exchange. Strict `>`
    * keeps simultaneous events out of the next stage on BOTH engines
    * identically. */
  def funnel(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    val stages = Seq.newBuilder[(String, DataFrame)]
    stages += steps.head -> acc
    for (i <- 1 until steps.size) {
      val step = events.filter(col(typeCol) === steps(i))
        .select(col(userCol), col(tsCol).as("__ts"))
      acc = acc.join(step, Seq(userCol))
        .filter(col("__ts") > col(s"t${i - 1}"))
        .groupBy(col(userCol) +: (0 until i).map(j => col(s"t$j")): _*)
        .agg(min(col("__ts")).as(s"t$i"))
      stages += steps(i) -> acc
    }
    stages.result().zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(name).as("step"), lit((i + 1).toLong).as("step_no"),
          col("users"))
    }.reduce(_ unionByName _)
  }

  /** Retention cohorts: users bucketed by their FIRST active period
    * (cohort), counted in each later period they return — the
    * (cohort, offset) retention triangle. `bucket` is the period length
    * in the units of `tsCol` (e.g. 7·86400000 ms for weekly cohorts on a
    * millisecond timestamp). Integer arithmetic only, so the triangle
    * replays exactly in any engine.
    *
    * Plan: the log collapses to DISTINCT (user, period) in one two-phase
    * aggregate (map-side combine absorbs per-user chatter — the 100 TB
    * reduction step), cohorts are a second user-sized aggregate, and the
    * triangle is a third; the join in the middle is user-sized on both
    * sides. Output: (cohort, offset, users), offset 0 = the cohort's own
    * period (users = cohort size). */
  def retentionCohorts(
      events: DataFrame, userCol: String, tsCol: Column,
      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    // exact floor division for an integral tsCol: subtract the remainder
    // (integer ops) so the double division is exact-multiple / bucket —
    // no rounding-across-the-boundary edge. Valid while tsCol < 2^53
    // (any millisecond timestamp; use ms, not ns).
    val period = ((tsCol - pmod(tsCol, lit(bucket))) / bucket).cast("long")
    val up = events.select(col(userCol).as("u"), period.as("w"))
      .distinct()
    val cohorts = up.groupBy("u").agg(min("w").as("cohort"))
    up.join(cohorts, "u")
      .groupBy(col("cohort"), (col("w") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** Exact floor-division time bucket (the remainder is subtracted first
    * so the double division is exact-multiple / bucket — the
    * retentionCohorts trick). Shared by [[countAnomalies]], [[ewmaSmooth]]
    * and the streaming harness that must bucket IDENTICALLY to stay on
    * the batch oracle. */
  def timeBucket(tsMsCol: Column, bucketMs: Long): Column = {
    val ts = tsMsCol.cast("long")
    ((ts - pmod(ts, lit(bucketMs))) / bucketMs).cast("long")
  }

  /** Rolling-window count anomalies — the pipeline-health alarm ("did
    * this event type spike vs its own recent rate"): per (type, time
    * bucket), flag buckets whose count exceeds `factor`× the trailing
    * mean over the last `window` OBSERVED buckets (row-window semantics:
    * buckets with zero events don't appear, so the baseline is the last
    * k nonempty buckets — identical on any engine, no gap-filling
    * ambiguity).
    *
    * Integer-exact end to end: the flag is the cross-multiplied
    * comparison cnt·trail_n > factor·trail_sum — no division anywhere,
    * and the products stay far below Long range (trail_n ≤ window, so
    * the bound is window·max_bucket_count ≈ 2⁴⁰ at a billion events per
    * bucket). Buckets with no history (trail_n = 0) are never anomalous.
    *
    * Shape at 100 TB: one map-side-combined aggregation compresses the
    * log to (type, bucket) rows; the window runs over that compressed
    * table partitioned by type — state ∝ buckets, never events.
    *
    * Output: (event_type, bucket, cnt, trail_n, trail_sum, anomaly). */
  def countAnomalies(
      df: DataFrame, typeCol: String, tsMsCol: Column, bucketMs: Long,
      window: Int, factor: Long = 2L): DataFrame = {
    require(bucketMs > 0 && window > 0 && factor > 0,
      "bucketMs, window and factor must be positive")
    val counts = df
      .groupBy(col(typeCol), timeBucket(tsMsCol, bucketMs).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("bucket"))
      .rowsBetween(-window, -1)
    counts
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("anomaly",
        col("trail_n") > 0 &&
          col("cnt") * col("trail_n") > lit(factor) * col("trail_sum"))
  }

  /** Top-k user PATHS: the most common first-`depth` event-type sequences
    * (the "how do users start" product-analytics staple the funnel's
    * fixed stage list can't answer). Deterministic: events rank by
    * (ts, id) per user; the path string joins the first `depth` types in
    * that order.
    *
    * Shape at scale: ONE shuffle on the user key; the rank filter keeps
    * ≤ depth rows per user before the per-user collect (arrays bounded by
    * `depth`, reassembly via GetArrayStructFields — no lambda), and the
    * path count is a second two-phase aggregate + TakeOrdered top-k.
    *
    * Output: (path, users), top k by (users DESC, path ASC). */
  def topPaths(df: DataFrame, userCol: String, typeCol: String,
      tsCol: Column, idCol: Column, depth: Int, k: Int): DataFrame = {
    require(depth > 0 && k > 0, "depth and k must be positive")
    // rank over the RENAMED projection — ordering by the caller's columns
    // after the rename would not resolve
    val w = Window.partitionBy(userCol).orderBy(col("__ts"), col("__id"))
    df.select(col(userCol), col(typeCol).as("__t"), tsCol.as("__ts"),
        idCol.as("__id"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= depth)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col("__rn").as("i"),
        col("__t").as("t")))).as("s"))
      .select(array_join(col("s.t"), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("users"))
      .orderBy(col("users").desc, col("path").asc)
      .limit(k)
  }

  /** First-order event-type TRANSITION MATRIX (the Markov-chain view of
    * the log, complementing [[topPaths]]' literal prefixes): for every
    * consecutive pair of events per user, count (from, to) and the
    * row-normalized probability. Deterministic (ts, id) ordering;
    * integer counts with ONE final division per cell.
    *
    * One shuffle on the user key for the lag window (the log compresses
    * no further — transitions need adjacency), then a two-phase
    * (from, to) count whose output is |types|² rows. */
  def transitionMatrix(df: DataFrame, userCol: String, typeCol: String,
      tsCol: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col("__ts"), col("__id"))
    val pairs = df
      .select(col(userCol), col(typeCol).as("to_type"), tsCol.as("__ts"),
        idCol.as("__id"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("cnt"))
    val totals = Window.partitionBy("from_type")
    pairs
      .withColumn("row_total", sum("cnt").over(totals))
      .withColumn("prob",
        col("cnt").cast("double") / col("row_total").cast("double"))
  }

  /** Running EWMA smoothing of per-(type, bucket) event counts — the
    * dashboard/alerting companion of [[countAnomalies]]: out(0) = x(0),
    * out(t) = α·x(t) + (1−α)·out(t−1) over each type's buckets in time
    * order (gaps are skipped, not zero-filled — the series is the
    * observed buckets, same convention as countAnomalies' trailing
    * window).
    *
    * The fold is the codegen'd [[graft.functions.SeriesKernels.ewma]]
    * kernel (an `aggregate` HOF would run interpreted); with a dyadic α
    * every step is the same two IEEE roundings in any engine folding
    * left-to-right, so values replay bit-identically (DuckDB
    * `list_reduce`).
    *
    * Shape at 100 TB: one map-side-combined aggregation compresses the
    * log to (type, bucket) rows; the per-type collect_list then holds
    * buckets, never events — state ∝ series length, the grouped-series
    * shape shared with the window ops.
    *
    * Output: (event_type, bucket, cnt, ewma). */
  def ewmaSmooth(df: DataFrame, typeCol: String, tsMsCol: Column,
      bucketMs: Long, alpha: Double): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val counts = df
      .groupBy(col(typeCol), timeBucket(tsMsCol, bucketMs).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .groupBy(col(typeCol))
      .agg(sort_array(collect_list(struct(col("bucket"), col("cnt"))))
        .as("s"))
      .select(col(typeCol), col("s"),
        graft.functions.SeriesFunctions.ewma(
          col("s.cnt").cast("array<double>"), alpha).as("e"))
      .select(col(typeCol), posexplode(col("s")).as(Seq("i", "r")), col("e"))
      .select(col(typeCol), col("r.bucket").as("bucket"),
        col("r.cnt").as("cnt"),
        element_at(col("e"), col("i") + 1).as("ewma"))
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
}

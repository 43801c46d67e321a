package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketized) interval join — the scale-safe form of the range
  * join "for each left row, find right rows with ts ∈ (l.ts, l.ts+span]".
  *
  * A naive theta-join on the range predicate degenerates to a per-equi-group
  * cartesian product (Spark plans BroadcastNestedLoopJoin — O(n·m) compares
  * per group, unusable when the equi keys are low-cardinality like
  * event_type). Bucketizing time into span-sized bins makes it an EQUI join:
  * bucket(ts) = ts div span, and any right match of a left row lives in the
  * left row's bucket or the next one. The left side explodes to those 2
  * probe buckets, the join runs on (equi keys, bucket) — a plain shuffled
  * hash join whose work is proportional to actual temporal density, not n² —
  * and the exact range predicate filters residually. Same technique as
  * Spark's own range-join binning hints and kdb-style window joins.
  */
object IntervalJoin {

  /** Per left row: count of right rows with `ts` strictly after the left's
    * and within `spanMs`, sharing `equi` keys, plus the earliest such ts
    * (null if none). Timestamps must be non-negative epoch millis (integer
    * `div` bucketing). One exploded-probe equi join + one aggregation on the
    * left id; a (left,right) pair can match in only one probe bucket, so no
    * dedup pass is needed.
    *
    * At 100 TB: choose span ≈ the real window (buckets stay dense), and the
    * join shuffles each side once on (equi, bucket) — skew on a hot equi key
    * is bounded by per-bucket density, and AQE's skew-join split handles
    * hot buckets.
    */
  def followWithin(
      left: DataFrame, right: DataFrame, idCol: String, tsMsCol: String,
      spanMs: Long, equi: Seq[String]): DataFrame = {
    val probes = left
      .select(col(idCol) +: col(tsMsCol) +: equi.map(col): _*)
      .withColumn("__b", explode(array(
        expr(s"$tsMsCol div $spanMs"), expr(s"$tsMsCol div $spanMs + 1"))))
    val build = right
      .select(col(tsMsCol).as("__rts") +: equi.map(col): _*)
      .withColumn("__b", expr(s"__rts div $spanMs"))
    val hit = col("__rts") > col(tsMsCol) &&
      col("__rts") <= col(tsMsCol) + lit(spanMs)
    probes.join(build, equi :+ "__b", "left_outer")
      .groupBy(col(idCol))
      .agg(
        sum(when(hit, 1L).otherwise(0L)).as("matches"),
        min(when(hit, col("__rts"))).as("next_ts_ms"))
  }
}
